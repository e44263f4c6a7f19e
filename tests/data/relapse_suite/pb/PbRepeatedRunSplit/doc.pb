
ax
b