
a
b