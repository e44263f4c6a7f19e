

:junk0c