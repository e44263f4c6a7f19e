

ann

bob