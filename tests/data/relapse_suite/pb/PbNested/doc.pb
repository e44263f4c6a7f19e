

bob