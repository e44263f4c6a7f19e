"""Parser for the concrete Relapse syntax (common subset).

From-scratch recursive-descent parser for the grammar the reference parses
with Parsec (/root/reference/src/Data/Katydid/Relapse/Parser.hs:43-462),
producing spec-DSL documents for :func:`katydid_haskell_ray.spec.compile_spec`.

Supported surface (the subset exercised by the reference's test corpus,
test/ParserSpec.hs):

    grammar  := pattern? ('#' name '=' pattern)*
    pattern  := '*' | '<empty>' | '!' '(' pattern ')' | '.' pattern
              | '@' name | '(' pattern (('|'|'&') pattern)* ')' ['*'|'?']
              | '[' pattern (',' pattern)* ']'        -- concat
              | '{' pattern (';' pattern)* '}'        -- interleave
              | name ':' pattern                      -- node
              | name ('[' .. | '{' .. | '.' ..)      -- node, colon-free
              | BUILTIN literal                       -- leaf w/ builtin op
              | '->' funcexpr                         -- leaf w/ function
    name     := identifier | '_' | string | int | double | true | false
              | '!' '(' name ')'                      -- name negation
              | '(' name ('|' name)+ ')'              -- name choice
    BUILTIN  := '==' '!=' '<' '>' '<=' '>=' '~=' '*=' '^=' '$=' '::'
    funcexpr := ident '(' arg (',' arg)* ')' ; arg := '$'type | literal
              | funcexpr
    literal  := int (dec/hex/oct, signed) | double | string ("..." with
              escapes, `raw`) | true | false | '[]byte{' bytes '}'
              | '$'type (type-check sugar after '::')

Line (`//`) and block (`/* */`) comments are whitespace.

Typed cast literals (``int(-5)``, ``uint(7)``, ``double(2.5)``) and typed
list literals (``[]bool{..} []int{..} []uint{..} []double{..}
[]string{..} [][]byte{..}``) parse per Parser.hs:121-151,294-318; list
elements must already carry the element type (newList asserts, never
converts).
"""

from __future__ import annotations

import re

BUILTINS = ("==", "!=", "<=", ">=", "~=", "*=", "^=", "$=", "::", "<", ">")

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<arrow>->)
  | (?P<builtin>==|!=|<=|>=|~=|\*=|\^=|\$=|::)
  | (?P<empty><empty>)
  | (?P<listtype>\[\]\[\]byte\{|\[\](?:bool|int|uint|double|string)\{)
  | (?P<bytes>\[\]byte\{)
  | (?P<double>-?(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
  | (?P<int>-?(?:0[xX][0-9a-fA-F]+|0[0-7]*|[1-9]\d*))
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<char>'(?:\\.|[^'\\])*')
  | (?P<raw>`[^`]*`)
  | (?P<var>\$(?:bool|int|uint|double|string|\[\]byte))
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[\[\]{}();,|&!.*?@:=#])
""", re.VERBOSE)


class RelapseSyntaxError(ValueError):
    pass


def _tokenize(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise RelapseSyntaxError(f"lex error at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            if m.group().startswith("/*") and not m.group().endswith("*/"):
                raise RelapseSyntaxError("unterminated block comment")
            continue
        out.append((kind, m.group()))
    return out


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'",
            "a": "\a", "b": "\b", "f": "\f", "v": "\v", "/": "/", "0": "\0"}


def _unquote(s: str) -> str:
    body, out, i = s[1:-1], [], 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            i += 1
            e = body[i]
            if e in "uUx":
                n = {"u": 4, "U": 8, "x": 2}[e]
                out.append(chr(int(body[i + 1:i + 1 + n], 16)))
                i += n
            else:
                out.append(_ESCAPES.get(e, e))
        else:
            out.append(c)
        i += 1
    return "".join(out)


_VAR_TYPE = {"$bool": "bool", "$int": "int", "$uint": "uint",
             "$double": "double", "$string": "string", "$[]byte": "bytes"}


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value):
        kind, v = self.next()
        if v != value:
            raise RelapseSyntaxError(f"expected {value!r}, got {v!r}")

    # -- literals / expressions ---------------------------------------------

    def literal(self):
        kind, v = self.next()
        if kind == "int":
            base = 16 if v.lstrip("-").lower().startswith("0x") else \
                8 if re.match(r"-?0[0-7]+$", v) else 10
            return {"int": int(v, base)}
        if kind == "double":
            return {"double": float(v)}
        if kind == "string":
            return {"string": _unquote(v)}
        if kind == "raw":
            return {"string": v[1:-1]}
        if kind == "ident" and v in ("true", "false"):
            return {"bool": v == "true"}
        if kind == "ident" and v in ("int", "uint", "double") \
                and self.peek()[1] == "(":
            return self._cast_literal(v)
        if kind == "bytes":
            return {"bytes": self._bytes_body()}
        if kind == "listtype":
            return self._list_literal(v)
        if kind == "var":
            # after '::' the "literal" is a type name: produce a typed dummy
            return {_VAR_TYPE[v]: _TYPE_DUMMY[_VAR_TYPE[v]]}
        raise RelapseSyntaxError(f"expected literal, got {v!r}")

    def _cast_literal(self, cast: str):
        """Typed cast literals int(-5) / uint(7) / double(2.5)
        (Parser.hs intLit:121-123, uintCastLit:131-132,
        doubleCastLit:149-151).  uint and double exist ONLY via the cast;
        double(2) reads digits-without-dot as a float, like _floatLit."""
        self.expect("(")
        inner = self.literal()
        self.expect(")")
        (t, val), = inner.items()
        if cast == "int" and t == "int":
            return {"int": val}
        if cast == "uint" and t == "int":
            if val < 0:
                raise RelapseSyntaxError("negative uint")
            return {"uint": val}
        if cast == "double" and t in ("double", "int"):
            return {"double": float(val)}
        raise RelapseSyntaxError(f"bad {cast}(...) cast of {t} literal")

    def _list_literal(self, tok: str):
        """Typed list literals []int{1,2} .. [][]byte{[]byte{46}}
        (Parser.hs _listType:294-303, newList:309-318).  Element literals
        must already have the list's element type — newList asserts, it
        never converts (Expr.hs assertUint:259-262)."""
        et = tok[2:-1]  # "bool" | "int" | ... | "[]byte"
        want = "bytes" if et == "[]byte" else et
        vals = []
        if self.peek()[1] == "}":
            self.next()
        else:
            while True:
                lit = self.literal()
                (t, val), = lit.items()
                if t != want:
                    raise RelapseSyntaxError(
                        f"[]{et}{{..}}: expected {want} element, got {t}")
                vals.append(val)
                kind, v = self.next()
                if v == "}":
                    break
                if v != ",":
                    raise RelapseSyntaxError(f"expected , or }}, got {v!r}")
        return {f"list_{want}": vals}

    def _bytes_body(self) -> str:
        import base64
        vals = []
        while True:
            kind, v = self.next()
            if v == "}":
                break
            if v == ",":
                continue
            if kind == "int":
                n = int(v, 0)
            elif kind == "char":
                s = _unquote(v)
                if len(s) != 1:
                    raise RelapseSyntaxError(f"bad char literal {v!r}")
                n = ord(s)
            else:
                raise RelapseSyntaxError(f"bad []byte element {v!r}")
            if not 0 <= n < 256:
                raise RelapseSyntaxError(f"byte out of range: {n}")
            vals.append(n)
        return "base64:" + base64.b64encode(bytes(vals)).decode()

    def funcexpr(self):
        kind, name = self.next()
        if kind != "ident":
            raise RelapseSyntaxError(f"expected function name, got {name!r}")
        self.expect("(")
        args = []
        if self.peek()[1] != ")":
            while True:
                args.append(self.funcarg())
                kind, v = self.next()
                if v == ")":
                    break
                if v != ",":
                    raise RelapseSyntaxError(f"expected , or ), got {v!r}")
        else:
            self.next()
        return {"func": name, "args": args}

    def funcarg(self):
        kind, v = self.peek()
        if kind == "var":
            self.next()
            return {"var": _VAR_TYPE[v]}
        if (kind == "ident" and self.peek(1)[1] == "("
                and v not in ("true", "false", "int", "uint", "double")):
            # int(/uint(/double( are cast literals, not function calls
            # (Parser.hs _expr: try _terminal first)
            return self.funcexpr()
        return self.literal()

    # -- patterns -----------------------------------------------------------

    def pattern(self):
        kind, v = self.peek()
        if v == "*":
            self.next()
            return "zany"
        if kind == "empty":
            self.next()
            return "empty"
        if v == "!":
            # treenode is tried before pattern-not (Parser.hs:445-447:
            # "!(A):*" is a node with a negated NAME, "!(*)" a pattern not)
            save = self.i
            try:
                return self._node_tail(self._name_expr())
            except RelapseSyntaxError:
                self.i = save
            self.next()
            self.expect("(")
            p = self.pattern()
            self.expect(")")
            return {"not": p}
        if v == ".":
            self.next()
            return {"contains": self.pattern()}
        if v == "@":
            self.next()
            kind, name = self.next()
            if kind != "ident":
                raise RelapseSyntaxError(f"expected ref name, got {name!r}")
            return {"ref": name}
        if v == "(":
            # name-choice node "(a|b):p" (Parser.hs:351-361) vs pattern
            # group "(p|q)": try the name expression first, backtrack
            save = self.i
            try:
                return self._node_tail(self._name_expr())
            except RelapseSyntaxError:
                self.i = save
            return self._group()
        if v == "[":
            return self._list("[", "]", ",", "concat")
        if v == "{":
            return self._list("{", "}", ";", "interleave")
        if kind == "builtin":
            self.next()
            return {"leaf": {"op": v, "value": self.literal()}}
        if kind == "arrow":
            self.next()
            return {"leaf": self.funcexpr()}
        # name ':' pattern  (node), or  name BUILTIN literal / name -> func
        # (leaf sugar: `A == "x"` — Parser.hs treeNode alternatives)
        return self._node_tail(self._name_expr())

    def _node_tail(self, name_expr):
        """Parse the child of a tree node: ':' pattern, a depth pattern
        ([..] {..} .p) without a colon, or the builtin/-> leaf sugar
        (Parser.hs _treenodePattern/_depthPattern, :417-431)."""
        kind, v = self.peek()
        if kind == "builtin":
            self.next()
            child = {"leaf": {"op": v, "value": self.literal()}}
        elif kind == "arrow":
            self.next()
            child = {"leaf": self.funcexpr()}
        elif v in ("[", "{", "."):
            child = self.pattern()
        else:
            self.expect(":")
            child = self.pattern()
        if isinstance(name_expr, str):
            return {"field": name_expr, "child": child}
        return {"node": name_expr, "child": child}

    def _name_expr(self):
        """nameExpr (Parser.hs:354-361): '_' any, '!(n)' negation,
        '(n|m|..)' choice (>=2 alternatives), or a literal name."""
        kind, v = self.next()
        if v == "_":
            return True  # any-name node: predicate true
        if v == "!":
            self.expect("(")
            inner = self._name_expr()
            self.expect(")")
            return {"func": "not", "args": [_name_to_expr(inner)]}
        if v == "(":
            parts = [self._name_expr()]
            while self.peek()[1] == "|":
                self.next()
                parts.append(self._name_expr())
            self.expect(")")
            if len(parts) < 2:  # sepBy2: "((a))" is a parse error
                raise RelapseSyntaxError("name choice needs >= 2 alternatives")
            out = _name_to_expr(parts[0])
            for p in parts[1:]:  # foldl1 orExpr
                out = {"func": "or", "args": [out, _name_to_expr(p)]}
            return out
        if kind == "ident" and v in ("true", "false"):
            return {"func": "eq", "args": [{"var": "bool"},
                                           {"bool": v == "true"}]}
        if kind == "ident":
            return v
        if kind == "string":
            return _unquote(v)
        if kind == "raw":
            return v[1:-1]
        if kind == "int":
            return {"func": "eq", "args": [{"var": "int"}, {"int": int(v, 0)}]}
        if kind == "double":
            return {"func": "eq", "args": [{"var": "double"},
                                           {"double": float(v)}]}
        raise RelapseSyntaxError(f"expected name, got {v!r}")

    def _group(self):
        """_parenPattern (Parser.hs:378-392): after '(' p, EITHER ')' with a
        mandatory postfix '*'/'?', OR a '|'/'&' list closed by ')' with no
        postfix.  A bare group '(p)' is a parse error in the reference."""
        self.expect("(")
        first = self.pattern()
        kind, v = self.next()
        if v == ")":
            kind, v = self.next()
            if v == "*":
                return {"star": first}
            if v == "?":
                return {"optional": first}
            raise RelapseSyntaxError(
                f"bare group needs postfix * or ?, got {v!r}")
        if v not in ("|", "&"):
            raise RelapseSyntaxError(f"expected | & or ), got {v!r}")
        op = v
        parts = [first, self.pattern()]
        while True:
            kind, v = self.next()
            if v == ")":
                break
            if v != op:
                raise RelapseSyntaxError("mixed | and & without parens")
            parts.append(self.pattern())
        return {"or" if op == "|" else "and": parts}

    def _list(self, open_, close, sep, key):
        """sepBy2 with optional trailing separator (Parser.hs:343-349,
        364-376): '[p,q,]' ok, '[p]' and '[]' parse errors."""
        self.expect(open_)
        parts = [self.pattern()]
        while True:
            kind, v = self.next()
            if v == close:
                break
            if v != sep:
                raise RelapseSyntaxError(f"expected {sep} or {close}, got {v!r}")
            if self.peek()[1] == close:
                self.next()
                break
            parts.append(self.pattern())
        if len(parts) < 2:
            raise RelapseSyntaxError(f"{key} needs >= 2 elements")
        return {key: parts}

    def grammar(self):
        refs = {}
        if self.peek()[1] != "#" and self.peek()[0] is not None:
            refs["main"] = self.pattern()
        while self.peek()[0] is not None:
            self.expect("#")
            kind, name = self.next()
            if kind != "ident":
                raise RelapseSyntaxError(f"expected ref name, got {name!r}")
            self.expect("=")
            refs[name] = self.pattern()
        if "main" not in refs:
            raise RelapseSyntaxError("grammar has no main pattern")
        return refs


_TYPE_DUMMY = {"bool": False, "int": 0, "uint": 0, "double": 0.0,
               "string": "", "bytes": b""}


def _name_to_expr(n):
    """Name in field shorthand (str/True) -> boolean name expression."""
    if n is True:
        return True
    if isinstance(n, str):
        return {"func": "eq", "args": [{"var": "string"}, {"string": n}]}
    return n


def parse(src: str) -> dict:
    """Concrete Relapse text -> spec-DSL document ({"main":..., "refs":...})."""
    refs = _Parser(_tokenize(src)).grammar()
    main = refs.pop("main")
    return {"main": main, "refs": refs}


def compile_relapse(src: str):
    """Concrete Relapse text -> compiled Grammar."""
    from katydid_haskell_ray import spec as S
    return S.compile_spec(parse(src))
