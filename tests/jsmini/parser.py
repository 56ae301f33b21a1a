"""Recursive-descent / Pratt parser for the jsmini ES-subset.

AST nodes are plain tuples, first element is the kind:

statements:
  ('block',[s]) ('decl',kind,[(pattern,init)]) ('funcdecl',name,fn)
  ('if',c,t,e) ('for',init,cond,upd,body) ('forof',kind,pattern,it,body)
  ('while',c,body) ('return',e) ('throw',e) ('break',) ('continue',)
  ('try',block,param,catch,fin) ('expr',e) ('empty',)
expressions:
  ('num',v) ('str',v) ('bigint',v) ('regex',body,flags) ('tmpl',[parts])
  ('name',id) ('this',) ('arr',[e]) ('obj',[(key,e)])
  ('fn',name,params,body,is_async,is_arrow)
  ('assign',op,target,e) ('cond',c,t,e) ('bin',op,l,r) ('logic',op,l,r)
  ('unary',op,e) ('update',op,prefix,target) ('call',callee,args)
  ('new',callee,args) ('member',obj,prop) ('index',obj,e)
  ('spread',e) ('await',e)
patterns (destructuring targets):
  ('name',id) ('arrpat',[pattern|None]) ('objpat',[(key,pattern,default)])
params: list of (pattern, default|None)
"""

from __future__ import annotations

from .lexer import tokenize

ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
              "<<=", ">>=", "**="}

BIN_LEVELS = [
    {"||"}, {"&&"}, {"|"}, {"^"}, {"&"},
    {"==", "!=", "===", "!=="},
    {"<", ">", "<=", ">=", "instanceof", "in"},
    {"<<", ">>", ">>>"},
    {"+", "-"},
    {"*", "/", "%"},
]


class ParseError(SyntaxError):
    pass


def parse(src: str):
    return Parser(tokenize(src)).parse_program()


class Parser:
    def __init__(self, toks: list[tuple]):
        self.toks = toks
        self.i = 0

    # -- token helpers ----------------------------------------------------
    def peek(self, off: int = 0) -> tuple:
        j = min(self.i + off, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> tuple:
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def at(self, kind: str, val=None, off: int = 0) -> bool:
        t = self.peek(off)
        return t[0] == kind and (val is None or t[1] == val)

    def at_name(self, val: str, off: int = 0) -> bool:
        return self.at("name", val, off)

    def eat(self, kind: str, val=None) -> tuple:
        t = self.peek()
        if not self.at(kind, val):
            raise ParseError(
                f"line {t[2]}: expected {val or kind}, got {t[0]} {t[1]!r}")
        return self.next()

    def newline_before(self) -> bool:
        if self.i == 0:
            return True
        return self.peek()[2] > self.toks[self.i - 1][2]

    def semi(self):
        """Consume a statement terminator with minimal ASI."""
        if self.at("punct", ";"):
            self.next()
            return
        if self.at("punct", "}") or self.at("eof") or self.newline_before():
            return
        t = self.peek()
        raise ParseError(
            f"line {t[2]}: expected ';' before {t[0]} {t[1]!r}")

    # -- program / statements --------------------------------------------
    def parse_program(self):
        out = []
        while not self.at("eof"):
            out.append(self.statement())
        return ("block", out)

    def statement(self):
        t = self.peek()
        if t[0] == "punct" and t[1] == "{":
            return self.block()
        if t[0] == "punct" and t[1] == ";":
            self.next()
            return ("empty",)
        if t[0] == "name":
            kw = t[1]
            if kw in ("const", "let", "var"):
                return self.var_decl()
            if kw == "function":
                return self.func_decl(is_async=False)
            if kw == "async" and self.at_name("function", 1):
                self.next()
                return self.func_decl(is_async=True)
            if kw == "if":
                return self.if_stmt()
            if kw == "for":
                return self.for_stmt()
            if kw == "while":
                self.next()
                self.eat("punct", "(")
                c = self.expression()
                self.eat("punct", ")")
                return ("while", c, self.statement())
            if kw == "return":
                self.next()
                if (self.at("punct", ";") or self.at("punct", "}")
                        or self.at("eof") or self.newline_before()):
                    self.semi()
                    return ("return", None)
                e = self.expression()
                self.semi()
                return ("return", e)
            if kw == "throw":
                self.next()
                e = self.expression()
                self.semi()
                return ("throw", e)
            if kw == "break":
                self.next()
                self.semi()
                return ("break",)
            if kw == "continue":
                self.next()
                self.semi()
                return ("continue",)
            if kw == "try":
                return self.try_stmt()
        e = self.expression()
        self.semi()
        return ("expr", e)

    def block(self):
        self.eat("punct", "{")
        out = []
        while not self.at("punct", "}"):
            out.append(self.statement())
        self.eat("punct", "}")
        return ("block", out)

    def var_decl(self):
        kind = self.next()[1]
        decls = []
        while True:
            pat = self.pattern()
            init = None
            if self.at("punct", "="):
                self.next()
                init = self.assignment()
            decls.append((pat, init))
            if self.at("punct", ","):
                self.next()
                continue
            break
        self.semi()
        return ("decl", kind, decls)

    def func_decl(self, is_async: bool):
        self.eat("name", "function")
        name = self.eat("name")[1]
        params = self.params()
        body = self.block()
        return ("funcdecl", name,
                ("fn", name, params, body, is_async, False))

    def if_stmt(self):
        self.eat("name", "if")
        self.eat("punct", "(")
        c = self.expression()
        self.eat("punct", ")")
        then = self.statement()
        els = None
        if self.at_name("else"):
            self.next()
            els = self.statement()
        return ("if", c, then, els)

    def for_stmt(self):
        self.eat("name", "for")
        self.eat("punct", "(")
        # for (const pat of expr)
        if (self.at("name") and self.peek()[1] in ("const", "let", "var")):
            kind = self.next()[1]
            pat = self.pattern()
            if self.at_name("of") or self.at_name("in"):
                of_kind = self.next()[1]
                it = self.expression()
                self.eat("punct", ")")
                return ("forof" if of_kind == "of" else "forin",
                        kind, pat, it, self.statement())
            init = None
            if self.at("punct", "="):
                self.next()
                init = self.assignment()
            decls = [(pat, init)]
            while self.at("punct", ","):
                self.next()
                p2 = self.pattern()
                i2 = None
                if self.at("punct", "="):
                    self.next()
                    i2 = self.assignment()
                decls.append((p2, i2))
            init_node = ("decl", kind, decls)
        elif self.at("punct", ";"):
            init_node = None
        else:
            init_node = ("expr", self.expression())
        self.eat("punct", ";")
        cond = None if self.at("punct", ";") else self.expression()
        self.eat("punct", ";")
        upd = None if self.at("punct", ")") else self.expression()
        self.eat("punct", ")")
        return ("for", init_node, cond, upd, self.statement())

    def try_stmt(self):
        self.eat("name", "try")
        blk = self.block()
        param, catch, fin = None, None, None
        if self.at_name("catch"):
            self.next()
            if self.at("punct", "("):
                self.next()
                param = self.pattern()
                self.eat("punct", ")")
            catch = self.block()
        if self.at_name("finally"):
            self.next()
            fin = self.block()
        return ("try", blk, param, catch, fin)

    # -- patterns ---------------------------------------------------------
    def pattern(self):
        if self.at("punct", "["):
            self.next()
            elems = []
            while not self.at("punct", "]"):
                if self.at("punct", ","):
                    elems.append(None)  # hole: (s,[,v])=>...
                    self.next()
                    continue
                elems.append(self.pattern())
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "]")
            return ("arrpat", elems)
        if self.at("punct", "{"):
            self.next()
            props = []
            while not self.at("punct", "}"):
                key = self.eat("name")[1]
                pat = ("name", key)
                if self.at("punct", ":"):
                    self.next()
                    pat = self.pattern()
                default = None
                if self.at("punct", "="):
                    self.next()
                    default = self.assignment()
                props.append((key, pat, default))
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "}")
            return ("objpat", props)
        return ("name", self.eat("name")[1])

    def params(self) -> list:
        self.eat("punct", "(")
        out = []
        while not self.at("punct", ")"):
            pat = self.pattern()
            default = None
            if self.at("punct", "="):
                self.next()
                default = self.assignment()
            out.append((pat, default))
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        return out

    # -- expressions ------------------------------------------------------
    def expression(self):
        e = self.assignment()
        while self.at("punct", ","):
            self.next()
            e = ("bin", ",", e, self.assignment())
        return e

    def assignment(self):
        if arrow := self.try_arrow():
            return arrow
        left = self.conditional()
        t = self.peek()
        if t[0] == "punct" and t[1] in ASSIGN_OPS:
            self.next()
            right = self.assignment()
            return ("assign", t[1], left, right)
        return left

    def try_arrow(self):
        """Detect `name =>`, `(params) =>`, `async name =>`,
        `async (params) =>` at the current position."""
        start = self.i
        is_async = False
        if self.at_name("async") and not self.newline_ahead(1):
            if self.at("name", None, 1) and self.at("punct", "=>", 2):
                is_async = True
                self.next()
            elif self.at("punct", "(", 1) and self.arrow_after_parens(1):
                is_async = True
                self.next()
        if self.at("name") and self.at("punct", "=>", 1) \
                and self.peek()[1] not in ("true", "false", "null",
                                           "undefined", "this"):
            name = self.next()[1]
            self.next()  # =>
            return self.arrow_tail([(("name", name), None)], is_async)
        if self.at("punct", "(") and self.arrow_after_parens(0):
            params = self.params()
            self.eat("punct", "=>")
            return self.arrow_tail(params, is_async)
        self.i = start
        return None

    def newline_ahead(self, off: int) -> bool:
        return self.peek(off)[2] > self.peek(off - 1)[2] if off else False

    def arrow_after_parens(self, off: int) -> bool:
        """From toks[i+off]=='(' scan to the matching ')' and check the
        next token is '=>'."""
        j = self.i + off
        depth = 0
        while j < len(self.toks):
            t = self.toks[j]
            if t[0] == "punct":
                if t[1] in ("(", "[", "{"):
                    depth += 1
                elif t[1] in (")", "]", "}"):
                    depth -= 1
                    if depth == 0:
                        k = self.toks[j + 1] if j + 1 < len(self.toks) else None
                        return bool(k and k[0] == "punct" and k[1] == "=>")
            j += 1
        return False

    def arrow_tail(self, params, is_async):
        if self.at("punct", "{"):
            body = self.block()
        else:
            body = ("return", self.assignment())
        return ("fn", None, params, body, is_async, True)

    def conditional(self):
        c = self.binary(0)
        if self.at("punct", "?"):
            self.next()
            t = self.assignment()
            self.eat("punct", ":")
            e = self.assignment()
            return ("cond", c, t, e)
        return c

    def binary(self, level: int):
        if level >= len(BIN_LEVELS):
            return self.unary()
        left = self.binary(level + 1)
        ops = BIN_LEVELS[level]
        while True:
            t = self.peek()
            tag = t[1] if t[0] == "punct" else (
                t[1] if t[0] == "name" and t[1] in ("instanceof", "in")
                else None)
            if tag not in ops:
                return left
            self.next()
            right = self.binary(level + 1)
            kind = "logic" if tag in ("&&", "||", "??") else "bin"
            left = (kind, tag, left, right)

    def unary(self):
        t = self.peek()
        if t[0] == "punct" and t[1] in ("!", "-", "+", "~"):
            self.next()
            return ("unary", t[1], self.unary())
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.next()
            return ("update", t[1], True, self.unary())
        if t[0] == "name":
            if t[1] == "typeof":
                self.next()
                return ("unary", "typeof", self.unary())
            if t[1] == "void":
                self.next()
                return ("unary", "void", self.unary())
            if t[1] == "delete":
                self.next()
                return ("unary", "delete", self.unary())
            if t[1] == "await":
                self.next()
                return ("await", self.unary())
            if t[1] == "new":
                self.next()
                callee = self.member_chain(self.primary(), no_call=True)
                args = []
                if self.at("punct", "("):
                    args = self.args()
                return self.call_chain(("new", callee, args))
        return self.postfix()

    def postfix(self):
        e = self.call_chain(self.primary())
        t = self.peek()
        if t[0] == "punct" and t[1] in ("++", "--") \
                and not self.newline_before():
            self.next()
            return ("update", t[1], False, e)
        return e

    def member_chain(self, e, no_call: bool = False):
        while True:
            if self.at("punct", "."):
                self.next()
                e = ("member", e, self.eat("name")[1])
            elif self.at("punct", "["):
                self.next()
                idx = self.expression()
                self.eat("punct", "]")
                e = ("index", e, idx)
            elif not no_call and self.at("punct", "("):
                e = ("call", e, self.args())
            else:
                return e

    def call_chain(self, e):
        return self.member_chain(e, no_call=False)

    def args(self) -> list:
        self.eat("punct", "(")
        out = []
        while not self.at("punct", ")"):
            if self.at("punct", "..."):
                self.next()
                out.append(("spread", self.assignment()))
            else:
                out.append(self.assignment())
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        return out

    def primary(self):
        t = self.next()
        kind, val = t[0], t[1]
        if kind == "num":
            return ("num", val)
        if kind == "bigint":
            return ("bigint", val)
        if kind == "str":
            return ("str", val)
        if kind == "regex":
            return ("regex", val[0], val[1])
        if kind == "tmpl":
            parts = []
            for pk, pv in val:
                if pk == "str":
                    parts.append(("str", pv))
                else:
                    parts.append(("expr", Parser(pv).parse_expr_entry()))
            return ("tmpl", parts)
        if kind == "name":
            if val == "true":
                return ("bool", True)
            if val == "false":
                return ("bool", False)
            if val == "null":
                return ("null",)
            if val == "undefined":
                return ("undef",)
            if val == "this":
                return ("this",)
            if val == "function":
                name = None
                if self.at("name"):
                    name = self.next()[1]
                params = self.params()
                body = self.block()
                return ("fn", name, params, body, False, False)
            if val == "async" and self.at_name("function"):
                self.next()
                name = None
                if self.at("name"):
                    name = self.next()[1]
                params = self.params()
                body = self.block()
                return ("fn", name, params, body, True, False)
            return ("name", val)
        if kind == "punct" and val == "(":
            e = self.expression()
            self.eat("punct", ")")
            return e
        if kind == "punct" and val == "[":
            elems = []
            while not self.at("punct", "]"):
                if self.at("punct", "..."):
                    self.next()
                    elems.append(("spread", self.assignment()))
                else:
                    elems.append(self.assignment())
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "]")
            return ("arr", elems)
        if kind == "punct" and val == "{":
            props = []
            while not self.at("punct", "}"):
                kt = self.next()
                if kt[0] == "name":
                    key = kt[1]
                elif kt[0] == "str":
                    key = kt[1]
                elif kt[0] == "num":
                    key = _num_key(kt[1])
                elif kt[0] == "punct" and kt[1] == "[":
                    key = ("computed", self.expression())
                    self.eat("punct", "]")
                else:
                    raise ParseError(
                        f"line {kt[2]}: bad object key {kt[1]!r}")
                if self.at("punct", ":"):
                    self.next()
                    props.append((key, self.assignment()))
                else:  # shorthand {a, b}
                    props.append((key, ("name", key)))
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "}")
            return ("obj", props)
        raise ParseError(f"line {t[2]}: unexpected {kind} {val!r}")

    def parse_expr_entry(self):
        e = self.expression()
        if not self.at("eof"):
            t = self.peek()
            raise ParseError(
                f"line {t[2]}: trailing tokens in template expr: {t[1]!r}")
        return e


def _num_key(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else str(v)
