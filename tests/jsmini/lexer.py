"""Tokenizer for the jsmini ES-subset.

Tokens are (kind, value, line) tuples. Kinds:
  num str tmpl regex bigint name punct eof
Template literals tokenize as ('tmpl', [parts...]) where parts alternate
('str', text) and ('expr', [tokens...]) — the parser re-parses the
embedded token lists, which keeps nesting (templates inside ${} of other
templates) free.
"""

from __future__ import annotations

KEYWORDS = {
    "const", "let", "var", "function", "return", "if", "else", "for",
    "of", "in", "while", "do", "break", "continue", "try", "catch",
    "finally", "throw", "new", "typeof", "instanceof", "delete", "void",
    "null", "true", "false", "undefined", "async", "await", "this",
    "switch", "case", "default",
}

# multi-char punctuators, longest first
PUNCTS = [
    "...", "===", "!==", "**=", "<<=", ">>=", ">>>",
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.",
    "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
    "<<", ">>", "**",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*",
    "/", "%", "&", "|", "^", "!", "~", "?", ":", "=", ".",
]


class LexError(SyntaxError):
    pass


def _is_name_start(c: str) -> bool:
    return c.isalpha() or c in "_$"


def _is_name(c: str) -> bool:
    return c.isalnum() or c in "_$"


def tokenize(src: str) -> list[tuple]:
    toks: list[tuple] = []
    i, n, line = 0, len(src), 1

    def prev_significant():
        return toks[-1] if toks else None

    def regex_allowed() -> bool:
        """Heuristic: a '/' starts a regex literal unless the previous
        token can end an expression (name that isn't a keyword, number,
        string, regex, ')', ']', '}')."""
        p = prev_significant()
        if p is None:
            return True
        kind, val = p[0], p[1]
        if kind in ("num", "str", "tmpl", "regex", "bigint"):
            return False
        if kind == "name":
            # `return /re/` and `typeof /re/` etc: keyword -> regex ok
            return val in KEYWORDS and val not in (
                "this", "null", "true", "false", "undefined")
        if kind == "punct":
            return val not in (")", "]", "}")
        return True

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise LexError(f"unterminated block comment at line {line}")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            isfloat = False
            if src.startswith("0x", i) or src.startswith("0X", i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                toks.append(("num", float(int(src[i:j], 16)), line))
                i = j
                continue
            while j < n and src[j].isdigit():
                j += 1
            if j < n and src[j] == ".":
                isfloat = True
                j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] in "eE":
                isfloat = True
                j += 1
                if j < n and src[j] in "+-":
                    j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] == "n" and not isfloat:
                toks.append(("bigint", int(src[i:j]), line))
                i = j + 1
                continue
            toks.append(("num", float(src[i:j]), line))
            i = j
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    buf.append(_escape(src[j + 1]))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise LexError(f"unterminated string at line {line}")
            toks.append(("str", "".join(buf), line))
            line += src.count("\n", i, j)
            i = j + 1
            continue
        if c == "`":
            parts, i2, line = _template(src, i + 1, line)
            toks.append(("tmpl", parts, line))
            i = i2
            continue
        if c == "/" and regex_allowed():
            j = i + 1
            in_class = False
            while j < n:
                d = src[j]
                if d == "\\":
                    j += 2
                    continue
                if d == "[":
                    in_class = True
                elif d == "]":
                    in_class = False
                elif d == "/" and not in_class:
                    break
                elif d == "\n":
                    raise LexError(f"unterminated regex at line {line}")
                j += 1
            if j >= n:
                raise LexError(f"unterminated regex at line {line}")
            body = src[i + 1:j]
            j += 1
            k = j
            while k < n and src[k].isalpha():
                k += 1
            toks.append(("regex", (body, src[j:k]), line))
            i = k
            continue
        if _is_name_start(c):
            j = i + 1
            while j < n and _is_name(src[j]):
                j += 1
            toks.append(("name", src[i:j], line))
            i = j
            continue
        for p in PUNCTS:
            if src.startswith(p, i):
                toks.append(("punct", p, line))
                i += len(p)
                break
        else:
            raise LexError(f"unexpected character {c!r} at line {line}")
    toks.append(("eof", None, line))
    return toks


def _escape(c: str) -> str:
    return {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0"}.get(c, c)


def _template(src: str, i: int, line: int) -> tuple[list, int, int]:
    """Lex a template literal body starting just after the backtick.
    Returns ([('str', s) | ('expr', tokens)], index-after-close, line)."""
    n = len(src)
    parts: list = []
    buf: list[str] = []
    while i < n:
        c = src[i]
        if c == "\\":
            buf.append(_escape(src[i + 1]))
            i += 2
            continue
        if c == "`":
            if buf:
                parts.append(("str", "".join(buf)))
            return parts, i + 1, line
        if src.startswith("${", i):
            if buf:
                parts.append(("str", "".join(buf)))
                buf = []
            # find the matching close brace, respecting nested strings,
            # templates, and braces
            depth = 1
            j = i + 2
            start = j
            while j < n and depth:
                d = src[j]
                if d in "'\"":
                    q = d
                    j += 1
                    while j < n and src[j] != q:
                        j += 2 if src[j] == "\\" else 1
                    j += 1
                    continue
                if d == "`":
                    _, j, line = _template(src, j + 1, line)
                    continue
                if d == "{":
                    depth += 1
                elif d == "}":
                    depth -= 1
                    if not depth:
                        break
                elif d == "\n":
                    line += 1
                j += 1
            if depth:
                raise LexError(f"unterminated ${{}} at line {line}")
            parts.append(("expr", tokenize(src[start:j])))
            i = j + 1
            continue
        if c == "\n":
            line += 1
        buf.append(c)
        i += 1
    raise LexError(f"unterminated template literal at line {line}")
