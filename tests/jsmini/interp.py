"""Tree-walking evaluator for the jsmini ES-subset.

Value mapping (JS -> Python):
  number -> float        string -> str        boolean -> bool
  null -> None           undefined -> UNDEF (sentinel)
  object -> dict         array -> list        bigint -> JSBigInt
  function -> JSFunction / NativeFunction
  promise -> JSPromise (synchronous resolution + microtask queue)
Host objects (DOM, canvas, fetch responses) implement js_get/js_set.

Semantics notes:
  * async functions run synchronously; `await` unwraps an
    already-settled JSPromise (re-raising rejections). then/catch
    callbacks queue as microtasks drained after the top-level script
    and after every dispatched event — enough to reproduce browser
    ordering for this page.
  * rejected promises that nobody handled are collected in
    Interpreter.unhandled — the test asserts the list is empty.
"""

from __future__ import annotations

import json as _json
import math
import re as _re
import struct
import time
import urllib.parse


class Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = Undefined()


class JSBigInt:
    __slots__ = ("v",)

    def __init__(self, v: int):
        self.v = int(v)

    def __repr__(self):
        return f"{self.v}n"


class JSThrow(Exception):
    """A JS `throw` in flight; .value is the thrown JS value."""

    def __init__(self, value):
        super().__init__(to_js_string(
            value.get("message", value) if isinstance(value, dict) else value))
        self.value = value


class JSError(Exception):
    """Interpreter-level failure (bad AST, unsupported feature)."""


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


def js_error(name: str, message: str) -> JSThrow:
    return JSThrow({"name": name, "message": message})


def is_callable(v) -> bool:
    """JS-callable: interpreted or native function (JSFunction is not
    Python-callable, so plain callable() is wrong here)."""
    return isinstance(v, (JSFunction, NativeFunction)) or callable(v)


# --------------------------------------------------------------------------
# conversions

def to_bool(v) -> bool:
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, float):
        return v != 0.0 and not math.isnan(v)
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, JSBigInt):
        return v.v != 0
    return True


def to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if v is None:
        return 0.0
    if v is UNDEF:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(int(s, 16)) if s[:2].lower() == "0x" else float(s)
        except ValueError:
            return math.nan
    if isinstance(v, list):
        if not v:
            return 0.0
        if len(v) == 1:
            return to_number(v[0])
        return math.nan
    if isinstance(v, JSBigInt):
        raise js_error("TypeError", "cannot convert a BigInt to a number")
    return math.nan


def to_int32(v) -> int:
    f = to_number(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    i = int(f) & 0xFFFFFFFF
    return i - 0x100000000 if i >= 0x80000000 else i


def to_uint32(v) -> int:
    f = to_number(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    return int(f) & 0xFFFFFFFF


def num_to_string(f: float) -> str:
    if math.isnan(f):
        return "NaN"
    if f == math.inf:
        return "Infinity"
    if f == -math.inf:
        return "-Infinity"
    if f == 0:
        return "0"
    if float(f).is_integer() and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


def to_js_string(v) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return num_to_string(v)
    if isinstance(v, JSBigInt):
        return str(v.v)
    if isinstance(v, list):
        return ",".join(
            "" if x is UNDEF or x is None else to_js_string(x) for x in v)
    if isinstance(v, dict):
        if "message" in v and v.get("name"):
            return f"{v['name']}: {to_js_string(v['message'])}"
        return "[object Object]"
    if callable(v):
        return "function"
    g = getattr(v, "js_to_string", None)
    if g:
        return g()
    return str(v)


def to_property_key(v) -> str:
    if isinstance(v, float):
        return num_to_string(v)
    return to_js_string(v)


# --------------------------------------------------------------------------
# promises

class JSPromise:
    __slots__ = ("state", "value", "handled", "interp")

    def __init__(self, interp, state: str, value):
        self.interp = interp
        self.state = state  # 'fulfilled' | 'rejected'
        self.value = value
        self.handled = False
        interp.promises.append(self)

    def js_get(self, name):
        if name == "then":
            return NativeFunction("then", self._then)
        if name == "catch":
            return NativeFunction(
                "catch", lambda on_r=UNDEF: self._then(UNDEF, on_r))
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", f"cannot set {name} on a Promise")

    def _then(self, on_f=UNDEF, on_r=UNDEF):
        self.handled = True
        interp = self.interp
        out = JSPromise(interp, "pending", UNDEF)

        def run():
            cb = on_f if self.state == "fulfilled" else on_r
            if not is_callable(cb):
                out.state = self.state
                out.value = self.value
                return
            try:
                r = interp.call(cb, [self.value])
                if isinstance(r, JSPromise):
                    r.handled = True
                    out.state, out.value = r.state, r.value
                else:
                    out.state, out.value = "fulfilled", r
            except JSThrow as t:
                out.state, out.value = "rejected", t.value

        interp.microtasks.append(run)
        return out


# --------------------------------------------------------------------------
# functions

class NativeFunction:
    __slots__ = ("name", "fn")

    def __init__(self, name: str, fn):
        self.name = name
        self.fn = fn

    def __call__(self, *args):
        return self.fn(*args)

    def __repr__(self):
        return f"<native {self.name}>"


class JSFunction:
    __slots__ = ("node", "env", "interp", "name")

    def __init__(self, node, env, interp):
        self.node = node  # ('fn', name, params, body, is_async, is_arrow)
        self.env = env
        self.interp = interp
        self.name = node[1] or "<anonymous>"

    def __repr__(self):
        return f"<js function {self.name}>"


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent

    def lookup(self, name: str):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise js_error("ReferenceError", f"{name} is not defined")

    def assign(self, name: str, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        raise js_error("ReferenceError", f"{name} is not defined")

    def declare(self, name: str, value):
        self.vars[name] = value


# --------------------------------------------------------------------------
# regex

class JSRegExp:
    __slots__ = ("source", "flags", "rx", "global_")

    def __init__(self, source: str, flags: str):
        self.source = source
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= _re.IGNORECASE
        if "s" in flags:
            py_flags |= _re.DOTALL
        if "m" in flags:
            py_flags |= _re.MULTILINE
        self.rx = _re.compile(source, py_flags)
        self.global_ = "g" in flags

    def js_get(self, name):
        if name == "source":
            return self.source
        if name == "flags":
            return self.flags
        if name == "test":
            return NativeFunction(
                "test", lambda s: self.rx.search(to_js_string(s)) is not None)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "regexps are read-only here")


# --------------------------------------------------------------------------
# typed arrays (the small slice the dashboard uses)

class JSArrayBuffer:
    __slots__ = ("data",)

    def __init__(self, data: bytes):
        self.data = bytes(data)

    def js_get(self, name):
        if name == "byteLength":
            return float(len(self.data))
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "ArrayBuffer is read-only")


class JSTypedArray:
    """Uint8Array / Float32Array — enough for the dashboard."""

    __slots__ = ("kind", "data")

    def __init__(self, kind: str, data: bytes):
        self.kind = kind  # 'u8' | 'f32'
        self.data = bytes(data)

    @property
    def itemsize(self):
        return 1 if self.kind == "u8" else 4

    def values(self):
        fmt = "B" if self.kind == "u8" else "<f"
        sz = self.itemsize
        return [float(struct.unpack_from(fmt, self.data, i * sz)[0])
                for i in range(len(self.data) // sz)]

    def js_get(self, name):
        if name == "buffer":
            return JSArrayBuffer(self.data)
        if name == "length":
            return float(len(self.data) // self.itemsize)
        if name.isdigit():
            vals = self.values()
            i = int(name)
            return vals[i] if i < len(vals) else UNDEF
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "typed arrays are read-only here")

    def js_index(self, i: int):
        vals = self.values()
        return vals[i] if 0 <= i < len(vals) else UNDEF


class JSDataView:
    __slots__ = ("buf",)

    def __init__(self, buf: JSArrayBuffer):
        self.buf = buf

    def js_get(self, name):
        if name == "getFloat32":
            def get(off, little=False):
                fmt = "<f" if to_bool(little) else ">f"
                return float(struct.unpack_from(
                    fmt, self.buf.data, int(to_number(off)))[0])
            return NativeFunction("getFloat32", get)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "DataView is read-only")


class JSDate:
    __slots__ = ("ms",)

    def __init__(self, ms: float):
        self.ms = float(ms)

    def js_get(self, name):
        if name == "toISOString":
            def iso():
                t = time.gmtime(self.ms / 1000.0)
                frac = int(self.ms % 1000)
                return (time.strftime("%Y-%m-%dT%H:%M:%S", t)
                        + f".{frac:03d}Z")
            return NativeFunction("toISOString", iso)
        if name == "getTime":
            return NativeFunction("getTime", lambda: self.ms)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Date is read-only here")


# --------------------------------------------------------------------------
# the interpreter

class Interpreter:
    def __init__(self):
        self.global_env = Env()
        self.microtasks: list = []
        self.promises: list[JSPromise] = []
        self._install_globals()

    # -- public API -------------------------------------------------------
    def run(self, ast):
        self.exec_block(ast, self.global_env)
        self.drain()

    def drain(self):
        while self.microtasks:
            task = self.microtasks.pop(0)
            task()

    @property
    def unhandled(self) -> list:
        return [p.value for p in self.promises
                if p.state == "rejected" and not p.handled]

    def resolved(self, value) -> JSPromise:
        return JSPromise(self, "fulfilled", value)

    def rejected(self, value) -> JSPromise:
        return JSPromise(self, "rejected", value)

    # -- globals ----------------------------------------------------------
    def _install_globals(self):
        g = self.global_env
        nf = NativeFunction

        def _parse_int(s=UNDEF, radix=UNDEF):
            txt = to_js_string(s).strip()
            base = int(to_number(radix)) if radix is not UNDEF else 10
            if base == 0:
                base = 10
            m = _re.match(r"[+-]?[0-9a-zA-Z]+", txt)
            if not m:
                return math.nan
            txt = m.group(0)
            sign = 1
            if txt[0] in "+-":
                sign = -1 if txt[0] == "-" else 1
                txt = txt[1:]
            digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
            acc = ""
            for c in txt.lower():
                if c not in digits:
                    break
                acc += c
            if not acc:
                return math.nan
            return float(sign * int(acc, base))

        def _parse_float(s=UNDEF):
            m = _re.match(r"\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?",
                          to_js_string(s))
            return float(m.group(0)) if m else math.nan

        g.declare("parseInt", nf("parseInt", _parse_int))
        g.declare("parseFloat", nf("parseFloat", _parse_float))
        g.declare("isNaN", nf("isNaN",
                              lambda *a: math.isnan(to_number(_a0(a)))))
        g.declare("String", nf("String", lambda *a: (
            "" if not a or a[0] is UNDEF else to_js_string(a[0]))))
        g.declare("Number", _NumberCtor())
        g.declare("Boolean", nf("Boolean", lambda *a: to_bool(_a0(a))))
        g.declare("BigInt", nf("BigInt", _bigint_ctor))
        g.declare("NaN", math.nan)
        g.declare("Infinity", math.inf)
        g.declare("encodeURIComponent", nf(
            "encodeURIComponent",
            lambda v=UNDEF: urllib.parse.quote(
                to_js_string(v), safe="!'()*-._~")))
        g.declare("decodeURIComponent", nf(
            "decodeURIComponent",
            lambda v=UNDEF: urllib.parse.unquote(to_js_string(v))))
        g.declare("Math", _MathObj())
        g.declare("JSON", _JsonObj(self))
        g.declare("Object", _ObjectObj(self))
        g.declare("Array", _ArrayCtor())
        g.declare("Error", _ErrorCtor("Error"))
        g.declare("TypeError", _ErrorCtor("TypeError"))
        g.declare("Date", _DateCtor())
        g.declare("Uint8Array", _TypedCtor("u8"))
        g.declare("Float32Array", _TypedCtor("f32"))
        g.declare("DataView", nf("DataView", lambda b: JSDataView(b)))
        g.declare("Promise", _PromiseCtor(self))
        g.declare("RegExp", nf("RegExp", lambda s, f=UNDEF: JSRegExp(
            to_js_string(s), "" if f is UNDEF else to_js_string(f))))
        g.declare("console", _ConsoleObj())
        g.declare("performance", _PerfObj())
        g.declare("globalThis", UNDEF)

    # -- statements -------------------------------------------------------
    def exec_block(self, node, env: Env):
        assert node[0] == "block"
        # hoist function declarations so earlier statements (and
        # synchronously-resolved promise callbacks) can call later fns
        for st in node[1]:
            if st[0] == "funcdecl":
                env.declare(st[1], JSFunction(st[2], env, self))
        for st in node[1]:
            self.exec_stmt(st, env)

    def exec_stmt(self, node, env: Env):
        kind = node[0]
        if kind == "expr":
            self.eval(node[1], env)
        elif kind == "decl":
            for pat, init in node[2]:
                val = UNDEF if init is None else self.eval(init, env)
                self.bind_pattern(pat, val, env, declare=True)
        elif kind == "funcdecl":
            env.declare(node[1], JSFunction(node[2], env, self))
        elif kind == "block":
            self.exec_block(node, Env(env))
        elif kind == "if":
            if to_bool(self.eval(node[1], env)):
                self.exec_stmt(node[2], env)
            elif node[3] is not None:
                self.exec_stmt(node[3], env)
        elif kind == "while":
            while to_bool(self.eval(node[1], env)):
                try:
                    self.exec_stmt(node[2], Env(env))
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "for":
            e2 = Env(env)
            if node[1] is not None:
                self.exec_stmt(node[1], e2)
            while node[2] is None or to_bool(self.eval(node[2], e2)):
                try:
                    self.exec_stmt(node[4], Env(e2))
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    self.eval(node[3], e2)
        elif kind == "forof":
            it = self.eval(node[3], env)
            for item in self._iterate(it):
                e2 = Env(env)
                self.bind_pattern(node[2], item, e2, declare=True)
                try:
                    self.exec_stmt(node[4], e2)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "forin":
            obj = self.eval(node[3], env)
            keys = (list(obj.keys()) if isinstance(obj, dict)
                    else [num_to_string(float(i))
                          for i in range(len(obj))] if isinstance(obj, list)
                    else [])
            for k in keys:
                e2 = Env(env)
                self.bind_pattern(node[2], k, e2, declare=True)
                try:
                    self.exec_stmt(node[4], e2)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "return":
            raise _Return(UNDEF if node[1] is None
                          else self.eval(node[1], env))
        elif kind == "throw":
            raise JSThrow(self.eval(node[1], env))
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "try":
            try:
                self.exec_block(node[1], Env(env))
            except JSThrow as t:
                if node[3] is not None:
                    e2 = Env(env)
                    if node[2] is not None:
                        self.bind_pattern(node[2], t.value, e2, declare=True)
                    self.exec_block(node[3], e2)
                elif node[4] is None:
                    raise
            finally:
                if node[4] is not None:
                    self.exec_block(node[4], Env(env))
        elif kind == "empty":
            pass
        else:
            raise JSError(f"unknown statement {kind}")

    def _iterate(self, v):
        if isinstance(v, list):
            return list(v)
        if isinstance(v, str):
            return list(v)
        if isinstance(v, JSTypedArray):
            return v.values()
        raise js_error("TypeError", f"{to_js_string(v)} is not iterable")

    # -- patterns ---------------------------------------------------------
    def bind_pattern(self, pat, value, env: Env, declare: bool):
        kind = pat[0]
        if kind == "name":
            if declare:
                env.declare(pat[1], value)
            else:
                env.assign(pat[1], value)
        elif kind == "arrpat":
            items = self._iterate(value) if value not in (None, UNDEF) else []
            for i, sub in enumerate(pat[1]):
                if sub is None:
                    continue
                self.bind_pattern(
                    sub, items[i] if i < len(items) else UNDEF, env, declare)
        elif kind == "objpat":
            for key, sub, default in pat[1]:
                v = self.get_member(value, key)
                if v is UNDEF and default is not None:
                    v = self.eval(default, env)
                self.bind_pattern(sub, v, env, declare)
        else:
            raise JSError(f"unknown pattern {kind}")

    # -- function calls ---------------------------------------------------
    def call(self, fn, args: list, this=UNDEF):
        if isinstance(fn, NativeFunction):
            return fn.fn(*args)
        if isinstance(fn, JSFunction):
            _, name, params, body, is_async, is_arrow = fn.node
            env = Env(fn.env)
            if name:
                env.declare(name, fn)
            for i, (pat, default) in enumerate(params):
                v = args[i] if i < len(args) else UNDEF
                if v is UNDEF and default is not None:
                    v = self.eval(default, env)
                self.bind_pattern(pat, v, env, declare=True)
            if not is_arrow:
                env.declare("this", this)
            try:
                if body[0] == "block":
                    self.exec_block(body, env)
                    ret = UNDEF
                else:  # expression-bodied arrow: ('return', expr)
                    ret = self.eval(body[1], env)
                    return self.resolved(ret) if is_async else ret
            except _Return as r:
                ret = r.value
            except JSThrow as t:
                if is_async:
                    return self.rejected(t.value)
                raise
            return self.resolved(ret) if is_async else ret
        if callable(fn):
            return fn(*args)
        raise js_error("TypeError", f"{to_js_string(fn)} is not a function")

    # -- member access ----------------------------------------------------
    def get_member(self, obj, name: str):
        if obj is UNDEF or obj is None:
            raise js_error(
                "TypeError",
                f"Cannot read properties of {to_js_string(obj)} "
                f"(reading '{name}')")
        if isinstance(obj, dict):
            if name in obj:
                return obj[name]
            if name == "hasOwnProperty":
                return NativeFunction(
                    "hasOwnProperty",
                    lambda k=UNDEF: to_property_key(k) in obj)
            return UNDEF
        if isinstance(obj, list):
            return self._array_member(obj, name)
        if isinstance(obj, str):
            return self._string_member(obj, name)
        if isinstance(obj, float):
            return self._number_member(obj, name)
        if isinstance(obj, bool):
            return UNDEF
        g = getattr(obj, "js_get", None)
        if g is not None:
            return g(name)
        raise js_error("TypeError",
                       f"cannot read {name} of {type(obj).__name__}")

    def set_member(self, obj, name: str, value):
        if isinstance(obj, dict):
            obj[name] = value
            return
        if isinstance(obj, list):
            if name == "length":
                n = int(to_number(value))
                del obj[n:]
                return
            if name.lstrip("-").isdigit():
                i = int(name)
                while len(obj) <= i:
                    obj.append(UNDEF)
                obj[i] = value
                return
            raise js_error("TypeError", f"cannot set {name} on an array")
        s = getattr(obj, "js_set", None)
        if s is not None:
            s(name, value)
            return
        raise js_error("TypeError",
                       f"cannot set {name} on {type(obj).__name__}")

    # array / string / number methods ------------------------------------
    def _array_member(self, arr: list, name: str):
        interp = self
        nf = NativeFunction
        if name == "length":
            return float(len(arr))
        if name.isdigit():
            i = int(name)
            return arr[i] if i < len(arr) else UNDEF

        def norm_slice(a, b):
            n = len(arr)
            start = 0 if a is UNDEF else int(to_number(a))
            end = n if b is UNDEF else int(to_number(b))
            if start < 0:
                start += n
            if end < 0:
                end += n
            return max(0, min(start, n)), max(0, min(end, n))

        if name == "forEach":
            def fe(cb):
                for i, v in enumerate(list(arr)):
                    interp.call(cb, [v, float(i), arr])
                return UNDEF
            return nf("forEach", fe)
        if name == "map":
            return nf("map", lambda cb: [
                interp.call(cb, [v, float(i), arr])
                for i, v in enumerate(list(arr))])
        if name == "filter":
            return nf("filter", lambda cb: [
                v for i, v in enumerate(list(arr))
                if to_bool(interp.call(cb, [v, float(i), arr]))])
        if name == "find":
            def find(cb):
                for i, v in enumerate(list(arr)):
                    if to_bool(interp.call(cb, [v, float(i), arr])):
                        return v
                return UNDEF
            return nf("find", find)
        if name == "findIndex":
            def findi(cb):
                for i, v in enumerate(list(arr)):
                    if to_bool(interp.call(cb, [v, float(i), arr])):
                        return float(i)
                return -1.0
            return nf("findIndex", findi)
        if name == "some":
            return nf("some", lambda cb: any(
                to_bool(interp.call(cb, [v, float(i), arr]))
                for i, v in enumerate(list(arr))))
        if name == "every":
            return nf("every", lambda cb: all(
                to_bool(interp.call(cb, [v, float(i), arr]))
                for i, v in enumerate(list(arr))))
        if name == "join":
            return nf("join", lambda sep=UNDEF: (
                "," if sep is UNDEF else to_js_string(sep)).join(
                "" if v is UNDEF or v is None else to_js_string(v)
                for v in arr))
        if name == "slice":
            def sl(a=UNDEF, b=UNDEF):
                s, e = norm_slice(a, b)
                return arr[s:e]
            return nf("slice", sl)
        if name == "push":
            def push(*vals):
                arr.extend(vals)
                return float(len(arr))
            return nf("push", push)
        if name == "pop":
            return nf("pop", lambda: arr.pop() if arr else UNDEF)
        if name == "shift":
            return nf("shift", lambda: arr.pop(0) if arr else UNDEF)
        if name == "unshift":
            def unshift(*vals):
                arr[:0] = vals
                return float(len(arr))
            return nf("unshift", unshift)
        if name == "concat":
            def concat(*vals):
                out = list(arr)
                for v in vals:
                    out.extend(v) if isinstance(v, list) else out.append(v)
                return out
            return nf("concat", concat)
        if name == "indexOf":
            def idx(v=UNDEF):
                for i, x in enumerate(arr):
                    if js_strict_eq(x, v):
                        return float(i)
                return -1.0
            return nf("indexOf", idx)
        if name == "includes":
            return nf("includes", lambda v=UNDEF: any(
                js_strict_eq(x, v) for x in arr))
        if name == "reduce":
            def reduce(cb, init=UNDEF):
                items = list(arr)
                if init is UNDEF:
                    if not items:
                        raise js_error("TypeError",
                                       "reduce of empty array")
                    acc, start = items[0], 1
                else:
                    acc, start = init, 0
                for i in range(start, len(items)):
                    acc = interp.call(cb, [acc, items[i], float(i), arr])
                return acc
            return nf("reduce", reduce)
        if name == "sort":
            def sort(cmp=UNDEF):
                import functools
                if cmp is UNDEF:
                    arr.sort(key=to_js_string)
                else:
                    arr.sort(key=functools.cmp_to_key(
                        lambda a, b: (0 if (c := to_number(
                            interp.call(cmp, [a, b]))) == 0
                            else (-1 if c < 0 else 1))))
                return arr
            return nf("sort", sort)
        if name == "fill":
            def fill(v=UNDEF):
                for i in range(len(arr)):
                    arr[i] = v
                return arr
            return nf("fill", fill)
        if name == "reverse":
            def rev():
                arr.reverse()
                return arr
            return nf("reverse", rev)
        if name == "flat":
            def flat(depth=UNDEF):
                out = []
                for v in arr:
                    out.extend(v) if isinstance(v, list) else out.append(v)
                return out
            return nf("flat", flat)
        if name == "flatMap":
            def flatmap(cb):
                out = []
                for i, v in enumerate(list(arr)):
                    r = interp.call(cb, [v, float(i), arr])
                    out.extend(r) if isinstance(r, list) else out.append(r)
                return out
            return nf("flatMap", flatmap)
        return UNDEF

    def _string_member(self, s: str, name: str):
        nf = NativeFunction
        interp = self
        if name == "length":
            return float(len(s))
        if name.isdigit():
            i = int(name)
            return s[i] if i < len(s) else UNDEF

        def norm(a, b):
            n = len(s)
            start = 0 if a is UNDEF else int(to_number(a))
            end = n if b is UNDEF else int(to_number(b))
            if start < 0:
                start += n
            if end < 0:
                end += n
            return max(0, min(start, n)), max(0, min(end, n))

        if name == "slice":
            def sl(a=UNDEF, b=UNDEF):
                x, y = norm(a, b)
                return s[x:y]
            return nf("slice", sl)
        if name == "substring":
            def sub(a=UNDEF, b=UNDEF):
                x, y = norm(a, b)
                return s[min(x, y):max(x, y)]
            return nf("substring", sub)
        if name == "trim":
            return nf("trim", lambda: s.strip())
        if name == "split":
            def split(sep=UNDEF, limit=UNDEF):
                if sep is UNDEF:
                    return [s]
                if isinstance(sep, JSRegExp):
                    parts = sep.rx.split(s)
                elif sep == "":
                    parts = list(s)
                else:
                    parts = s.split(to_js_string(sep))
                if limit is not UNDEF:
                    parts = parts[:int(to_number(limit))]
                return parts
            return nf("split", split)
        if name == "startsWith":
            return nf("startsWith",
                      lambda p=UNDEF: s.startswith(to_js_string(p)))
        if name == "endsWith":
            return nf("endsWith",
                      lambda p=UNDEF: s.endswith(to_js_string(p)))
        if name == "includes":
            return nf("includes", lambda p=UNDEF: to_js_string(p) in s)
        if name == "indexOf":
            return nf("indexOf",
                      lambda p=UNDEF: float(s.find(to_js_string(p))))
        if name == "match":
            def match(re_):
                if not isinstance(re_, JSRegExp):
                    re_ = JSRegExp(to_js_string(re_), "")
                if re_.global_:
                    out = re_.rx.findall(s)
                    # findall returns tuples when groups exist
                    out = [m if isinstance(m, str) else m[0] for m in out]
                    return out if out else None
                m = re_.rx.search(s)
                if not m:
                    return None
                return [m.group(0)] + [
                    g if g is not None else UNDEF for g in m.groups()]
            return nf("match", match)
        if name == "replace":
            def replace(re_, rep):
                def apply_rep(m):
                    if callable(rep) or isinstance(
                            rep, (JSFunction, NativeFunction)):
                        return to_js_string(interp.call(
                            rep, [m.group(0)] + [
                                g if g is not None else UNDEF
                                for g in m.groups()]))
                    return to_js_string(rep)
                if isinstance(re_, JSRegExp):
                    return re_.rx.sub(
                        apply_rep, s, count=0 if re_.global_ else 1)
                pat = to_js_string(re_)
                if callable(rep) or isinstance(
                        rep, (JSFunction, NativeFunction)):
                    i = s.find(pat)
                    if i < 0:
                        return s
                    return (s[:i]
                            + to_js_string(interp.call(rep, [pat]))
                            + s[i + len(pat):])
                return s.replace(pat, to_js_string(rep), 1)
            return nf("replace", replace)
        if name == "replaceAll":
            return nf("replaceAll", lambda p, r: s.replace(
                to_js_string(p), to_js_string(r)))
        if name == "toLowerCase":
            return nf("toLowerCase", lambda: s.lower())
        if name == "toUpperCase":
            return nf("toUpperCase", lambda: s.upper())
        if name == "charCodeAt":
            return nf("charCodeAt", lambda i=UNDEF: float(
                ord(s[int(to_number(i)) if i is not UNDEF else 0])))
        if name == "charAt":
            def chat(i=UNDEF):
                j = int(to_number(i)) if i is not UNDEF else 0
                return s[j] if 0 <= j < len(s) else ""
            return nf("charAt", chat)
        if name == "padStart":
            return nf("padStart", lambda n, p=" ": s.rjust(
                int(to_number(n)), to_js_string(p)[:1] or " "))
        if name == "repeat":
            return nf("repeat", lambda n: s * int(to_number(n)))
        if name == "concat":
            return nf("concat", lambda *vs: s + "".join(
                to_js_string(v) for v in vs))
        return UNDEF

    def _number_member(self, f: float, name: str):
        nf = NativeFunction
        if name == "toFixed":
            def tofixed(d=UNDEF):
                nd = int(to_number(d)) if d is not UNDEF else 0
                if math.isnan(f):
                    return "NaN"
                return f"{f:.{nd}f}"
            return nf("toFixed", tofixed)
        if name == "toString":
            def tostr(radix=UNDEF):
                if radix is UNDEF or int(to_number(radix)) == 10:
                    return num_to_string(f)
                base = int(to_number(radix))
                n = int(f)
                if n == 0:
                    return "0"
                digits = "0123456789abcdefghijklmnopqrstuvwxyz"
                sign = "-" if n < 0 else ""
                n = abs(n)
                out = ""
                while n:
                    out = digits[n % base] + out
                    n //= base
                return sign + out
            return nf("toString", tostr)
        return UNDEF

    # -- expressions ------------------------------------------------------
    def eval(self, node, env: Env):
        kind = node[0]
        if kind == "num":
            return float(node[1])
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "null":
            return None
        if kind == "undef":
            return UNDEF
        if kind == "bigint":
            return JSBigInt(node[1])
        if kind == "regex":
            return JSRegExp(node[1], node[2])
        if kind == "tmpl":
            out = []
            for pk, pv in node[1]:
                out.append(pv if pk == "str"
                           else to_js_string(self.eval(pv, env)))
            return "".join(out)
        if kind == "name":
            return env.lookup(node[1])
        if kind == "this":
            try:
                return env.lookup("this")
            except JSThrow:
                return UNDEF
        if kind == "arr":
            out = []
            for e in node[1]:
                if e[0] == "spread":
                    out.extend(self._iterate(self.eval(e[1], env)))
                else:
                    out.append(self.eval(e, env))
            return out
        if kind == "obj":
            out = {}
            for key, e in node[1]:
                if isinstance(key, tuple) and key[0] == "computed":
                    key = to_property_key(self.eval(key[1], env))
                out[key] = self.eval(e, env)
            return out
        if kind == "fn":
            return JSFunction(node, env, self)
        if kind == "assign":
            return self._assign(node, env)
        if kind == "cond":
            return (self.eval(node[2], env)
                    if to_bool(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if kind == "logic":
            left = self.eval(node[2], env)
            op = node[1]
            if op == "&&":
                return self.eval(node[3], env) if to_bool(left) else left
            if op == "||":
                return left if to_bool(left) else self.eval(node[3], env)
            if op == "??":
                return (self.eval(node[3], env)
                        if left is None or left is UNDEF else left)
        if kind == "bin":
            if node[1] == ",":
                self.eval(node[2], env)
                return self.eval(node[3], env)
            return js_binop(node[1],
                            self.eval(node[2], env),
                            self.eval(node[3], env))
        if kind == "unary":
            return self._unary(node, env)
        if kind == "update":
            return self._update(node, env)
        if kind == "await":
            v = self.eval(node[1], env)
            if isinstance(v, JSPromise):
                v.handled = True
                self.drain()  # settle chained thens before inspecting
                if v.state == "rejected":
                    raise JSThrow(v.value)
                out = v.value
                while isinstance(out, JSPromise):
                    out.handled = True
                    if out.state == "rejected":
                        raise JSThrow(out.value)
                    out = out.value
                return out
            return v
        if kind == "call":
            return self._call(node, env)
        if kind == "new":
            return self._new(node, env)
        if kind == "member":
            return self.get_member(self.eval(node[1], env), node[2])
        if kind == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            return self._index_get(obj, idx)
        if kind == "spread":
            raise JSError("spread outside call/array")
        raise JSError(f"unknown expression {kind}")

    def _index_get(self, obj, idx):
        if isinstance(obj, list) and isinstance(idx, float) \
                and idx.is_integer():
            i = int(idx)
            return obj[i] if 0 <= i < len(obj) else UNDEF
        if isinstance(obj, str) and isinstance(idx, float) \
                and idx.is_integer():
            i = int(idx)
            return obj[i] if 0 <= i < len(obj) else UNDEF
        if isinstance(obj, JSTypedArray) and isinstance(idx, float):
            return obj.js_index(int(idx))
        return self.get_member(obj, to_property_key(idx))

    def _assign(self, node, env: Env):
        _, op, target, rhs = node
        value = self.eval(rhs, env)
        if op != "=":
            cur = self.eval(target, env)
            value = js_binop(op[:-1], cur, value)
        self._store(target, value, env)
        return value

    def _store(self, target, value, env: Env):
        kind = target[0]
        if kind == "name":
            env.assign(target[1], value)
        elif kind == "member":
            self.set_member(self.eval(target[1], env), target[2], value)
        elif kind == "index":
            obj = self.eval(target[1], env)
            idx = self.eval(target[2], env)
            if isinstance(obj, list) and isinstance(idx, float) \
                    and idx.is_integer() and idx >= 0:
                i = int(idx)
                while len(obj) <= i:
                    obj.append(UNDEF)
                obj[i] = value
            else:
                self.set_member(obj, to_property_key(idx), value)
        elif kind == "arr":
            # destructuring assignment [a, b] = expr (rare)
            items = self._iterate(value)
            for i, sub in enumerate(target[1]):
                self._store(sub, items[i] if i < len(items) else UNDEF, env)
        else:
            raise JSError(f"bad assignment target {kind}")

    def _unary(self, node, env: Env):
        op = node[1]
        if op == "typeof":
            try:
                v = self.eval(node[2], env)
            except JSThrow:
                return "undefined"
            return js_typeof(v)
        if op == "delete":
            t = node[2]
            if t[0] == "member":
                obj = self.eval(t[1], env)
                if isinstance(obj, dict):
                    obj.pop(t[2], None)
                return True
            if t[0] == "index":
                obj = self.eval(t[1], env)
                key = to_property_key(self.eval(t[2], env))
                if isinstance(obj, dict):
                    obj.pop(key, None)
                return True
            return True
        v = self.eval(node[2], env)
        if op == "!":
            return not to_bool(v)
        if op == "-":
            if isinstance(v, JSBigInt):
                return JSBigInt(-v.v)
            return -to_number(v)
        if op == "+":
            return to_number(v)
        if op == "~":
            return float(~to_int32(v))
        if op == "void":
            return UNDEF
        raise JSError(f"unknown unary {op}")

    def _update(self, node, env: Env):
        _, op, prefix, target = node
        cur = to_number(self.eval(target, env))
        new = cur + (1.0 if op == "++" else -1.0)
        self._store(target, new, env)
        return new if prefix else cur

    def _call(self, node, env: Env):
        _, callee, args_nodes = node
        args = []
        for a in args_nodes:
            if a[0] == "spread":
                args.extend(self._iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        if callee[0] == "member":
            obj = self.eval(callee[1], env)
            fn = self.get_member(obj, callee[2])
            if fn is UNDEF:
                raise js_error(
                    "TypeError",
                    f"{to_js_string(obj)[:40]}.{callee[2]} is not a function")
            return self.call(fn, args, this=obj)
        if callee[0] == "index":
            obj = self.eval(callee[1], env)
            fn = self._index_get(obj, self.eval(callee[2], env))
            return self.call(fn, args, this=obj)
        fn = self.eval(callee, env)
        return self.call(fn, args)

    def _new(self, node, env: Env):
        _, callee, args_nodes = node
        args = []
        for a in args_nodes:
            if a[0] == "spread":
                args.extend(self._iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        ctor = self.eval(callee, env)
        construct = getattr(ctor, "js_construct", None)
        if construct is not None:
            return construct(*args)
        if isinstance(ctor, (NativeFunction, JSFunction)) or callable(ctor):
            return self.call(ctor, args)
        raise js_error("TypeError",
                       f"{to_js_string(ctor)} is not a constructor")


# --------------------------------------------------------------------------
# operators

def js_typeof(v) -> str:
    if v is UNDEF:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, JSBigInt):
        return "bigint"
    if isinstance(v, (JSFunction, NativeFunction)) or callable(v):
        return "function"
    return "object"


def js_strict_eq(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return a == b  # NaN != NaN falls out naturally
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
        return a.v == b.v
    if a is None and b is None:
        return True
    if a is UNDEF and b is UNDEF:
        return True
    return a is b


def js_loose_eq(a, b) -> bool:
    if (a is None or a is UNDEF) and (b is None or b is UNDEF):
        return True
    if a is None or a is UNDEF or b is None or b is UNDEF:
        return False
    if isinstance(a, bool):
        return js_loose_eq(to_number(a), b)
    if isinstance(b, bool):
        return js_loose_eq(a, to_number(b))
    if isinstance(a, float) and isinstance(b, str):
        return a == to_number(b)
    if isinstance(a, str) and isinstance(b, float):
        return to_number(a) == b
    return js_strict_eq(a, b)


def js_binop(op: str, a, b):
    if op == "+":
        if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
            return JSBigInt(a.v + b.v)
        if isinstance(a, str) or isinstance(b, str) \
                or isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
            return to_js_string(a) + to_js_string(b)
        return to_number(a) + to_number(b)
    if op == "-":
        if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
            return JSBigInt(a.v - b.v)
        return to_number(a) - to_number(b)
    if op == "*":
        if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
            return JSBigInt(a.v * b.v)
        return to_number(a) * to_number(b)
    if op == "/":
        x, y = to_number(a), to_number(b)
        if y == 0:
            if x == 0 or math.isnan(x):
                return math.nan
            return math.inf if (x > 0) == (not math.copysign(1, y) < 0) \
                else -math.inf
        return x / y
    if op == "%":
        if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
            # JS BigInt % truncates toward zero (sign of dividend)
            return JSBigInt(math.fmod(a.v, b.v) if b.v == 0
                            else a.v - (abs(a.v) // abs(b.v))
                            * abs(b.v) * (1 if a.v >= 0 else -1))
        x, y = to_number(a), to_number(b)
        if y == 0 or math.isnan(x) or math.isnan(y) or math.isinf(x):
            return math.nan
        return math.fmod(x, y)
    if op == "**":
        return to_number(a) ** to_number(b)
    if op == "==":
        return js_loose_eq(a, b)
    if op == "!=":
        return not js_loose_eq(a, b)
    if op == "===":
        return js_strict_eq(a, b)
    if op == "!==":
        return not js_strict_eq(a, b)
    if op in ("<", ">", "<=", ">="):
        if isinstance(a, str) and isinstance(b, str):
            x, y = a, b
        else:
            x, y = to_number(a), to_number(b)
            if isinstance(x, float) and isinstance(y, float) \
                    and (math.isnan(x) or math.isnan(y)):
                return False
        return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
    if op == "&":
        if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
            return JSBigInt(a.v & b.v)
        return float(to_int32(a) & to_int32(b))
    if op == "|":
        if isinstance(a, JSBigInt) and isinstance(b, JSBigInt):
            return JSBigInt(a.v | b.v)
        return float(to_int32(a) | to_int32(b))
    if op == "^":
        return float(to_int32(a) ^ to_int32(b))
    if op == "<<":
        return float(to_int32(to_int32(a) << (to_uint32(b) & 31)))
    if op == ">>":
        return float(to_int32(a) >> (to_uint32(b) & 31))
    if op == ">>>":
        return float(to_uint32(a) >> (to_uint32(b) & 31))
    if op == "instanceof":
        inst = getattr(b, "js_instanceof", None)
        return inst(a) if inst else False
    if op == "in":
        if isinstance(b, dict):
            return to_property_key(a) in b
        if isinstance(b, list):
            return 0 <= int(to_number(a)) < len(b)
        return False
    raise JSError(f"unknown binary op {op}")


def _a0(a):
    return a[0] if a else UNDEF


def _a1(a):
    return a[1] if len(a) > 1 else UNDEF


def _bigint_ctor(v=UNDEF):
    if isinstance(v, JSBigInt):
        return v
    if isinstance(v, bool):
        return JSBigInt(1 if v else 0)
    if isinstance(v, float):
        if not v.is_integer():
            raise js_error(
                "RangeError",
                "The number " + num_to_string(v)
                + " cannot be converted to a BigInt")
        return JSBigInt(int(v))
    if isinstance(v, str):
        return JSBigInt(int(v.strip() or "0"))
    raise js_error("TypeError", "cannot convert to BigInt")


# --------------------------------------------------------------------------
# builtin namespace objects

class _MathObj:
    # every entry takes *a and reads what it needs: JS builtins ignore
    # extra arguments (so `arr.map(Math.abs)` works — the callback gets
    # (value, index, array))
    FNS = {
        "max": lambda *a: max((to_number(x) for x in a),
                              default=-math.inf),
        "min": lambda *a: min((to_number(x) for x in a),
                              default=math.inf),
        "floor": lambda *a: float(math.floor(to_number(_a0(a)))),
        "ceil": lambda *a: float(math.ceil(to_number(_a0(a)))),
        "round": lambda *a: float(math.floor(to_number(_a0(a)) + 0.5)),
        "abs": lambda *a: abs(to_number(_a0(a))),
        "sqrt": lambda *a: math.sqrt(to_number(_a0(a))),
        "pow": lambda *a: to_number(_a0(a)) ** to_number(_a1(a)),
        "cos": lambda *a: math.cos(to_number(_a0(a))),
        "sin": lambda *a: math.sin(to_number(_a0(a))),
        "atan2": lambda *a: math.atan2(to_number(_a0(a)),
                                       to_number(_a1(a))),
        "log": lambda *a: math.log(to_number(_a0(a))),
        "log2": lambda *a: math.log2(to_number(_a0(a))),
        "hypot": lambda *a: math.hypot(*(to_number(x) for x in a)),
        "sign": lambda *a: (math.copysign(1.0, to_number(_a0(a)))
                            if to_number(_a0(a)) != 0 else 0.0),
        "trunc": lambda *a: float(math.trunc(to_number(_a0(a)))),
        "random": lambda *a: 0.42,  # deterministic for tests
    }

    def js_get(self, name):
        if name == "PI":
            return math.pi
        if name == "E":
            return math.e
        fn = self.FNS.get(name)
        if fn:

            def guard(*a, _fn=fn):
                out = _fn(*a)
                if isinstance(out, float) and math.isnan(out):
                    return math.nan
                return out
            return NativeFunction(name, guard)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Math is read-only")


class _JsonObj:
    def __init__(self, interp):
        self.interp = interp

    def js_get(self, name):
        if name == "stringify":
            return NativeFunction("stringify", self._stringify)
        if name == "parse":
            return NativeFunction("parse", self._parse)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "JSON is read-only")

    def _stringify(self, v=UNDEF, _replacer=UNDEF, _space=UNDEF):
        def enc(x):
            if x is UNDEF:
                return None  # handled at call sites
            if x is None or isinstance(x, (bool, str)):
                return x
            if isinstance(x, float):
                if math.isnan(x) or math.isinf(x):
                    return None
                return int(x) if x.is_integer() and abs(x) < 2**53 else x
            if isinstance(x, JSBigInt):
                raise js_error("TypeError",
                               "Do not know how to serialize a BigInt")
            if isinstance(x, list):
                return [None if e is UNDEF else enc(e) for e in x]
            if isinstance(x, dict):
                return {k: enc(val) for k, val in x.items()
                        if val is not UNDEF
                        and not isinstance(val, (JSFunction, NativeFunction))}
            if isinstance(x, (JSFunction, NativeFunction)):
                return None
            return None
        if v is UNDEF or isinstance(v, (JSFunction, NativeFunction)):
            return UNDEF
        return _json.dumps(enc(v), separators=(",", ":"))

    def _parse(self, s=UNDEF):
        try:
            py = _json.loads(to_js_string(s))
        except ValueError as e:
            raise js_error("SyntaxError", f"JSON.parse: {e}")
        return py_to_js(py)


def py_to_js(py):
    """Recursively convert json.loads output to jsmini values.
    Numbers become floats (browser double semantics — deliberately
    including precision loss on >2^53 ints, which is what real clients
    see)."""
    if isinstance(py, bool) or py is None or isinstance(py, str):
        return py
    if isinstance(py, (int, float)):
        return float(py)
    if isinstance(py, list):
        return [py_to_js(x) for x in py]
    if isinstance(py, dict):
        return {str(k): py_to_js(v) for k, v in py.items()}
    return py


class _ObjectObj:
    def __init__(self, interp):
        self.interp = interp

    def js_get(self, name):
        nf = NativeFunction
        if name == "entries":
            return nf("entries", lambda o=UNDEF: [
                [k, v] for k, v in o.items()] if isinstance(o, dict) else [])
        if name == "keys":
            return nf("keys", lambda o=UNDEF: (
                list(o.keys()) if isinstance(o, dict) else []))
        if name == "values":
            return nf("values", lambda o=UNDEF: (
                list(o.values()) if isinstance(o, dict) else []))
        if name == "assign":
            def assign(target=UNDEF, *sources):
                for s in sources:
                    if isinstance(s, dict):
                        target.update(s)
                return target
            return nf("assign", assign)
        if name == "fromEntries":
            return nf("fromEntries", lambda pairs=UNDEF: {
                to_property_key(p[0]): p[1] for p in pairs})
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Object is read-only")


class _ArrayCtor(NativeFunction):
    def __init__(self):
        super().__init__("Array", self._call)

    def _call(self, *args):
        if len(args) == 1 and isinstance(args[0], float):
            return [UNDEF] * int(args[0])
        return list(args)

    def js_construct(self, *args):
        return self._call(*args)

    def js_get(self, name):
        if name == "isArray":
            return NativeFunction("isArray",
                                  lambda v=UNDEF: isinstance(v, list))
        if name == "from":
            def from_(v=UNDEF, fn=UNDEF):
                items = (v.values() if isinstance(v, JSTypedArray)
                         else list(v) if isinstance(v, (list, str)) else [])
                return items
            return NativeFunction("from", from_)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Array is read-only")


class _NumberCtor(NativeFunction):
    def __init__(self):
        super().__init__("Number", lambda *a: (
            0.0 if not a or a[0] is UNDEF else to_number_or_bigint(a[0])))

    def js_get(self, name):
        if name == "isFinite":
            return NativeFunction("isFinite", lambda v=UNDEF: (
                isinstance(v, float) and math.isfinite(v)))
        if name == "isInteger":
            return NativeFunction("isInteger", lambda v=UNDEF: (
                isinstance(v, float) and v.is_integer()))
        if name == "MAX_SAFE_INTEGER":
            return float(2**53 - 1)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Number is read-only")


def to_number_or_bigint(v):
    if isinstance(v, JSBigInt):
        return float(v.v)
    return to_number(v)


class _ErrorCtor(NativeFunction):
    def __init__(self, name: str):
        self.err_name = name
        super().__init__(name, self._make)

    def _make(self, message=UNDEF):
        return {"name": self.err_name,
                "message": "" if message is UNDEF else to_js_string(message)}

    def js_construct(self, message=UNDEF):
        return self._make(message)

    def js_get(self, name):
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Error is read-only")


class _DateCtor(NativeFunction):
    def __init__(self):
        super().__init__("Date", self._make)

    def _make(self, ms=UNDEF):
        return JSDate(time.time() * 1000.0 if ms is UNDEF
                      else to_number(ms))

    def js_construct(self, ms=UNDEF):
        return self._make(ms)

    def js_get(self, name):
        if name == "now":
            return NativeFunction("now", lambda: time.time() * 1000.0)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Date is read-only")


class _TypedCtor(NativeFunction):
    def __init__(self, kind: str):
        self.kind = kind
        super().__init__("TypedArray", self._make)

    def _make(self, src=UNDEF):
        if isinstance(src, JSArrayBuffer):
            return JSTypedArray(self.kind, src.data)
        if isinstance(src, JSTypedArray):
            if src.kind == self.kind:
                return JSTypedArray(self.kind, src.data)
            src = src.values()
        if isinstance(src, float):
            return JSTypedArray(
                self.kind, bytes(int(src) * (1 if self.kind == "u8" else 4)))
        if isinstance(src, list):
            if self.kind == "u8":
                return JSTypedArray("u8", bytes(
                    int(to_number(v)) & 0xFF for v in src))
            return JSTypedArray("f32", b"".join(
                struct.pack("<f", to_number(v)) for v in src))
        if src is UNDEF:
            return JSTypedArray(self.kind, b"")
        raise js_error("TypeError", "unsupported TypedArray source")

    def js_construct(self, src=UNDEF):
        return self._make(src)

    def js_get(self, name):
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "TypedArray ctor is read-only")


class _PromiseCtor(NativeFunction):
    def __init__(self, interp):
        self.interp = interp
        super().__init__("Promise", self._make)

    def _make(self, executor=UNDEF):
        interp = self.interp
        box = {"state": "pending", "value": UNDEF}

        def resolve(v=UNDEF):
            if box["state"] == "pending":
                box["state"], box["value"] = "fulfilled", v

        def reject(v=UNDEF):
            if box["state"] == "pending":
                box["state"], box["value"] = "rejected", v
        interp.call(executor, [NativeFunction("resolve", resolve),
                               NativeFunction("reject", reject)])
        if box["state"] == "pending":
            box["state"] = "fulfilled"  # synchronous world: settle now
        return JSPromise(interp, box["state"], box["value"])

    def js_construct(self, executor=UNDEF):
        return self._make(executor)

    def js_get(self, name):
        interp = self.interp
        if name == "resolve":
            return NativeFunction("resolve",
                                  lambda v=UNDEF: interp.resolved(v))
        if name == "reject":
            return NativeFunction("reject",
                                  lambda v=UNDEF: interp.rejected(v))
        if name == "all":
            def all_(items=UNDEF):
                out = []
                for p in items or []:
                    if isinstance(p, JSPromise):
                        p.handled = True
                        if p.state == "rejected":
                            return interp.rejected(p.value)
                        out.append(p.value)
                    else:
                        out.append(p)
                return interp.resolved(out)
            return NativeFunction("all", all_)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Promise is read-only")


class _ConsoleObj:
    def __init__(self):
        self.lines: list[str] = []

    def js_get(self, name):
        if name in ("log", "warn", "error", "info", "debug"):
            def log(*args, _lvl=name):
                self.lines.append(
                    _lvl + ": " + " ".join(to_js_string(a) for a in args))
            return NativeFunction(name, log)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "console is read-only")


class _PerfObj:
    def __init__(self):
        self.t0 = time.monotonic()

    def js_get(self, name):
        if name == "now":
            return NativeFunction(
                "now", lambda: (time.monotonic() - self.t0) * 1000.0)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "performance is read-only")
