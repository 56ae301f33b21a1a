"""Host objects for running the dashboard script: a small DOM tree with
selector matching, a recording 2D canvas, localStorage, and a fetch()
bridged to the real in-process HTTP app.

Only what webui.py's script touches is implemented; unknown DOM API
raises (via js_get returning UNDEF then a TypeError at the call site),
which is exactly what a test harness should do with new usage.
"""

from __future__ import annotations

import html.parser
import re

from .interp import (
    UNDEF,
    Interpreter,
    JSArrayBuffer,
    JSTypedArray,
    NativeFunction,
    js_error,
    py_to_js,
    to_bool,
    to_js_string,
    to_number,
)

VOID_TAGS = {"input", "img", "br", "hr", "meta", "link", "source", "wbr"}


# --------------------------------------------------------------------------
# DOM tree

class StyleObj:
    def __init__(self):
        self.props: dict = {}

    def js_get(self, name):
        if name == "cssText":
            return "; ".join(f"{k}:{v}" for k, v in self.props.items())
        return self.props.get(name, "")

    def js_set(self, name, value):
        self.props[name] = to_js_string(value)


class ClassList:
    def __init__(self, el: "Element"):
        self.el = el

    def _classes(self) -> list[str]:
        return [c for c in self.el.attrs.get("class", "").split() if c]

    def js_get(self, name):
        el = self.el
        if name == "add":
            def add(*cs):
                cur = self._classes()
                for c in cs:
                    c = to_js_string(c)
                    if c not in cur:
                        cur.append(c)
                el.attrs["class"] = " ".join(cur)
            return NativeFunction("add", add)
        if name == "remove":
            def remove(*cs):
                drop = {to_js_string(c) for c in cs}
                el.attrs["class"] = " ".join(
                    c for c in self._classes() if c not in drop)
            return NativeFunction("remove", remove)
        if name == "contains":
            return NativeFunction(
                "contains",
                lambda c=UNDEF: to_js_string(c) in self._classes())
        if name == "toggle":
            def toggle(c=UNDEF):
                c = to_js_string(c)
                cur = self._classes()
                if c in cur:
                    cur.remove(c)
                    present = False
                else:
                    cur.append(c)
                    present = True
                el.attrs["class"] = " ".join(cur)
                return present
            return NativeFunction("toggle", toggle)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "classList is read-only")


class Dataset:
    def __init__(self, el: "Element"):
        self.el = el

    def js_get(self, name):
        # camelCase -> data-kebab-case
        key = "data-" + re.sub(r"([A-Z])", r"-\1", name).lower()
        v = self.el.attrs.get(key)
        return v if v is not None else UNDEF

    def js_set(self, name, value):
        key = "data-" + re.sub(r"([A-Z])", r"-\1", name).lower()
        self.el.attrs[key] = to_js_string(value)


class Canvas2D:
    """Recording 2D context: every draw call and property set is kept so
    tests can assert on what the chart code actually painted."""

    METHODS = (
        "fillRect", "strokeRect", "clearRect", "beginPath", "moveTo",
        "lineTo", "stroke", "fill", "arc", "fillText", "strokeText",
        "closePath", "save", "restore", "translate", "rotate", "scale",
    )
    PROPS = ("fillStyle", "strokeStyle", "lineWidth", "font",
             "textAlign", "textBaseline", "globalAlpha")

    def __init__(self):
        self.ops: list[tuple] = []
        self.props: dict = {}

    def count(self, name: str) -> int:
        return sum(1 for op in self.ops if op[0] == name)

    def calls(self, name: str) -> list[tuple]:
        return [op for op in self.ops if op[0] == name]

    def js_get(self, name):
        if name in self.METHODS:
            def record(*args, _n=name):
                self.ops.append((_n, tuple(
                    to_number(a) if isinstance(a, float) else a
                    for a in args)))
                return UNDEF
            return NativeFunction(name, record)
        if name in self.PROPS:
            return self.props.get(name, "")
        return UNDEF

    def js_set(self, name, value):
        if name in self.PROPS:
            self.props[name] = value
            # property sets are recorded too (e.g. fillStyle sequences)
            self.ops.append(("set:" + name, (value,)))
            return
        raise js_error("TypeError", f"unknown canvas prop {name}")


class Element:
    def __init__(self, doc: "DocumentStub", tag: str, attrs=None):
        self.doc = doc
        self.tag = tag.lower()
        self.attrs: dict = dict(attrs or {})
        self.children: list = []  # Element | str (text)
        self.parent: Element | None = None
        self.props: dict = {}  # value/checked/files overrides, handlers
        self.listeners: dict[str, list] = {}
        self.style = StyleObj()
        self._ctx: Canvas2D | None = None

    # -- tree ops ----------------------------------------------------------
    def append(self, child):
        if isinstance(child, Element):
            child.parent = self
        self.children.append(child)

    def walk(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.walk()

    def text_content(self) -> str:
        out = []
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                out.append(c.text_content())
        return "".join(out)

    def set_inner_html(self, html_text: str):
        self.children = []
        for node in parse_fragment(self.doc, html_text):
            self.append(node)

    def serialize_inner(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    # -- selector matching ---------------------------------------------------
    def matches_simple(self, simple: str) -> bool:
        m = re.match(
            r"^([a-zA-Z][\w-]*|\*)?((?:[#.][\w-]+|\[[\w-]+\])*)$", simple)
        if not m:
            return False
        tag, quals = m.group(1), m.group(2) or ""
        if tag and tag != "*" and self.tag != tag.lower():
            return False
        for q in re.findall(r"[#.][\w-]+|\[[\w-]+\]", quals):
            if q.startswith("#"):
                if self.attrs.get("id") != q[1:]:
                    return False
            elif q.startswith("."):
                if q[1:] not in self.attrs.get("class", "").split():
                    return False
            else:  # [attr]
                if q[1:-1] not in self.attrs:
                    return False
        return True

    def query_all(self, selector: str) -> list["Element"]:
        parts = selector.strip().split()
        out = []
        for el in self.walk():
            if el.matches_simple(parts[-1]):
                # check ancestor chain for the leading parts
                need = parts[:-1]
                node = el.parent
                i = len(need) - 1
                while node is not None and i >= 0:
                    if node.matches_simple(need[i]):
                        i -= 1
                    node = node.parent
                if i < 0 or not need:
                    out.append(el)
        return out

    # -- event dispatch ------------------------------------------------------
    def fire(self, event: str, interp: Interpreter):
        """Invoke on<event> plus listeners; drain microtasks after.
        An on<event>="..." HTML attribute (no prop handler set) is
        evaluated as script in the page's global scope, like a browser."""
        handler = self.props.get("on" + event)
        fns = ([handler] if handler not in (None, UNDEF) else [])
        if not fns and ("on" + event) in self.attrs:
            from .parser import parse

            src = self.attrs["on" + event]
            fns = [NativeFunction(
                "inline", lambda *_a, _s=src: interp.run(parse(_s)))]
        fns = fns + self.listeners.get(event, [])
        for fn in fns:
            r = interp.call(fn, [{"type": event, "target": self}])
            from .interp import JSPromise

            if isinstance(r, JSPromise):
                r.handled = True
                interp.drain()
                if r.state == "rejected":
                    from .interp import JSThrow

                    raise JSThrow(r.value)
        interp.drain()

    # -- JS surface ----------------------------------------------------------
    def js_get(self, name):
        nf = NativeFunction
        if name in self.props:
            return self.props[name]
        if name == "id":
            return self.attrs.get("id", "")
        if name == "tagName":
            return self.tag.upper()
        if name == "value":
            if self.tag == "select":
                return self._select_value()
            if self.tag == "textarea" and "value" not in self.attrs:
                return self.text_content()  # initial value = element text
            return self.attrs.get("value", "")
        if name == "checked":
            return "checked" in self.attrs
        if name == "files":
            return []
        if name == "dataset":
            return Dataset(self)
        if name == "classList":
            return ClassList(self)
        if name == "style":
            return self.style
        if name == "title":
            return self.attrs.get("title", "")
        if name == "className":
            return self.attrs.get("class", "")
        if name == "textContent":
            return self.text_content()
        if name == "innerHTML":
            return self.serialize_inner()
        if name == "width":
            return to_number(self.attrs.get("width", "0"))
        if name == "height":
            return to_number(self.attrs.get("height", "0"))
        if name == "length":  # select.options-ish uses
            return UNDEF
        if name == "parentElement" or name == "parentNode":
            return self.parent if self.parent is not None else None
        if name == "getContext":
            def getctx(kind=UNDEF):
                if self._ctx is None:
                    self._ctx = Canvas2D()
                return self._ctx
            return nf("getContext", getctx)
        if name == "appendChild":
            def append_child(child=UNDEF):
                if not isinstance(child, Element):
                    raise js_error("TypeError", "appendChild: not a node")
                self.append(child)
                return child
            return nf("appendChild", append_child)
        if name == "insertAdjacentHTML":
            def insert(pos=UNDEF, txt=UNDEF):
                where = to_js_string(pos)
                nodes = parse_fragment(self.doc, to_js_string(txt))
                if where == "beforeend":
                    for nd in nodes:
                        self.append(nd)
                elif where == "afterbegin":
                    for nd in reversed(nodes):
                        if isinstance(nd, Element):
                            nd.parent = self
                        self.children.insert(0, nd)
                else:
                    raise js_error("TypeError",
                                   f"insertAdjacentHTML: {where}")
                return UNDEF
            return nf("insertAdjacentHTML", insert)
        if name == "querySelector":
            def qs(sel=UNDEF):
                out = self.query_all(to_js_string(sel))
                return out[0] if out else None
            return nf("querySelector", qs)
        if name == "querySelectorAll":
            return nf("querySelectorAll",
                      lambda sel=UNDEF: self.query_all(to_js_string(sel)))
        if name == "addEventListener":
            def ael(ev=UNDEF, fn=UNDEF):
                self.listeners.setdefault(to_js_string(ev), []).append(fn)
                return UNDEF
            return nf("addEventListener", ael)
        if name == "getAttribute":
            return nf("getAttribute", lambda k=UNDEF: self.attrs.get(
                to_js_string(k), None))
        if name == "setAttribute":
            def seta(k=UNDEF, v=UNDEF):
                self.attrs[to_js_string(k)] = to_js_string(v)
                return UNDEF
            return nf("setAttribute", seta)
        if name == "remove":
            def remove_self():
                if self.parent is not None:
                    self.parent.children.remove(self)
                    self.parent = None
                return UNDEF
            return nf("remove", remove_self)
        if name.startswith("on"):
            return self.props.get(name, None)
        return UNDEF

    def js_set(self, name, value):
        if name == "innerHTML":
            self.set_inner_html(to_js_string(value))
        elif name == "textContent":
            self.children = [to_js_string(value)]
        elif name == "value":
            if self.tag == "select":
                self.props["__select_value"] = to_js_string(value)
            else:
                self.attrs["value"] = to_js_string(value)
        elif name == "checked":
            if to_bool(value):
                self.attrs["checked"] = ""
            else:
                self.attrs.pop("checked", None)
        elif name == "className":
            self.attrs["class"] = to_js_string(value)
        elif name == "id":
            self.attrs["id"] = to_js_string(value)
        elif name == "title":
            self.attrs["title"] = to_js_string(value)
        elif name in ("width", "height"):
            self.attrs[name] = to_js_string(value)
        elif name == "src":
            self.attrs["src"] = to_js_string(value)
        else:
            self.props[name] = value

    def _select_value(self):
        override = self.props.get("__select_value")
        options = [c for c in self.walk() if c.tag == "option"]
        if override is not None:
            for o in options:
                if _option_value(o) == override:
                    return override
        for o in options:
            if "selected" in o.attrs:
                return _option_value(o)
        return _option_value(options[0]) if options else ""


def _option_value(o: Element):
    v = o.props.get("value")
    if v is not None:
        return to_js_string(v)
    if "value" in o.attrs:
        return o.attrs["value"]
    return o.text_content()


def _serialize(node) -> str:
    if isinstance(node, str):
        return (node.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))
    attrs = "".join(f' {k}="{v}"' for k, v in node.attrs.items())
    if node.tag in VOID_TAGS:
        return f"<{node.tag}{attrs}>"
    return (f"<{node.tag}{attrs}>"
            + "".join(_serialize(c) for c in node.children)
            + f"</{node.tag}>")


# --------------------------------------------------------------------------
# HTML parsing

class _TreeBuilder(html.parser.HTMLParser):
    def __init__(self, doc):
        super().__init__(convert_charrefs=True)
        self.doc = doc
        self.root = Element(doc, "#fragment")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(self.doc, tag, {k: (v if v is not None else "")
                                     for k, v in attrs})
        self.stack[-1].append(el)
        if tag.lower() not in VOID_TAGS:
            self.stack.append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag.lower():
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].append(data)


def parse_fragment(doc, html_text: str) -> list:
    b = _TreeBuilder(doc)
    b.feed(html_text)
    b.close()
    return b.root.children


# --------------------------------------------------------------------------
# document / window / storage / fetch

class DocumentStub:
    def __init__(self, page_html: str):
        self.root = Element(self, "#document")
        for node in parse_fragment(self, page_html):
            self.root.append(node)
        self.scripts = [el.text_content() for el in self.root.walk()
                        if el.tag == "script"]

    def get_by_id(self, id_: str):
        for el in self.root.walk():
            if el.attrs.get("id") == id_:
                return el
        return None

    def js_get(self, name):
        nf = NativeFunction
        if name == "getElementById":
            return nf("getElementById",
                      lambda i=UNDEF: self.get_by_id(to_js_string(i)))
        if name == "createElement":
            return nf("createElement",
                      lambda t=UNDEF: Element(self, to_js_string(t)))
        if name == "querySelector":
            def qs(sel=UNDEF):
                out = self.root.query_all(to_js_string(sel))
                return out[0] if out else None
            return nf("querySelector", qs)
        if name == "querySelectorAll":
            return nf("querySelectorAll", lambda sel=UNDEF:
                      self.root.query_all(to_js_string(sel)))
        if name == "body":
            for el in self.root.walk():
                if el.tag == "body":
                    return el
            return None
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", f"cannot set document.{name}")


class LocalStorage:
    def __init__(self):
        self.data: dict = {}

    def js_get(self, name):
        nf = NativeFunction
        if name == "getItem":
            return nf("getItem",
                      lambda k=UNDEF: self.data.get(to_js_string(k), None))
        if name == "setItem":
            def set_item(k=UNDEF, v=UNDEF):
                self.data[to_js_string(k)] = to_js_string(v)
                return UNDEF
            return nf("setItem", set_item)
        if name == "removeItem":
            def rm(k=UNDEF):
                self.data.pop(to_js_string(k), None)
                return UNDEF
            return nf("removeItem", rm)
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "use setItem")


class FileStub:
    """What an <input type=file> .files[0] yields."""

    def __init__(self, interp: Interpreter, name: str, data: bytes,
                 mime: str = "application/octet-stream"):
        self.interp = interp
        self.name = name
        self.data = bytes(data)
        self.mime = mime

    def js_get(self, name):
        if name == "name":
            return self.name
        if name == "type":
            return self.mime
        if name == "size":
            return float(len(self.data))
        if name == "arrayBuffer":
            return NativeFunction(
                "arrayBuffer",
                lambda: self.interp.resolved(JSArrayBuffer(self.data)))
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "File is read-only")


class AudioBufferStub:
    def __init__(self, samples_f32le: bytes, sample_rate: float):
        self.data = samples_f32le
        self.rate = sample_rate

    def js_get(self, name):
        if name == "getChannelData":
            return NativeFunction(
                "getChannelData", lambda i=UNDEF: JSTypedArray(
                    "f32", self.data))
        if name == "sampleRate":
            return self.rate
        if name == "duration":
            return len(self.data) / 4.0 / self.rate
        if name == "numberOfChannels":
            return 1.0
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "AudioBuffer is read-only")


class AudioContextStub:
    """WebAudio decode stand-in: 'decodes' any input to the f32 samples
    the test registered (browser codec behavior is out of scope — the
    point is that the REAL bytes flow onward to the real audio API)."""

    decoded_samples: bytes = b""

    def __init__(self, interp: Interpreter):
        self.interp = interp
        self.rate = 8000.0

    def ctor(self, opts=UNDEF):
        if isinstance(opts, dict) and "sampleRate" in opts:
            self.rate = to_number(opts["sampleRate"])
        return self

    def js_get(self, name):
        if name == "decodeAudioData":
            return NativeFunction(
                "decodeAudioData",
                lambda buf=UNDEF: self.interp.resolved(AudioBufferStub(
                    type(self).decoded_samples, self.rate)))
        if name == "sampleRate":
            return self.rate
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "AudioContext is read-only")


class WindowStub:
    def __init__(self, interp: Interpreter):
        self.interp = interp
        self.audio_ctor = _AudioCtxCtor(interp)

    def js_get(self, name):
        if name in ("AudioContext", "webkitAudioContext"):
            return self.audio_ctor
        if name == "location":
            return {"href": "http://localhost/", "origin": "http://localhost"}
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", f"cannot set window.{name}")


class _AudioCtxCtor(NativeFunction):
    def __init__(self, interp):
        self.interp = interp
        super().__init__("AudioContext", self._make)

    def _make(self, opts=UNDEF):
        return AudioContextStub(self.interp).ctor(opts)

    def js_construct(self, opts=UNDEF):
        return self._make(opts)

    def js_get(self, name):
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "read-only")


class FetchResponse:
    def __init__(self, interp: Interpreter, status: int, body: bytes):
        self.interp = interp
        self.status = status
        self.body = body

    def js_get(self, name):
        if name == "ok":
            return 200 <= self.status < 300
        if name == "status":
            return float(self.status)
        if name == "json":
            def json_():
                import json as _j
                try:
                    return self.interp.resolved(
                        py_to_js(_j.loads(self.body.decode("utf-8"))))
                except Exception:
                    return self.interp.rejected(
                        {"name": "SyntaxError",
                         "message": "Unexpected end of JSON input"})
            return NativeFunction("json", json_)
        if name == "text":
            return NativeFunction("text", lambda: self.interp.resolved(
                self.body.decode("utf-8", "replace")))
        return UNDEF

    def js_set(self, name, value):
        raise js_error("TypeError", "Response is read-only")


def body_to_bytes(body) -> bytes:
    if body is UNDEF or body is None:
        return b""
    if isinstance(body, str):
        return body.encode("utf-8")
    if isinstance(body, JSArrayBuffer):
        return body.data
    if isinstance(body, JSTypedArray):
        return body.data
    raise js_error("TypeError", "unsupported fetch body")


class Browser:
    """Glue: document + window + localStorage + fetch-over-the-real-app.

    http(method, path, headers: dict[str,str], body: bytes)
        -> (status: int, body: bytes)  is supplied by the test.
    """

    def __init__(self, page_html: str, http):
        self.interp = Interpreter()
        self.doc = DocumentStub(page_html)
        self.storage = LocalStorage()
        self.http = http
        self.requests: list[tuple] = []  # (method, path) log
        g = self.interp.global_env
        g.declare("document", self.doc)
        g.declare("window", WindowStub(self.interp))
        g.declare("localStorage", self.storage)
        g.declare("fetch", NativeFunction("fetch", self._fetch))
        g.declare("alert", NativeFunction("alert", lambda *a: UNDEF))
        g.declare("navigator", {"userAgent": "jsmini"})
        g.declare("setTimeout", NativeFunction(
            "setTimeout", self._set_timeout))

    def _set_timeout(self, fn=UNDEF, _ms=UNDEF, *args):
        self.interp.microtasks.append(
            lambda: self.interp.call(fn, list(args)))
        return 0.0

    def _fetch(self, path=UNDEF, opts=UNDEF):
        path = to_js_string(path)
        opts = opts if isinstance(opts, dict) else {}
        method = to_js_string(opts.get("method", "GET")).upper()
        headers = {to_js_string(k).lower(): to_js_string(v)
                   for k, v in (opts.get("headers") or {}).items()}
        body = body_to_bytes(opts.get("body", UNDEF))
        self.requests.append((method, path))
        try:
            status, resp_body = self.http(method, path, headers, body)
        except Exception as e:  # network-level failure -> rejected promise
            return self.interp.rejected(
                {"name": "TypeError", "message": f"fetch failed: {e}"})
        return self.interp.resolved(
            FetchResponse(self.interp, int(status), resp_body))

    # -- test-facing helpers -------------------------------------------------
    def run_scripts(self):
        from .parser import parse

        for src in self.doc.scripts:
            self.interp.run(parse(src))

    def by_id(self, id_: str) -> Element:
        el = self.doc.get_by_id(id_)
        assert el is not None, f"no element #{id_}"
        return el

    def set_value(self, id_: str, value: str):
        self.by_id(id_).js_set("value", value)

    def click(self, el_or_id):
        el = self.by_id(el_or_id) if isinstance(el_or_id, str) else el_or_id
        el.fire("click", self.interp)

    def call(self, fn_name: str, *args):
        """Invoke a global page function (the inline onclick handlers)."""
        fn = self.interp.global_env.lookup(fn_name)
        r = self.interp.call(fn, list(args))
        from .interp import JSPromise, JSThrow

        if isinstance(r, JSPromise):
            r.handled = True
            self.interp.drain()
            if r.state == "rejected":
                raise JSThrow(r.value)
            r = r.value
        self.interp.drain()
        return r

    def canvases(self, within: Element) -> list[Canvas2D]:
        out = []
        for el in within.walk():
            if el.tag == "canvas" and el._ctx is not None:
                out.append(el._ctx)
        return out
