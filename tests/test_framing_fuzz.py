"""Property-based fuzz of the streaming framing code: BodyStream's
chunked decoder and the multipart splitter must reassemble the exact
payload regardless of how the transport fragments the bytes."""

import asyncio

from hypothesis import given, settings
from hypothesis import strategies as st

from ucfp_tpu.server.handlers import Handlers
from ucfp_tpu.server.http import BodyStream


class _ScriptedReader:
    """asyncio.StreamReader stand-in fed from a fixed byte script,
    returning data in the fragment sizes the fuzzer chose."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    async def readexactly(self, n: int) -> bytes:
        if self._pos + n > len(self._data):
            raise asyncio.IncompleteReadError(
                self._data[self._pos:], n
            )
        out = self._data[self._pos:self._pos + n]
        self._pos += n
        return out

    async def readline(self) -> bytes:
        i = self._data.find(b"\n", self._pos)
        if i < 0:
            out = self._data[self._pos:]
            self._pos = len(self._data)
            return out
        out = self._data[self._pos:i + 1]
        self._pos = i + 1
        return out


def _chunked_encode(payload: bytes, sizes: list[int]) -> bytes:
    out = b""
    pos = 0
    for s in sizes:
        if pos >= len(payload):
            break
        part = payload[pos:pos + max(1, s)]
        pos += len(part)
        out += b"%x\r\n%s\r\n" % (len(part), part)
    if pos < len(payload):
        rest = payload[pos:]
        out += b"%x\r\n%s\r\n" % (len(rest), rest)
    return out + b"0\r\n\r\n"


@settings(max_examples=60, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=4096),
    sizes=st.lists(st.integers(1, 700), min_size=1, max_size=12),
    read_n=st.integers(1, 1500),
)
def test_bodystream_chunked_roundtrip(payload, sizes, read_n):
    wire = _chunked_encode(payload, sizes)
    stream = BodyStream(_ScriptedReader(wire), chunked=True)

    async def go():
        parts = []
        while not stream.done:
            d = await stream.read(read_n)
            if not d and stream.done:
                break
            parts.append(d)
        return b"".join(parts)

    got = asyncio.run(go())
    assert got == payload
    assert stream.consumed == len(payload)


@settings(max_examples=60, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=4096),
    read_n=st.integers(1, 999),
)
def test_bodystream_content_length_roundtrip(payload, read_n):
    stream = BodyStream(_ScriptedReader(payload), content_length=len(payload))

    async def go():
        parts = []
        while not stream.done:
            d = await stream.read(read_n)
            parts.append(d)
        return b"".join(parts)

    assert asyncio.run(go()) == payload


def _multipart_encode(parts: list[bytes], boundary: bytes) -> bytes:
    out = b"preamble junk\r\n"
    for p in parts:
        out += (b"--" + boundary + b"\r\n"
                + b'Content-Disposition: form-data; name="c"\r\n\r\n'
                + p + b"\r\n")
    return out + b"--" + boundary + b"--\r\nepilogue"


@settings(max_examples=60, deadline=None)
@given(
    parts=st.lists(
        st.binary(min_size=0, max_size=1200).filter(
            # payload bytes must not contain the delimiter sequence
            lambda b: b"--BNDRY" not in b
        ),
        min_size=0, max_size=5,
    ),
    cuts=st.lists(st.integers(1, 400), min_size=1, max_size=16),
)
def test_multipart_splitter_roundtrip(parts, cuts):
    wire = _multipart_encode(parts, b"BNDRY")
    # fragment the wire at the fuzzer's cut sizes
    frags = []
    pos = 0
    i = 0
    while pos < len(wire):
        step = cuts[i % len(cuts)]
        frags.append(wire[pos:pos + step])
        pos += step
        i += 1

    async def chunks():
        for f in frags:
            yield f

    async def go():
        out = []
        async for data in Handlers._multipart_chunks(chunks(), b"BNDRY"):
            out.append(data)
        return b"".join(out)

    assert asyncio.run(go()) == b"".join(parts)


# -- malformed-input safety: garbage must fail CLEANLY, never hang ----------
# (bounded scripted input guarantees termination; the property is that the
# only exceptions escaping are the documented contract types)


_FRAMINGISH = st.one_of(
    st.binary(min_size=0, max_size=2048),
    # biased toward bytes the framing state machines actually consume
    st.text(alphabet="0123456789abcdefABCDEF;:=\r\n -BNDRY_x",
            max_size=2048).map(lambda s: s.encode()),
)


@settings(max_examples=100, deadline=None)
@given(garbage=_FRAMINGISH)
def test_bodystream_chunked_garbage_fails_cleanly(garbage):
    stream = BodyStream(_ScriptedReader(garbage), chunked=True)

    async def go():
        total = 0
        while not stream.done:
            d = await stream.read(512)
            total += len(d)
            if not d and stream.done:
                break
        return total

    try:
        asyncio.run(go())
    except (ValueError, asyncio.IncompleteReadError):
        pass  # the documented bad-framing / truncated-body outcomes


@settings(max_examples=100, deadline=None)
@given(
    garbage=_FRAMINGISH,
    cut=st.integers(1, 300),
)
def test_multipart_garbage_fails_cleanly(garbage, cut):
    from ucfp_tpu.server.http import HttpError

    frags = [garbage[i:i + cut] for i in range(0, len(garbage), cut)]

    async def chunks():
        for f in frags:
            yield f

    async def go():
        async for _ in Handlers._multipart_chunks(chunks(), b"BNDRY"):
            pass

    try:
        asyncio.run(go())
    except HttpError as e:
        assert e.status == 400  # bad_multipart is the only failure mode


# -- batch text NDJSON parser ------------------------------------------------

_NDJSONISH = st.one_of(
    st.binary(max_size=400),
    st.text(max_size=300).map(lambda s: s.encode("utf-8", "replace")),
    st.lists(
        st.one_of(
            st.builds(
                lambda rid, txt: __import__("json").dumps(
                    {"record_id": rid, "text": txt}, ensure_ascii=False
                ),
                st.integers(min_value=-(2**70), max_value=2**70),
                st.text(max_size=60),
            ),
            st.text(max_size=40),  # garbage lines interleaved
        ),
        max_size=6,
    ).map(lambda rows: "\n".join(rows).encode("utf-8", "replace")),
)


@settings(max_examples=60, deadline=None)
@given(body=_NDJSONISH)
def test_text_batch_garbage_never_500s(body, tmp_path_factory):
    """Arbitrary bytes against the batch text route answer 201 (valid
    rows committed, bad rows in `errors`) or a clean 4xx — never an
    unhandled exception. Mirrors the framing-fuzz contract of the other
    body parsers."""
    import json as _j

    from ucfp_tpu.server.http import HttpError, Request

    app = _fuzz_app(tmp_path_factory)
    req = Request(
        "POST", "/v1/ingest/text/batch/0", {},
        {"authorization": "Bearer fuzz-token",
         "content-length": str(len(body))},
        body,
    )

    async def go():
        resp, _ = await app.handle_request(req)
        return resp

    resp = asyncio.run(go())
    assert resp.status in (201, 400), (resp.status, resp.body[:120])
    out = _j.loads(resp.body)
    if resp.status == 400:
        assert "error" in out
    else:
        assert out["count"] >= 1


_FUZZ_APP = {}


def _fuzz_app(tmp_path_factory):
    # one app for the whole fuzz run: per-example backend construction
    # would dominate the runtime
    if "app" not in _FUZZ_APP:
        from ucfp_tpu.index.embedded import EmbeddedBackend
        from ucfp_tpu.server.app import ServerState, build_server
        from ucfp_tpu.server.auth import StaticSingleKey
        from ucfp_tpu.server.inputs_cache import InputsCache
        from ucfp_tpu.server.ratelimit import NoopRateLimiter
        from ucfp_tpu.server.usage import NoopUsageSink

        d = tmp_path_factory.mktemp("batchfuzz")
        state = ServerState(
            index=EmbeddedBackend(str(d / "db")),
            api_keys=StaticSingleKey("fuzz-token"),
            rate_limit=NoopRateLimiter(),
            usage=NoopUsageSink(),
            inputs=InputsCache(),
        )
        _FUZZ_APP["app"] = build_server(state, timeout_secs=120.0)
    return _FUZZ_APP["app"]


class _FragmentingReader:
    """StreamReader stand-in whose read(n) returns at most the next
    scripted fragment — exercising every partial-read interleaving of
    HttpServer._read_body_exact."""

    def __init__(self, data: bytes, sizes: list[int]):
        self._data = data
        self._pos = 0
        self._sizes = list(sizes)
        self._i = 0

    async def read(self, n: int) -> bytes:
        if self._pos >= len(self._data):
            return b""
        frag = self._sizes[self._i % len(self._sizes)] if self._sizes else n
        self._i += 1
        take = min(n, max(1, frag), len(self._data) - self._pos)
        out = self._data[self._pos:self._pos + take]
        self._pos += take
        return out

    async def readexactly(self, n: int) -> bytes:
        if self._pos + n > len(self._data):
            raise asyncio.IncompleteReadError(self._data[self._pos:], n)
        out = self._data[self._pos:self._pos + n]
        self._pos += n
        return out


@settings(max_examples=40, deadline=None)
@given(
    size=st.integers(0, 1 << 19),
    sizes=st.lists(st.integers(1, 1 << 17), min_size=1, max_size=8),
)
def test_read_body_exact_reassembles(size, sizes):
    """_read_body_exact(clen) == the exact body bytes for every
    fragmentation, above and below the slice threshold."""
    from ucfp_tpu.server.http import HttpServer

    payload = bytes(i & 0xFF for i in range(size))
    srv = HttpServer.__new__(HttpServer)  # only _read_body_exact needed
    r = _FragmentingReader(payload, sizes)
    got = asyncio.run(srv._read_body_exact(r, len(payload)))
    assert got == payload


def test_read_body_exact_eof_raises():
    from ucfp_tpu.server.http import HttpServer

    srv = HttpServer.__new__(HttpServer)
    r = _FragmentingReader(b"x" * 1000, [300])
    try:
        asyncio.run(srv._read_body_exact(r, (1 << 18) + 5000))
        raise AssertionError("expected IncompleteReadError")
    except asyncio.IncompleteReadError as e:
        assert e.partial == b"x" * 1000
