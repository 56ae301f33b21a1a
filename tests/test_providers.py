"""Remote semantic providers (OpenAI / Voyage / Cohere) against local
stub HTTP servers — wire-correct codecs, key pass-through, and error
mapping (reference: src/modality/text.rs:500-606,
src/server/handlers.rs:360-519). Same in-process-stub strategy as
tests/test_webhooks.py."""

import asyncio
import json
import threading

import pytest

from ucfp_tpu.core import ModalityError, ProviderError
from ucfp_tpu.modality import providers as prov
from ucfp_tpu.modality import text as tmod

from test_server import TOKEN, call, jbody, make_app


class ProviderStub:
    """Records (path, headers, body); replies from a per-path handler."""

    def __init__(self):
        self.requests = []
        self.handlers = {}  # path -> (status, payload-dict | raw-bytes)
        self._started = threading.Event()
        self.port = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(10)

    def _run(self):
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)

        async def client(reader, writer):
            try:
                head = await reader.readuntil(b"\r\n\r\n")
                lines = head.decode().split("\r\n")
                path = lines[0].split(" ")[1]
                headers = {}
                clen = 0
                for ln in lines[1:]:
                    name, _, val = ln.partition(":")
                    if _:
                        headers[name.strip().lower()] = val.strip()
                clen = int(headers.get("content-length", 0))
                body = json.loads(await reader.readexactly(clen)) if clen else {}
                self.requests.append((path, headers, body))
                status, payload = self.handlers.get(path, (404, {}))
                out = (payload if isinstance(payload, bytes)
                       else json.dumps(payload).encode())
                writer.write(
                    f"HTTP/1.1 {status} X\r\ncontent-length: {len(out)}\r\n"
                    f"connection: close\r\n\r\n".encode() + out
                )
                await writer.drain()
            finally:
                writer.close()

        async def boot():
            srv = await asyncio.start_server(client, "127.0.0.1", 0)
            self.port = srv.sockets[0].getsockname()[1]
            self._started.set()
            async with srv:
                await srv.serve_forever()

        loop.run_until_complete(boot())


@pytest.fixture
def stub(monkeypatch):
    s = ProviderStub()
    for name in ("OPENAI", "VOYAGE", "COHERE"):
        monkeypatch.setenv(f"UCFP_PROVIDER_{name}_URL",
                           f"http://127.0.0.1:{s.port}")
    return s


EMB = [0.25, -0.5, 1.0, 0.125]


class TestCodecs:
    def test_openai_roundtrip(self, stub):
        stub.handlers["/v1/embeddings"] = (
            200, {"data": [{"embedding": EMB}],
                  "model": "text-embedding-3-small-001"})
        vec, mid = prov.embed("openai", "hello", "text-embedding-3-small",
                              "sk-test")
        assert vec.tolist() == EMB
        assert mid == "text-embedding-3-small-001"
        path, headers, body = stub.requests[0]
        assert path == "/v1/embeddings"
        assert headers["authorization"] == "Bearer sk-test"
        assert body == {"model": "text-embedding-3-small",
                        "input": ["hello"]}

    def test_voyage_roundtrip(self, stub):
        stub.handlers["/v1/embeddings"] = (
            200, {"data": [{"embedding": EMB}], "model": "voyage-3-lite"})
        vec, mid = prov.embed("voyage", "hi", "voyage-3-lite", "pa-key")
        assert vec.tolist() == EMB
        assert stub.requests[0][1]["authorization"] == "Bearer pa-key"

    def test_cohere_v1_and_v2_shapes(self, stub):
        stub.handlers["/v1/embed"] = (200, {"embeddings": [EMB]})
        vec, mid = prov.embed("cohere", "hi", "embed-english-v3.0", "ck")
        assert vec.tolist() == EMB
        assert mid == "embed-english-v3.0"
        _, _, body = stub.requests[0]
        assert body["texts"] == ["hi"]
        assert body["input_type"] == "search_document"
        stub.handlers["/v1/embed"] = (200, {"embeddings": {"float": [EMB]}})
        vec2, _ = prov.embed("cohere", "hi", "embed-english-v3.0", "ck")
        assert vec2.tolist() == EMB

    def test_provider_http_error_is_502(self, stub):
        stub.handlers["/v1/embeddings"] = (429, {"error": "rate limited"})
        with pytest.raises(ProviderError) as e:
            prov.embed("openai", "x", "m", "k")
        assert "429" in str(e.value)

    def test_malformed_json_is_provider_error(self, stub):
        stub.handlers["/v1/embeddings"] = (200, b"not json{{")
        with pytest.raises(ProviderError):
            prov.embed("openai", "x", "m", "k")

    def test_missing_embedding_field(self, stub):
        stub.handlers["/v1/embeddings"] = (200, {"data": []})
        with pytest.raises(ProviderError):
            prov.embed("openai", "x", "m", "k")

    def test_nonfinite_vector_rejected(self, stub):
        stub.handlers["/v1/embeddings"] = (
            200, {"data": [{"embedding": [1.0, float("nan")]}]})
        with pytest.raises(ProviderError):
            prov.embed("openai", "x", "m", "k")

    def test_unreachable_is_provider_error(self, monkeypatch):
        monkeypatch.setenv("UCFP_PROVIDER_OPENAI_URL",
                           "http://127.0.0.1:9")  # discard port: refused
        with pytest.raises(ProviderError):
            prov.embed("openai", "x", "m", "k")


class TestModalityLayer:
    def test_record_fields(self, stub):
        stub.handlers["/v1/embeddings"] = (
            200, {"data": [{"embedding": EMB}], "model": "m-001"})
        rec = tmod.fingerprint_semantic(
            "some text", 3, 9, provider="openai", provider_key="sk",
            model="text-embedding-3-small")
        assert rec.algorithm == "embedding-openai"
        assert rec.model_id == "m-001"
        assert rec.embedding == EMB
        import numpy as np

        assert rec.fingerprint == np.asarray(EMB, "<f4").tobytes()

    def test_missing_key_is_modality_400(self):
        with pytest.raises(ModalityError):
            tmod.fingerprint_semantic("t", 0, 1, provider="voyage")

    def test_default_models(self, stub):
        stub.handlers["/v1/embed"] = (200, {"embeddings": [EMB]})
        rec = tmod.fingerprint_semantic("t", 0, 1, provider="cohere",
                                        provider_key="ck")
        assert rec.model_id == prov.DEFAULT_MODEL["cohere"]
        assert rec.algorithm == "embedding-cohere"


class TestHttpRoute:
    def test_ingest_via_header_key(self, tmp_path, stub):
        app, _ = make_app(tmp_path)
        stub.handlers["/v1/embeddings"] = (
            200, {"data": [{"embedding": EMB}], "model": "m-9"})
        body = jbody(call(
            app, "POST", "/v1/ingest/text/0/1", b"remote semantic text",
            query="algorithm=semantic&provider=openai&return_embedding=1",
            headers={"x-provider-key": "sk-live"},
        ))
        assert body["algorithm"] == "embedding-openai"
        assert body["embedding"] == EMB
        # key forwarded as the provider bearer, not ours
        assert stub.requests[0][1]["authorization"] == "Bearer sk-live"
        # stored: describe sees the provider model id
        meta = jbody(call(app, "GET", "/v1/records/0/1"))
        assert meta["model_id"] == "m-9"

    def test_provider_failure_maps_502(self, tmp_path, stub):
        app, _ = make_app(tmp_path)
        stub.handlers["/v1/embeddings"] = (500, {"error": "boom"})
        resp = call(
            app, "POST", "/v1/ingest/text/0/2", b"text",
            query="algorithm=semantic&provider=voyage",
            headers={"x-provider-key": "k"},
        )
        assert resp.status == 502
        assert json.loads(resp.body)["error"] == "provider"

    def test_missing_key_maps_400(self, tmp_path, stub):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/3", b"text",
                    query="algorithm=semantic&provider=cohere")
        assert resp.status == 400

    def test_unknown_provider_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/4", b"text",
                    query="algorithm=semantic&provider=acme")
        assert resp.status == 400
