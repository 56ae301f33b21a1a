"""Synchronous client (`Ucfp`).

Thin transport over `_common` request shaping. Uses `httpx` when
installed (the reference SDK's only dependency, sdk-python.md:9); falls
back to the stdlib `urllib` so the package works with no deps at all.
Retries 5xx + 429 with exponential backoff, honouring Retry-After
(sdk-python.md:132).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Iterable, Iterator, Optional, Union

from . import _common as c
from ._types import (
    BatchIngest,
    BatchQueryResult,
    Fingerprint,
    QueryResult,
    RecordMeta,
    StreamIngest,
    UcfpError,
    WatermarkReport,
    _parse_fingerprint,
    _parse_query,
    _parse_query_batch,
    _parse_record_meta,
    _parse_watermark,
)

try:
    import httpx as _httpx
except ImportError:  # pragma: no cover - httpx is present in CI
    _httpx = None


class Ucfp:
    """Synchronous UCFP client (reference surface: sdk-python.md).

    >>> client = Ucfp(api_key="ucfp_...", base_url="http://host:8080")
    >>> fp = client.text("The quick brown fox.")
    >>> fp.algorithm
    'minhash-h128'
    """

    def __init__(
        self,
        api_key: str,
        *,
        base_url: str = c.DEFAULT_BASE_URL,
        tenant_id: int = 0,
        timeout_s: float = 30.0,
        retries: int = 3,
        transport: Any = None,
    ) -> None:
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.tenant_id = tenant_id
        self.timeout_s = timeout_s
        self.retries = retries
        if _httpx is not None:
            self._http = _httpx.Client(
                base_url=self.base_url,
                timeout=timeout_s,
                transport=transport,
            )
        else:
            if transport is not None:
                raise RuntimeError("transport override requires httpx")
            self._http = None

    # -- plumbing ---------------------------------------------------------------

    def close(self) -> None:
        if self._http is not None:
            self._http.close()

    def __enter__(self) -> "Ucfp":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()

    def _headers(self, extra: Optional[dict] = None) -> dict:
        # no header at all for keyless clients (public routes / demo
        # path) — an empty "Bearer " is an illegal header value
        h = {"authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        if extra:
            h.update(extra)
        return h

    def _urllib_request(
        self, method: str, path: str, params: dict, content: bytes, headers: dict
    ) -> tuple[int, dict, bytes]:
        import urllib.error
        import urllib.parse
        import urllib.request

        url = self.base_url + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        req = urllib.request.Request(url, data=content or None, method=method)
        for k, v in headers.items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, dict(resp.headers.items()), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers.items()), e.read()

    def _request(
        self,
        method: str,
        path: str,
        *,
        params: Optional[dict] = None,
        content: bytes = b"",
        json_body: Any = None,
        headers: Optional[dict] = None,
        record_id: Optional[int] = None,
    ) -> dict:
        hdrs = self._headers(headers)
        if json_body is not None:
            content = json.dumps(json_body).encode("utf-8")
            hdrs["content-type"] = "application/json"
        last: Optional[UcfpError] = None
        for attempt in range(self.retries + 1):
            if self._http is not None:
                r = self._http.request(
                    method, path, params=params, content=content, headers=hdrs
                )
                status, rheaders, body = r.status_code, r.headers, r.content
            else:
                status, raw_headers, body = self._urllib_request(
                    method, path, params or {}, content, hdrs
                )
                rheaders = {k.lower(): v for k, v in raw_headers.items()}
            try:
                c.raise_for_response(status, rheaders, body, record_id)
                return json.loads(body) if body else {}
            except UcfpError as e:
                last = e
                if attempt < self.retries and c.should_retry(status):
                    time.sleep(c.backoff_seconds(attempt, e.retry_after_ms))
                    continue
                raise
        raise last  # pragma: no cover - loop always returns or raises

    # -- public (unauthenticated) -----------------------------------------------

    def healthz(self) -> dict:
        return self._request("GET", "/healthz")

    def info(self) -> dict:
        return self._request("GET", "/v1/info")

    def algorithms(self) -> dict:
        """GET /v1/algorithms — the machine-readable tunables manifest."""
        return self._request("GET", "/v1/algorithms")

    # -- text -------------------------------------------------------------------

    def text(
        self,
        text: Union[str, bytes],
        *,
        algorithm: str = "minhash",
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        h: Optional[int] = None,
        k: Optional[int] = None,
        tokenizer: Optional[str] = None,
        canonicalizer: Optional[dict] = None,
        preprocess: Optional[str] = None,
        provider: Optional[str] = None,
        model_id: Optional[str] = None,
        return_embedding: bool = False,
        **tunables: Any,
    ) -> Fingerprint:
        tid = self.tenant_id if tenant_id is None else tenant_id
        path, params, body = c.text_request(
            tid, record_id, text, algorithm,
            h=h, k=k, tokenizer=tokenizer, canonicalizer=canonicalizer,
            preprocess=preprocess, provider=provider, model_id=model_id,
            return_embedding=return_embedding, extra_params=tunables,
        )
        out = self._request("POST", path, params=params, content=body)
        return _parse_fingerprint(out)

    def text_stream(
        self, inputs: Iterable[Union[str, bytes]], **kwargs: Any
    ) -> Iterator[Fingerprint]:
        """Fingerprint each input lazily (sdk-python.md:60-64): one
        fingerprint per document, yielded as responses arrive."""
        for doc in inputs:
            yield self.text(doc, **kwargs)

    def text_stream_chunks(
        self,
        chunks: Iterable[str],
        *,
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        **kwargs: Any,
    ) -> Fingerprint:
        """Stream ONE long document as NDJSON chunks through the
        server's buffered StreamingMinHash session
        (POST /v1/ingest/text/{tid}/{rid}/stream)."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        rid = record_id if record_id is not None else c.new_record_id()
        path, params, _ = c.text_request(tid, rid, "", "minhash", **kwargs)
        out = self._request(
            "POST", path + "/stream", params=params,
            content=c.ndjson_chunks(chunks), record_id=rid,
        )
        return _parse_fingerprint(out)

    # -- image ------------------------------------------------------------------

    def image(
        self,
        image: c.ImageSource,
        *,
        algorithm: str = "multi",
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        preprocess: Optional[dict] = None,
        model_id: Optional[str] = None,
        return_embedding: bool = False,
    ) -> Fingerprint:
        tid = self.tenant_id if tenant_id is None else tenant_id
        path, params, body = c.image_request(
            tid, record_id, image, algorithm,
            preprocess=preprocess, model_id=model_id,
            return_embedding=return_embedding,
        )
        out = self._request("POST", path, params=params, content=body)
        return _parse_fingerprint(out)

    def image_batch(
        self,
        images: "list[tuple[int, c.ImageSource]]",
        *,
        algorithm: str = "multi",
        tenant_id: Optional[int] = None,
        preprocess: Optional[dict] = None,
    ) -> "list[dict]":
        """High-throughput batch ingest (up to 1024 images per request):
        one device hash batch + one WAL group commit server-side.
        images = [(record_id, bytes-or-Path), ...]. Returns the per-image
        record list [{record_id, fingerprint_hex, fingerprint_bytes}]."""
        import struct
        from pathlib import Path

        if not images:
            return []
        if len(images) > 1024:
            raise ValueError("batch exceeds 1024 images")
        tid = self.tenant_id if tenant_id is None else tenant_id
        params: dict = {"algorithm": algorithm}
        if preprocess:
            for key in ("max_input_bytes", "max_dimension", "min_dimension"):
                if key in preprocess:
                    params[key] = str(int(preprocess[key]))
        body = bytearray()
        for rid, img in images:
            data = img.read_bytes() if isinstance(img, Path) else bytes(img)
            body += struct.pack("<QI", rid, len(data))
            body += data
        out = self._request(
            "POST", f"/v1/ingest/image/batch/{tid}", params=params,
            content=bytes(body),
        )
        return out["records"]

    def audio_batch(
        self,
        clips: "list[tuple[int, 'c.AudioSource']]",
        *,
        sample_rate: int,
        algorithm: str = "wang",
        tenant_id: Optional[int] = None,
        tunables: Optional[dict] = None,
        encoding: str = "f32",
    ) -> "list[dict]":
        """High-throughput batch audio ingest (up to 256 clips per
        request, one shared sample_rate): equal-length clips ride one
        vmapped device dispatch per stage server-side, and the batch
        commits in one WAL round. clips = [(record_id, f32-PCM bytes or
        numpy array), ...]; algorithm wang|panako|haitsma.
        encoding="s16" halves the wire bytes for 16-bit-sourced clips
        (int16 arrays / raw s16 bytes / 16-bit mono WAV) and is exactly
        value-identical server-side. Records are bit-identical to the
        single route's. Returns the record list
        [{record_id, fingerprint_hex, fingerprint_bytes}]."""
        import struct

        if not clips:
            return []
        if len(clips) > 256:
            raise ValueError("batch exceeds 256 clips")
        tid = self.tenant_id if tenant_id is None else tenant_id
        params: dict = {
            "sample_rate": str(int(sample_rate)), "algorithm": algorithm
        }
        if encoding != "f32":
            params["encoding"] = encoding
        for key, val in (tunables or {}).items():
            params[key] = str(val)
        body = bytearray()
        for rid, clip in clips:
            data, _sr = c.audio_payload(clip, sample_rate, encoding)
            body += struct.pack("<QI", rid, len(data))
            body += data
        out = self._request(
            "POST", f"/v1/ingest/audio/batch/{tid}", params=params,
            content=bytes(body),
        )
        return out["records"]

    def text_batch(
        self,
        docs: "list[tuple[int, str]]",
        *,
        algorithm: str = "minhash",
        tenant_id: Optional[int] = None,
    ) -> "BatchIngest":
        """High-throughput batch text ingest (up to 1024 documents per
        request): one WAL group commit server-side. docs =
        [(record_id, text), ...]. Returns a BatchIngest with BOTH the
        durably-committed records and the per-line failures — partial
        success commits the valid remainder, and throwing would discard
        the record of what succeeded. An all-rows-failed batch (400)
        raises UcfpError like any other error response."""
        if not docs:
            return BatchIngest(records=[], errors=[])
        if len(docs) > 1024:
            raise ValueError("batch exceeds 1024 documents")
        tid = self.tenant_id if tenant_id is None else tenant_id
        body = "".join(
            json.dumps({"record_id": rid, "text": text}) + "\n"
            for rid, text in docs
        ).encode("utf-8")
        out = self._request(
            "POST", f"/v1/ingest/text/batch/{tid}",
            params={"algorithm": algorithm}, content=body,
        )
        return BatchIngest(records=out.get("records", []),
                           errors=out.get("errors", []))

    def embedding_batch(
        self,
        rows: "list[tuple[int, 'c.FloatRow']]",
        *,
        algorithm: str = "embedding-local",
        model_id: Optional[str] = None,
        modality: str = "text",
        config_hash: int = 0,
        tenant_id: Optional[int] = None,
    ) -> dict:
        """High-throughput bulk load of pre-computed embeddings (up to
        4096 rows per request): binary f32 frames -> one WAL run commit
        server-side, no JSON float parsing anywhere on the path. rows =
        [(record_id, vector), ...] with every vector the same dim;
        values are stored as f32 (each row's stored fingerprint is its
        f32-LE bytes, like the semantic routes). Returns
        {count, dim, algorithm}."""
        import struct

        if not rows:
            return {"count": 0, "dim": 0, "algorithm": algorithm}
        if len(rows) > 4096:
            raise ValueError("batch exceeds 4096 rows")
        tid = self.tenant_id if tenant_id is None else tenant_id
        params: dict = {"algorithm": algorithm, "modality": modality}
        if model_id:
            params["model_id"] = model_id
        if config_hash:
            params["config_hash"] = str(int(config_hash))
        body = bytearray()
        for rid, vec in rows:
            data = c.f32_row_bytes(vec)
            body += struct.pack("<QI", int(rid), len(data))
            body += data
        return self._request(
            "POST", f"/v1/ingest/embedding/batch/{tid}", params=params,
            content=bytes(body),
        )

    # -- audio ------------------------------------------------------------------

    def audio(
        self,
        audio: c.AudioSource,
        *,
        algorithm: str = "wang",
        sample_rate: Optional[int] = None,
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        return_embedding: bool = False,
        encoding: str = "f32",
        **tunables: Any,
    ) -> Fingerprint:
        tid = self.tenant_id if tenant_id is None else tenant_id
        path, params, body = c.audio_request(
            tid, record_id, audio, algorithm,
            sample_rate=sample_rate, tunables=tunables,
            return_embedding=return_embedding, encoding=encoding,
        )
        out = self._request("POST", path, params=params, content=body)
        return _parse_fingerprint(out)

    def audio_watermark(
        self,
        audio: c.AudioSource,
        *,
        key: str,
        sample_rate: Optional[int] = None,
        threshold: Optional[float] = None,
        tenant_id: Optional[int] = None,
    ) -> WatermarkReport:
        """Detect a spread-spectrum watermark. `key` is the per-tenant
        secret the mark was embedded with — sent as the X-Watermark-Key
        header, never in the URL."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        tunables = {"threshold": threshold} if threshold is not None else None
        path, params, body = c.audio_request(
            tid, None, audio, "watermark",
            sample_rate=sample_rate, tunables=tunables,
        )
        out = self._request("POST", path, params=params, content=body,
                            headers={"x-watermark-key": key})
        return _parse_watermark(out)

    def audio_stream(
        self,
        chunks: Iterable[bytes],
        *,
        sample_rate: int,
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        segment_secs: Optional[float] = None,
        algorithm: Optional[str] = None,
    ) -> StreamIngest:
        """Stream raw f32-LE PCM chunks through the Wang streaming
        session (POST /v1/ingest/audio/{tid}/{rid}/stream); each
        completed segment becomes its own Record server-side."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        rid = record_id if record_id is not None else c.new_record_id()
        params = {"sample_rate": str(sample_rate)}
        if segment_secs is not None:
            params["segment_secs"] = str(segment_secs)
        if algorithm is not None:  # wang (default) | panako
            params["algorithm"] = algorithm
        body = b"".join(chunks)
        out = self._request(
            "POST", f"/v1/ingest/audio/{tid}/{rid}/stream",
            params=params, content=body, record_id=rid,
        )
        return StreamIngest(
            segments=int(out["segments"]), records=out.get("records", [])
        )

    # -- records ----------------------------------------------------------------

    def list_records(
        self, *, tenant_id: Optional[int] = None, offset: int = 0,
        limit: int = 50,
    ) -> dict:
        """GET /v1/records/{tenant}: paginated insertion-order listing
        -> {"records": [...], "total", "offset", "limit"}."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        return self._request(
            "GET", f"/v1/records/{tid}",
            params={"offset": str(offset), "limit": str(limit)},
        )

    def get_record(
        self, record_id: int, *, tenant_id: Optional[int] = None,
        include: Optional[str] = None,
    ) -> RecordMeta:
        """Describe a record. include="fingerprint" or
        "fingerprint,embedding" also returns the stored bytes."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        out = self._request(
            "GET", f"/v1/records/{tid}/{int(record_id)}",
            params={"include": include} if include else None,
            record_id=int(record_id),
        )
        return _parse_record_meta(out)

    def delete_record(
        self, record_id: int, *, tenant_id: Optional[int] = None
    ) -> None:
        tid = self.tenant_id if tenant_id is None else tenant_id
        self._request(
            "DELETE", f"/v1/records/{tid}/{int(record_id)}",
            record_id=int(record_id),
        )

    def upsert_records(self, records: list[dict]) -> dict:
        """PUT /v1/records with the reference UpsertRequest envelope."""
        return self._request(
            "PUT", "/v1/records", json_body={"records": records}
        )

    # -- search -----------------------------------------------------------------

    def query(
        self,
        modality: str,
        *,
        k: int = 10,
        vector: Optional[list[float]] = None,
        terms: Optional[list[str]] = None,
        fingerprint: Optional[Union[bytes, str]] = None,
        algorithm: Optional[str] = None,
        tenant_id: Optional[int] = None,
        rrf_k: int = 60,
        explain: bool = False,
        rerank: Optional[str] = None,
        multihash: Optional[dict] = None,
        filter: Optional[dict] = None,
        recall_tier: Optional[str] = None,
    ) -> QueryResult:
        tid = self.tenant_id if tenant_id is None else tenant_id
        body = c.query_body(
            tid, modality, k=k, vector=vector, terms=terms,
            fingerprint=fingerprint, algorithm=algorithm, rrf_k=rrf_k,
            multihash=multihash, filter=filter, recall_tier=recall_tier,
        )
        params: dict[str, str] = {}
        if explain:
            params["explain"] = "1"
        if rerank:
            params["rerank"] = rerank
        out = self._request(
            "POST", "/v1/query", params=params or None, json_body=body
        )
        return _parse_query(out)

    def query_batch(
        self,
        modality: str,
        *,
        k: int = 10,
        vectors: Optional[list[list[float]]] = None,
        fingerprints: Optional[list[Union[bytes, str]]] = None,
        algorithm: Optional[str] = None,
        tenant_id: Optional[int] = None,
        multihash: Optional[dict] = None,
        filter: Optional[dict] = None,
        recall_tier: Optional[str] = None,
    ) -> BatchQueryResult:
        """Batched similarity query: every vector (or fingerprint)
        shares ONE device dispatch on the server — the highest-
        throughput query path (at most 256 per batch). Pass exactly one
        of vectors= / fingerprints= (the latter requires algorithm;
        friendly ids like "phash" are accepted)."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        body = c.query_batch_body(
            tid, modality, k=k, vectors=vectors, fingerprints=fingerprints,
            algorithm=algorithm, multihash=multihash, filter=filter,
            recall_tier=recall_tier,
        )
        out = self._request("POST", "/v1/query", json_body=body)
        return _parse_query_batch(out)

    # -- pipeline inspection ------------------------------------------------------

    def inspect_text(self, text: Union[str, bytes], **params: Any) -> dict:
        body = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        return self._request(
            "POST", "/v1/pipeline/inspect/text",
            params={k: str(v) for k, v in params.items()} or None, content=body,
        )

    def inspect_image(self, image: c.ImageSource, **params: Any) -> dict:
        if isinstance(image, Path):
            image = image.read_bytes()
        return self._request(
            "POST", "/v1/pipeline/inspect/image",
            params={k: str(v) for k, v in params.items()} or None,
            content=bytes(image),
        )

    def inspect_audio(
        self, audio: c.AudioSource, *, sample_rate: Optional[int] = None,
        **params: Any,
    ) -> dict:
        pcm, sr = c.audio_payload(audio, sample_rate)
        q = {"sample_rate": str(sr)}
        q.update({k: str(v) for k, v in params.items()})
        return self._request(
            "POST", "/v1/pipeline/inspect/audio", params=q, content=pcm
        )
