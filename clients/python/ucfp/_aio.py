"""Async client (`UcfpAsync`) — same surface as `Ucfp`, every method
`async`, every iterator an async iterator (sdk-python.md:137-151).
Requires `httpx`.
"""

from __future__ import annotations

import asyncio
import json
from pathlib import Path
from typing import Any, AsyncIterator, Iterable, Optional, Union

from . import _common as c
from ._types import (
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
except ImportError:  # pragma: no cover
    _httpx = None


async def _aiter(items) -> AsyncIterator:
    """Adapt a sync or async iterable to an async iterator."""
    if hasattr(items, "__aiter__"):
        async for x in items:
            yield x
    else:
        for x in items:
            yield x


class UcfpAsync:
    """Async UCFP client.

    >>> async with UcfpAsync(api_key="ucfp_...") as client:
    ...     fp = await client.text("hello")
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
        if _httpx is None:
            raise RuntimeError("UcfpAsync requires httpx")
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.tenant_id = tenant_id
        self.retries = retries
        self._http = _httpx.AsyncClient(
            base_url=self.base_url, timeout=timeout_s, transport=transport
        )

    async def aclose(self) -> None:
        await self._http.aclose()

    async def __aenter__(self) -> "UcfpAsync":
        return self

    async def __aexit__(self, *exc: Any) -> None:
        await self.aclose()

    async def _request(
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
        hdrs = (
            {"authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        )
        if headers:
            hdrs.update(headers)
        if json_body is not None:
            content = json.dumps(json_body).encode("utf-8")
            hdrs["content-type"] = "application/json"
        last: Optional[UcfpError] = None
        for attempt in range(self.retries + 1):
            r = await self._http.request(
                method, path, params=params, content=content, headers=hdrs
            )
            try:
                c.raise_for_response(r.status_code, r.headers, r.content, record_id)
                return json.loads(r.content) if r.content else {}
            except UcfpError as e:
                last = e
                if attempt < self.retries and c.should_retry(r.status_code):
                    await asyncio.sleep(
                        c.backoff_seconds(attempt, e.retry_after_ms)
                    )
                    continue
                raise
        raise last  # pragma: no cover

    # -- public -----------------------------------------------------------------

    async def healthz(self) -> dict:
        return await self._request("GET", "/healthz")

    async def info(self) -> dict:
        return await self._request("GET", "/v1/info")

    async def algorithms(self) -> dict:
        return await self._request("GET", "/v1/algorithms")

    # -- text -------------------------------------------------------------------

    async def text(
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
        out = await self._request("POST", path, params=params, content=body)
        return _parse_fingerprint(out)

    async def text_stream(
        self, inputs, *, concurrency: int = 1, **kwargs: Any
    ) -> AsyncIterator[Fingerprint]:
        """Fingerprint each input, yielding results in input order.

        With concurrency > 1 up to that many requests are in flight at
        once (results still arrive in order).
        """
        if concurrency <= 1:
            async for doc in _aiter(inputs):
                yield await self.text(doc, **kwargs)
            return
        pending: list[asyncio.Task] = []
        try:
            async for doc in _aiter(inputs):
                pending.append(asyncio.ensure_future(self.text(doc, **kwargs)))
                while len(pending) >= concurrency:
                    yield await pending.pop(0)
            while pending:
                yield await pending.pop(0)
        finally:
            # one failure (or the consumer breaking out) must not leak
            # the in-flight requests
            for t in pending:
                t.cancel()
            if pending:
                await asyncio.gather(*pending, return_exceptions=True)

    async def text_stream_chunks(
        self,
        chunks,
        *,
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        **kwargs: Any,
    ) -> Fingerprint:
        tid = self.tenant_id if tenant_id is None else tenant_id
        rid = record_id if record_id is not None else c.new_record_id()
        path, params, _ = c.text_request(tid, rid, "", "minhash", **kwargs)
        parts = [chunk async for chunk in _aiter(chunks)]
        out = await self._request(
            "POST", path + "/stream", params=params,
            content=c.ndjson_chunks(parts), record_id=rid,
        )
        return _parse_fingerprint(out)

    # -- image ------------------------------------------------------------------

    async def image(
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
        out = await self._request("POST", path, params=params, content=body)
        return _parse_fingerprint(out)

    # -- audio ------------------------------------------------------------------

    async def audio(
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
        out = await self._request("POST", path, params=params, content=body)
        return _parse_fingerprint(out)

    async def audio_watermark(
        self,
        audio: c.AudioSource,
        *,
        sample_rate: Optional[int] = None,
        threshold: Optional[float] = None,
        tenant_id: Optional[int] = None,
    ) -> WatermarkReport:
        tid = self.tenant_id if tenant_id is None else tenant_id
        tunables = {"threshold": threshold} if threshold is not None else None
        path, params, body = c.audio_request(
            tid, None, audio, "watermark",
            sample_rate=sample_rate, tunables=tunables,
        )
        out = await self._request("POST", path, params=params, content=body)
        return _parse_watermark(out)

    async def audio_stream(
        self,
        chunks,
        *,
        sample_rate: int,
        record_id: Optional[int] = None,
        tenant_id: Optional[int] = None,
        segment_secs: Optional[float] = None,
        algorithm: Optional[str] = None,
    ) -> StreamIngest:
        tid = self.tenant_id if tenant_id is None else tenant_id
        rid = record_id if record_id is not None else c.new_record_id()
        params = {"sample_rate": str(sample_rate)}
        if segment_secs is not None:
            params["segment_secs"] = str(segment_secs)
        if algorithm is not None:  # wang (default) | panako
            params["algorithm"] = algorithm
        body = b"".join([chunk async for chunk in _aiter(chunks)])
        out = await self._request(
            "POST", f"/v1/ingest/audio/{tid}/{rid}/stream",
            params=params, content=body, record_id=rid,
        )
        return StreamIngest(
            segments=int(out["segments"]), records=out.get("records", [])
        )

    # -- records ----------------------------------------------------------------

    async def list_records(
        self, *, tenant_id: Optional[int] = None, offset: int = 0,
        limit: int = 50,
    ) -> dict:
        tid = self.tenant_id if tenant_id is None else tenant_id
        return await self._request(
            "GET", f"/v1/records/{tid}",
            params={"offset": str(offset), "limit": str(limit)},
        )

    async def get_record(
        self, record_id: int, *, tenant_id: Optional[int] = None,
        include: Optional[str] = None,
    ) -> RecordMeta:
        tid = self.tenant_id if tenant_id is None else tenant_id
        out = await self._request(
            "GET", f"/v1/records/{tid}/{int(record_id)}",
            params={"include": include} if include else None,
            record_id=int(record_id),
        )
        return _parse_record_meta(out)

    async def delete_record(
        self, record_id: int, *, tenant_id: Optional[int] = None
    ) -> None:
        tid = self.tenant_id if tenant_id is None else tenant_id
        await self._request(
            "DELETE", f"/v1/records/{tid}/{int(record_id)}",
            record_id=int(record_id),
        )

    async def upsert_records(self, records: list[dict]) -> dict:
        return await self._request(
            "PUT", "/v1/records", json_body={"records": records}
        )

    # -- search -----------------------------------------------------------------

    async def query(
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
        out = await self._request(
            "POST", "/v1/query", params=params or None, json_body=body
        )
        return _parse_query(out)

    async def query_batch(
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
        """Batched similarity query — see Ucfp.query_batch."""
        tid = self.tenant_id if tenant_id is None else tenant_id
        body = c.query_batch_body(
            tid, modality, k=k, vectors=vectors, fingerprints=fingerprints,
            algorithm=algorithm, multihash=multihash, filter=filter,
            recall_tier=recall_tier,
        )
        out = await self._request("POST", "/v1/query", json_body=body)
        return _parse_query_batch(out)

    # -- pipeline inspection ------------------------------------------------------

    async def inspect_text(self, text: Union[str, bytes], **params: Any) -> dict:
        body = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        return await self._request(
            "POST", "/v1/pipeline/inspect/text",
            params={k: str(v) for k, v in params.items()} or None, content=body,
        )

    async def inspect_image(self, image: c.ImageSource, **params: Any) -> dict:
        if isinstance(image, Path):
            image = image.read_bytes()
        return await self._request(
            "POST", "/v1/pipeline/inspect/image",
            params={k: str(v) for k, v in params.items()} or None,
            content=bytes(image),
        )

    async def inspect_audio(
        self, audio: c.AudioSource, *, sample_rate: Optional[int] = None,
        **params: Any,
    ) -> dict:
        pcm, sr = c.audio_payload(audio, sample_rate)
        q = {"sample_rate": str(sr)}
        q.update({k: str(v) for k, v in params.items()})
        return await self._request(
            "POST", "/v1/pipeline/inspect/audio", params=q, content=pcm
        )
