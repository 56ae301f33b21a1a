"""Typed results and the error contract for the ucfp client.

Mirrors the SDK surface the reference documents at
web/src/lib/docs/sdk-python.md (TextFingerprint dataclass, UcfpError
fields status/code/message/retry_after_ms/record_id) against the
ucfp-tpu server's wire shapes (server/handlers.py `_ingest_response`,
`describe_record`, watermark report, query `_hit_out`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


class UcfpError(Exception):
    """Raised for every non-2xx API response.

    Fields per the reference SDK doc (sdk-python.md:123): ``status``,
    ``code`` (one of the documented error codes), ``message``,
    ``retry_after_ms`` (populated from the Retry-After header on 429),
    ``record_id`` (populated when the failing call names one).
    """

    def __init__(
        self,
        status: int,
        code: str,
        message: str,
        retry_after_ms: Optional[int] = None,
        record_id: Optional[int] = None,
    ) -> None:
        super().__init__(f"{status} {code}: {message}")
        self.status = status
        self.code = code
        self.message = message
        self.retry_after_ms = retry_after_ms
        self.record_id = record_id


@dataclass
class Fingerprint:
    """One ingest response (server `_ingest_response`).

    The reference doc names the text flavour ``TextFingerprint``
    (sdk-python.md:44-56); image and audio responses carry the same
    shape, so one dataclass serves all three (aliases below).
    """

    tenant_id: int
    record_id: int
    modality: str
    algorithm: str
    format_version: int
    config_hash: int
    fingerprint_bytes: int
    fingerprint_hex: str
    has_embedding: bool
    embedding: Optional[list[float]] = None

    @property
    def fingerprint(self) -> bytes:
        """Raw fingerprint bytes decoded from the hex wire field."""
        return bytes.fromhex(self.fingerprint_hex)

    @property
    def embedding_dim(self) -> Optional[int]:
        return len(self.embedding) if self.embedding is not None else None


# Reference names — same wire shape, kept for drop-in familiarity.
TextFingerprint = Fingerprint
ImageFingerprint = Fingerprint
AudioFingerprint = Fingerprint


@dataclass
class RecordMeta:
    """GET /v1/records/{tid}/{rid} response (describe_record)."""

    tenant_id: int
    record_id: int
    modality: str
    algorithm: str
    config_hash: int
    format_version: int
    fingerprint_bytes: int
    has_embedding: bool
    embedding_dim: int = 0
    metadata_bytes: int = 0
    model_id: Optional[str] = None
    # populated only when requested via include=...
    fingerprint_hex: Optional[str] = None
    embedding: Optional[list[float]] = None

    @property
    def fingerprint(self) -> Optional[bytes]:
        return (
            bytes.fromhex(self.fingerprint_hex)
            if self.fingerprint_hex is not None
            else None
        )


@dataclass
class WatermarkReport:
    """Watermark detection result — no Record is persisted
    (reference audio.rs:333-400)."""

    detected: bool
    payload: Optional[int]
    confidence: float


@dataclass
class TermHit:
    term: str
    idf: float = 0.0
    tf: int = 0
    contribution: float = 0.0


@dataclass
class Hit:
    """One search hit with the optional RRF breakdown fields
    (reference core/mod.rs:107-131)."""

    tenant_id: int
    record_id: int
    score: float
    source: str
    vector_score: Optional[float] = None
    bm25_score: Optional[float] = None
    vector_rank: Optional[int] = None
    bm25_rank: Optional[int] = None
    term_hits: list[TermHit] = field(default_factory=list)


@dataclass
class QueryResult:
    hits: list[Hit]
    approximate: bool = False


@dataclass
class BatchQueryResult:
    """Per-query hit lists from a batched /v1/query (`vectors` or
    `fingerprints_hex`): results[i] corresponds to input i. On the
    server every batch shares one device dispatch — under
    UCFP_KNN_QUANT=int4 this is the fastest serving configuration
    (one packed catalog scan per query block)."""

    results: list[list[Hit]]
    approximate: bool = False


@dataclass
class BatchIngest:
    """Batch text ingest result: `records` were durably committed
    (one WAL group commit), `errors` carries the per-line failures by
    line number — partial success is normal batch behavior, so the
    client returns both instead of throwing away the committed list."""

    records: list[dict]
    errors: list[dict]


@dataclass
class StreamIngest:
    """Audio stream ingest summary: one record per completed segment."""

    segments: int
    records: list[dict]


def _parse_fingerprint(body: dict) -> Fingerprint:
    return Fingerprint(
        tenant_id=int(body["tenant_id"]),
        record_id=int(body["record_id"]),
        modality=body["modality"],
        algorithm=body["algorithm"],
        format_version=int(body["format_version"]),
        config_hash=int(body["config_hash"]),
        fingerprint_bytes=int(body["fingerprint_bytes"]),
        fingerprint_hex=body["fingerprint_hex"],
        has_embedding=bool(body["has_embedding"]),
        embedding=body.get("embedding"),
    )


def _parse_record_meta(body: dict) -> RecordMeta:
    return RecordMeta(
        tenant_id=int(body["tenant_id"]),
        record_id=int(body["record_id"]),
        modality=body["modality"],
        algorithm=body["algorithm"],
        config_hash=int(body["config_hash"]),
        format_version=int(body["format_version"]),
        fingerprint_bytes=int(body["fingerprint_bytes"]),
        has_embedding=bool(body["has_embedding"]),
        embedding_dim=int(body.get("embedding_dim", 0)),
        metadata_bytes=int(body.get("metadata_bytes", 0)),
        model_id=body.get("model_id"),
        fingerprint_hex=body.get("fingerprint_hex"),
        embedding=body.get("embedding"),
    )


def _parse_hit(h: dict) -> Hit:
    return Hit(
        tenant_id=int(h["tenant_id"]),
        record_id=int(h["record_id"]),
        score=float(h["score"]),
        source=h["source"],
        vector_score=h.get("vector_score"),
        bm25_score=h.get("bm25_score"),
        vector_rank=h.get("vector_rank"),
        bm25_rank=h.get("bm25_rank"),
        term_hits=[
            TermHit(
                term=t["term"],
                idf=float(t.get("idf", 0.0)),
                tf=int(t.get("tf", 0)),
                contribution=float(t.get("contribution", 0.0)),
            )
            for t in h.get("term_hits", [])
        ],
    )


def _parse_query(body: dict) -> QueryResult:
    return QueryResult(
        hits=[_parse_hit(h) for h in body.get("hits", [])],
        approximate=bool(body.get("approximate", False)),
    )


def _parse_query_batch(body: dict) -> BatchQueryResult:
    return BatchQueryResult(
        results=[
            [_parse_hit(h) for h in r.get("hits", [])]
            for r in body.get("results", [])
        ],
        approximate=bool(body.get("approximate", False)),
    )


def _parse_watermark(body: dict) -> WatermarkReport:
    return WatermarkReport(
        detected=bool(body["detected"]),
        payload=body.get("payload"),
        confidence=float(body["confidence"]),
    )
