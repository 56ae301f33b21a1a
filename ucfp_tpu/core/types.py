"""Core record / query / hit contract.

Modality-agnostic data model mirroring the reference wire semantics
(reference: src/core/mod.rs:19-205). These are plain Python dataclasses on
the host side; device code never sees them — kernels consume/produce dense
arrays and the host layer wraps them into Records.

Wire invariants kept identical to the reference:
  * Record identity is ``(tenant_id: u32, record_id: u64)``.
  * ``fingerprint`` is raw bytes whose layout is algorithm-defined.
  * ``embedding`` is an optional dense f32 vector used by cosine k-NN.
  * ``config_hash`` marks records for cross-config comparability:
    ``Record.compatible_with`` is the library-level guard. Like the
    reference (whose knn scan also never consults it), the query paths
    do NOT enforce it — use the query ``filter`` on algorithm/model_id
    to scope comparisons (src/core/mod.rs:43-55).
  * ``format_version`` gates resume compatibility.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

FORMAT_VERSION = 1

U32_MAX = 0xFFFF_FFFF
U64_MAX = 0xFFFF_FFFF_FFFF_FFFF


class Modality(enum.Enum):
    """Content modality (reference: src/core/mod.rs Modality enum)."""

    TEXT = "text"
    IMAGE = "image"
    AUDIO = "audio"

    @classmethod
    def parse(cls, s: str) -> "Modality":
        try:
            return cls(s.lower())
        except ValueError:
            from .errors import ModalityError

            raise ModalityError(f"unknown modality: {s!r}")


def _check_u32(name: str, v: int) -> int:
    if not (0 <= v <= U32_MAX):
        raise ValueError(f"{name} out of u32 range: {v}")
    return v


def _check_u64(name: str, v: int) -> int:
    if not (0 <= v <= U64_MAX):
        raise ValueError(f"{name} out of u64 range: {v}")
    return v


@dataclass
class Record:
    """One stored fingerprint row (reference: src/core/mod.rs:34-72)."""

    tenant_id: int
    record_id: int
    modality: Modality
    algorithm: str
    fingerprint: bytes
    format_version: int = FORMAT_VERSION
    config_hash: int = 0
    embedding: Optional[list[float]] = None
    model_id: Optional[str] = None
    metadata: bytes = b""
    text: Optional[str] = None

    def __post_init__(self) -> None:
        _check_u32("tenant_id", self.tenant_id)
        _check_u64("record_id", self.record_id)
        _check_u64("config_hash", self.config_hash)
        if isinstance(self.modality, str):
            self.modality = Modality.parse(self.modality)

    def compatible_with(self, other: "Record") -> bool:
        """Two records are comparable only when algorithm + config match
        (reference: src/core/mod.rs:43-55)."""
        return (
            self.modality == other.modality
            and self.algorithm == other.algorithm
            and self.config_hash == other.config_hash
            and self.format_version == other.format_version
        )


@dataclass
class FingerprintMeta:
    """Catalog metadata for a stored record (src/core/mod.rs:81-104)."""

    tenant_id: int
    record_id: int
    modality: Modality
    algorithm: str
    config_hash: int
    format_version: int
    fingerprint_bytes: int
    has_embedding: bool
    model_id: Optional[str] = None


class HitSource(enum.Enum):
    """Which retrieval leg produced a hit (src/core/mod.rs HitSource)."""

    VECTOR = "vector"
    BM25 = "bm25"
    FUSED = "fused"


@dataclass
class TermHit:
    """Per-term BM25 contribution for explain mode (src/core/mod.rs:195-205)."""

    term: str
    tf: int
    idf: float
    contribution: float


@dataclass
class Hit:
    """One search result with optional RRF breakdown (src/core/mod.rs:107-131)."""

    record_id: int
    score: float
    source: HitSource = HitSource.VECTOR
    vector_score: Optional[float] = None
    bm25_score: Optional[float] = None
    vector_rank: Optional[int] = None
    bm25_rank: Optional[int] = None
    term_hits: Optional[list[TermHit]] = None


@dataclass
class Query:
    """Hybrid retrieval request (src/core/mod.rs:153-189)."""

    tenant_id: int
    modality: Modality
    k: int = 10
    vector: Optional[list[float]] = None
    terms: list[str] = field(default_factory=list)
    filter: Optional[dict] = None
    rrf_k: int = 60
    explain: bool = False
    # per-request sketch pool override (extension): None = the backend
    # default. Serving exposes only a fixed tier ladder so distinct
    # values cannot force unbounded kernel recompiles.
    pool_frac: Optional[float] = None

    def __post_init__(self) -> None:
        _check_u32("tenant_id", self.tenant_id)
        if isinstance(self.modality, str):
            self.modality = Modality.parse(self.modality)
        if self.k < 1:
            self.k = 1
        if self.rrf_k < 0:
            # rrf_k = -1 would divide by zero at rank 1 in the fusion;
            # other negatives silently invert the ranking
            raise ValueError("rrf_k must be >= 0")
