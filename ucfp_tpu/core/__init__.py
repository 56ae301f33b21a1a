"""Core types and errors (layer 1)."""

from .errors import (
    ALL_ERRORS,
    ForbiddenError,
    IncompatibleError,
    IndexError_,
    IngestError,
    IoError,
    ModalityError,
    ProviderError,
    RecordNotFound,
    RerankError,
    UcfpError,
    UnsupportedError,
)
from .types import (
    FORMAT_VERSION,
    FingerprintMeta,
    Hit,
    HitSource,
    Modality,
    Query,
    Record,
    TermHit,
)

__all__ = [
    "FORMAT_VERSION",
    "FingerprintMeta",
    "Hit",
    "HitSource",
    "Modality",
    "Query",
    "Record",
    "TermHit",
    "UcfpError",
    "ModalityError",
    "ProviderError",
    "IncompatibleError",
    "IndexError_",
    "IngestError",
    "RerankError",
    "IoError",
    "RecordNotFound",
    "UnsupportedError",
    "ForbiddenError",
    "ALL_ERRORS",
]
