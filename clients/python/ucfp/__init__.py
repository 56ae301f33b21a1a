"""ucfp — Python client for the UCFP content-fingerprinting API.

Synchronous (`Ucfp`) and async (`UcfpAsync`) clients plus bulk helpers,
matching the surface the reference documents at
web/src/lib/docs/sdk-python.md. Works against any UCFP deployment —
hosted or the self-run ucfp-tpu server (`python -m ucfp_tpu.server`).

    from ucfp import Ucfp

    client = Ucfp(api_key="ucfp_...", base_url="http://localhost:8080")
    fp = client.text("The quick brown fox.")
    print(fp.algorithm, fp.fingerprint_bytes)
"""

from ._aio import UcfpAsync
from ._bulk import BulkResult, BulkSource, bulk_audio, bulk_image, bulk_text
from ._client import Ucfp
from ._types import (
    AudioFingerprint,
    Fingerprint,
    Hit,
    ImageFingerprint,
    BatchIngest,
    BatchQueryResult,
    QueryResult,
    RecordMeta,
    StreamIngest,
    TermHit,
    TextFingerprint,
    UcfpError,
    WatermarkReport,
)

__version__ = "0.2.0"

__all__ = [
    "Ucfp",
    "UcfpAsync",
    "UcfpError",
    "Fingerprint",
    "TextFingerprint",
    "ImageFingerprint",
    "AudioFingerprint",
    "RecordMeta",
    "WatermarkReport",
    "Hit",
    "TermHit",
    "QueryResult",
    "BatchQueryResult",
    "BatchIngest",
    "StreamIngest",
    "BulkResult",
    "BulkSource",
    "bulk_text",
    "bulk_image",
    "bulk_audio",
]
