"""Request shaping shared by the sync and async clients.

Every helper here is pure (no I/O): it turns SDK-level arguments into
(path, query-params, headers, body) tuples against the ucfp-tpu route
contract (server/app.py routes, handlers.py parameter names), and turns
raw response bodies back into typed results. The sync (`Ucfp`) and
async (`UcfpAsync`) clients are thin transports over these.
"""

from __future__ import annotations

import json
import secrets
from pathlib import Path
from typing import Any, Iterable, Optional, Union

from ._types import UcfpError

DEFAULT_BASE_URL = "http://127.0.0.1:8080"

AudioSource = Union[bytes, bytearray, memoryview, Path, "Any"]
ImageSource = Union[bytes, bytearray, memoryview, Path]
# an embedding row: float sequence, numpy array, or pre-packed f32-LE bytes
FloatRow = Union[bytes, bytearray, "Any"]


def f32_row_bytes(vec: FloatRow) -> bytes:
    """Little-endian f32 bytes of one embedding row. Accepts a float
    sequence, a numpy array (any float dtype), or already-packed bytes
    (validated to be f32-aligned). numpy is optional — plain sequences
    pack via struct."""
    if isinstance(vec, (bytes, bytearray, memoryview)):
        b = bytes(vec)
        if not b or len(b) % 4:
            raise ValueError("packed row must be non-empty f32-LE bytes")
        return b
    tolist = getattr(vec, "tobytes", None)
    if tolist is not None and getattr(vec, "dtype", None) is not None:
        import numpy as np  # only reached for actual arrays

        return np.ascontiguousarray(vec, dtype="<f4").tobytes()
    import struct

    seq = list(vec)
    if not seq:
        raise ValueError("empty embedding row")
    return struct.pack(f"<{len(seq)}f", *seq)


def new_record_id() -> int:
    """Collision-resistant u53 record id for callers that don't pass one.

    The server keys records (tenant_id:u32, record_id:u64); the hosted
    reference auto-assigns ids on the proxy path, so the SDK does the
    same client-side. 53 bits (not 63) so the id survives a JSON
    round trip through JavaScript consumers exactly.
    """
    return secrets.randbits(53) | 1


def _qbool(v: bool) -> str:
    return "1" if v else "0"


def canonicalizer_params(canonicalizer: Optional[dict]) -> dict[str, str]:
    """Map the SDK-doc canonicalizer object (sdk-python.md:40) onto the
    server's canon_* query params (handlers._text_opts)."""
    if not canonicalizer:
        return {}
    out: dict[str, str] = {}
    mapping = {
        "normalization": "canon_normalization",
        "case_fold": "canon_case_fold",
        "strip_bidi": "canon_strip_bidi",
        "strip_format": "canon_strip_format",
        "apply_confusable": "canon_apply_confusable",
    }
    for key, val in canonicalizer.items():
        param = mapping.get(key)
        if param is None:
            raise ValueError(f"unknown canonicalizer knob {key!r}")
        if isinstance(val, bool):
            out[param] = _qbool(val)
        else:
            out[param] = str(val).lower()
    return out


def text_request(
    tenant_id: int,
    record_id: Optional[int],
    text: Union[str, bytes],
    algorithm: str,
    *,
    h: Optional[int] = None,
    k: Optional[int] = None,
    tokenizer: Optional[str] = None,
    canonicalizer: Optional[dict] = None,
    preprocess: Optional[str] = None,
    provider: Optional[str] = None,
    model_id: Optional[str] = None,
    return_embedding: bool = False,
    extra_params: Optional[dict] = None,
) -> tuple[str, dict, bytes]:
    rid = record_id if record_id is not None else new_record_id()
    params: dict[str, str] = {"algorithm": algorithm}
    if h is not None:
        params["h"] = str(h)
    if k is not None:
        params["k"] = str(k)
    if tokenizer is not None:
        params["tokenizer"] = tokenizer.lower()
    if preprocess is not None:
        params["preprocess"] = preprocess
    if provider is not None:
        params["provider"] = provider
    if model_id is not None:
        params["model_id"] = model_id
    if return_embedding:
        params["return_embedding"] = "1"
    params.update(canonicalizer_params(canonicalizer))
    if extra_params:
        params.update({k2: str(v) for k2, v in extra_params.items()})
    body = text.encode("utf-8") if isinstance(text, str) else bytes(text)
    return f"/v1/ingest/text/{tenant_id}/{rid}", params, body


def image_request(
    tenant_id: int,
    record_id: Optional[int],
    image: ImageSource,
    algorithm: str,
    *,
    preprocess: Optional[dict] = None,
    model_id: Optional[str] = None,
    return_embedding: bool = False,
) -> tuple[str, dict, bytes]:
    if isinstance(image, Path):
        image = image.read_bytes()
    rid = record_id if record_id is not None else new_record_id()
    params: dict[str, str] = {"algorithm": algorithm}
    if preprocess:
        for key in ("max_input_bytes", "max_dimension", "min_dimension"):
            if key in preprocess:
                params[key] = str(int(preprocess[key]))
        unknown = set(preprocess) - {
            "max_input_bytes", "max_dimension", "min_dimension"
        }
        if unknown:
            raise ValueError(f"unknown preprocess knobs {sorted(unknown)}")
    if model_id is not None:
        params["model_id"] = model_id
    if return_embedding:
        params["return_embedding"] = "1"
    return f"/v1/ingest/image/{tenant_id}/{rid}", params, bytes(image)


def decode_wav(data: bytes) -> tuple[bytes, int]:
    """Decode a RIFF/WAVE container to mono f32-LE PCM + sample rate.

    The server's audio routes take raw f32-LE samples
    (handlers.ingest_audio → amod.decode_f32le); the reference SDK doc
    passes WAV paths (sdk-python.md:87), with the browser demo doing
    WebAudio decode client-side — this is the Python equivalent, using
    only the stdlib `wave` module (PCM 8/16/32-bit and float32 WAVs).
    """
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(n)

    if width == 2:
        vals = struct.unpack(f"<{n * ch}h", raw)
        scale = 1.0 / 32768.0
    elif width == 4:
        # Python's `wave` rejects IEEE-float WAVs (format 3), so 4-byte
        # samples are always int32 PCM — a float32 sniff would misfire
        # on int32 files with quiet openings
        vals = struct.unpack(f"<{n * ch}i", raw)
        scale = 1.0 / 2147483648.0
    elif width == 1:
        vals = tuple(b - 128 for b in raw)
        scale = 1.0 / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")

    if ch > 1:  # average channels to mono
        mono = [
            sum(vals[i * ch : (i + 1) * ch]) * (scale / ch) for i in range(n)
        ]
    else:
        mono = [v * scale for v in vals]
    return struct.pack(f"<{len(mono)}f", *mono), sr


def audio_payload(
    audio: AudioSource, sample_rate: Optional[int], encoding: str = "f32"
) -> tuple[bytes, int]:
    """Normalize any accepted audio source to (PCM bytes, rate).

    encoding="s16" ships raw signed-16-bit LE PCM — half the wire bytes,
    and the server decode (`i16 -> f32 * 2^-15`) is exactly
    value-identical to converting client-side, so fingerprints never
    depend on the wire choice. Accepted s16 sources: 16-bit MONO WAV
    (frames pass straight through), raw s16-LE bytes, or an int16
    numpy array. Float sources are refused rather than silently
    quantized (that would change the fingerprint)."""
    if encoding not in ("f32", "s16"):
        raise ValueError("encoding must be 'f32' or 's16'")
    if isinstance(audio, Path):
        audio = audio.read_bytes()
    if isinstance(audio, (bytearray, memoryview)):
        audio = bytes(audio)
    if not isinstance(audio, bytes):
        try:
            import numpy as np
        except Exception as e:  # pragma: no cover - exotic inputs
            raise TypeError(f"unsupported audio source {type(audio)!r}") from e
        arr = np.asarray(audio)
        if encoding == "s16":
            if arr.dtype != np.int16:
                raise ValueError(
                    "encoding='s16' requires int16 samples; converting "
                    f"{arr.dtype} would quantize — pass f32 instead"
                )
            audio = arr.astype("<i2").tobytes()
        else:
            # duck-typed numpy array: float samples, any dtype
            audio = np.asarray(arr, dtype="<f4").tobytes()
    if audio[:4] == b"RIFF" and audio[8:12] == b"WAVE":
        if encoding == "s16":
            import io
            import wave

            with wave.open(io.BytesIO(audio), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise ValueError(
                        "encoding='s16' requires 16-bit mono WAV; "
                        "use encoding='f32' for other formats"
                    )
                wav_rate = w.getframerate()
                pcm = w.readframes(w.getnframes())
            return pcm, sample_rate if sample_rate is not None else wav_rate
        pcm, wav_rate = decode_wav(audio)
        return pcm, sample_rate if sample_rate is not None else wav_rate
    if sample_rate is None:
        raise ValueError(f"sample_rate is required for raw {encoding} audio")
    return audio, sample_rate


def audio_request(
    tenant_id: int,
    record_id: Optional[int],
    audio: AudioSource,
    algorithm: str,
    *,
    sample_rate: Optional[int] = None,
    tunables: Optional[dict] = None,
    return_embedding: bool = False,
    encoding: str = "f32",
) -> tuple[str, dict, bytes]:
    pcm, sr = audio_payload(audio, sample_rate, encoding)
    rid = record_id if record_id is not None else new_record_id()
    params: dict[str, str] = {"algorithm": algorithm, "sample_rate": str(sr)}
    if encoding != "f32":
        params["encoding"] = encoding
    if tunables:
        params.update({k: str(v) for k, v in tunables.items()})
    if return_embedding:
        params["return_embedding"] = "1"
    return f"/v1/ingest/audio/{tenant_id}/{rid}", params, pcm


def query_body(
    tenant_id: int,
    modality: str,
    *,
    k: int = 10,
    vector: Optional[list[float]] = None,
    terms: Optional[list[str]] = None,
    fingerprint: Optional[Union[bytes, str]] = None,
    algorithm: Optional[str] = None,
    rrf_k: int = 60,
    multihash: Optional[dict] = None,
    filter: Optional[dict] = None,
    recall_tier: Optional[str] = None,
) -> dict:
    body: dict[str, Any] = {"tenant_id": tenant_id, "modality": modality, "k": k}
    if filter is not None:
        body["filter"] = filter
    if recall_tier is not None:
        body["recall_tier"] = recall_tier
    if rrf_k != 60:
        body["rrf_k"] = rrf_k
    if vector is not None:
        body["vector"] = list(vector)
    if terms:
        body["terms"] = list(terms)
    if fingerprint is not None:
        body["fingerprint_hex"] = (
            fingerprint if isinstance(fingerprint, str) else fingerprint.hex()
        )
        if algorithm is None:
            raise ValueError("fingerprint queries require algorithm")
    if algorithm is not None:
        body["algorithm"] = algorithm
    if multihash is not None:
        body["multihash"] = multihash
    return body


def query_batch_body(
    tenant_id: int,
    modality: str,
    *,
    k: int = 10,
    vectors: Optional[list[list[float]]] = None,
    fingerprints: Optional[list[Union[bytes, str]]] = None,
    algorithm: Optional[str] = None,
    multihash: Optional[dict] = None,
    filter: Optional[dict] = None,
    recall_tier: Optional[str] = None,
) -> dict:
    """Batched /v1/query body: exactly one of `vectors` (shared device
    GEMM / packed prefilter scan) or `fingerprints` (shared
    XOR+popcount dispatch; requires `algorithm`)."""
    if (vectors is None) == (fingerprints is None):
        raise ValueError(
            "pass exactly one of vectors= or fingerprints=")
    body: dict[str, Any] = {"tenant_id": tenant_id, "modality": modality,
                            "k": k}
    if filter is not None:
        body["filter"] = filter
    if recall_tier is not None:
        body["recall_tier"] = recall_tier
    if vectors is not None:
        body["vectors"] = [list(v) for v in vectors]
    else:
        if algorithm is None:
            raise ValueError("fingerprint queries require algorithm")
        body["fingerprints_hex"] = [
            f if isinstance(f, str) else f.hex() for f in fingerprints
        ]
    if algorithm is not None:
        body["algorithm"] = algorithm
    if multihash is not None:
        body["multihash"] = multihash
    return body


def ndjson_chunks(chunks: Iterable[str]) -> bytes:
    """NDJSON body for the /stream text route: one {"chunk": ...} per
    line (handlers.ingest_text_stream)."""
    return b"".join(
        json.dumps({"chunk": c}).encode("utf-8") + b"\n" for c in chunks
    )


def raise_for_response(
    status: int, headers: Any, body: bytes, record_id: Optional[int] = None
) -> None:
    """Map a non-2xx response onto UcfpError with the documented fields."""
    if 200 <= status < 300:
        return
    code, message = "error", body.decode("utf-8", "replace")[:512]
    try:
        parsed = json.loads(body)
        code = parsed.get("error", code)
        message = parsed.get("message", message)
    except (ValueError, AttributeError):
        pass
    retry_ms: Optional[int] = None
    ra = headers.get("retry-after") if headers is not None else None
    if ra is not None:
        try:
            retry_ms = int(float(ra) * 1000)
        except ValueError:
            pass
    raise UcfpError(status, code, message, retry_ms, record_id)


def should_retry(status: int) -> bool:
    return status == 429 or status >= 500


def backoff_seconds(attempt: int, retry_after_ms: Optional[int], base: float = 0.25) -> float:
    if retry_after_ms is not None:
        return retry_after_ms / 1000.0
    return base * (2.0 ** attempt)
