"""Image modality pipeline: decode -> preprocess -> device hash -> Record.

Mirrors the reference image modality surface (src/modality/image.rs:62-241):
  * fingerprint_multi   -> 536-byte multi bundle   (algorithm "multi")
  * fingerprint_single  -> 8-byte phash/dhash/ahash
  * inspect_image       -> per-stage extractor (32x32/8x8 grayscale, mean)

Preprocess defaults come from the reference algorithms manifest
(src/server/algorithms_manifest.rs:446-470): max_input_bytes 50 MiB,
max_dimension 8192, min_dimension 32. Oversized dimensions downscale the
longest edge; undersized inputs are rejected.

Decode is host work (PIL: PNG/JPEG/WebP/GIF/BMP, matching image.rs:54-55);
everything after raw RGB runs in one jitted batched kernel
(ucfp_tpu.ops.imagehash). The batch dimension is the TPU seam: the ingest
batcher groups same-shape decodes into one device call.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from ..core import Modality, ModalityError, Record
from ..ops import imagehash
from .confighash import config_hash64

ALGORITHM_MULTI = "imgfprint-multi-v1"
ALGORITHM_PHASH = "imgfprint-phash-v1"
ALGORITHM_DHASH = "imgfprint-dhash-v1"
ALGORITHM_AHASH = "imgfprint-ahash-v1"


@dataclass(frozen=True)
class PreprocessConfig:
    """Validation + pre-resize config (manifest defaults)."""

    max_input_bytes: int = 50 * 1024 * 1024
    max_dimension: int = 8192
    min_dimension: int = 32

    def config_hash(self) -> int:
        return config_hash64(
            "image-preprocess",
            max_input_bytes=self.max_input_bytes,
            max_dimension=self.max_dimension,
            min_dimension=self.min_dimension,
        )


def _fast_bmp_view(data: bytes):
    """Header parse + strided view for plain 24-bit uncompressed BMPs.

    Returns (bgr_view [rows, w, 3] in STORED row order, bottom_up) or
    None for anything but BI_RGB 24bpp, so every other BMP flavor
    (palette, RLE, 16/32bpp, v4/v5 alpha) falls through to PIL. The
    view aliases `data` — callers copy before returning it."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", data, 10)[0]
    hsz = struct.unpack_from("<I", data, 14)[0]
    if hsz < 40:  # BITMAPCOREHEADER layouts differ; let PIL handle them
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp != 24 or w <= 0 or h == 0:
        return None
    rows = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if off + stride * rows > len(data):
        return None
    a = np.frombuffer(data, np.uint8, stride * rows, off)
    a = a.reshape(rows, stride)[:, : w * 3].reshape(rows, w, 3)
    return a, h > 0  # bottom-up storage is the common case


def _fast_bmp_rgb(data: bytes):
    """Zero-copy numpy decode for plain 24-bit uncompressed BMPs (the
    dominant high-rate ingest format: cameras/pipelines that pre-decode
    upstream send raw BMP to skip double compression). PIL's generic
    path costs ~68 us/image on this host; the header parse + strided
    view is ~4 us, which moves the 1-core ingest decode ceiling from
    ~15k to ~240k imgs/s. Output is byte-identical to PIL's (tested)."""
    fv = _fast_bmp_view(data)
    if fv is None:
        return None
    a, bottom_up = fv
    if bottom_up:
        a = a[::-1]
    return np.ascontiguousarray(a[..., ::-1])  # BGR -> RGB


def decode_rgb(data: bytes, pre: PreprocessConfig) -> np.ndarray:
    """Decode image bytes to RGB uint8 [H, W, 3], enforcing preprocess limits."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ModalityError(f"image decode unavailable: {e}")

    if len(data) > pre.max_input_bytes:
        raise ModalityError(
            f"image exceeds max_input_bytes ({len(data)} > {pre.max_input_bytes})"
        )
    fast = _fast_bmp_rgb(data)
    if fast is not None:
        h, w = fast.shape[:2]
        if min(h, w) >= pre.min_dimension and max(h, w) <= pre.max_dimension:
            return fast
        # out-of-bounds dims re-run the PIL path for identical errors
        # and the identical pre-shrink resample
    try:
        img = Image.open(io.BytesIO(data))
        img.load()
    except Exception as e:
        raise ModalityError(f"image decode: {e}")
    if img.mode != "RGB":
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    h, w = arr.shape[:2]
    if min(h, w) < pre.min_dimension:
        raise ModalityError(
            f"image too small: {w}x{h} < min_dimension {pre.min_dimension}"
        )
    if max(h, w) > pre.max_dimension:
        # Pre-shrink oversized inputs with PIL's C bilinear resize: the
        # dense exact-int resize matrix for an 8k-pixel edge would be
        # hundreds of MB and minutes of host matmul. Only inputs ABOVE
        # max_dimension take this path, so the exact-int guarantee of the
        # hash-stage resizes (which always run) is unaffected; the
        # preprocess shrink is deterministic for a given PIL build.
        scale = pre.max_dimension / max(h, w)
        nh = max(1, round(h * scale))
        nw = max(1, round(w * scale))
        if min(nh, nw) < pre.min_dimension:
            raise ModalityError(
                f"image aspect ratio too extreme: downscaling {w}x{h} to the "
                f"max_dimension {pre.max_dimension} leaves the short edge "
                f"below min_dimension {pre.min_dimension}"
            )
        shrunk = Image.fromarray(arr, "RGB").resize(
            (nw, nh), Image.Resampling.BILINEAR
        )
        arr = np.asarray(shrunk, dtype=np.uint8)
    return arr


def decode_gray(data: bytes, pre: PreprocessConfig) -> np.ndarray:
    """Decode image bytes straight to BT.601 luma [H, W] uint8.

    The high-rate ingest path only ever feeds the *_kernel_gray device
    entries, so materializing RGB per image is pure overhead: for fast
    BMPs this computes the EXACT np_luma_u8 integer formula directly on
    the strided BGR view (no flip/swap/contiguous copies — the round-4
    profile showed those per-image copies were ~15% of the 1-core soak
    budget) and flips rows afterwards on the 1-byte/pixel result.
    Bit-identical to np_luma_u8(decode_rgb(data, pre)) by construction
    (same weights, channels read from their BGR positions); everything
    that isn't a fast-path BMP falls back to exactly that composition,
    including all preprocess limit errors and the oversize pre-shrink.
    """
    if len(data) <= pre.max_input_bytes:
        fv = _fast_bmp_view(data)
        if fv is not None:
            a, bottom_up = fv
            h, w = a.shape[:2]
            if min(h, w) >= pre.min_dimension and max(h, w) <= pre.max_dimension:
                # stored order is BGR: weights indexed accordingly
                r = a[..., 2].astype(np.int32)
                g = a[..., 1].astype(np.int32)
                b = a[..., 0].astype(np.int32)
                out = ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(
                    np.uint8
                )
                return out[::-1] if bottom_up else out
    return imagehash.np_luma_u8(decode_rgb(data, pre))


def decode_gray_batch(raw: bytes, max_n: int, pre: PreprocessConfig):
    """Whole-batch native decode for the image batch route framing
    ([u64 rid][u32 len][bytes]*, server/handlers.py:ingest_image_batch).

    Returns (code, rids, gray):
      code 0  — rids is a list[int] and gray is uint8 [n, h, w] luma,
                byte-identical to per-image decode_gray (tested);
      code 1  — fall back to the per-image Python path (native module
                unavailable, mixed shapes, non-BMP frames, or any frame
                outside the preprocess limits — the Python path owns the
                exact error behavior for those);
      code -1 / -2 / -3 — truncated frame header / truncated frame body
                / more than max_n frames (framing errors the handler
                maps to the same 400s the Python parse raises).
    """
    import ctypes

    from .. import native

    lib = native.load_imgbatch()
    if lib is None or not raw:
        return 1, None, None
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    code = lib.ucfp_imgbatch_probe(
        raw, len(raw), max_n, pre.min_dimension, pre.max_dimension,
        pre.max_input_bytes, ctypes.byref(n), ctypes.byref(h),
        ctypes.byref(w),
    )
    if code != 0:
        return code, None, None
    rids = np.empty(n.value, np.uint64)
    gray = np.empty((n.value, h.value, w.value), np.uint8)
    got = lib.ucfp_imgbatch_fill(
        raw, len(raw),
        rids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n.value, h.value, w.value,
    )
    if got != n.value:  # pragma: no cover - probe/fill see the same bytes
        return 1, None, None
    return 0, rids.tolist(), gray


#: per-algorithm resized luma shape (rows, cols) — what the device
#: kernel's own first stage produces; shipping it pre-resized is
#: byte-identical (the kernel's resize is the identity at equal size)
SINGLE_HASH_INPUT = {"phash": (32, 32), "dhash": (8, 9), "ahash": (8, 8)}


def resize_gray_batch(gray: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Host-side exact fixed-point tent resize over a luma batch.

    [n, H, W] uint8 -> [n, oh, ow] uint8, byte-identical to the device
    resize_exact stage (same Q15 matrices, same per-stage rounding —
    native/imgbatch.cpp ucfp_imgbatch_resize, numpy fallback below).
    Used by the ingest hot path to ship the ALREADY-RESIZED plane to
    the device: at 64x64 inputs the single-hash wire bytes drop 4x
    (64x at camera sizes), which is the tunnel-bandwidth exposure the
    ingest soak measures (bench.py _ingest_http)."""
    import ctypes

    from .. import native

    n, ih, iw = gray.shape
    wh = imagehash.resize_matrix_q(ih, oh)
    ww = imagehash.resize_matrix_q(iw, ow)
    lib = native.load_imgbatch()
    if lib is not None and n:
        if not gray.flags.c_contiguous:
            gray = np.ascontiguousarray(gray)
        out = np.empty((n, oh, ow), np.uint8)
        rc = lib.ucfp_imgbatch_resize(
            gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, ih, iw,
            wh.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), oh,
            ww.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ow,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out
    # numpy fallback: the identical two-stage integer matmul
    t = (np.einsum("oh,bhw->bow", wh.astype(np.int64),
                   gray.astype(np.int64))
         + imagehash.RESIZE_ROUND) >> imagehash.RESIZE_SHIFT
    o = (np.einsum("bow,pw->bop", t, ww.astype(np.int64))
         + imagehash.RESIZE_ROUND) >> imagehash.RESIZE_SHIFT
    return o.astype(np.uint8)


#: the four planes the multi bundle derives from (see
#: ops/imagehash._multihash_from_gray); total 5,256 B/image — shipping
#: them pre-resized beats the full luma plane above this pixel count
MULTI_PRE_PLANES = ((32, 32), (8, 9), (8, 8), (64, 64))
MULTI_PRE_THRESHOLD = 2 * sum(h * w for h, w in MULTI_PRE_PLANES)


def multi_pre_planes(gray: np.ndarray) -> tuple:
    """Host-side exact resize of a luma batch to the multi bundle's
    four planes (g32, g9x8, g8, g64) — the inputs of
    ops.imagehash.multihash_kernel_pre."""
    return tuple(
        resize_gray_batch(gray, h, w) for h, w in MULTI_PRE_PLANES
    )


def _multi_outputs(rgbs: np.ndarray) -> dict:
    """Run the batched multi-hash kernel on same-shape RGB uint8 [B,H,W,3].

    Luma runs on the host (identical integer math, oracle-locked) so
    the device transfer is 1 byte/pixel — see np_luma_u8. Camera-size
    inputs also pre-resize to the bundle's four planes on the host
    (exact) and ship those instead — see multihash_kernel_pre."""
    b, h, w, _ = rgbs.shape
    gray = imagehash.np_luma_u8(rgbs)
    if h * w > MULTI_PRE_THRESHOLD:
        return jax_device_get(
            imagehash.multihash_kernel_pre(*multi_pre_planes(gray))
        )
    return jax_device_get(imagehash.multihash_kernel_gray(gray, h, w))


def jax_device_get(tree):
    import jax

    return jax.device_get(tree)


def fingerprint_multi(
    data: bytes,
    tenant_id: int,
    record_id: int,
    pre: PreprocessConfig | None = None,
) -> Record:
    """536-byte multi bundle (phash + dhash + ahash + hist + block)."""
    pre = pre or PreprocessConfig()
    rgb = decode_rgb(data, pre)
    out = _multi_outputs(rgb[None])
    fp = imagehash.serialize_multihash(out, 0)
    return Record(
        tenant_id=tenant_id,
        record_id=record_id,
        modality=Modality.IMAGE,
        algorithm=ALGORITHM_MULTI,
        fingerprint=fp,
        config_hash=pre.config_hash(),
    )


_SINGLE_ALGOS = {
    "phash": ALGORITHM_PHASH,
    "dhash": ALGORITHM_DHASH,
    "ahash": ALGORITHM_AHASH,
}


def fingerprint_single(
    data: bytes,
    algorithm: str,
    tenant_id: int,
    record_id: int,
    pre: PreprocessConfig | None = None,
) -> Record:
    """8-byte single hash; algorithm in {phash, dhash, ahash}."""
    if algorithm not in _SINGLE_ALGOS:
        raise ModalityError(f"unknown image algorithm: {algorithm!r}")
    pre = pre or PreprocessConfig()
    rgb = decode_rgb(data, pre)
    h, w = rgb.shape[:2]
    g = imagehash.np_luma_u8(rgb[None])
    if (h, w) != SINGLE_HASH_INPUT[algorithm]:
        # host-side exact resize: ship the kernel's own first-stage
        # output instead of the full luma (see _hash_image_group)
        h, w = SINGLE_HASH_INPUT[algorithm]
        g = resize_gray_batch(g, h, w)
    out = jax_device_get(
        imagehash.single_hash_kernel_gray(g, h, w, algorithm)
    )
    return Record(
        tenant_id=tenant_id,
        record_id=record_id,
        modality=Modality.IMAGE,
        algorithm=_SINGLE_ALGOS[algorithm],
        fingerprint=bytes(out[0]),
        config_hash=pre.config_hash(),
    )


def fingerprint_batch(
    rgbs: np.ndarray, tenant_ids: list[int], record_ids: list[int],
    pre: PreprocessConfig | None = None,
) -> list[Record]:
    """Batched multi-hash over same-shape decoded images — the TPU hot path."""
    pre = pre or PreprocessConfig()
    out = _multi_outputs(rgbs)
    ch = pre.config_hash()
    return [
        Record(
            tenant_id=tenant_ids[i],
            record_id=record_ids[i],
            modality=Modality.IMAGE,
            algorithm=ALGORITHM_MULTI,
            fingerprint=imagehash.serialize_multihash(out, i),
            config_hash=ch,
        )
        for i in range(rgbs.shape[0])
    ]


ALGORITHM_SEMANTIC = "embedding-image-local"


def semantic_features(rgb: np.ndarray) -> np.ndarray:
    """Decoded RGB -> the encoder's [3072] input (exact-int 32x32 per
    channel, scaled to [0, 1]). Split out so the ingest batcher can stack
    many requests into one encoder call."""
    chans = [
        imagehash.np_resize(rgb[..., c].astype(np.int64), 32, 32) for c in range(3)
    ]
    return (np.stack(chans, -1).astype(np.float32) / 255.0).reshape(-1)


def semantic_record(
    emb: np.ndarray, tenant_id: int, record_id: int, model_id: str | None = None
) -> Record:
    """Wrap one encoder output row into the semantic Record."""
    from ..models import IMAGE_MODEL_ID as SEMANTIC_MODEL_ID

    return Record(
        tenant_id=tenant_id,
        record_id=record_id,
        modality=Modality.IMAGE,
        algorithm=ALGORITHM_SEMANTIC,
        fingerprint=emb.astype("<f4").tobytes(),
        embedding=[float(v) for v in emb],
        model_id=model_id or SEMANTIC_MODEL_ID,
        config_hash=config_hash64(
            ALGORITHM_SEMANTIC, model_id=model_id or SEMANTIC_MODEL_ID
        ),
    )


def fingerprint_semantic(
    data: bytes,
    tenant_id: int,
    record_id: int,
    pre: PreprocessConfig | None = None,
    model_id: str | None = None,
) -> Record:
    """CLIP-class local embedding record (embedding slot + f32 LE bytes).

    Stands in for the reference's CLIP ONNX LocalProvider
    (image.rs:210-241); the encoder lives in ucfp_tpu.models.encoders.
    """
    from ..core import UnsupportedError
    from ..models import IMAGE_MODEL_ID as SEMANTIC_MODEL_ID
    from ..models import hf_local, image_encode

    pre = pre or PreprocessConfig()
    rgb = decode_rgb(data, pre)
    if hf_local.available("image"):
        # real local weights (UCFP_MODEL_DIR/image) are THE encoder
        emb, actual = hf_local.image_embed(rgb)
    else:
        x = semantic_features(rgb)[None]
        emb = image_encode(x)[0]
        actual = SEMANTIC_MODEL_ID
    if model_id is not None and model_id != actual:
        # stamping a caller-supplied id onto another encoder's output
        # would forge comparability across different models — exactly
        # the cross-config comparison config_hash exists to prevent
        raise UnsupportedError(
            f"model {model_id!r} is not loaded (active encoder: {actual})"
        )
    model_id = actual
    return Record(
        tenant_id=tenant_id,
        record_id=record_id,
        modality=Modality.IMAGE,
        algorithm=ALGORITHM_SEMANTIC,
        fingerprint=emb.astype("<f4").tobytes(),
        embedding=[float(v) for v in emb],
        model_id=model_id or SEMANTIC_MODEL_ID,
        config_hash=config_hash64(
            ALGORITHM_SEMANTIC, model_id=model_id or SEMANTIC_MODEL_ID
        ),
    )


def inspect_image(data: bytes, pre: PreprocessConfig | None = None) -> dict:
    """Per-stage extractor (reference inspect_image, image.rs:291-339).

    Returns the original size, PNG-b64 thumbnails of the 32x32 and 8x8
    grayscale stages, the integer aHash mean, and the final multi bundle.
    """
    import base64

    from PIL import Image

    pre = pre or PreprocessConfig()
    rgb = decode_rgb(data, pre)
    h, w = rgb.shape[:2]
    gray = imagehash.np_luma(rgb)
    g32 = imagehash.np_resize(gray, 32, 32).astype(np.uint8)
    g8 = imagehash.np_resize(gray, 8, 8).astype(np.uint8)
    ahash_mean = int(g8.astype(np.uint32).sum()) // 64

    def png_b64(a: np.ndarray) -> str:
        buf = io.BytesIO()
        Image.fromarray(a, mode="L").save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    # max-256px thumbnail of the original (visualization only: PIL's C
    # resize, not the exact-int path — a dense matrix against a large
    # original would be needlessly slow)
    max_edge = 256
    if max(h, w) > max_edge:
        scale = max_edge / max(h, w)
        nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
        thumb = np.asarray(
            Image.fromarray(rgb, "RGB").resize(
                (nw, nh), Image.Resampling.BILINEAR
            ),
            dtype=np.uint8,
        )
    else:
        thumb = rgb
    tbuf = io.BytesIO()
    Image.fromarray(thumb, mode="RGB").save(tbuf, format="PNG")
    # reuse the decode: fingerprint_multi would decode the (up to 50 MiB)
    # input a second time
    out = _multi_outputs(rgb[None])
    fp = imagehash.serialize_multihash(out, 0)

    return {
        "algorithm": ALGORITHM_MULTI,
        "width": w,
        "height": h,
        "original_png_b64": base64.b64encode(tbuf.getvalue()).decode(),
        "gray32_png_b64": png_b64(g32),
        "gray8_png_b64": png_b64(g8),
        "ahash_mean": ahash_mean,
        "fingerprint_hex": fp.hex(),
        "fingerprint_bytes": len(fp),
        "config_hash": pre.config_hash(),
    }
