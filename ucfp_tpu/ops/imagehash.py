"""Batched perceptual image-hash kernels (pHash / dHash / aHash / multi).

TPU-first rebuild of the reference's image modality (reference call-sites:
src/modality/image.rs:62-194, stage conventions at image.rs:291-339,
algorithm pseudocode at REPORT.md 4.2.1-4.2.4). The reference computes one
image at a time on CPU inside the imgfprint SDK; here the whole pipeline is
a single jitted function batched over B images:

    u8 RGB [B,H,W,3]
      -> integer luma                        (elementwise, VPU)
      -> fixed-point tent-filter resize      (two matmuls per target size)
      -> 9-bit fixed-point 8x32 DCT          (two int32 matmuls)
      -> median threshold / gradient / mean  (sort + compare)
      -> packed u8 hash bytes

Exactness contract
------------------
The external imgfprint SDK is not vendored in the reference, so bit-level
parity against its binary output is unobtainable; what IS pinned by the
reference (inspect stages + REPORT pseudocode + manifest defaults) is the
algorithm: 32x32 grayscale -> 2D DCT -> top-left 8x8 -> exclude DC ->
median threshold (pHash); 9x8 horizontal gradient (dHash); 8x8 mean
threshold with integer mean (aHash, image.rs:315-318). This module makes
those algorithms *canonically exact*: every stage is integer arithmetic
(int32 matmuls with fixed-point constants), so the same bytes fall out on
CPU, TPU, and any future backend — the conformance corpus in
tests/goldens/ locks them. No float thresholds anywhere.

Fixed-point scheme (all documented constants, part of the wire contract):
  * luma      = (299*R + 587*G + 114*B + 500) // 1000          (BT.601)
  * resize    = tent filter, weights rounded to 1/2^15, rows re-normalized
                to sum exactly 2^15; per-stage rounding (x + 2^14) >> 15
  * DCT basis = round(orthonormal DCT-II * 2^9); input centered by -128
                (only perturbs the DC coefficient, which pHash excludes);
                |T| <= 32*128*128 and |P| <= 32*T*128 < 2^31: exact int32
  * bits pack LSB-first, u64 little-endian on the wire
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Fixed-point constants (the canonical spec)
# ---------------------------------------------------------------------------

RESIZE_SHIFT = 15  # tent-filter weights in units of 2^-15
RESIZE_ONE = 1 << RESIZE_SHIFT
RESIZE_ROUND = 1 << (RESIZE_SHIFT - 1)
DCT_SHIFT = 9  # DCT basis in units of 2^-9


@functools.lru_cache(maxsize=None)
def dct_matrix_q(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis quantized to int32 at 2^-9 resolution.

    D[u, x] = s(u) * cos(pi * (2x + 1) * u / (2n)),
    s(0) = sqrt(1/n), s(u>0) = sqrt(2/n).
    """
    d = np.zeros((n, n), dtype=np.float64)
    for u in range(n):
        s = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
        for x in range(n):
            d[u, x] = s * math.cos(math.pi * (2 * x + 1) * u / (2 * n))
    return np.round(d * (1 << DCT_SHIFT)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def resize_matrix_q(n_in: int, n_out: int) -> np.ndarray:
    """Tent-filter (triangle/bilinear) resampling matrix, fixed point.

    Standard convention (PIL / image-crate Triangle): output pixel i's
    center maps to (i + 0.5) * (n_in / n_out) - 0.5 in input coordinates;
    filter radius = max(1, scale). Rows are L1-normalized then rounded to
    2^-15 with the largest weight adjusted so each row sums to exactly
    2^15 — guaranteeing the rounded output stays within [0, 255].
    """
    scale = n_in / n_out
    radius = max(1.0, scale)
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale - 0.5
        lo = int(math.floor(center - radius))
        hi = int(math.ceil(center + radius))
        for j in range(lo, hi + 1):
            jj = min(max(j, 0), n_in - 1)  # clamp-to-edge
            t = abs(j - center) / radius
            if t < 1.0:
                w[i, jj] += 1.0 - t
    w /= w.sum(axis=1, keepdims=True)
    q = np.round(w * RESIZE_ONE).astype(np.int64)
    # force exact row sums of 2^15 by adjusting the largest weight
    for i in range(n_out):
        q[i, int(np.argmax(q[i]))] += RESIZE_ONE - q[i].sum()
    return q.astype(np.int32)


_PACK64 = np.array([1 << b for b in range(8)], dtype=np.int32)  # per-byte LSB


# ---------------------------------------------------------------------------
# Device kernels (jit-compiled, batched over B)
# ---------------------------------------------------------------------------


def luma_u8(rgb: jax.Array) -> jax.Array:
    """BT.601 integer luma: (299R + 587G + 114B + 500) // 1000.

    Input [..., 3] uint8 -> int32 [...] in [0, 255]. Exact.
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    return (299 * r + 587 * g + 114 * b + 500) // 1000


def resize_exact(gray: jax.Array, wh: jax.Array, ww: jax.Array) -> jax.Array:
    """Fixed-point separable tent resize. gray [B,H,W] int32 -> [B,h,w] int32.

    Two integer matmul stages with per-stage rounding; values stay in
    [0, 255] throughout because weight rows sum to exactly 2^15.
    """
    # rows: [h,H] @ [B,H,W] -> via dot_general batched
    t = jnp.einsum("oh,bhw->bow", wh, gray, preferred_element_type=jnp.int32)
    t = (t + RESIZE_ROUND) >> RESIZE_SHIFT
    o = jnp.einsum("bow,pw->bop", t, ww, preferred_element_type=jnp.int32)
    return (o + RESIZE_ROUND) >> RESIZE_SHIFT


def _pack_bits_u8(bits: jax.Array) -> jax.Array:
    """bits [B, 64] int32 {0,1}, LSB-first -> [B, 8] uint8 (u64 LE bytes)."""
    b = bits.reshape(bits.shape[0], 8, 8)
    return jnp.einsum(
        "bki,i->bk", b, jnp.asarray(_PACK64), preferred_element_type=jnp.int32
    ).astype(jnp.uint8)


def phash_bits(gray32: jax.Array) -> jax.Array:
    """pHash: 32x32 int32 luma -> [B, 64] bits (bit 63 always 0).

    Top-left 8x8 of the 2D DCT, DC excluded, median threshold over the
    63 remaining coefficients (REPORT.md 4.2.2). Exact int32 DCT on
    mean-128-centered input.
    """
    d8 = jnp.asarray(dct_matrix_q(32)[:8])  # [8, 32]
    x = gray32 - 128  # |x| <= 128; DC-only perturbation
    t = jnp.einsum("ux,bxy->buy", d8, x, preferred_element_type=jnp.int32)
    p = jnp.einsum("buy,vy->buv", t, d8, preferred_element_type=jnp.int32)
    flat = p.reshape(p.shape[0], 64)
    vals = flat[:, 1:]  # exclude DC -> 63 values
    med = jnp.sort(vals, axis=1)[:, 31:32]  # middle order statistic
    bits63 = (vals > med).astype(jnp.int32)
    return jnp.concatenate(
        [bits63, jnp.zeros((p.shape[0], 1), jnp.int32)], axis=1
    )


def dhash_bits(gray9x8: jax.Array) -> jax.Array:
    """dHash: [B, 8, 9] int32 (8 tall, 9 wide) -> [B, 64] bits.

    bit = resized[row, col] > resized[row, col + 1], row-major
    (REPORT.md 4.2.3).
    """
    bits = (gray9x8[:, :, :8] > gray9x8[:, :, 1:]).astype(jnp.int32)
    return bits.reshape(bits.shape[0], 64)


def ahash_bits(gray8: jax.Array) -> jax.Array:
    """aHash: [B, 8, 8] int32 -> [B, 64] bits.

    Integer mean (sum // 64, matching inspect image.rs:315-318);
    bit = pixel > mean (REPORT.md 4.2.4).
    """
    flat = gray8.reshape(gray8.shape[0], 64)
    mean = jnp.sum(flat, axis=1, keepdims=True) // 64
    return (flat > mean).astype(jnp.int32)


def global_hist64(gray32: jax.Array) -> jax.Array:
    """64-bin luma histogram over the 32x32 grid, L1-normalized f32.

    Counts are multiples of 1/1024 — exactly representable in f32, so the
    serialized bytes stay deterministic.
    """
    bins = gray32.reshape(gray32.shape[0], 1024) >> 2  # 0..63
    onehot = (bins[:, :, None] == jnp.arange(64, dtype=jnp.int32)[None, None, :]).astype(
        jnp.int32
    )
    counts = jnp.sum(onehot, axis=1)
    return counts.astype(jnp.float32) / jnp.float32(1024.0)


def block_means(gray64: jax.Array) -> jax.Array:
    """16x16 grid of 4x4-block integer means over a 64x64 resize -> [B,256] u8."""
    b = gray64.reshape(gray64.shape[0], 16, 4, 16, 4)
    sums = jnp.sum(b, axis=(2, 4))
    return (sums >> 4).astype(jnp.uint8).reshape(gray64.shape[0], 256)


def _multihash_from_gray(gray: jax.Array, in_h: int, in_w: int) -> dict:
    """Shared bundle body over int32 luma [B, H, W]."""
    wh32 = jnp.asarray(resize_matrix_q(in_h, 32))
    ww32 = jnp.asarray(resize_matrix_q(in_w, 32))
    wh8 = jnp.asarray(resize_matrix_q(in_h, 8))
    ww8 = jnp.asarray(resize_matrix_q(in_w, 8))
    ww9 = jnp.asarray(resize_matrix_q(in_w, 9))
    wh64 = jnp.asarray(resize_matrix_q(in_h, 64))
    ww64 = jnp.asarray(resize_matrix_q(in_w, 64))

    g32 = resize_exact(gray, wh32, ww32)
    g8 = resize_exact(gray, wh8, ww8)
    g9x8 = resize_exact(gray, wh8, ww9)  # 8 tall, 9 wide
    g64 = resize_exact(gray, wh64, ww64)

    return {
        "phash": _pack_bits_u8(phash_bits(g32)),
        "dhash": _pack_bits_u8(dhash_bits(g9x8)),
        "ahash": _pack_bits_u8(ahash_bits(g8)),
        "hist": global_hist64(g32),
        "block": block_means(g64),
    }


@functools.partial(jax.jit, static_argnums=(1, 2))
def multihash_kernel(rgb: jax.Array, in_h: int, in_w: int) -> dict:
    """Full multi-hash bundle for a batch of same-shape RGB images.

    Returns device arrays; the host layer serializes them into the
    536-byte MultiHashV1 wire layout (see serialize_multihash).
    """
    return _multihash_from_gray(luma_u8(rgb), in_h, in_w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def multihash_kernel_gray(gray_u8: jax.Array, in_h: int, in_w: int) -> dict:
    """Bundle from HOST-computed BT.601 luma [B, H, W] uint8.

    The luma formula is pure integer math, so host numpy and device
    produce identical bytes (np_luma == luma_u8, locked by the oracle
    parity tests) — and shipping one gray plane instead of RGB cuts
    host->device ingest traffic 3x (tunneled runtimes charge per-dispatch
    round trips that scale with payload; see bench.py ingest notes)."""
    return _multihash_from_gray(gray_u8.astype(jnp.int32), in_h, in_w)


@jax.jit
def multihash_kernel_pre(g32: jax.Array, g9x8: jax.Array, g8: jax.Array,
                         g64: jax.Array) -> dict:
    """Bundle from HOST-pre-resized planes: [B,32,32] / [B,8,9] /
    [B,8,8] / [B,64,64] uint8 (modality.image.multi_pre_planes — the
    exact fixed-point tent, byte-identical to the device resize, so
    this kernel skips its resize stage entirely). At camera sizes the
    four planes are ~12x fewer host->device bytes than the full luma
    plane (5,256 B vs 65,536 B at 256x256); below ~103x103 the full
    plane is already smaller and multihash_kernel_gray stays the entry
    (server/handlers.py picks per batch)."""
    return {
        "phash": _pack_bits_u8(phash_bits(g32.astype(jnp.int32))),
        "dhash": _pack_bits_u8(dhash_bits(g9x8.astype(jnp.int32))),
        "ahash": _pack_bits_u8(ahash_bits(g8.astype(jnp.int32))),
        "hist": global_hist64(g32.astype(jnp.int32)),
        "block": block_means(g64.astype(jnp.int32)),
    }


def _single_from_gray(gray: jax.Array, in_h: int, in_w: int, algo: str) -> jax.Array:
    if algo == "phash":
        g = resize_exact(
            gray,
            jnp.asarray(resize_matrix_q(in_h, 32)),
            jnp.asarray(resize_matrix_q(in_w, 32)),
        )
        return _pack_bits_u8(phash_bits(g))
    if algo == "dhash":
        g = resize_exact(
            gray,
            jnp.asarray(resize_matrix_q(in_h, 8)),
            jnp.asarray(resize_matrix_q(in_w, 9)),
        )
        return _pack_bits_u8(dhash_bits(g))
    if algo == "ahash":
        g = resize_exact(
            gray,
            jnp.asarray(resize_matrix_q(in_h, 8)),
            jnp.asarray(resize_matrix_q(in_w, 8)),
        )
        return _pack_bits_u8(ahash_bits(g))
    raise ValueError(f"unknown algorithm {algo!r}")


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def single_hash_kernel(rgb: jax.Array, in_h: int, in_w: int, algo: str) -> jax.Array:
    """One 64-bit hash for a batch: algo in {phash, dhash, ahash} -> [B,8] u8."""
    return _single_from_gray(luma_u8(rgb), in_h, in_w, algo)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def single_hash_kernel_gray(gray_u8: jax.Array, in_h: int, in_w: int,
                            algo: str) -> jax.Array:
    """Single hash from HOST-computed luma [B, H, W] uint8 (see
    multihash_kernel_gray for the exactness + traffic rationale)."""
    return _single_from_gray(gray_u8.astype(jnp.int32), in_h, in_w, algo)


# ---------------------------------------------------------------------------
# Weighted multi-hash comparison (query-time kernel)
# ---------------------------------------------------------------------------
#
# The reference compares 536-byte bundles component-wise with weights
# phash .4 / dhash .3 / ahash .1 / global .1 / block .1 and a
# block_distance_threshold of 12 (MultiHashConfigDto, dto.rs:465-480;
# web docs api-reference-image.md:55-62). Raw XOR-popcount over all 536
# bytes is meaningless — the histogram bytes are f32s. This kernel views
# the packed u32 catalog rows ([C, 134] words) as their components:
#   words [0:2) phash  [2:4) dhash  [4:6) ahash
#   words [6:70)  histogram, bitcast to 64 f32 (L1-normalized)
#   words [70:134) block means, 4 u8 per word (256 blocks)
# and scores
#   score = wp*(1-hd_p/64) + wd*(1-hd_d/64) + wa*(1-hd_a/64)
#         + wg*max(0, 1 - L1(hist)/2) + wb*mean(|block diff| <= thresh)
# All reductions accumulate into [Q, C] via fori_loops so the live
# intermediate never exceeds the score matrix.

MULTIHASH_WORDS = 134


@functools.partial(jax.jit, static_argnums=(4,))
def multihash_weighted_topk(
    qm: jax.Array,  # [Q, 134] uint32 packed bundles
    db: jax.Array,  # [C, 134] uint32
    valid: jax.Array,  # [C] bool
    params: jax.Array,  # [6] f32: wp, wd, wa, wg, wb, block_thresh
    k: int,
):
    """-> (scores [Q, k] f32 descending, idx [Q, k] int32)."""
    qn = qm.shape[0]
    c = db.shape[0]

    def ham64(a, b):  # a [Q, 2] u32, b [C, 2] u32 -> [Q, C] f32 similarity
        d = jnp.zeros((qn, c), jnp.int32)
        for w in range(2):
            x = jnp.bitwise_xor(a[:, w][:, None], b[None, :, w])
            d = d + jax.lax.population_count(x).astype(jnp.int32)
        return 1.0 - d.astype(jnp.float32) / 64.0

    psim = ham64(qm[:, 0:2], db[:, 0:2])
    dsim = ham64(qm[:, 2:4], db[:, 2:4])
    asim = ham64(qm[:, 4:6], db[:, 4:6])

    qh = jax.lax.bitcast_convert_type(qm[:, 6:70], jnp.float32)  # [Q, 64]
    dh = jax.lax.bitcast_convert_type(db[:, 6:70], jnp.float32)  # [C, 64]

    def hist_body(j, acc):
        return acc + jnp.abs(qh[:, j][:, None] - dh[None, :, j])

    l1 = jax.lax.fori_loop(0, 64, hist_body, jnp.zeros((qn, c), jnp.float32))
    gsim = jnp.clip(1.0 - 0.5 * l1, 0.0, 1.0)

    # block means: unpack u8 lanes once, then accumulate matches
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    qb = ((qm[:, 70:134, None] >> shifts[None, None, :]) & 0xFF).reshape(
        qn, 256
    ).astype(jnp.int32)
    dbb = ((db[:, 70:134, None] >> shifts[None, None, :]) & 0xFF).reshape(
        c, 256
    ).astype(jnp.int32)
    thresh = params[5]

    def block_body(j, acc):
        diff = jnp.abs(qb[:, j][:, None] - dbb[None, :, j]).astype(jnp.float32)
        return acc + (diff <= thresh).astype(jnp.float32)

    nmatch = jax.lax.fori_loop(
        0, 256, block_body, jnp.zeros((qn, c), jnp.float32)
    )
    bsim = nmatch / 256.0

    score = (
        params[0] * psim + params[1] * dsim + params[2] * asim
        + params[3] * gsim + params[4] * bsim
    )
    score = jnp.where(valid[None, :], score, -jnp.inf)
    return jax.lax.top_k(score, k)


# reference MultiHashConfigDto defaults (dto.rs:465-480)
MULTIHASH_DEFAULT_WEIGHTS = {
    "phash_weight": 0.4,
    "dhash_weight": 0.3,
    "ahash_weight": 0.1,
    "global_weight": 0.1,
    "block_weight": 0.1,
    "block_distance_threshold": 12,
}


def multihash_params(weights: dict | None) -> "np.ndarray":
    """[6] f32 param vector from a MultiHashConfigDto-shaped dict."""
    w = dict(MULTIHASH_DEFAULT_WEIGHTS)
    if weights:
        for key in w:
            if key in weights:
                w[key] = float(weights[key])
    return np.asarray(
        [w["phash_weight"], w["dhash_weight"], w["ahash_weight"],
         w["global_weight"], w["block_weight"],
         w["block_distance_threshold"]],
        np.float32,
    )


# ---------------------------------------------------------------------------
# Wire serialization (host)
# ---------------------------------------------------------------------------

MULTIHASH_BYTES = 536  # 3*u64 + 64*f32 + 256*u8, matching the reference size


def serialize_multihash(out: dict, i: int) -> bytes:
    """Pack one image's bundle into the 536-byte MultiHashV1 layout.

    Layout (little-endian, documented in this module's header):
      [0:8)    phash u64   [8:16)  dhash u64   [16:24) ahash u64
      [24:280) global_hist 64 x f32
      [280:536) block_means 256 x u8
    """
    buf = bytearray()
    buf += bytes(np.asarray(out["phash"][i]))
    buf += bytes(np.asarray(out["dhash"][i]))
    buf += bytes(np.asarray(out["ahash"][i]))
    buf += np.asarray(out["hist"][i], dtype="<f4").tobytes()
    buf += bytes(np.asarray(out["block"][i]))
    assert len(buf) == MULTIHASH_BYTES
    return bytes(buf)


# ---------------------------------------------------------------------------
# Pure-numpy oracle (conformance-corpus generator; must match the device
# kernels bit-for-bit — both are the same exact integer math)
# ---------------------------------------------------------------------------


def np_luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.int64)


def np_luma_u8(rgb: np.ndarray) -> np.ndarray:
    """Vectorized host luma for the serving path: [..., 3] u8 -> u8.

    Same integer formula as np_luma / the device luma_u8 (the result is
    in [0, 255] by construction), int32 intermediates for speed; feeds
    the *_kernel_gray entries so ingest ships 1 byte/pixel."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


def np_resize(gray: np.ndarray, h: int, w: int) -> np.ndarray:
    wh = resize_matrix_q(gray.shape[0], h).astype(np.int64)
    ww = resize_matrix_q(gray.shape[1], w).astype(np.int64)
    t = (wh @ gray + RESIZE_ROUND) >> RESIZE_SHIFT
    return (t @ ww.T + RESIZE_ROUND) >> RESIZE_SHIFT


def np_phash(gray32: np.ndarray) -> int:
    d8 = dct_matrix_q(32)[:8].astype(np.int64)
    p = d8 @ (gray32 - 128) @ d8.T
    vals = p.reshape(64)[1:]
    med = np.sort(vals)[31]
    h = 0
    for i, v in enumerate(vals):
        if v > med:
            h |= 1 << i
    return h


def np_dhash(g9x8: np.ndarray) -> int:
    h = 0
    bit = 0
    for r in range(8):
        for c in range(8):
            if g9x8[r, c] > g9x8[r, c + 1]:
                h |= 1 << bit
            bit += 1
    return h


def np_ahash(g8: np.ndarray) -> int:
    flat = g8.reshape(64)
    mean = int(flat.sum()) // 64
    h = 0
    for i, v in enumerate(flat):
        if v > mean:
            h |= 1 << i
    return h
