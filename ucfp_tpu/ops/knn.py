"""Device k-NN kernels: cosine top-k (MXU) and Hamming-popcount top-k (VPU).

This replaces the reference's CPU brute-force scan (src/index/embedded/
mod.rs:268-360: redb range scan + rayon fold/reduce with an 8-lane
unrolled dot product) with dense device kernels:

  * cosine_topk  — one [Q, D] x [D, N] matmul on the MXU + lax.top_k.
    Semantics match the reference exactly: score = dot / (|q| * |v|),
    zero-norm database rows are skipped, ties resolve to the lower row
    index (the reference's partial_cmp sort is stable over insert order,
    which is ascending record order after the range scan).
  * hamming_topk — XOR + lax.population_count over bit-packed uint32
    fingerprint words; top-k smallest distance. This is the packed-hash
    path for phash/dhash/ahash records (8 bytes -> 2 words).

Capacity model: the store hands us a padded matrix of power-of-two
capacity C with a validity mask, so recompilation happens only on
capacity doubling, never per insert. See parallel/sharded_knn.py for the
ICI-sharded version with the cross-chip top-k merge.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Plain Python float, NOT jnp.float32(...): a module-scope jnp scalar
# would initialise the default backend at import time — which hangs the
# whole process when the default platform is an unreachable tunnel and
# defeats any later jax.config.update("jax_platforms", ...) override.
# Inside jit, the weak-typed float binds as f32 exactly like before.
NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnums=(3,))
def cosine_topk(
    query: jax.Array,  # [Q, D] f32
    matrix: jax.Array,  # [C, D] f32 (rows >= N are padding)
    valid: jax.Array,  # [C] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine scores over valid rows. Returns ([Q,k] scores, [Q,k] idx).

    Invalid / zero-norm rows surface as -inf scores; the caller drops them
    (they only appear when fewer than k valid rows exist).
    """
    row_norm = jnp.linalg.norm(matrix, axis=1)  # [C]
    q_norm = jnp.linalg.norm(query, axis=1, keepdims=True)  # [Q, 1]
    dots = jax.lax.dot_general(
        query,
        matrix,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, C]
    denom = q_norm * row_norm[None, :]
    ok = valid[None, :] & (row_norm[None, :] > 0.0) & (q_norm > 0.0)
    scores = jnp.where(ok, dots / jnp.where(denom == 0.0, 1.0, denom), NEG_INF)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnums=(3,))
def hamming_topk(
    query: jax.Array,  # [Q, W] uint32 packed bits
    matrix: jax.Array,  # [C, W] uint32
    valid: jax.Array,  # [C] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k SMALLEST Hamming distance. Returns ([Q,k] dist int32, [Q,k] idx).

    Invalid rows surface as distance 0x7fffffff. The per-word unrolled
    accumulation keeps the live intermediate at [Q, C] int32 — the naive
    broadcast XOR would materialize [Q, C, W] (tens of GB at 10M rows
    with a 256-query batch).
    """
    w_total = matrix.shape[1]
    dist = jnp.zeros((query.shape[0], matrix.shape[0]), jnp.int32)
    for w in range(w_total):
        x = jnp.bitwise_xor(query[:, w][:, None], matrix[None, :, w])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    big = jnp.int32(0x7FFFFFFF)
    dist = jnp.where(valid[None, :], dist, big)
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx


@functools.partial(jax.jit, static_argnums=(3,))
def cosine_topk_fused(
    query: jax.Array,  # [Q, D] f32
    matrix: jax.Array,  # [C, D] f32, C % (ROWS_PER_TILE*128) == 0
    valid: jax.Array,  # [C] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact f32 cosine scores + pallas partial-reduce candidate top-k:
    the big-catalog path for the DEFAULT (unquantized) config — lax.top_k
    over 10M rows costs ~22 ms while the streaming per-lane reduce costs
    ~0.5 ms. Same candidate semantics as the int8 fused path (near-exact
    for k <= 16, exact top-1); callers mark responses approximate."""
    from . import pallas_scan

    row_norm = jnp.linalg.norm(matrix, axis=1)
    q_norm = jnp.linalg.norm(query, axis=1, keepdims=True)
    dots = jax.lax.dot_general(
        query, matrix, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    denom = q_norm * row_norm[None, :]
    ok = valid[None, :] & (row_norm[None, :] > 0.0) & (q_norm > 0.0)
    scores = jnp.where(ok, dots / jnp.where(denom == 0.0, 1.0, denom), NEG_INF)
    return pallas_scan.scores_topk_fused_batched(scores, k)


def quantize_rows_int8(matrix) -> tuple:
    """Symmetric per-row int8 quantization for the HBM-resident matrix.

    The sub-ms @10M x 768 budget is bandwidth-bound: f32 rows are 30 GB,
    int8 rows are 7.5 GB — the only representation that scans inside a
    v5e-8's aggregate HBM bandwidth in under a millisecond. Cosine only
    needs row direction, so per-row scales drop out of the score
    entirely: score = (q/|q|) . (r/|r|), and the int8 row divided by its
    own int8-row norm IS the unit direction up to quantization noise.
    Returns (q8 [C, D] int8, row_norm_q [C] f32 = |q8 row|).
    """
    import numpy as np

    m = np.asarray(matrix, np.float32)
    # value-identical to the textbook abs().max()/round()/clip()/astype
    # chain but with one temporary instead of five full-matrix passes
    # (this runs on the bulk-embedding INGEST path per batch, and the
    # old chain measured 3.2 s for a 65k x 768 load on one core):
    # max(max, -min) == abs().max() without the 200 MB abs temp;
    # rint == round (both half-to-even); the rounded/clipped f32 buffer
    # IS q8 cast back, so its self-dot gives |q8 row| with no recast
    absmax = np.maximum(m.max(axis=1), -m.min(axis=1))[:, None]
    scale = np.where(absmax == 0.0, 1.0, absmax / 127.0)
    q = m / scale
    np.rint(q, out=q)
    np.clip(q, -127, 127, out=q)
    q8 = q.astype(np.int8)
    row_norm = np.sqrt(np.einsum("ij,ij->i", q, q, dtype=np.float32))
    return q8, row_norm.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(4,))
def cosine_topk_int8(
    query: jax.Array,  # [Q, D] f32
    q8: jax.Array,  # [C, D] int8
    row_norm: jax.Array,  # [C] f32 (|int8 row|)
    valid: jax.Array,  # [C] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Quantized cosine top-k: int8 matrix rides the MXU int path at 4x
    the f32 scan rate; scores are exact cosines of the quantized rows
    (per-row scales cancel), so recall loss is bounded by row
    quantization noise (~1e-2 on unit vectors)."""
    # quantize the query symmetrically too: int8 x int8 -> int32 on MXU
    q = query
    q_absmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
    q_scale = jnp.where(q_absmax == 0.0, 1.0, q_absmax / 127.0)
    qq = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    dots = jax.lax.dot_general(
        qq, q8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)  # [Q, C]
    q_norm = jnp.linalg.norm(qq.astype(jnp.float32), axis=1, keepdims=True)
    denom = q_norm * row_norm[None, :]
    ok = valid[None, :] & (row_norm[None, :] > 0.0) & (q_norm > 0.0)
    scores = jnp.where(ok, dots / jnp.where(denom == 0.0, 1.0, denom), NEG_INF)
    return jax.lax.top_k(scores, k)


# -- SimHash sketch prefilter + exact int8 rescore ---------------------------
#
# The single-query 10M x 768 int8 GEMV is HBM-bound at ~9.2 ms on one
# v5e chip (7.5 GB scanned at 819 GB/s). A 768-bit SimHash sketch per
# row cuts the scanned bytes 8x (960 MB) and an ASYMMETRIC 4-level
# estimator ranks every row by approximate angle: the query keeps its
# continuous projection magnitudes (quantized to 4 weight levels,
# realized as 4 masked popcounts per word), which is worth ~1.57x
# effective bits over symmetric Hamming at small angles — measured on
# chip at 10M x 768, the exact-top-10 rank-92% quantile drops from 2.6M
# rows (256-bit symmetric) through ~410k (512-bit asym-L4) to ~300k
# (768-bit asym-L4).
#
# Selection keeps a per-2048-row-segment quota (one batched
# approx_max_k — a global threshold + cumsum/scatter compaction costs
# ~70 ms in TPU scatter at 10M), then the exact int8 dot re-scores the
# surviving pool through a sorted-unique gather. Pool sizing is the
# recall knob (UCFP_SKETCH_POOL_FRAC; see DEFAULT_POOL_FRAC table) —
# planted near-duplicates, the product workload, are found at any pool
# size. Responses on this path are marked approximate whenever the
# pool does not cover the catalog.

SKETCH_BITS = 768  # 96 B/row: the extra 32 B over 512-bit pays for a
# ~2.3x smaller rescore pool at equal recall — the pool gather is the
# latency wall (~13 ns/row), so fewer candidates beat fewer sketch bytes
SKETCH_WORDS = SKETCH_BITS // 32
SKETCH_LEVELS = 4
# pool fraction -> (random-query recall@10 +- 95% CI over 104 queries,
# single-query p50 [min, max] over 3 runs) at 10M x 768 with the
# 768-bit sketch, round-4 driver-shaped capture on one v5e through the
# tunnel runtime (exact-int8 ground truth; bench.py emits the same
# keys, so every number here is reproducible from BENCH_r04):
#   0.0066 -> (0.87 +- 0.02, medians 4.0-5.1 ms spanning [2.4, 5.7])  "fast"
#   0.042  -> (0.97 +- 0.01, medians 9.5-10.7 ms spanning [9.4, 11.6]) default
# vs the exhaustive int8 scan at medians 9.8-11.6 spanning [9.5, 11.7] —
# the default tier beats exact in every paired run at near-equal quality; planted near-duplicates (the
# product workload) are 1.0 at every setting. The latency budget is
# gather-bound (~13 ns per candidate row, an XLA/TPU gather constant)
# + selection (~16 us per quota unit) + the ~1.6 ms pallas sketch scan
# + ~2.4 ms of XLA composition overhead (see _COST_DEFAULTS). The
# sharded mesh divides per-chip pool and scan by the shard count
# (measured per-shard at 10M/8 rows: 1.0-1.2 ms sketch / 1.6-2.0 exact).
# Exact batch-32 serving is 0.62 ms/query.
DEFAULT_POOL_FRAC = 0.042
# selection segment width, swept on chip at 10M x 768 (quality tier,
# round-3 sweep — relative ordering, absolute numbers predate the
# round-4 reorder removal): 2048 -> 14.2 ms, 1024 -> 10.4 ms,
# 512 -> best; 256 -> pathological compile time (rejected).
# approx_max_k cost scales with the per-segment quota, so narrower
# segments cut selection; the quota floor (8) keeps per-segment Poisson
# headroom, which also inflates small pools' effective size slightly.
SKETCH_SEG = 512


def sketch_planes(dim: int, seed: int = 0x5EED):
    """Deterministic Rademacher (+-1) hyperplane matrix
    [dim, SKETCH_BITS].

    Host-side and seeded by (seed, dim) only, so cache rebuilds and
    process restarts reproduce identical sketches."""
    import numpy as np

    rng = np.random.default_rng([seed, dim])
    return rng.choice(
        np.asarray([-1.0, 1.0], np.float32), size=(dim, SKETCH_BITS)
    )


def _pack_bit_rows(bits: jax.Array) -> jax.Array:
    """[N, 256] bool -> [N, 8] uint32 little-endian bit packing."""
    n = bits.shape[0]
    b3 = bits.reshape(n, SKETCH_WORDS, 32).astype(jnp.uint32)
    weights = jnp.left_shift(
        jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32)
    )
    return jnp.sum(b3 * weights[None, None, :], axis=2, dtype=jnp.uint32)


@jax.jit
def sketch_rows_int8(q8_rows: jax.Array, planes: jax.Array) -> jax.Array:
    """Sketch int8 rows: sign bits of the f32 projection. Quantization
    preserves row direction, so sketching q8 instead of the f32 source
    matches up to quantization noise — and avoids ever needing the
    30 GB f32 matrix on device."""
    proj = jax.lax.dot_general(
        q8_rows.astype(jnp.float32), planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return _pack_bit_rows(proj >= 0.0)


def build_sketch_chunked(q8: jax.Array, planes: jax.Array,
                         chunk: int = 1 << 20) -> jax.Array:
    """Sketch a [C, D] int8 matrix in row chunks: the f32 projection
    intermediate stays O(chunk x 256) instead of O(C x 256)."""
    c = q8.shape[0]
    if c <= chunk:
        return sketch_rows_int8(q8, planes)
    parts = [
        sketch_rows_int8(q8[i : i + chunk], planes)
        for i in range(0, c, chunk)
    ]
    return jnp.concatenate(parts, axis=0)


@jax.jit
def sketch_query_plan(query: jax.Array, planes: jax.Array):
    """Per-query asymmetric scoring plan.

    Returns (qsign [W]u32, masks [L,W]u32, wts [L]f32, cnt [L]f32,
    sigma f32): sign bits of the query projection, one bit-mask per
    magnitude-quantile level, the per-level mean |projection| weights,
    per-level plane counts, and the exact bulk-score standard deviation
    sigma = sqrt(sum_j w_{level(j)}^2) used to calibrate the selection
    threshold (each plane contributes an independent +-w_j for a random
    row)."""
    qp = query @ planes  # [B]
    qsign = _pack_bit_rows((qp >= 0.0)[None])[0]  # [W] u32
    mag = jnp.abs(qp)
    qs = jnp.quantile(mag, jnp.linspace(0.0, 1.0, SKETCH_LEVELS + 1))
    lvl = jnp.sum(
        (mag[:, None] >= qs[None, 1:SKETCH_LEVELS]).astype(jnp.int32), axis=1
    )  # [B] in 0..L-1
    onehot = lvl[:, None] == jnp.arange(SKETCH_LEVELS)[None, :]  # [B, L]
    cnt = jnp.sum(onehot, axis=0).astype(jnp.float32)
    wts = jnp.sum(mag[:, None] * onehot, axis=0) / jnp.maximum(cnt, 1.0)
    masks = _pack_bit_rows(onehot.T)  # [L, W] u32
    sigma = jnp.sqrt(jnp.sum(wts * wts * cnt))
    return qsign, masks, wts, cnt, sigma


def asym_sketch_scores(sketch, qsign, masks, wts, cnt):
    """[C] f32 asymmetric sketch scores (higher = closer): per level l,
    score_l = w_l * (n_l - 2 * disagree_l), realized as L masked
    popcounts per 32-bit word — the level weights stay query-side, so
    rows keep their 1-bit/plane storage.

    Whole-array formulation (no per-word Python loop): a word-sliced
    accumulation chain lowered to one strided pass over the row-major
    sketch PER (word, level) — 64 reads of the 640 MB array, measured
    29 ms at 10M. Operating on [C, W] with axis-1 reductions keeps the
    whole computation inside one fused read."""
    x = jnp.bitwise_xor(sketch, qsign[None, :])  # [C, W]
    score = jnp.zeros((sketch.shape[0],), jnp.float32)
    for li in range(SKETCH_LEVELS):
        dis = jnp.sum(
            jax.lax.population_count(
                jnp.bitwise_and(x, masks[li][None, :])
            ).astype(jnp.int32),
            axis=1,
        )
        score = score + wts[li] * (cnt[li] - 2.0 * dis.astype(jnp.float32))
    return score


SKETCH_LANES = 128
SKETCH_TILE_R = 256  # grid step covers SKETCH_TILE_R * 128 catalog rows


@jax.jit
def tile_sketch(packed: jax.Array) -> jax.Array:
    """[C, W] u32 row-major -> [C/128, W, 128] i32 lane-tiled (flat
    row r*128+lane). The Mosaic-friendly layout: the word axis rides
    sublanes, rows ride lanes, and one HBM->VMEM tile copy feeds all 64
    masked popcounts — the row-major layout costs one strided pass over
    the whole array per (word, level) in the XLA lowering (measured
    29 ms vs ~1 ms at 10M x 512 bits)."""
    c = packed.shape[0]
    return (
        packed.astype(jnp.int32)
        .reshape(c // SKETCH_LANES, SKETCH_LANES, SKETCH_WORDS)
        .swapaxes(1, 2)
    )


def _asym_scan_kernel(q_ref, m_ref, w_ref, db_ref, out_ref):
    tile = db_ref[:]  # [Rt, W, 128] i32
    x = jax.lax.bitwise_xor(tile, q_ref[:])  # qsign [1, W, 1] broadcasts
    acc = jnp.zeros((tile.shape[0], SKETCH_LANES), jnp.float32)
    for li in range(SKETCH_LEVELS):
        d = jnp.sum(
            jax.lax.population_count(
                jnp.bitwise_and(x, m_ref[li : li + 1])
            ),
            axis=1,
        )  # [Rt, 128]
        acc = acc + w_ref[li, 0:1, 0:1][0] * d.astype(jnp.float32)
    out_ref[:, :] = acc


def asym_sketch_scores_tiled(sk_tiled, qsign, masks, wts, cnt):
    """[C] f32 asymmetric scores from the lane-tiled sketch — one fused
    pallas pass (read 64 B/row once, all masked popcounts in VMEM)."""
    r, w, lanes = sk_tiled.shape
    rt = min(SKETCH_TILE_R, r)  # both powers of two -> rt divides r
    q3 = qsign.astype(jnp.int32).reshape(1, w, 1)
    m3 = masks.astype(jnp.int32).reshape(SKETCH_LEVELS, w, 1)
    w3 = wts.astype(jnp.float32).reshape(SKETCH_LEVELS, 1, 1)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wsum = pl.pallas_call(
        _asym_scan_kernel,
        grid=(r // rt,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, w, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SKETCH_LEVELS, w, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SKETCH_LEVELS, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, w, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, lanes), jnp.float32),
    )(q3, m3, w3, sk_tiled)
    const = jnp.sum(wts * cnt)
    return const - 2.0 * wsum.reshape(-1)


def _quantize_query(query):
    qa = jnp.max(jnp.abs(query))
    qs = jnp.where(qa == 0.0, 1.0, qa / 127.0)
    return jnp.clip(jnp.round(query / qs), -127, 127).astype(jnp.int8)


def _rescore_exact(q8, cidx, slot_ok, query, k,
                   sorted_unique: bool = True):
    """Exact int8 cosine over gathered candidate rows; top-k via an
    exact segmented reduction.

    ONE gather only: TPU gather cost is ~13 ns per INDEX regardless of
    row size or the sorted/unique flags (849k-row gather = 8 ms; a
    scalar take of row_norm costs the same 8 ms, and gathering norms
    instead of recomputing measured +3.6 ms at 10M), so the row norms
    are recomputed FROM the gathered rows (pure VPU work on resident
    data) and per-slot validity arrives precomputed in slot_ok
    (derived WITHOUT gathers: from the selection's own -inf values,
    which encode the full valid/filter mask).

    The gathered rows convert to f32 ONCE and both the dot and the
    norms ride that copy: int8 magnitudes keep every sum below 2^24
    (768 * 127^2 = 12.4M), so f32 accumulation is bit-exact integer
    arithmetic — same scores as the int32 path, measured ~0.2 ms
    cheaper at a 420k pool."""
    rows = jnp.take(q8, cidx, axis=0, indices_are_sorted=sorted_unique,
                    unique_indices=sorted_unique
                    ).astype(jnp.float32)  # [P, D] gather
    qq = _quantize_query(query).astype(jnp.float32)
    dots = jax.lax.dot_general(
        qq[None, :], rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]  # [P]
    qn = jnp.linalg.norm(qq)
    rn = jnp.sqrt(jnp.sum(rows * rows, axis=1))
    denom = jnp.maximum(qn, 1e-9) * jnp.maximum(rn, 1e-9)
    okc = slot_ok & (rn > 0.0)
    scores = jnp.where(okc, dots / denom, NEG_INF)
    s, p = _exact_topk_flat(scores, k)
    return s, jnp.take(cidx, p)


def _exact_topk_flat(scores, k):
    """EXACT top-k over a flat [P] score vector without a P-wide sort:
    batched 2048-segment top-k + a tiny cross-segment merge. (A flat
    approx_max_k at recall_target 0.99 over ~600k scores measured
    ~13 ms — this is ~0.2 ms and exact.)"""
    p_len = scores.shape[0]
    seg = 2048
    if p_len <= seg:
        return jax.lax.top_k(scores, min(k, p_len))
    pad = (-p_len) % seg
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((pad,), NEG_INF, scores.dtype)]
        )
    rows = scores.reshape(-1, seg)
    kk = min(k, seg)
    sv, si = jax.lax.top_k(rows, kk)  # [nrows, kk]
    base = (jnp.arange(rows.shape[0], dtype=jnp.int32) * seg)[:, None]
    flat_v = sv.reshape(-1)
    flat_i = (si + base).reshape(-1)
    v2, p2 = jax.lax.top_k(flat_v, min(k, flat_v.shape[0]))
    # padding slots are NEG_INF and only surface when fewer than k real
    # candidates exist; clamp so the index stays in range
    return v2, jnp.minimum(jnp.take(flat_i, p2), p_len - 1)


@functools.partial(jax.jit, static_argnums=(6, 7))
def cosine_sketch_topk(
    query: jax.Array,  # [D] f32
    planes: jax.Array,  # [D, SKETCH_BITS] f32
    q8: jax.Array,  # [C, D] int8
    row_norm: jax.Array,  # [C] f32
    sketch: jax.Array,  # [C, W] u32 packed OR [C/128, W, 128] i32 tiled
    valid: jax.Array,  # [C] bool
    k: int,
    pool: int,
) -> tuple[jax.Array, jax.Array]:
    """Asymmetric-sketch-prefilter cosine top-k. Returns ([k] scores,
    [k] idx); scores are exact int8 cosines of the rescored pool.

    sketch accepts the lane-tiled [C/128, W, 128] layout (pallas scan;
    the serving caches use it) or packed [C, W] (XLA fallback). Recall
    is the pool's coverage of the exact top-k's sketch ranks (see
    DEFAULT_POOL_FRAC table); the pipeline is scan -> segmented
    per-2048-row quota selection -> sorted-unique gather -> exact int8
    rescore -> exact segmented top-k."""
    c = q8.shape[0]
    # ok carries BOTH validity and any device-side query filter the
    # caller folded into `valid` — per-candidate checks must come from
    # it (via the selection's -inf encoding), NEVER from an index
    # compare against a valid-count (filters make validity non-prefix)
    ok = valid & (row_norm > 0.0)
    if pool * 2 >= c:
        # pool covers (most of) the catalog: exhaustive exact rescore;
        # identity indexing means ok itself is the per-slot mask
        cidx = jnp.arange(c, dtype=jnp.int32)
        return _rescore_exact(q8, cidx, ok, query, k)
    qsign, masks, wts, cnt, _sigma = sketch_query_plan(query, planes)
    raw = (
        asym_sketch_scores_tiled(sketch, qsign, masks, wts, cnt)
        if sketch.ndim == 3  # lane-tiled (pallas scan)
        else asym_sketch_scores(sketch, qsign, masks, wts, cnt)
    )
    score = jnp.where(ok, raw, NEG_INF)
    # SEGMENTED selection: view the scores as [nseg, 2048] and keep a
    # per-segment quota with one batched approx_max_k. The global
    # threshold + cumsum + scatter compaction this replaces measured
    # ~70 ms at 10M (TPU scatter over 10M update elements); segmented
    # selection is within noise of the bare scan. quota * nseg ~=
    # 1.3 * pool, so a true global-top-pool row is dropped only when its
    # segment drew > quota of the global pool (Poisson mean pool/nseg;
    # at 1.3x headroom that is a low-probability per-segment event).
    seg = SKETCH_SEG
    pad = (-c) % seg
    if pad:
        score = jnp.concatenate(
            [score, jnp.full((pad,), NEG_INF, score.dtype)]
        )
    nseg = (c + pad) // seg
    quota = min(seg, max(8, -(-int(pool * 1.3) // nseg)))
    # selection recall_target applies at the QUOTA boundary; the exact
    # top-k rows sit far above it, so the default 0.95 loses ~nothing
    # while compiling to a cheaper reduction than 0.99
    _sv, si = jax.lax.approx_max_k(
        score.reshape(nseg, seg), quota
    )  # [nseg, quota]
    # slots whose selected VALUE is -inf are masked rows (invalid,
    # filtered out, or padding) that only got picked because their
    # segment ran out of live rows — carry that bit per slot. The
    # candidates stay in approx_max_k's value order: a per-segment
    # index argsort + take_along_axis pair measured +14 ms at 10M in
    # composition (XLA relayout around the reorder), while the gather
    # constant is ~the same for sorted and unsorted indices — so the
    # reorder buys nothing and is skipped (round-4 kernel profile).
    sel_ok = _sv > NEG_INF  # [nseg, quota]
    gidx = (
        si + (jnp.arange(nseg, dtype=jnp.int32) * seg)[:, None]
    ).reshape(-1)
    slot_ok = sel_ok.reshape(-1) & (gidx < c)
    # clamping can duplicate c-1, harmless under slot_ok
    gidx = jnp.minimum(gidx, c - 1)
    return _rescore_exact(q8, gidx, slot_ok, query, k,
                          sorted_unique=False)


# -- packed-int4 prefilter + exact int8 rescore ------------------------------
#
# UCFP_KNN_QUANT=int4: the round-4 successor to the sketch prefilter
# for single-query serving. Each int8 row is re-quantized to int4 and
# nibble-packed column-major ([D/2, C] int8, ops/pallas_int4.py), so
# the prefilter scan streams HALF the exact scan's bytes at the HBM
# roofline (measured 746 GB/s packed at 2.5M x 768 — 2.2x the exact
# int8 GEMV over the same rows). Unlike the sketch (whose 768-bit
# estimator needs a ~420k-row rescore pool for recall 0.9, paying the
# ~13 ns/row gather constant), the int4 ordering is nearly exact: the
# exact top-10's worst int4 rank measured <= 30 at 2M x 768 (32 random
# queries), so a 2k-row pool reaches recall ~1.0 and the gather cost
# vanishes. One tier: there is no pool/recall knob worth exposing.
#
# Pipeline: packed scan (pallas) -> partial-reduce candidate selection
# (pallas scores_topk_fused) -> top-pool -> sorted gather + exact int8
# rescore -> exact top-k. Candidate-loss bound: a true top-k row is
# dropped only when a higher-int4-scored row shares its (tile, lane)
# selection cell — P <= rank/(C/256/128 cells) ~ 0.04% per item at 10M.
#
# Measured at 10M x 768 on one v5e (BENCH_r04 fused captures, 3
# spread runs, 104-query recall CI): medians 4.5-7.5 ms in
# [4.4, 7.5] at recall@10 1.000±0.000 (typical sessions 4.5-5.5; one
# volatile session inflated the single-query family ~40% while the
# batched tiers stayed in range — published spans are the union) vs
# the 9.8-11.6 ms exact int8
# scan — ~1.5-2x faster at measured-perfect recall. Per-shard at
# 10M/8 = 1.25M rows: 0.65-0.88 ms (64-iter device-loop calibration;
# shorter loops at this scale are tunnel-jitter-dominated) -> derived
# v5e-8 ~0.75-0.98 ms incl. the modeled 0.1 ms merge (sub-ms @10M
# single query as shard-scale arithmetic; typical sessions ~0.8).
#
# BATCHED (cosine_int4_topk_batched, knn_batch serving): one packed
# scan serves a whole query block (the [QB, D/2] MXU weight rows are
# free — the scan is HBM-bound), masked scores bounce as bf16 (half
# the f32 bytes), selection rides the 8-query-block partial-reduce +
# approx_max_k pool pick (a pool-width top_k measured ~5 ms of pure
# selection at Q=32), and each query's pool rescores exactly.
# Measured at 10M x 768 Q=32: 0.26-0.35 ms/query at recall@10
# 1.000±0.000 across captures vs the exact batched GEMM's
# 0.52-0.62 ms/query — the
# fastest measured serving configuration at the BASELINE shape. The
# per-Q sweep (scripts/int4_batch_q_sweep.py, session 9) puts the
# sweet spot AT the 64-row chunk: int4 0.318/0.241/0.303 and exact
# 0.569/0.402 ms/query at Q=32/64/128 — one INT4_BATCH_QB chunk
# amortizes the scan fully, while Q=128 re-streams the catalog for a
# second chunk and pays Q-scaling selection on top.

INT4_MIN_POOL = 2048
INT4_BATCH_QB = 64  # batched-scan weight-block height (VMEM-bounded)


def int4_pool(n: int, k: int) -> int:
    """Rescore-pool size for the int4 prefilter. Fixed small: int4 rank
    error is bounded by quantization noise, not sketch-bit starvation,
    so the pool does not scale with the catalog."""
    return min(n, max(INT4_MIN_POOL, 64 * k))


def int4_batch_pool(n: int, k: int) -> int:
    """Rescore-pool size for the BATCHED int4 prefilter: smaller than
    the single-query 2048 floor because the per-query pool costs scale
    with Q (gather + per-row top-k), while the rank-error margin does
    not — the exact top-10's worst int4 rank measured <= 30 (2M x 768,
    32 queries) and batched recall@10 measured 1.0 at pools 256 and 512
    at 10M x 768. 512 keeps a ~16x margin over the measured worst
    rank."""
    return min(n, max(512, 64 * k))


def int4_supported(cap: int, dim: int) -> bool:
    """Kernel shape constraints: even dim (nibble pairing) and a
    128-multiple capacity (pallas tile divisor)."""
    return dim % 2 == 0 and cap >= 128 and cap % 128 == 0


@jax.jit
def pack_int4_cols(q8m: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[C, D] int8 rows -> (packed_t [D/2, C] int8, inv_n4 [C] f32).

    Per-row symmetric int4 re-quantization (scale = absmax/7; the scale
    cancels in cosine, exactly as the int8 path's does). Packing: dim j
    rides byte j's HIGH nibble (two's complement) and dim j+D/2 its LOW
    nibble BIASED +8 — the bias makes the in-kernel unpack a pure
    bitwise AND (see ops/pallas_int4.py for the Mosaic legalization
    story). inv_n4 is 1/|int4 row| with 0 for zero rows, so the score
    fixup is a multiply, not a guarded divide."""
    return _pack_int4_rows(q8m)


def _pack_int4_rows(q8m):
    f = q8m.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(f), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 7.0)
    q4 = jnp.clip(jnp.round(f / scale), -7, 7).astype(jnp.int32)
    dp = q8m.shape[1] // 2
    hi = q4[:, :dp]
    lo = q4[:, dp:] + 8
    packed_t = ((hi << 4) | lo).astype(jnp.int8).T  # [Dp, C]
    n4 = jnp.sqrt(jnp.sum(q4.astype(jnp.float32) ** 2, axis=1))
    inv_n4 = jnp.where(n4 > 0.0, 1.0 / jnp.maximum(n4, 1e-9), 0.0)
    return packed_t, inv_n4


@functools.partial(jax.jit, static_argnums=(1,))
def _pack_int4_map(q8m, chunk):
    # fori_loop + dynamic_update_slice on the carry: XLA keeps the
    # output buffers in place, so peak memory is output + ONE chunk's
    # transients (a lax.map + transpose reassembly would stage the
    # packed columns twice — 7.5 GB transient at 10M x 768)
    n, d = q8m.shape
    out_p = jnp.zeros((d // 2, n), jnp.int8)
    out_i = jnp.zeros((n,), jnp.float32)

    def body(g, carry):
        op, oi = carry
        blk = jax.lax.dynamic_slice(q8m, (g * chunk, 0), (chunk, d))
        pk, inv = _pack_int4_rows(blk)
        return (
            jax.lax.dynamic_update_slice(op, pk, (0, g * chunk)),
            jax.lax.dynamic_update_slice(oi, inv, (g * chunk,)),
        )

    return jax.lax.fori_loop(0, n // chunk, body, (out_p, out_i))


def pack_int4_cols_chunked(q8m, chunk: int = 1 << 18):
    """Memory-safe pack_int4_cols for multi-GB catalogs: the one-shot
    pack stages a full f32 copy of the matrix (~4x the int8 bytes —
    OOM beside a resident 7.5 GB catalog), so this runs the identical
    per-row math over `chunk`-row blocks inside a fori_loop that
    dynamic_update_slices each block's columns into the output in
    place (see _pack_int4_map: a lax.map + transpose reassembly would
    stage the packed columns twice). Row-wise math means the result is
    bit-identical to the one-shot pack."""
    n = q8m.shape[0]
    if n <= chunk:
        return pack_int4_cols(q8m)
    m = (n // chunk) * chunk
    pk, inv = _pack_int4_map(q8m[:m], chunk)
    if m < n:  # sub-chunk tail: the one-shot pack is safe at this size
        pk_t, inv_t = pack_int4_cols(q8m[m:])
        pk = jnp.concatenate([pk, pk_t], axis=1)
        inv = jnp.concatenate([inv, inv_t])
    return pk, inv


@functools.partial(jax.jit, static_argnums=(6, 7))
def cosine_int4_topk(
    query: jax.Array,  # [D] f32
    q8: jax.Array,  # [C, D] int8 (the exact-rescore matrix)
    row_norm: jax.Array,  # [C] f32 (|int8 row|)
    packed_t: jax.Array,  # [D/2, C] int8 (pack_int4_cols)
    inv_n4: jax.Array,  # [C] f32
    valid: jax.Array,  # [C] bool (validity AND any device-side filter)
    k: int,
    pool: int,
    n_valid: jax.Array | None = None,  # prefix length when valid IS the
    #                                    row-prefix rule (no filters) —
    #                                    enables the fused kernel
) -> tuple[jax.Array, jax.Array]:
    """Packed-int4-prefilter cosine top-k. Returns ([k] scores, [k] idx);
    scores are exact int8 cosines of the rescored pool (same contract
    as cosine_sketch_topk).

    When `n_valid` is given the caller asserts `valid == arange < n` —
    the scores come from the FUSED pallas kernel (dots + correction +
    inv-norm + prefix mask in one pass with a tight f32 output;
    pallas_int4.int4_masked_scores) instead of int4_dots + a separate
    XLA mask pass. Measured at 10M x 768: 6.3 -> ~5.3 ms."""
    from . import pallas_int4, pallas_scan

    c, d = q8.shape
    if pool * 2 >= c:
        # pool covers (most of) the catalog: exhaustive exact rescore
        ok = valid & (row_norm > 0.0)
        cidx = jnp.arange(c, dtype=jnp.int32)
        return _rescore_exact(q8, cidx, ok, query, k)
    qq = _quantize_query(query)
    dp = d // 2
    wh = jnp.zeros((pallas_int4.SUB, dp), jnp.int8).at[0].set(qq[:dp])
    wl = jnp.zeros((pallas_int4.SUB, dp), jnp.int8).at[0].set(qq[dp:])
    corr = 8 * jnp.sum(qq[dp:].astype(jnp.int32))
    if n_valid is not None:
        # the fused kernel masks via the prefix scalar + inv == 0; the
        # `valid` array is not read on this path at all
        s4 = pallas_int4.int4_masked_scores(
            packed_t, wh, wl, inv_n4, pallas_int4.pick_rpt(c), corr,
            n_valid,
        )
    else:
        ok = valid & (row_norm > 0.0)
        dots = pallas_int4.int4_dots(
            packed_t, wh, wl, pallas_int4.pick_rpt(c)
        )
        s4 = jnp.where(ok, (dots - corr).astype(jnp.float32) * inv_n4,
                       NEG_INF)
    tile_rows = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n_cand = (c // tile_rows) * pallas_scan.LANES
    if c % tile_rows == 0 and n_cand >= 2 * pool:
        # streaming per-(tile, lane) partial reduce, then top-pool over
        # the ~C/256 candidates (the big-catalog path)
        vals, gidx = pallas_scan.scores_topk_fused(s4, pool)
    else:
        # small/odd capacities (where the cost model prefers exact
        # anyway): exact segmented top-pool
        vals, gidx = _exact_topk_flat(s4, pool)
    slot_ok = vals > NEG_INF
    return _rescore_exact(q8, gidx, slot_ok, query, k, sorted_unique=False)


# -- packed-int2 prefilter + exact int8 rescore ------------------------------
#
# UCFP_KNN_QUANT=int2: the lowest-byte prefilter tier. Four dims per
# byte ([D/4, C] int8 columns, ops/pallas_int2.py) stream QUARTER the
# exact scan's bytes (1.875 GB at 10M x 768, ~2.3 ms floor on one
# v5e). The 2-bit code stores v in [-2, 1] per dim and dequantizes as
# (v + 0.5) * s — four symmetric levels +-0.5s, +-1.5s with a
# Lloyd-style per-row scale s ~= 0.9957 * row std (the optimal uniform
# 4-level quantizer for Gaussian data). Ordering quality (measured,
# random normal rows, exact-int8 top-10 coverage, 16 queries each):
# worst pool 1,025 / median 167 at 500k x 768 and worst 976 /
# median 205 at 2M x 768 — the rank error is bounded by quantization
# noise, NOT catalog competition (same scale-free behavior as int4's
# <= 30 ranks, one order coarser), so a fixed 8k pool carries ~8x
# margin over the measured worst at any capacity and the gather cost
# (~13 ns/row) stays ~0.1 ms. Pipeline: fused masked-scores pallas
# scan -> segmented per-quota selection (the sketch tier's — the int4
# per-cell partial reduce would drop rank-1e3 rows to cell collisions)
# -> exact int8 rescore; same never-slower-than-exact cost-model
# dispatch contract.

INT2_MIN_POOL = 8192


def int2_pool(n: int, k: int) -> int:
    """Rescore-pool size for the int2 prefilter: fixed like int4's (the
    rank error is quantization-bounded — measured worst ~1.0k at BOTH
    500k and 2M x 768 — not catalog-scaled), 8192 keeps ~8x margin."""
    return min(n, max(INT2_MIN_POOL, 64 * k))


def int2_supported(cap: int, dim: int) -> bool:
    """Kernel shape constraints: dim divisible by 4 (four fields per
    byte) and a 128-multiple capacity (pallas tile divisor)."""
    return dim % 4 == 0 and cap >= 128 and cap % 128 == 0


INT2_BATCH_MIN_POOL = 4096


def int2_batch_pool(n: int, k: int) -> int:
    """Rescore-pool size for the BATCHED int2 prefilter: smaller than
    the single-query 8192 floor because per-query pool costs (13 ns/row
    gather + exact rescore) scale with Q while the rank-error margin
    does not. Margin evidence: the worst int2 rank of an exact top-10
    row measured ~1k at 500k x 768 and ~2-4k at 2M x 768 (pallas_int2
    header) — the 4096 floor sits AT that boundary, so it is backed by
    direct measurement of this batched path: recall@10 1.000 over
    104 random queries at 10M x 768 (bench.py int2_batch_hits,
    `int2_batch_recall10_random_10m_x768`), where random queries are
    the worst case. The tier is also cost-model-gated to small Q
    (int2_batch_beats_exact), which caps how much rides on the
    margin."""
    return min(n, max(INT2_BATCH_MIN_POOL, 64 * k))


@jax.jit
def pack_int2_cols(q8m: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[C, D] int8 rows -> (packed_t [D/4, C] int8, inv_n2 [C] f32).

    Per-row Lloyd-style 2-bit quantization (see the section comment).
    Packing: dim j rides byte j's bits 6-7 as the SIGNED field (two's
    complement in place, so the in-kernel `byte & -64` is exactly 64*a),
    dims j+D/4 / j+D/2 / j+3D/4 ride bits 4-5 / 2-3 / 0-1 BIASED +2 —
    pure-AND unpack (ops/pallas_int2.py for the Mosaic story). inv_n2
    is 1/|dequantized row| with 0 forced for all-zero int8 rows (the
    dequantized code is never the zero vector, so the zero-row mask
    cannot ride the norm as the int4 path's does)."""
    return _pack_int2_rows(q8m)


def _pack_int2_rows(q8m):
    f = q8m.astype(jnp.float32)
    s = 0.9957 * jnp.std(f, axis=1, keepdims=True)
    s = jnp.where(s == 0.0, 1.0, s)
    v = jnp.clip(jnp.round(f / s - 0.5), -2, 1).astype(jnp.int32)
    dq = q8m.shape[1] // 4
    a = v[:, :dq]
    b = v[:, dq:2 * dq] + 2
    c = v[:, 2 * dq:3 * dq] + 2
    d = v[:, 3 * dq:] + 2
    byte = ((a & 3) << 6) | (b << 4) | (c << 2) | d
    packed_t = byte.astype(jnp.int8).T  # [D/4, C]
    deq = v.astype(jnp.float32) + 0.5
    n2 = jnp.sqrt(jnp.sum(deq * deq, axis=1))
    nz = jnp.max(jnp.abs(f), axis=1) > 0.0
    inv_n2 = jnp.where(nz, 1.0 / jnp.maximum(n2, 1e-9), 0.0)
    return packed_t, inv_n2


@functools.partial(jax.jit, static_argnums=(1,))
def _pack_int2_map(q8m, chunk):
    # identical in-place assembly strategy to _pack_int4_map
    n, d = q8m.shape
    out_p = jnp.zeros((d // 4, n), jnp.int8)
    out_i = jnp.zeros((n,), jnp.float32)

    def body(g, carry):
        op, oi = carry
        blk = jax.lax.dynamic_slice(q8m, (g * chunk, 0), (chunk, d))
        pk, inv = _pack_int2_rows(blk)
        return (
            jax.lax.dynamic_update_slice(op, pk, (0, g * chunk)),
            jax.lax.dynamic_update_slice(oi, inv, (g * chunk,)),
        )

    return jax.lax.fori_loop(0, n // chunk, body, (out_p, out_i))


def pack_int2_cols_chunked(q8m, chunk: int = 1 << 18):
    """Memory-safe pack_int2_cols for multi-GB catalogs (the int4
    chunked pack's strategy; row-wise math makes it bit-identical to
    the one-shot pack)."""
    n = q8m.shape[0]
    if n <= chunk:
        return pack_int2_cols(q8m)
    m = (n // chunk) * chunk
    pk, inv = _pack_int2_map(q8m[:m], chunk)
    if m < n:
        pk_t, inv_t = pack_int2_cols(q8m[m:])
        pk = jnp.concatenate([pk, pk_t], axis=1)
        inv = jnp.concatenate([inv, inv_t])
    return pk, inv


def _int2_query_parts(qq, dq):
    """Split an int8 query into the four [SUB, D/4] weight blocks plus
    the f32 correction scalar (2*(Σwb+Σwc+Σwd) - 0.5*Σw_all — the +2
    field biases and the +0.5 dequant offset, see pallas_int2)."""
    from . import pallas_int2

    def blk(seg):
        return jnp.zeros((pallas_int2.SUB, dq), jnp.int8).at[0].set(seg)

    wa = blk(qq[:dq])
    wb = blk(qq[dq:2 * dq])
    wc = blk(qq[2 * dq:3 * dq])
    wd = blk(qq[3 * dq:])
    qi = qq.astype(jnp.int32)
    corr = (2 * jnp.sum(qi[dq:]) ).astype(jnp.float32) - 0.5 * jnp.sum(
        qi
    ).astype(jnp.float32)
    return wa, wb, wc, wd, corr


def cosine_int2_topk(
    query: jax.Array,  # [D] f32
    q8: jax.Array,  # [C, D] int8 (the exact-rescore matrix)
    row_norm: jax.Array,  # [C] f32 (|int8 row|)
    packed_t: jax.Array,  # [D/4, C] int8 (pack_int2_cols)
    inv_n2: jax.Array,  # [C] f32
    valid: jax.Array,  # [C] bool (validity AND any device-side filter)
    k: int,
    pool: int,
    n_valid: jax.Array | None = None,  # prefix length when valid IS the
    #                                    row-prefix rule (no filters)
) -> tuple[jax.Array, jax.Array]:
    """Packed-int2-prefilter cosine top-k. Returns ([k] scores, [k]
    idx); scores are exact int8 cosines of the rescored pool (same
    contract as cosine_int4_topk). With `n_valid` the prefix mask fuses
    into the pallas scan; filtered queries pass n_valid=None and the
    filter mask runs as one XLA pass over the [C] f32 scores."""
    from . import pallas_int2

    c, d = q8.shape
    if pool * 2 >= c:
        ok = valid & (row_norm > 0.0)
        cidx = jnp.arange(c, dtype=jnp.int32)
        return _rescore_exact(q8, cidx, ok, query, k)
    qq = _quantize_query(query)
    wa, wb, wc, wd, corr = _int2_query_parts(qq, d // 4)
    rpt = pallas_int2.pick_rpt(c)
    nseg_512 = c // pallas_int2.TOPQ_SEG
    if (os.environ.get("UCFP_INT2_TOPQ") == "1"
            and n_valid is not None and rpt % pallas_int2.TOPQ_SEG == 0
            and nseg_512 * pallas_int2.TOPQ >= int(pool * 1.3)):
        # EXPERIMENTAL in-kernel selection (unfiltered), off by
        # default: the scan kernel extracts each 512-row segment's
        # EXACT top-8 in VMEM, eliminating the [C] f32 score bounce
        # and the segmented approx_max_k pass. MEASURED SLOWER on
        # v5e (round 4 session 8): the on-chip decomposition puts the
        # whole XLA selection at only +1.2 ms over the 3.4 ms
        # compute-bound scan, while Mosaic lowers the in-kernel
        # iterative extraction to ~+6 ms of serialized VPU work (both
        # the [1, rpt] whole-tile and the [rpt/512, 512]
        # sublane-parallel formulations). Kept behind UCFP_INT2_TOPQ=1
        # as the measured record; the segmented path below is the
        # production dispatch.
        tv, tg = pallas_int2.int2_topq_scores(
            packed_t, wa, wb, wc, wd, rpt, corr, inv_n2, n_valid
        )
        slot_ok = tv > NEG_INF
        gidx = tg
        if nseg_512 * pallas_int2.TOPQ > 2 * pool:
            flat_v = jnp.where(slot_ok, tv, NEG_INF)
            v2, p2 = jax.lax.approx_max_k(flat_v, pool)
            gidx = jnp.take(gidx, p2)
            slot_ok = v2 > NEG_INF
        return _rescore_exact(q8, gidx, slot_ok, query, k,
                              sorted_unique=False)
    s2 = pallas_int2.int2_masked_scores(
        packed_t, wa, wb, wc, wd, rpt, corr, inv_n2,
        n_valid if n_valid is not None else jnp.asarray(c, jnp.int32),
    )
    if n_valid is None:
        ok = valid & (row_norm > 0.0)
        s2 = jnp.where(ok, s2, NEG_INF)
    # SEGMENTED per-quota selection (the sketch tier's): int2 pools run
    # thousands of rows, where the int4 path's per-(tile, lane) partial
    # reduce (one survivor per 256 rows) would drop true top-k rows to
    # cell collisions — a rank-r row dies with P ~= r/C * 256, fine for
    # int4's r <= 30 but ruinous at int2's r ~ 1e3-1e4. The per-segment
    # quota keeps pool*1.3 candidates spread evenly instead.
    seg = SKETCH_SEG
    pad = (-c) % seg
    if pad:
        s2 = jnp.concatenate([s2, jnp.full((pad,), NEG_INF, s2.dtype)])
    nseg = (c + pad) // seg
    quota = min(seg, max(8, -(-int(pool * 1.3) // nseg)))
    _sv, si = jax.lax.approx_max_k(s2.reshape(nseg, seg), quota)
    sel_ok = _sv > NEG_INF
    gidx = (
        si + (jnp.arange(nseg, dtype=jnp.int32) * seg)[:, None]
    ).reshape(-1)
    slot_ok = sel_ok.reshape(-1) & (gidx < c)
    gidx = jnp.minimum(gidx, c - 1)
    if nseg * quota > 2 * pool:
        # stage-2 shrink: the per-segment floor of 8 (approx_max_k's
        # minimum useful quota) inflates the candidate set far past the
        # pool at big catalogs — 8 * C/512 = 156k rows at 10M, and the
        # rescore gather pays ~13 ns PER ROW (~2 ms) for rows the pool
        # never needed. One approx top-pool over the survivors' int2
        # scores cuts the gather back to `pool` rows; a true top-k row
        # (int2 rank ~1e3, quantization-bounded) sits far inside the
        # pool's 8x margin, so recall is unchanged (bench-measured
        # 1.000 at 10M x 768 with the shrink in place).
        flat_v = jnp.where(slot_ok, _sv.reshape(-1), NEG_INF)
        v2, p2 = jax.lax.approx_max_k(flat_v, pool)
        gidx = jnp.take(gidx, p2)
        slot_ok = v2 > NEG_INF
    return _rescore_exact(q8, gidx, slot_ok, query, k, sorted_unique=False)


@functools.partial(jax.jit, static_argnums=(6, 7))
def cosine_int2_topk_batched(
    queries: jax.Array,  # [Q, D] f32
    q8: jax.Array,  # [C, D] int8 (the exact-rescore matrix)
    row_norm: jax.Array,  # [C] f32 (|int8 row|)
    packed_t: jax.Array,  # [D/4, C] int8 (pack_int2_cols)
    inv_n2: jax.Array,  # [C] f32
    n_valid,  # int: prefix validity length (valid == arange < n)
    k: int,
    pool: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched packed-int2-prefilter cosine top-k: ONE quarter-byte
    packed scan serves the whole query block (MXU weight rows are free
    — the scan is HBM-bound, streaming HALF the batched int4 path's
    bytes), then the int2 segmented-quota selection batched over Q, a
    per-row stage-2 shrink to `pool`, and one batched exact rescore.
    Returns ([Q, k] scores, [Q, k] idx) — exact int8 cosines, same
    contract as cosine_int4_topk_batched.

    PREFIX-VALIDITY ONLY (unfiltered serving): validity must be
    `arange < n_valid`; filtered batches stay on the exact GEMM path
    (index/embedded.py knn_batch). Selection mirrors the single-query
    int2 scheme — the int4 per-(tile, lane) partial reduce would drop
    rank-~1e3 rows to cell collisions (P ~= r/C * 256 per row)."""
    from . import pallas_int2

    c, d = q8.shape
    nq = queries.shape[0]
    qq = _quantize_query_rows(queries)
    qf = qq.astype(jnp.float32)
    nv = jnp.asarray(n_valid, jnp.int32)
    if pool * 2 >= c:
        return cosine_topk_int8(
            queries, q8, row_norm,
            jnp.arange(c, dtype=jnp.int32) < nv, k,
        )
    dq = d // 4
    rpt = pallas_int2.pick_rpt(c)
    chunks = []
    for lo in range(0, nq, INT4_BATCH_QB):
        # same 64-row weight-block chunking as the int4 batch: [qb, rpt]
        # i32 dots x4 fields + the f32 scores must fit VMEM beside the
        # packed tile, and 64 rows already amortize the scan to ~1/64
        # of a query's bytes
        blk = qq[lo:lo + INT4_BATCH_QB]
        bn = blk.shape[0]
        qb = -(-bn // pallas_int2.SUB) * pallas_int2.SUB

        def _pad(seg, qb=qb, bn=bn):
            return jnp.zeros((qb, dq), jnp.int8).at[:bn].set(seg)

        wa, wb, wc, wd = (_pad(blk[:, i * dq:(i + 1) * dq])
                          for i in range(4))
        qi = blk.astype(jnp.int32)
        corrs = jnp.zeros((qb,), jnp.float32).at[:bn].set(
            (2 * jnp.sum(qi[:, dq:], axis=1)).astype(jnp.float32)
            - 0.5 * jnp.sum(qi, axis=1).astype(jnp.float32)
        )
        # bf16 scores: half the [QB, C] bounce bytes; the rounding sits
        # far inside the pool's 4x rank margin and the rescore is exact
        chunks.append(pallas_int2.int2_masked_scores_batched(
            packed_t, wa, wb, wc, wd, corrs, inv_n2, rpt, nv,
            out_dtype=jnp.bfloat16,
        )[:bn])
    s2 = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    seg = SKETCH_SEG
    pad = (-c) % seg
    if pad:
        s2 = jnp.concatenate(
            [s2, jnp.full((nq, pad), NEG_INF, s2.dtype)], axis=1
        )
    nseg = (c + pad) // seg
    quota = min(seg, max(8, -(-int(pool * 1.3) // nseg)))
    sv, si = jax.lax.approx_max_k(s2.reshape(nq, nseg, seg), quota)
    base = (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :, None]
    gidx = (si + base).reshape(nq, -1)
    slot_ok = (sv > NEG_INF).reshape(nq, -1) & (gidx < c)
    gidx = jnp.minimum(gidx, c - 1)
    if nseg * quota > 2 * pool:
        # per-row stage-2 shrink (see cosine_int2_topk)
        flat_v = jnp.where(
            slot_ok, sv.reshape(nq, -1).astype(jnp.float32), NEG_INF
        )
        v2, p2 = jax.lax.approx_max_k(flat_v, pool)
        gidx = jnp.take_along_axis(gidx, p2, axis=1)
        slot_ok = v2 > NEG_INF
    return _rescore_exact_batched(q8, gidx, slot_ok, qf, k)


def _quantize_query_rows(qm):
    """Per-row symmetric int8 quantization of a [Q, D] query block —
    the batched twin of _quantize_query (same scale rule per row)."""
    qa = jnp.max(jnp.abs(qm), axis=1, keepdims=True)
    qs = jnp.where(qa == 0.0, 1.0, qa / 127.0)
    return jnp.clip(jnp.round(qm / qs), -127, 127).astype(jnp.int8)


def _exact_topk_rows(scores, k):
    """EXACT per-row top-k over [Q, P] without a P-wide sort per row:
    the batched twin of _exact_topk_flat (per-2048-segment top-k + a
    tiny cross-segment merge, all batched over Q)."""
    q, p_len = scores.shape
    seg = 2048
    if p_len <= seg:
        return jax.lax.top_k(scores, min(k, p_len))
    pad = (-p_len) % seg
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((q, pad), NEG_INF, scores.dtype)], axis=1
        )
    rows = scores.reshape(q, -1, seg)
    kk = min(k, seg)
    sv, si = jax.lax.top_k(rows, kk)  # [Q, nseg, kk]
    base = (jnp.arange(rows.shape[1], dtype=jnp.int32) * seg)[None, :, None]
    flat_v = sv.reshape(q, -1)
    flat_i = (si + base).reshape(q, -1)
    v2, p2 = jax.lax.top_k(flat_v, min(k, flat_v.shape[1]))
    # padding slots are NEG_INF and only surface when fewer than k real
    # candidates exist; clamp so the index stays in range
    return v2, jnp.minimum(
        jnp.take_along_axis(flat_i, p2, axis=1), p_len - 1
    )


def _rescore_exact_batched(q8, cidx, slot_ok, qq_f32, k):
    """Exact int8 cosine over per-query gathered candidate rows.
    cidx/slot_ok [Q, P]; qq_f32 [Q, D] (the already-quantized queries as
    f32). Same one-gather / recomputed-norms / f32-exact-integer rules
    as _rescore_exact. Returns ([Q, k] scores, [Q, k] catalog idx)."""
    q, p = cidx.shape
    rows = jnp.take(q8, cidx.reshape(-1), axis=0).astype(
        jnp.float32
    ).reshape(q, p, -1)  # [Q, P, D] gather
    dots = jnp.einsum("qd,qpd->qp", qq_f32, rows)
    qn = jnp.linalg.norm(qq_f32, axis=1, keepdims=True)  # [Q, 1]
    rn = jnp.sqrt(jnp.sum(rows * rows, axis=2))  # [Q, P]
    denom = jnp.maximum(qn, 1e-9) * jnp.maximum(rn, 1e-9)
    okc = slot_ok & (rn > 0.0)
    scores = jnp.where(okc, dots / denom, NEG_INF)
    s, pos = jax.lax.top_k(scores, min(k, p))
    return s, jnp.take_along_axis(cidx, pos, axis=1)


@functools.partial(jax.jit, static_argnums=(6, 7))
def cosine_int4_topk_batched(
    queries: jax.Array,  # [Q, D] f32
    q8: jax.Array,  # [C, D] int8 (the exact-rescore matrix)
    row_norm: jax.Array,  # [C] f32 (|int8 row|) — zero rows gate via it
    packed_t: jax.Array,  # [D/2, C] int8 (pack_int4_cols)
    inv_n4: jax.Array,  # [C] f32
    n_valid,  # int: prefix validity length (valid == arange < n)
    k: int,
    pool: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched packed-int4-prefilter cosine top-k: ONE packed scan
    serves the whole query block (the [QB, D/2] MXU weight block costs
    the same as a single row — the scan is HBM-bound), then per-query
    partial-reduce selection + one batched exact rescore. Returns
    ([Q, k] scores, [Q, k] idx) — exact int8 cosines of each query's
    rescored pool, same contract as cosine_int4_topk per row.

    PREFIX-VALIDITY ONLY (unfiltered serving): validity must be
    `arange < n_valid`. Filtered batches stay on the exact GEMM path
    (index/embedded.py knn_batch). Q pads to a multiple of 8 (the
    sublane floor); padding rows cost nothing extra — the scan streams
    the same bytes — and are sliced off before return."""
    from . import pallas_int4, pallas_scan

    c, d = q8.shape
    nq = queries.shape[0]
    qq = _quantize_query_rows(queries)  # [Q, D] i8
    qf = qq.astype(jnp.float32)
    nv = jnp.asarray(n_valid, jnp.int32)
    if pool * 2 >= c:
        # pool covers (most of) the catalog: the exhaustive exact GEMM
        # is strictly cheaper than scan + near-full rescore
        return cosine_topk_int8(
            queries, q8, row_norm,
            jnp.arange(c, dtype=jnp.int32) < nv, k,
        )
    dp = d // 2
    rpt = pallas_int4.pick_rpt(c)
    # chunk the weight block at 64 rows: [qb, rpt] i32 dots + [qb, rpt]
    # f32 scores must fit VMEM beside the packed tile, and 64 rows
    # already amortize the scan to ~1/64 of a query's bytes
    chunks = []
    for lo in range(0, nq, INT4_BATCH_QB):
        blk = qq[lo:lo + INT4_BATCH_QB]
        bn = blk.shape[0]
        qb = -(-bn // pallas_int4.SUB) * pallas_int4.SUB
        wh = jnp.zeros((qb, dp), jnp.int8).at[:bn].set(blk[:, :dp])
        wl = jnp.zeros((qb, dp), jnp.int8).at[:bn].set(blk[:, dp:])
        corrs = 8 * jnp.sum(wl.astype(jnp.int32), axis=1)  # [QB]
        # bf16 scores: half the [QB, C] bounce bytes; the 0.4% relative
        # rounding sits far inside the pool's 16x rank-error margin and
        # the rescore is exact regardless
        chunks.append(pallas_int4.int4_masked_scores_batched(
            packed_t, wh, wl, corrs, inv_n4, rpt, nv,
            out_dtype=jnp.bfloat16,
        )[:bn])
    s4 = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    tile_rows = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n_cand = (c // tile_rows) * pallas_scan.LANES
    if c % tile_rows == 0 and n_cand >= 2 * pool:
        # per-(tile, lane) partial reduce, batched over Q; approx pool
        # selection (a top_k at pool width measured ~5 ms of the
        # pipeline at Q=32 — approx_max_k's ~5% boundary loss is free
        # at the pool's rank margin)
        vals, gidx = pallas_scan.scores_topk_fused_batched(
            s4, pool, approx=True)
    else:
        vals, gidx = _exact_topk_rows(s4.astype(jnp.float32), pool)
    slot_ok = vals.astype(jnp.float32) > NEG_INF
    return _rescore_exact_batched(q8, gidx, slot_ok, qf, k)


def int4_model_ms(cap: int, dim: int, pool: int) -> float:
    """Modeled p50 of the int4-prefilter pipeline at (cap, pool).

    Refit to the FUSED-kernel capture pair — measured 5.27 ms at
    10M x 768 and 0.72 ms at the 1.25M-row shard: the masked-scores
    kernel + selection land at an effective ~730 GB/s over
    cap*(dim/2 + 8) bytes plus a small ~0.15 ms flat term (top-pool +
    rescore composition). Both fitted constants honor the UCFP_COST_*
    recalibration contract (UCFP_COST_INT4_GBPS /
    UCFP_COST_INT4_FLAT_MS). The fit deliberately OVERestimates
    (5.52 modeled vs 5.27 measured at 10M; 0.85 vs 0.72 at shard
    scale) so the dispatch stays conservative — int4 never serves
    where exact might win."""
    stream = cap * (dim // 2 + 8) / (_cost_const("int4_gbps") * 1e6)
    gather = pool * _cost_const("gather_ns") / 1e6
    rescore = pool * dim / (_cost_const("hbm_gbps") * 1e6)
    return stream + gather + rescore + _cost_const("int4_flat_ms")


def exact_batch_model_ms(cap: int, dim: int, q: int) -> float:
    """Modeled p50 of the exhaustive batched int8 GEMM path for q
    queries: one [q, dim] x [dim, cap] MXU GEMM streams the catalog
    once, then the [q, cap] f32 scores bounce through HBM (written by
    the GEMM, read by the batched partial-reduce)."""
    hbm = _cost_const("hbm_gbps") * 1e6
    return (cap * dim + 8.0 * cap * q) / hbm + 1.0


def int4_batch_model_ms(cap: int, dim: int, q: int, pool: int) -> float:
    """Modeled p50 of the BATCHED int4-prefilter pipeline: one packed
    scan (cap * dim/2 bytes) serves the whole padded query block, the
    masked [qb, cap] bf16 scores bounce through HBM into the batched
    partial-reduce, then each query gathers + rescores its own pool.
    Constants honor the UCFP_COST_* recalibration contract
    (UCFP_COST_INT4B_GBPS / UCFP_COST_INT4B_FLAT_MS); fitted
    conservatively to the round-4 capture (measured 10.0-10.4 ms at
    10M x 768 Q=32, modeled 10.5; the exact-GEMM model underestimates
    its own measured 18-19 ms, which only raises int4's bar)."""
    qb = -(-max(1, q) // 8) * 8
    bw = _cost_const("int4b_gbps") * 1e6
    # the packed scan re-streams the catalog once per 64-query chunk
    stream = cap * (dim // 2) / bw * -(-qb // INT4_BATCH_QB)
    bounce = 2 * 2.0 * cap * qb / bw  # [qb, C] bf16 written + read
    gather = q * pool * _cost_const("gather_ns") / 1e6
    rescore = q * pool * dim / (_cost_const("hbm_gbps") * 1e6)
    return stream + bounce + gather + rescore + _cost_const("int4b_flat_ms")


def int4_batch_beats_exact(cap: int, dim: int, q: int, pool: int) -> bool:
    """Dispatch predicate for the batched int4 prefilter — the same
    never-slower-than-exact contract as the single-query tiers, against
    the batched exact GEMM model."""
    import os

    if not int4_supported(cap, dim):
        return False
    if os.environ.get("UCFP_SKETCH_COST_MODEL", "1") == "0":
        return True
    if pool * 2 >= cap:
        return False
    return int4_batch_model_ms(cap, dim, q, pool) < exact_batch_model_ms(
        cap, dim, q
    )


def int2_model_ms(cap: int, dim: int, pool: int) -> float:
    """Modeled p50 of the int2-prefilter pipeline at (cap, pool): the
    packed scan streams cap*(dim/4 + 8) bytes (tile + inv-norm), the
    segmented selection costs ~select_us per quota unit, the pool pays
    the gather constant + an exact rescore. Constants honor the
    UCFP_COST_* recalibration contract (UCFP_COST_INT2_GBPS /
    UCFP_COST_INT2_FLAT_MS); the int4-fitted stream rate is the prior
    until the chip capture refits it."""
    stream = cap * (dim // 4 + 8) / (_cost_const("int2_gbps") * 1e6)
    nseg = -(-cap // SKETCH_SEG)
    quota = min(SKETCH_SEG, max(8, -(-int(pool * 1.3) // nseg)))
    select = quota * _cost_const("select_us") / 1e3
    gather = pool * _cost_const("gather_ns") / 1e6
    rescore = pool * dim / (_cost_const("hbm_gbps") * 1e6)
    return stream + select + gather + rescore + _cost_const("int2_flat_ms")


def int2_beats_exact(cap: int, dim: int, pool: int,
                     fused: bool = True) -> bool:
    """Serving dispatch predicate for UCFP_KNN_QUANT=int2 — the same
    never-slower-than-exact contract as int4_beats_exact. fused=False
    models the filtered path's extra XLA mask pass over the [C] f32
    scores."""
    import os

    if not int2_supported(cap, dim):
        return False
    if os.environ.get("UCFP_SKETCH_COST_MODEL", "1") == "0":
        return True
    if pool * 2 >= cap:
        return False
    est = int2_model_ms(cap, dim, pool)
    if not fused:
        est += 2 * 4.0 * cap / (_cost_const("hbm_gbps") * 1e6)
    return est < exact_scan_model_ms(cap, dim)


def int2_batch_model_ms(cap: int, dim: int, q: int, pool: int) -> float:
    """Modeled p50 of the BATCHED int2-prefilter pipeline: one packed
    scan (cap * dim/4 bytes) per 64-query chunk, the [qb, cap] bf16
    scores bounce through HBM into the segmented selection, then each
    query pays the per-(query x quota) selection cost, the stage-2
    shrink, and its own pool gather + exact rescore.

    The selection term is the fitted truth-teller: the chip capture
    measured 43.3-43.7 ms per 32-query block at 10M x 768 — the batched
    approx_max_k over [Q, nseg, 512] scales ~linearly with Q (the int4
    batch's pallas partial-reduce does not, but it would drop int2's
    rank-~1e3 true rows to cell collisions), so batched int2 LOSES to
    the exact batched GEMM at every measured shape and this model says
    so. Constants honor the UCFP_COST_* recalibration contract
    (UCFP_COST_INT2B_GBPS / UCFP_COST_INT2B_FLAT_MS /
    UCFP_COST_INT2B_SELECT_US)."""
    qb = -(-max(1, q) // 8) * 8
    bw = _cost_const("int2b_gbps") * 1e6
    stream = cap * (dim // 4) / bw * -(-qb // INT4_BATCH_QB)
    bounce = 2 * 2.0 * cap * qb / bw  # [qb, C] bf16 written + read
    nseg = -(-cap // SKETCH_SEG)
    quota = min(SKETCH_SEG, max(8, -(-int(pool * 1.3) // nseg)))
    select = q * quota * _cost_const("int2b_select_us") / 1e3
    gather = q * pool * _cost_const("gather_ns") / 1e6
    rescore = q * pool * dim / (_cost_const("hbm_gbps") * 1e6)
    return (stream + bounce + select + gather + rescore
            + _cost_const("int2b_flat_ms"))


def int2_batch_beats_exact(cap: int, dim: int, q: int, pool: int) -> bool:
    """Dispatch predicate for the batched int2 prefilter — the same
    never-slower-than-exact contract as int4_batch_beats_exact, against
    the batched exact GEMM model."""
    import os

    if not int2_supported(cap, dim):
        return False
    if os.environ.get("UCFP_SKETCH_COST_MODEL", "1") == "0":
        return True
    if pool * 2 >= cap:
        return False
    return int2_batch_model_ms(cap, dim, q, pool) < exact_batch_model_ms(
        cap, dim, q
    )


def int4_beats_exact(cap: int, dim: int, pool: int,
                     fused: bool = True) -> bool:
    """Serving dispatch predicate for UCFP_KNN_QUANT=int4 — same
    never-slower-than-exact contract as sketch_beats_exact. fused=False
    models the slower unfused path (filtered queries: int4_dots + XLA
    mask pass, measured ~6.3 vs 5.3 ms at 10M) so the conservative-fit
    contract holds for filtered traffic too."""
    import os

    if not int4_supported(cap, dim):
        return False
    if os.environ.get("UCFP_SKETCH_COST_MODEL", "1") == "0":
        return True
    if pool * 2 >= cap:
        return False
    est = int4_model_ms(cap, dim, pool)
    if not fused:
        # unfused/fused measured ratio at 10M: 6.32 / 5.27
        est *= 1.2
    return est < exact_scan_model_ms(cap, dim)


# -- sketch-vs-exact dispatch cost model -------------------------------------
#
# The sketch prefilter is only worth serving when its modeled latency
# beats the exhaustive int8 scan at the SAME capacity — otherwise a user
# who turns on UCFP_KNN_QUANT=sketch would get marked-approximate
# answers SLOWER than exact (round-3 driver capture showed exactly this
# under a contended runtime). The serving dispatch
# (index/embedded.py knn) evaluates this model per (capacity, pool) and
# falls back to the exact int8 scan when the model says exact wins.
#
# Terms (all measured on one v5e, round 3/4; see BENCH_r04):
#   exact  = cap*dim bytes streamed at HBM rate
#   sketch = cap*SKETCH_BITS/8 bytes streamed (pallas scan)
#          + segmented selection (~select_us per quota unit)
#          + pool gather+rescore (~gather_ns PER CANDIDATE ROW — the
#            TPU gather constant; layout/batching do not move it)
# Constants are env-overridable (UCFP_COST_HBM_GBPS, UCFP_COST_GATHER_NS,
# UCFP_COST_SELECT_US, UCFP_COST_BASE_MS, UCFP_COST_INT4_GBPS,
# UCFP_COST_INT4_FLAT_MS) so operators can recalibrate for their own
# chips without a code change; UCFP_SKETCH_COST_MODEL=0 disables the
# fallback entirely (bench/debug).

_COST_DEFAULTS = {
    "hbm_gbps": 819.0,   # v5e HBM stream bandwidth
    "gather_ns": 13.0,   # per candidate row, data-dependent gather
    "select_us": 16.0,   # approx_max_k cost per per-segment quota unit
    "int4b_gbps": 600.0,  # BATCHED int4 pipeline effective stream rate
    #                       (fitted conservatively to the round-4 chip
    #                       capture: 10.0-10.4 ms at 10M x 768 Q=32 —
    #                       modeled 10.5 — so the dispatch never
    #                       prefers int4 where exact might win)
    "int4b_flat_ms": 1.5,  # batched selection + rescore composition
    "int4_gbps": 730.0,  # int4 FUSED pipeline effective stream rate
    #                      (masked-scores kernel + selection; fitted
    #                      conservatively to the fused capture pair
    #                      5.27 ms @ 10M / 0.72 ms @ 1.25M x 768 —
    #                      raw slope is ~754 GB/s)
    "int4_flat_ms": 0.15,  # int4 top-pool + rescore composition
    "int2_gbps": 730.0,  # int2 pipeline effective stream rate — the
    #                      int4-fitted prior until a chip capture refits
    "int2_flat_ms": 0.3,  # int2 selection + rescore composition (the
    #                      segmented approx_max_k costs more than the
    #                      int4 partial-reduce; conservative prior)
    "int2b_gbps": 600.0,  # BATCHED int2 pipeline effective stream rate
    #                       (int4-batch prior; the stream is NOT what
    #                       sinks this path — see int2b_select_us)
    "int2b_flat_ms": 1.5,  # batched composition overhead (int4b prior)
    "int2b_select_us": 130.0,  # batched segmented selection cost PER
    #                            (query x quota unit) — fitted to the
    #                            round-4 chip capture: 43.3-43.7 ms per
    #                            32-query block at 10M x 768 (the
    #                            batched approx_max_k over
    #                            [Q, nseg, 512] scales ~linearly with
    #                            Q, unlike the int4 batch's pallas
    #                            partial-reduce), so the model
    #                            truthfully reports batched int2 LOSING
    #                            to the exact batched GEMM (18 ms) and
    #                            the dispatch keeps int2-mode batches
    #                            on the winning path
    "base_ms": 2.4,      # query plan + small kernels + XLA composition
    #                      overhead of the full fused program (fitted so
    #                      the model reproduces the round-4 chip capture:
    #                      modeled 9.87/4.6 ms vs measured 9.86/5.1 ms
    #                      at the default/fast tiers, 10M x 768)
}


def _cost_const(name: str) -> float:
    import os

    return float(
        os.environ.get(f"UCFP_COST_{name.upper()}", "")
        or _COST_DEFAULTS[name]
    )


def exact_scan_model_ms(cap: int, dim: int) -> float:
    """Modeled p50 of the exhaustive single-query int8 scan: it streams
    the whole [cap, dim] int8 matrix once (HBM-bound). The +1.0 ms
    constant is the measured gap between the stream time and the end-to-
    end kernel (round-4 capture: modeled 10.38 vs measured 10.39 ms at
    10M x 768)."""
    return cap * dim / (_cost_const("hbm_gbps") * 1e6) + 1.0


def sketch_model_ms(cap: int, dim: int, pool: int) -> float:
    """Modeled p50 of the sketch-prefilter pipeline at (cap, pool)."""
    scan = cap * (SKETCH_BITS // 8) / (_cost_const("hbm_gbps") * 1e6)
    nseg = -(-cap // SKETCH_SEG)
    quota = min(SKETCH_SEG, max(8, -(-int(pool * 1.3) // nseg)))
    select = quota * _cost_const("select_us") / 1e3
    gather = pool * _cost_const("gather_ns") / 1e6
    rescore = pool * dim / (_cost_const("hbm_gbps") * 1e6)
    return scan + select + gather + rescore + _cost_const("base_ms")


def sketch_beats_exact(cap: int, dim: int, pool: int) -> bool:
    """Serving dispatch predicate: True when the sketch pipeline is
    modeled FASTER than the exhaustive int8 scan at this capacity.
    When False the backend serves the exact path (unmarked) — sketch
    mode must never be slower than exact."""
    import os

    if os.environ.get("UCFP_SKETCH_COST_MODEL", "1") == "0":
        return True
    if pool * 2 >= cap:
        # the kernel itself degenerates to an exhaustive exact rescore
        # (cosine_sketch_topk's own fallback) — exact scan is strictly
        # cheaper than sketch-scan-plus-exhaustive-rescore
        return False
    return sketch_model_ms(cap, dim, pool) < exact_scan_model_ms(cap, dim)


def sketch_pool(n: int, k: int, frac: float | None = None) -> int:
    """Rescore-pool size (the recall knob): max(2048, 64k, frac*n),
    capped at n. frac defaults to UCFP_SKETCH_POOL_FRAC or
    DEFAULT_POOL_FRAC (see the measured recall table above)."""
    import os

    if frac is None:
        frac = float(
            os.environ.get("UCFP_SKETCH_POOL_FRAC", "") or DEFAULT_POOL_FRAC
        )
    return min(n, max(2048, 64 * k, int(frac * n)))


def sketch_candidates(cap: int, k: int) -> int:
    """Back-compat alias used by the approximate-marker logic: the pool
    a query over a cap-row cache would rescore."""
    return sketch_pool(cap, k)


def pack_bits_to_u32(fp: bytes) -> np.ndarray:
    """Fingerprint bytes -> little-endian uint32 words (zero-padded).
    One frombuffer view (plus a copy only when padding) — the previous
    per-word int.from_bytes loop cost ~0.17 ms per 1032-byte minhash
    record on the batch ingest path."""
    pad = (-len(fp)) % 4
    if pad:
        fp = fp + b"\x00" * pad
    return np.frombuffer(fp, dtype="<u4")
