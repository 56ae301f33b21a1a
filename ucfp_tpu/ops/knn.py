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

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


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
    absmax = np.abs(m).max(axis=1, keepdims=True)
    scale = np.where(absmax == 0.0, 1.0, absmax / 127.0)
    q8 = np.clip(np.round(m / scale), -127, 127).astype(np.int8)
    row_norm = np.linalg.norm(q8.astype(np.float32), axis=1)
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


def pack_bits_to_u32(fp: bytes) -> list[int]:
    """Fingerprint bytes -> little-endian uint32 words (zero-padded)."""
    pad = (-len(fp)) % 4
    data = fp + b"\x00" * pad
    return [int.from_bytes(data[i : i + 4], "little") for i in range(0, len(data), 4)]
