"""Pallas fused scan kernels: tiled Hamming / int8-cosine top-k.

Why Pallas here: the XLA kernels in ops/knn.py materialize the full
[Q, C] score row in HBM before lax.top_k — at 10M records that is a
40 MB write + read per query, a measurable slice of the sub-ms budget.
These kernels stream the database through VMEM in tiles (the pallas
pipeline double-buffers the HBM->VMEM copies automatically via the
grid BlockSpecs), reduce each tile to its local top-k *inside* VMEM,
and emit only [tiles, k] candidates — ~1000x less HBM traffic on the
output side. The final merge over tiles*k candidates is a tiny
lax.top_k outside.

Top-k inside the kernel is k rounds of masked argmin/argmax (static
shapes, VPU-friendly) — no sort lowering required.

Layout notes (guide: /opt/skills/guides/pallas_guide.md):
  * tiles are (TILE_ROWS, D) with D padded to the 128-lane boundary
  * distances/scores live in VMEM scratch; argmin via broadcasted_iota
  * grid iterates row tiles; index_map pins the query block to 0
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 2048


def _tile_topk_small(vals: jax.Array, k: int, largest: bool):
    """k rounds of masked argmax/argmin over [T] -> ([k], [k])."""
    t = vals.shape[0]
    idx2d = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0]
    worst = jnp.asarray(
        -(2**31 - 1) if largest else 2**31 - 1, dtype=vals.dtype
    )

    def body(j, carry):
        cur, out_v, out_i = carry
        best = jnp.max(cur) if largest else jnp.min(cur)
        hit = cur == best
        first = jnp.min(jnp.where(hit, idx2d, jnp.int32(t)))
        out_v = out_v.at[j].set(best)
        out_i = out_i.at[j].set(first)
        cur = jnp.where(idx2d == first, worst, cur)
        return cur, out_v, out_i

    out_v = jnp.full((k,), worst, vals.dtype)
    out_i = jnp.zeros((k,), jnp.int32)
    _, out_v, out_i = jax.lax.fori_loop(0, k, body, (vals, out_v, out_i))
    return out_v, out_i


def _hamming_kernel(k: int, q_ref, db_ref, dist_ref, idx_ref):
    tile = db_ref[:]  # [TILE_ROWS, W] int32 (bit-identical to u32 xor)
    q = q_ref[:]  # [1, W]
    x = jax.lax.bitwise_xor(tile, q)
    d = jnp.sum(jax.lax.population_count(x), axis=1)  # [TILE_ROWS]
    vals, idx = _tile_topk_small(d, k, largest=False)
    base = pl.program_id(0) * TILE_ROWS
    dist_ref[0, :] = vals
    idx_ref[0, :] = idx + base


@functools.partial(jax.jit, static_argnums=(2,))
def hamming_topk_fused(query: jax.Array, db: jax.Array, k: int):
    """query [W] uint32, db [C, W] uint32 (C % TILE_ROWS == 0)
    -> (dist [k] int32, idx [k] int32), smallest distances first."""
    c, w = db.shape
    grid = c // TILE_ROWS
    db_i = db.astype(jnp.int32) if db.dtype != jnp.int32 else db
    q_i = query.astype(jnp.int32).reshape(1, w)
    dist_t, idx_t = pl.pallas_call(
        functools.partial(_hamming_kernel, k),
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_ROWS, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, k), jnp.int32),
            jax.ShapeDtypeStruct((grid, k), jnp.int32),
        ],
    )(q_i, db_i.view(jnp.int32) if db_i.dtype != jnp.int32 else db_i)
    flat_d = dist_t.reshape(-1)
    flat_i = idx_t.reshape(-1)
    neg, pos = jax.lax.top_k(-flat_d, k)
    return -neg, flat_i[pos]


def _cosine_i8_kernel(k: int, q_ref, db_ref, rn_ref, val_ref, idx_ref):
    tile = db_ref[:]  # [TILE_ROWS, D] int8
    q = q_ref[:]  # [1, D] int8
    dots = jax.lax.dot_general(
        tile, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )[:, 0].astype(jnp.float32)
    rn = rn_ref[:][0]  # [TILE_ROWS] f32 row norms
    scores = dots / jnp.maximum(rn, 1e-9)
    vals, idx = _tile_topk_small(scores, k, largest=True)
    base = pl.program_id(0) * TILE_ROWS
    val_ref[0, :] = vals
    idx_ref[0, :] = idx + base


@functools.partial(jax.jit, static_argnums=(3,))
def cosine_int8_topk_fused(
    q8: jax.Array,  # [D] int8 (pre-quantized query)
    db8: jax.Array,  # [C, D] int8
    row_norm: jax.Array,  # [C] f32
    k: int,
):
    """-> (scores [k] f32 = dot/|row| — divide by |q8| outside, idx [k])."""
    c, d = db8.shape
    grid = c // TILE_ROWS
    val_t, idx_t = pl.pallas_call(
        functools.partial(_cosine_i8_kernel, k),
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE_ROWS), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, k), jnp.float32),
            jax.ShapeDtypeStruct((grid, k), jnp.int32),
        ],
    )(q8.reshape(1, d), db8, row_norm.reshape(1, c))
    flat_v = val_t.reshape(-1)
    flat_i = idx_t.reshape(-1)
    vals, pos = jax.lax.top_k(flat_v, k)
    return vals, flat_i[pos]
