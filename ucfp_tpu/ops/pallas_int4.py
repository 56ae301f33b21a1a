"""Pallas packed-int4 prefilter scan: half the exact scan's HBM bytes.

Why this kernel exists: the exhaustive single-query int8 cosine scan is
HBM-bound (10M x 768 = 7.5 GB -> ~10.4 ms on one v5e), and the 768-bit
sketch prefilter's rescore pool costs ~13 ns/row of gather — measured
round 4 at ~9.9 ms end to end for recall 0.97. Packing each row to int4
(two dims per byte) halves the streamed bytes to 3.75 GB while keeping
the full per-dimension structure: the int4 ordering's rank error is
TINY (measured on chip at 2M x 768 random rows: the exact top-10's
worst rank under int4 ordering is <= 30 across 32 queries), so a
~2k-row rescore pool reaches recall ~1.0 — far smaller than the
sketch's ~420k-row pool, eliminating the gather wall.

Kernel shape (measured on one v5e, 2.5M x 768, round 4):
  M=8, rows/tile=4096: 1.29 ms = 746 GB/s of packed bytes — AT the
  HBM roofline, 2.2x the exact int8 GEMV over the same rows (2.79 ms).

Mosaic legalization constraints that shaped the kernel (all hit while
building it; each failed with 'failed to legalize' on i8 vectors):
  * NO shifts (arith.shrsi) and NO subtraction (arith.subi) on int8
    vectors — only bitwise AND survives. The nibble unpack is therefore
    pure AND: byte = 16*hi + lo_b with the LOW nibble stored BIASED
    (+8, so lo_b in [1,15] never borrows): `byte & 15` is lo_b and
    `byte & -16` is EXACTLY 16*hi in two's complement. The x16 factor
    and the +8 bias fold into post-dot scalar fixups on the tiny [M, R]
    output (i32 shift and a per-query constant), never on the tile.
  * int8 MXU matmul (i8 x i8 -> i32 dot_general) IS supported, and
    M=8 weight rows cost the same as M=128 at these shapes — the scan
    runs as two K=D/2 matmuls per tile against an [8, D/2] weight
    block, so up to 8 queries ride one scan for free.

Layout: the catalog is stored COLUMN-major ([D/2, C] int8, dims on
sublanes, rows on lanes) so each grid step streams a [D/2, R] tile with
no in-kernel transpose and emits scores with rows on lanes.

Reference anchor: replaces src/index/embedded/mod.rs:268-360 (brute
force scan) as the approximate serving tier; same candidate-pool
semantics as ops/knn.py cosine_sketch_topk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8          # output sublane floor == query-batch capacity
ROWS_PER_TILE = 4096  # measured fastest (746 GB/s); 2048 within 15%


def _unpack_dots(p_ref, wh_ref, wl_ref):
    """THE nibble-unpack + dual-dot body shared by both kernels (the
    Mosaic-constrained math must not fork): [SUB, R] i32 dots,
    UNCORRECTED (true int4 dot = out - 8 * sum(wl row))."""
    tile = p_ref[:]                   # [Dp, R] int8 packed
    lo = tile & 15                    # biased low nibble, [1, 15]
    hi16 = tile & -16                 # high nibble in place = 16 * hi
    dh = jax.lax.dot_general(
        wh_ref[:], hi16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                 # [SUB, R] = 16 * (hi . qh)
    dl = jax.lax.dot_general(
        wl_ref[:], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                 # [SUB, R] = (lo + 8) . ql
    # dh is exactly divisible by 16; shift the small output, not the tile
    return (dh >> 4) + dl


def _int4_kernel(p_ref, wh_ref, wl_ref, out_ref):
    out_ref[0, :, :] = _unpack_dots(p_ref, wh_ref, wl_ref)


@functools.partial(jax.jit, static_argnums=(3, 4))
def int4_dots(packed_t: jax.Array, wh: jax.Array, wl: jax.Array,
              rpt: int = ROWS_PER_TILE, nq: int = 1) -> jax.Array:
    """packed_t [D/2, C] int8 (C % rpt == 0), wh/wl [SUB, D/2] int8
    (row m = query m's high/low-half dims) -> [nq, C] int32 dots
    (nq=1 -> [C]), UNCORRECTED: row m's true int4 dot for catalog row c
    is out[m, c] - 8 * sum(wl[m]).

    nq is the number of REAL query rows to extract: nq=1 reads only the
    useful 1/8 sublane of the output (strided, ~C*4 bytes); nq>1 pays a
    [SUB, C]-sized relayout, amortized across the batch.
    """
    dp, c = packed_t.shape
    if c % rpt:
        raise ValueError(f"int4_dots requires C % {rpt} == 0, got {c}")
    if wh.shape != (SUB, dp) or wl.shape != (SUB, dp):
        raise ValueError(
            f"weights must be [{SUB}, {dp}], got {wh.shape}/{wl.shape}"
        )
    grid = c // rpt
    out = pl.pallas_call(
        _int4_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((dp, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, rpt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, SUB, rpt), jnp.int32),
    )(packed_t, wh, wl)
    if nq == 1:
        return out[:, 0, :].reshape(c)
    return jnp.moveaxis(out[:, :nq, :], 1, 0).reshape(nq, c)


def _int4_scores_kernel(p_ref, wh_ref, wl_ref, inv_ref, sc_ref, out_ref):
    """Fused dots + correction + inv-norm + validity -> masked f32
    scores, single query. Emits a TIGHT [1, rpt] f32 row per tile: the
    plain int4_dots writes a SUB-padded [grid, SUB, rpt] i32 block
    (8x the useful bytes — 320 MB at 10M rows) and the mask ran as a
    separate XLA pass over [C]; fusing both here cut the measured 10M
    pipeline from 6.3 to ~5.3 ms. Validity is the row-prefix rule
    (row < n, n in SMEM) — zero extra memory stream; zero-norm rows
    carry inv == 0 and mask themselves."""
    dots = _unpack_dots(p_ref, wh_ref, wl_ref)  # [SUB, R]; row 0 = query
    corr = sc_ref[0, 0]               # 8 * sum(ql)
    n = sc_ref[0, 1]                  # catalog prefix length
    rpt = dots.shape[1]
    row0 = dots[0:1, :] - corr        # [1, R] i32
    inv = inv_ref[:]                  # [1, R] f32 (0 for zero rows)
    gidx = pl.program_id(0) * rpt + jax.lax.broadcasted_iota(
        jnp.int32, (1, rpt), 1
    )
    ok = (gidx < n) & (inv > 0.0)
    out_ref[:] = jnp.where(
        ok, row0.astype(jnp.float32) * inv, -jnp.inf
    )


@functools.partial(jax.jit, static_argnums=(4,))
def int4_masked_scores(packed_t: jax.Array, wh: jax.Array, wl: jax.Array,
                       inv_n4: jax.Array, rpt: int, corr: jax.Array,
                       n_valid: jax.Array) -> jax.Array:
    """Single-query fused prefilter scores: packed_t [D/2, C] int8,
    wh/wl [SUB, D/2] int8 (row 0 = the query), inv_n4 [C] f32, corr
    scalar i32 (= 8 * sum(wl[0])), n_valid scalar i32 (prefix validity)
    -> [C] f32 masked int4 cosine scores (-inf outside the prefix /
    zero rows). The unfused int4_dots stays for the multi-query batch
    and filtered paths."""
    dp, c = packed_t.shape
    if c % rpt:
        raise ValueError(f"int4_masked_scores requires C % {rpt} == 0")
    grid = c // rpt
    scalars = jnp.stack(
        [jnp.asarray(corr, jnp.int32), jnp.asarray(n_valid, jnp.int32)]
    )[None, :]  # [1, 2] SMEM
    out = pl.pallas_call(
        _int4_scores_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((dp, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # [1, C] with (1, rpt) blocks: Mosaic requires the block's
        # sublane dim be 8-divisible OR equal to the array's — a
        # [grid, rpt] layout with (1, rpt) blocks fails that check
        out_specs=pl.BlockSpec((1, rpt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.float32),
    )(packed_t, wh, wl, inv_n4[None, :], scalars)
    return out.reshape(c)


def _int4_batched_kernel(out_dtype, p_ref, wh_ref, wl_ref, corr_ref,
                         inv_ref, sc_ref, out_ref):
    """Batched fused prefilter scores: one packed-catalog scan serves
    every query row in the weight block (M=8 and M=64 MXU weight rows
    cost the same at these shapes — the scan is HBM-bound), emitting a
    tight [QB, rpt] f32 block per tile. The batched analog of
    _int4_scores_kernel: correction + inv-norm + prefix validity fuse
    here so no [QB, C] i32 dots array ever hits HBM — only the masked
    f32 scores, which feed scores_topk_fused_batched directly in the
    layout it expects. corr rides VMEM as [QB, 1] (per-query vector
    math; SMEM holds only the shared prefix scalar)."""
    dots = _unpack_dots(p_ref, wh_ref, wl_ref)  # [QB, R] i32
    n = sc_ref[0, 0]                  # catalog prefix length
    rpt = dots.shape[1]
    inv = inv_ref[:]                  # [1, R] f32 (0 for zero rows)
    gidx = pl.program_id(0) * rpt + jax.lax.broadcasted_iota(
        jnp.int32, (1, rpt), 1
    )
    ok = (gidx < n) & (inv > 0.0)     # [1, R] broadcasts over QB
    sc = (dots - corr_ref[:]).astype(jnp.float32) * inv
    out_ref[:] = jnp.where(ok, sc, -jnp.inf).astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(5, 7))
def int4_masked_scores_batched(
    packed_t: jax.Array,  # [D/2, C] int8
    wh: jax.Array,  # [QB, D/2] int8 (row m = query m's high-half dims)
    wl: jax.Array,  # [QB, D/2] int8 (low-half dims)
    corrs: jax.Array,  # [QB] int32 (= 8 * sum(wl[m]))
    inv_n4: jax.Array,  # [C] f32
    rpt: int,
    n_valid: jax.Array,  # scalar i32 prefix validity
    out_dtype=jnp.float32,
) -> jax.Array:
    """Batched masked prefilter scores -> [QB, C] (-inf outside the
    prefix / zero rows / padding query rows score garbage the caller
    slices off). QB must be a sublane multiple (8); the scan streams the
    packed catalog ONCE for the whole block.

    out_dtype=bf16 halves the score bounce's HBM bytes (the [QB, C]
    write + the selection's read — measured ~1.1 ms cheaper per stage
    at 10M x 768, Q=32). bf16's 8-bit mantissa rounds scores ~0.4%
    relative, well inside the int4 rank-error margin the rescore pool
    absorbs; selection -inf masking is exact in any float dtype."""
    dp, c = packed_t.shape
    qb = wh.shape[0]
    if c % rpt:
        raise ValueError(f"int4_masked_scores_batched requires C % {rpt} == 0")
    if qb % SUB or wh.shape != (qb, dp) or wl.shape != (qb, dp):
        raise ValueError(
            f"weights must be [8k, {dp}], got {wh.shape}/{wl.shape}"
        )
    grid = c // rpt
    out = pl.pallas_call(
        functools.partial(_int4_batched_kernel, out_dtype),
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((dp, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((qb, rpt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qb, c), out_dtype),
    )(packed_t, wh, wl, corrs.astype(jnp.int32).reshape(qb, 1),
      inv_n4[None, :], jnp.asarray(n_valid, jnp.int32).reshape(1, 1))
    return out


def pick_rpt(c: int) -> int:
    """Largest supported tile width dividing the capacity (capacities
    are powers of two, so this only falls through for tiny caches)."""
    for rpt in (ROWS_PER_TILE, 2048, 1024, 512, 256, 128):
        if c % rpt == 0:
            return rpt
    raise ValueError(f"capacity {c} has no 128-multiple tile divisor")
