"""Pallas packed-int2 prefilter scan: QUARTER the exact scan's HBM bytes.

The round-4 int4 prefilter (ops/pallas_int4.py) halved the streamed
bytes and served 10M x 768 single queries in ~4.5-5.5 ms (typical
sessions; published union 4.5-7.5) at recall ~1.0
— essentially AT the HBM roofline for 3.75 GB. The remaining lever is
fewer bytes per row: packing four dims per byte (2 bits each) streams
1.875 GB at 10M x 768 (~2.3 ms floor on one v5e), and the int2 ordering
is still good enough that a small exact-rescore pool recovers the true
top-k: with the Lloyd-style scale used by pack_int2_cols (ops/knn.py),
the exact top-10's worst int2 rank measured ~1k at 500k x 768 and
~2-4k at 2M x 768 over random queries — a fixed few-×10k pool at 10M
keeps the gather cost ~0.3 ms (13 ns/row), far from the sketch tier's
~420k-row wall.

Quantization trick that preserves symmetry in 2 bits: the stored field
v in [-2, 1] encodes the effective level (v + 0.5) — four SYMMETRIC
levels ±0.5, ±1.5 (times the per-row scale, which cancels in cosine via
the inv-norm). The +0.5 dequant offset folds into a per-query scalar
(0.5 * sum(q)) applied to the [M, R] output, never to the tile.

Mosaic legalization constraints (same family as pallas_int4):
  * NO shifts and NO subtraction on int8 vectors — only bitwise AND.
    Field extraction is AND-in-place: the TOP field is stored as the
    SIGNED 2-bit value in bits 6-7 so `byte & -64` is EXACTLY 64*a in
    two's complement (values {-128, -64, 0, 64} all fit int8); the
    lower three fields are stored BIASED +2 (in [0, 3]) so
    `byte & 48` = 16*(b+2), `byte & 12` = 4*(c+2), `byte & 3` = d+2
    never borrow. The x64/x16/x4 factors shift off the small i32 [M, R]
    dot outputs; the +2 biases and the +0.5 dequant offset fold into a
    per-query f32 correction.
  * int8 MXU matmuls (i8 x i8 -> i32) carry the four field dots; M=8
    weight rows cost the same as M=128, so 8 queries ride one scan.

Layout: column-major [D/4, C] int8 (dims on sublanes, rows on lanes),
exactly like the int4 cache — each grid step streams a [D/4, R] tile
with no in-kernel transpose.

Reference anchor: replaces src/index/embedded/mod.rs:268-360 (brute
force scan) as the lowest-byte approximate serving tier; same
pool-then-exact-rescore contract as ops/knn.py cosine_int4_topk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8          # output sublane floor == query-batch capacity
ROWS_PER_TILE = 4096


def _unpack_dots2(p_ref, wa_ref, wb_ref, wc_ref, wd_ref):
    """AND-only 2-bit unpack + quad-dot body: [M, R] i32 dots,
    UNCORRECTED (true dequantized dot = out - 2*(sum(wb)+sum(wc)+
    sum(wd)) + 0.5*sum(w_all), applied by the callers in f32)."""
    tile = p_ref[:]                   # [D/4, R] int8 packed
    fa = tile & -64                   # 64 * a  (signed top field)
    fb = tile & 48                    # 16 * (b + 2)
    fc = tile & 12                    # 4 * (c + 2)
    fd = tile & 3                     # (d + 2)

    def dot(w_ref, t):
        return jax.lax.dot_general(
            w_ref[:], t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # each partial is exactly divisible by its field factor; shift the
    # small [M, R] i32 outputs, never the tile
    return ((dot(wa_ref, fa) >> 6) + (dot(wb_ref, fb) >> 4)
            + (dot(wc_ref, fc) >> 2) + dot(wd_ref, fd))


def _int2_scores_kernel(p_ref, wa_ref, wb_ref, wc_ref, wd_ref,
                        corr_ref, inv_ref, sc_ref, out_ref):
    """Fused dots + f32 correction + inv-norm + prefix validity ->
    masked f32 scores, single query (row 0 of the weight blocks).
    Emits a TIGHT [1, rpt] f32 row per tile — the same fusion that cut
    the int4 pipeline ~1 ms at 10M (see pallas_int4)."""
    dots = _unpack_dots2(p_ref, wa_ref, wb_ref, wc_ref, wd_ref)
    corr = corr_ref[0, 0]             # f32: 2*(Σwb+Σwc+Σwd) - 0.5*Σw
    n = sc_ref[0, 0]                  # catalog prefix length
    rpt = dots.shape[1]
    row0 = dots[0:1, :].astype(jnp.float32) - corr   # [1, R] f32
    inv = inv_ref[:]                  # [1, R] f32 (0 for zero rows)
    gidx = pl.program_id(0) * rpt + jax.lax.broadcasted_iota(
        jnp.int32, (1, rpt), 1
    )
    ok = (gidx < n) & (inv > 0.0)
    out_ref[:] = jnp.where(ok, row0 * inv, -jnp.inf)


@functools.partial(jax.jit, static_argnums=(5,))
def int2_masked_scores(packed_t: jax.Array, wa: jax.Array, wb: jax.Array,
                       wc: jax.Array, wd: jax.Array, rpt: int,
                       corr: jax.Array, inv_n2: jax.Array,
                       n_valid: jax.Array) -> jax.Array:
    """Single-query fused prefilter scores: packed_t [D/4, C] int8,
    wa..wd [SUB, D/4] int8 (row 0 = the query's four dim quarters),
    corr f32 scalar, inv_n2 [C] f32, n_valid scalar i32 -> [C] f32
    masked int2 cosine scores (-inf outside the prefix / zero rows)."""
    dq, c = packed_t.shape
    if c % rpt:
        raise ValueError(f"int2_masked_scores requires C % {rpt} == 0")
    for w in (wa, wb, wc, wd):
        if w.shape != (SUB, dq):
            raise ValueError(f"weights must be [{SUB}, {dq}], got {w.shape}")
    grid = c // rpt
    wspec = pl.BlockSpec((SUB, dq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _int2_scores_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((dq, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec,
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # (1, rpt) blocks: Mosaic needs the block sublane dim 8-divisible
        # OR equal to the array's — [1, C] satisfies the latter
        out_specs=pl.BlockSpec((1, rpt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.float32),
    )(packed_t, wa, wb, wc, wd,
      jnp.asarray(corr, jnp.float32).reshape(1, 1),
      inv_n2[None, :],
      jnp.asarray(n_valid, jnp.int32).reshape(1, 1))
    return out.reshape(c)


def _int2_batched_kernel(out_dtype, p_ref, wa_ref, wb_ref, wc_ref, wd_ref,
                         corr_ref, inv_ref, sc_ref, out_ref):
    """Batched twin: one packed-catalog scan serves every query row in
    the weight blocks, emitting a tight [QB, rpt] block per tile (the
    int4 batched kernel's structure; corr rides VMEM as [QB, 1] f32)."""
    dots = _unpack_dots2(p_ref, wa_ref, wb_ref, wc_ref, wd_ref)
    n = sc_ref[0, 0]
    rpt = dots.shape[1]
    inv = inv_ref[:]                  # [1, R] f32
    gidx = pl.program_id(0) * rpt + jax.lax.broadcasted_iota(
        jnp.int32, (1, rpt), 1
    )
    ok = (gidx < n) & (inv > 0.0)     # [1, R] broadcasts over QB
    sc = (dots.astype(jnp.float32) - corr_ref[:]) * inv
    out_ref[:] = jnp.where(ok, sc, -jnp.inf).astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(7, 9))
def int2_masked_scores_batched(
    packed_t: jax.Array,  # [D/4, C] int8
    wa: jax.Array,  # [QB, D/4] int8 (query dim quarters)
    wb: jax.Array,
    wc: jax.Array,
    wd: jax.Array,
    corrs: jax.Array,  # [QB] f32
    inv_n2: jax.Array,  # [C] f32
    rpt: int,
    n_valid: jax.Array,  # scalar i32
    out_dtype=jnp.float32,
) -> jax.Array:
    """Batched masked prefilter scores -> [QB, C]. QB must be a sublane
    multiple (8); the scan streams the packed catalog ONCE per block."""
    dq, c = packed_t.shape
    qb = wa.shape[0]
    if c % rpt:
        raise ValueError(f"int2_masked_scores_batched requires C % {rpt} == 0")
    if qb % SUB or any(w.shape != (qb, dq) for w in (wa, wb, wc, wd)):
        raise ValueError(f"weights must be [8k, {dq}]")
    grid = c // rpt
    wspec = pl.BlockSpec((qb, dq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_int2_batched_kernel, out_dtype),
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((dq, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec,
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
    )(packed_t, wa, wb, wc, wd,
      corrs.astype(jnp.float32).reshape(qb, 1),
      inv_n2[None, :], jnp.asarray(n_valid, jnp.int32).reshape(1, 1))
    return out


TOPQ = 8       # per-segment survivors (see int2_topq_scores)
TOPQ_SEG = 512  # in-kernel selection segment width (rows)


def _int2_topq_kernel(p_ref, wa_ref, wb_ref, wc_ref, wd_ref,
                      corr_ref, inv_ref, sc_ref, out_ref):
    """Fused dots + correction + inv-norm + prefix validity + IN-KERNEL
    per-512-row-segment top-TOPQ extraction. Each tile's [1, rpt]
    masked scores reshape to [rpt/512, 512] (segment-major — the SAME
    512-row segments the XLA approx_max_k path uses) and TOPQ
    iterations of a sublane-parallel max/argmax/mask extract every
    segment's top-8 at once. Emits [rpt/512, 128] per tile: lanes 0-7
    the descending top scores, lanes 8-15 their IN-SEGMENT indices
    (exact as f32: < 2^24). The [1, C] f32 score bounce (80 MB of HBM
    round trip at 10M) and the segmented approx_max_k pass disappear —
    selection runs on VMEM data and hides under the tile DMA.

    (A first design extracted a per-TILE top-8 on the [1, rpt] layout:
    whole-array reductions on one sublane serialized the VPU and
    measured 11 ms at 10M — WORSE than the 4.9 ms XLA path. The
    segment-major reshape restores sublane parallelism: 8 iterations
    over [8, 512] are ~4 vreg-wide ops each.)"""
    dots = _unpack_dots2(p_ref, wa_ref, wb_ref, wc_ref, wd_ref)
    corr = corr_ref[0, 0]
    n = sc_ref[0, 0]
    rpt = dots.shape[1]
    nseg = rpt // TOPQ_SEG
    row0 = dots[0:1, :].astype(jnp.float32) - corr
    inv = inv_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, rpt), 1)
    gidx = pl.program_id(0) * rpt + lane
    ok = (gidx < n) & (inv > 0.0)
    s = jnp.where(ok, row0 * inv, -jnp.inf).reshape(nseg, TOPQ_SEG)
    lane512 = jax.lax.broadcasted_iota(jnp.int32, (nseg, TOPQ_SEG), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (nseg, 128), 1)
    acc = jnp.zeros((nseg, 128), jnp.float32)
    for t in range(TOPQ):
        m = jnp.max(s, axis=1, keepdims=True)               # [S, 1]
        hit = jnp.min(
            jnp.where(s == m, lane512, TOPQ_SEG), axis=1, keepdims=True
        )                                                   # [S, 1]
        s = jnp.where(lane512 == hit, -jnp.inf, s)
        acc = jnp.where(out_lane == t, m, acc)
        acc = jnp.where(out_lane == TOPQ + t, hit.astype(jnp.float32), acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(5,))
def int2_topq_scores(packed_t: jax.Array, wa: jax.Array, wb: jax.Array,
                     wc: jax.Array, wd: jax.Array, rpt: int,
                     corr: jax.Array, inv_n2: jax.Array,
                     n_valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Single-query scan with IN-KERNEL per-512-row-segment top-TOPQ
    selection (same candidate set as the XLA segmented approx_max_k at
    quota 8 — exact per-segment top-8, not approximate). Returns
    ([C/512*TOPQ] f32 scores, [C/512*TOPQ] i32 GLOBAL row indices);
    -inf score = empty slot. Same masking semantics as
    int2_masked_scores. Requires rpt % 512 == 0."""
    dq, c = packed_t.shape
    if c % rpt or rpt % TOPQ_SEG:
        raise ValueError(
            f"int2_topq_scores requires C % {rpt} == 0 and rpt % 512 == 0"
        )
    for w in (wa, wb, wc, wd):
        if w.shape != (SUB, dq):
            raise ValueError(f"weights must be [{SUB}, {dq}], got {w.shape}")
    grid = c // rpt
    sseg = rpt // TOPQ_SEG  # segments per tile
    wspec = pl.BlockSpec((SUB, dq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _int2_topq_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((dq, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec,
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # (sseg, 128) blocks: sublane dim 8-divisible (rpt/512 is 8 at
        # the 4096 tile; 512-tile caches give 1, which equals the
        # array dim only when grid == 1 — pick_rpt shapes keep sseg 8)
        out_specs=pl.BlockSpec((sseg, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * sseg, 128), jnp.float32),
    )(packed_t, wa, wb, wc, wd,
      jnp.asarray(corr, jnp.float32).reshape(1, 1),
      inv_n2[None, :],
      jnp.asarray(n_valid, jnp.int32).reshape(1, 1))
    nseg = grid * sseg
    vals = out[:, :TOPQ].reshape(-1)
    local = out[:, TOPQ:2 * TOPQ].astype(jnp.int32).reshape(-1)
    base = (jnp.arange(nseg, dtype=jnp.int32) * TOPQ_SEG)[:, None]
    gidx = (local.reshape(nseg, TOPQ) + base).reshape(-1)
    # fully-masked segments still emit a real lane index (max(-inf
    # array) == -inf matches every element, so the argmax min picks
    # lane 0, never the 512 miss sentinel) — emptiness is signalled by
    # vals == -inf alone; indices are always in range by construction
    return vals, gidx


def pick_rpt(c: int) -> int:
    """Largest supported tile width dividing the capacity (capacities
    are powers of two, so this only falls through for tiny caches)."""
    for rpt in (ROWS_PER_TILE, 2048, 1024, 512, 256, 128):
        if c % rpt == 0:
            return rpt
    raise ValueError(f"capacity {c} has no 128-multiple tile divisor")
