"""Pallas fused scan kernels: tiled Hamming / int8-cosine candidate scan.

Why Pallas here: the XLA kernels in ops/knn.py materialize the full
[Q, C] score row in HBM and run lax.top_k over all C elements — at 10M
records the top-k sort dominates (measured ~22 ms for Hamming@10M vs a
~0.1 ms scan). These kernels stream the database through VMEM in tiles
(the pallas grid pipeline double-buffers the HBM->VMEM copies), reduce
each tile to 128 per-lane best candidates *inside* VMEM, and emit only
[tiles, 128] candidates; the final lax.top_k runs over tiles*128
elements (~40k at 10M) instead of 10M.

Candidate-set semantics: the database is viewed as [R, 128] lanes; each
tile keeps its best row PER LANE. Top-k then selects across
tiles x lanes. This is the standard TPU partial-reduce top-k shape (the
same idea behind lax.approx_max_k): exact for k=1, and for small k the
probability that two true top-k entries collide in the same
(tile, lane) cell is ~k^2/(2*tiles*128) — <0.1% at k=10 over 10M rows.
Use the exact XLA kernels when guaranteed-exact top-k matters more than
latency.

Mosaic layout notes (guide: /opt/skills/guides/pallas_guide.md):
  * db is reshaped host-side to [R, W, 128]: the word/feature axis rides
    the SUBLANE dimension — putting it minor would get padded to the
    128-lane width and blow VMEM 64x (measured: 20.9 MB for a 256 KB
    tile). Scores reduce over axis 1 into native (sublane, lane) 2D.
  * output blocks are (1, 8, 128): row 0 carries the 128 lane minima,
    rows 1..7 are padding to satisfy the (8, 128) tiling floor
  * argmin per lane via broadcasted_iota + masked min (no sort)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8  # output sublane padding floor
ROWS_PER_TILE = 256  # hamming tile covers ROWS_PER_TILE * 128 db rows
ROWS_PER_TILE_C = 128  # int8-cosine tile (int32 intermediates are 4x)
# fused-Hamming width ceiling (u32 words): the [R, W, 128] i32 VMEM
# tile scales linearly with W (W=16 -> 2 MB at R=256; minhash-h128's
# W=258 would be 33 MB, over the 16 MB scoped-vmem limit), and the
# batched kernel's per-word unroll scales the Mosaic program size with
# W. Wider fingerprints ride the exact XLA kernels (one fused 3D
# xor+popcount over a [Q, C] intermediate).
MAX_FUSED_HAMMING_WORDS = 16


def _lane_argbest(score2d: jax.Array, largest: bool):
    """[R, 128] -> (best [1, 128], row index of best [1, 128])."""
    r, l = score2d.shape
    if largest:
        best = jnp.max(score2d, axis=0, keepdims=True)
    else:
        best = jnp.min(score2d, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, l), 0)
    hit = score2d == best
    first = jnp.min(jnp.where(hit, rows, jnp.int32(r)), axis=0, keepdims=True)
    return best, first


def _emit_f32_best(val_ref, idx_ref, scores, largest: bool, base_row):
    """Shared per-tile candidate emit for the f32 score kernels: lane
    argbest -> global indices -> (1, SUB, 128) padded output blocks."""
    best, row = _lane_argbest(scores, largest=largest)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    gidx = (base_row + row) * LANES + lanes
    fill = -jnp.inf if largest else jnp.inf
    val_ref[0, 0:1, :] = best
    val_ref[0, 1:SUB, :] = jnp.full((SUB - 1, LANES), fill, jnp.float32)
    idx_ref[0, 0:1, :] = gidx
    idx_ref[0, 1:SUB, :] = jnp.zeros((SUB - 1, LANES), jnp.int32)


def _hamming_kernel(q_ref, db_ref, dist_ref, idx_ref):
    tile = db_ref[:]  # [R, W, 128] int32
    q = q_ref[:]  # [1, W, 1]
    x = jax.lax.bitwise_xor(tile, q)
    d = jnp.sum(jax.lax.population_count(x), axis=1)  # [R, 128]
    best, row = _lane_argbest(d, largest=False)
    base_row = pl.program_id(0) * ROWS_PER_TILE
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    gidx = (base_row + row) * LANES + lanes  # flat db row index
    dist_ref[0, 0:1, :] = best
    dist_ref[0, 1:SUB, :] = jnp.full((SUB - 1, LANES), 2**31 - 1, jnp.int32)
    idx_ref[0, 0:1, :] = gidx
    idx_ref[0, 1:SUB, :] = jnp.zeros((SUB - 1, LANES), jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def hamming_topk_fused(query: jax.Array, db: jax.Array, k: int):
    """query [W] uint32, db [C, W] uint32 with C % (ROWS_PER_TILE*128) == 0
    -> (dist [k] int32, idx [k] int32), smallest first."""
    c, w = db.shape
    if c % (ROWS_PER_TILE * LANES):
        raise ValueError(
            f"hamming_topk_fused requires C % {ROWS_PER_TILE * LANES} == 0, "
            f"got {c} (trailing rows would be silently skipped)"
        )
    r_total = c // LANES
    grid = r_total // ROWS_PER_TILE
    db3 = db.astype(jnp.int32).reshape(r_total, LANES, w).swapaxes(1, 2)
    q3 = query.astype(jnp.int32).reshape(1, w, 1)
    dist_t, idx_t = pl.pallas_call(
        _hamming_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, w, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ROWS_PER_TILE, w, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32),
        ],
    )(q3, db3)
    flat_d = dist_t[:, 0, :].reshape(-1)
    flat_i = idx_t[:, 0, :].reshape(-1)
    neg, pos = jax.lax.top_k(-flat_d, k)
    return -neg, flat_i[pos]


def _hamming_kernel_batched(qsel: int, rt: int, q_ref, db_ref, v_ref,
                            dist_ref, idx_ref):
    # [qsel, W] queries vs a shared [R, W, 128] tile: one grid step
    # serves a whole query BLOCK, so the catalog tile is fetched once
    # per qsel queries instead of once per query, and the step count
    # drops qsel-fold (per-query (1, ...) blocks pay the same grid-step
    # overhead class the scores kernel measured at ~8 ms for Q=32 over
    # 10M rows). The per-word Python loop keeps every op on 3D arrays.
    r = db_ref.shape[0]
    d = jnp.zeros((qsel, r, LANES), jnp.int32)
    for wi in range(db_ref.shape[1]):
        # static per-word REF slices: integer-indexing a traced 3D
        # value mid-axis lowers to a gather, which Mosaic rejects
        # ("Only 2D gather is supported"); ref slicing stays a load
        tw = db_ref[:, wi, :]          # [R, 128] int32
        qw = q_ref[:, wi:wi + 1]       # [qsel, 1] int32
        x = jax.lax.bitwise_xor(tw[None], qw[:, :, None])  # [qsel, R, 128]
        d = d + jax.lax.population_count(x)
    d = jnp.where(v_ref[:][None] != 0, d, jnp.int32(2**30))
    base_row = pl.program_id(1) * rt
    best, gidx = _qblock_argbest(d, False, base_row)
    dist_ref[0, 0] = best
    idx_ref[0, 0] = gidx


@functools.partial(jax.jit, static_argnums=(3,))
def hamming_topk_fused_batched(
    queries: jax.Array,  # [Q, W] uint32
    db: jax.Array,  # [C, W] uint32, C % (ROWS_PER_TILE*LANES) == 0
    valid: jax.Array,  # [C] bool (padding rows masked inside the kernel)
    k: int,
):
    """Batched masked fused Hamming scan: one pallas launch over a
    (Q/QSEL, tiles) grid streams the packed catalog once per QSEL-query
    block and never materializes [Q, C, W] (the serving-path
    requirement — 256 queries x 10M rows x W words would be tens of
    GB). Same per-(tile, lane) partial-reduce candidate semantics as
    hamming_topk_fused. Q pads to the block height with all-zero
    queries (results sliced off; Q < QSEL drops the block height
    instead). Returns ([Q, k] dist, [Q, k] idx), smallest first.
    """
    c, w = db.shape
    qn = queries.shape[0]
    if c % (ROWS_PER_TILE * LANES):
        raise ValueError(
            f"hamming_topk_fused_batched requires C % {ROWS_PER_TILE * LANES}"
            f" == 0, got {c}"
        )
    qsel = QSEL if qn >= QSEL else qn
    qpad = -(-qn // qsel) * qsel
    q2 = queries.astype(jnp.int32)
    if qpad != qn:
        q2 = jnp.concatenate(
            [q2, jnp.zeros((qpad - qn, w), jnp.int32)]
        )
    r_total = c // LANES
    # half the single-query tile height: the query-block dimension
    # multiplies every [qsel, R, 128] intermediate, and 256-row tiles
    # measured 80 KB past the 16 MB scoped-vmem limit at W=2
    rt = ROWS_PER_TILE // 2
    grid_t = r_total // rt
    db3 = db.astype(jnp.int32).reshape(r_total, LANES, w).swapaxes(1, 2)
    v2 = valid.astype(jnp.int32).reshape(r_total, LANES)
    dist_t, idx_t = pl.pallas_call(
        functools.partial(_hamming_kernel_batched, qsel, rt),
        grid=(qpad // qsel, grid_t),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((qsel, w), lambda qi, i: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rt, w, LANES),
                lambda qi, i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rt, LANES), lambda qi, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, qsel, LANES), lambda qi, i: (qi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qsel, LANES), lambda qi, i: (qi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qpad // qsel, grid_t, qsel, LANES),
                                 jnp.int32),
            jax.ShapeDtypeStruct((qpad // qsel, grid_t, qsel, LANES),
                                 jnp.int32),
        ],
    )(q2, db3, v2)
    flat_d = jnp.moveaxis(dist_t, 2, 1).reshape(qpad, -1)[:qn]
    flat_i = jnp.moveaxis(idx_t, 2, 1).reshape(qpad, -1)[:qn]
    neg, pos = jax.lax.top_k(-flat_d, k)
    return -neg, jnp.take_along_axis(flat_i, pos, axis=1)


def _scores_kernel(largest: bool, s_ref, val_ref, idx_ref):
    scores = s_ref[:]  # [R, 128] f32
    base_row = pl.program_id(0) * ROWS_PER_TILE
    _emit_f32_best(val_ref, idx_ref, scores, largest, base_row)


def _dots_norm_kernel(d_ref, rn_ref, n_ref, q_ref, val_ref, idx_ref):
    """Fused i32-dots -> cosine normalize -> prefix validity -> per-lane
    partial reduce: replaces the GEMV-output's separate f32
    convert/mask/divide XLA pass plus a scores_topk_fused launch (three
    [C]-sized materializations) with one streaming pass. Scalars ride
    two SMEM refs (Mosaic rejects scalar bitcasts, so no i32 packing)."""
    dots = d_ref[:].astype(jnp.float32)   # [R, 128]
    rn = rn_ref[:]                        # [R, 128]
    n = n_ref[0, 0]                       # prefix validity length (i32)
    inv_q = q_ref[0, 0]                   # 1/|q| (f32; 1.0 = dot/|row|)
    r = dots.shape[0]
    base_row = pl.program_id(0) * ROWS_PER_TILE
    rows = base_row + jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    gidx_e = rows * LANES + lanes2
    ok = (gidx_e < n) & (rn > 0.0)
    scores = jnp.where(ok, dots / jnp.maximum(rn, 1e-9) * inv_q, -jnp.inf)
    _emit_f32_best(val_ref, idx_ref, scores, True, base_row)


@functools.partial(jax.jit, static_argnums=(4,))
def dots_norm_topk_fused(dots: jax.Array, row_norm: jax.Array,
                         n_valid: jax.Array, inv_qnorm: jax.Array,
                         k: int):
    """Partial-reduce cosine top-k straight off the MXU GEMV output:
    dots [C] i32, row_norm [C] f32, n_valid scalar i32 (prefix
    validity: rows >= n score -inf), inv_qnorm scalar f32 (the 1/|q|
    factor; pass 1.0 for dot/|row| ranking) -> ([k] f32, [k] i32).
    Same candidate semantics as scores_topk_fused; zero-norm rows
    self-mask."""
    c = dots.shape[0]
    if c % (ROWS_PER_TILE * LANES):
        raise ValueError(
            f"dots_norm_topk_fused requires C % {ROWS_PER_TILE * LANES}"
            f" == 0, got {c}"
        )
    r_total = c // LANES
    grid = r_total // ROWS_PER_TILE
    d2 = dots.reshape(r_total, LANES)
    rn2 = row_norm.reshape(r_total, LANES)
    n_s = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    q_s = jnp.asarray(inv_qnorm, jnp.float32).reshape(1, 1)
    val_t, idx_t = pl.pallas_call(
        _dots_norm_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((ROWS_PER_TILE, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PER_TILE, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32),
        ],
    )(d2, rn2, n_s, q_s)
    flat_v = val_t[:, 0, :].reshape(-1)
    flat_i = idx_t[:, 0, :].reshape(-1)
    vals, pos = jax.lax.top_k(flat_v, k)
    return vals, flat_i[pos]


@functools.partial(jax.jit, static_argnums=(1, 2))
def scores_topk_fused(scores: jax.Array, k: int, largest: bool = True):
    """Partial-reduce top-k over a precomputed score vector.

    scores [C] f32 with C % (ROWS_PER_TILE*128) == 0 -> ([k], [k]).
    Pairs with an XLA MXU matmul for the cosine path: the matmul rides
    the systolic array at full rate, and this kernel replaces the
    ~20 ms lax.top_k-over-C with a streaming per-lane reduction.
    """
    c = scores.shape[0]
    if c % (ROWS_PER_TILE * LANES):
        raise ValueError(
            f"scores_topk_fused requires C % {ROWS_PER_TILE * LANES} == 0, got {c}"
        )
    r_total = c // LANES
    grid = r_total // ROWS_PER_TILE
    s2 = scores.reshape(r_total, LANES)
    val_t, idx_t = pl.pallas_call(
        functools.partial(_scores_kernel, largest),
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((ROWS_PER_TILE, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32),
        ],
    )(s2)
    flat_v = val_t[:, 0, :].reshape(-1)
    flat_i = idx_t[:, 0, :].reshape(-1)
    if largest:
        vals, pos = jax.lax.top_k(flat_v, k)
    else:
        neg, pos = jax.lax.top_k(-flat_v, k)
        vals = -neg
    return vals, flat_i[pos]


QSEL = 8  # query rows per batched-selection grid step


def _qblock_argbest(scores3, largest: bool, base_row):
    """[G, R, 128] -> (best [G, 128], global idx [G, 128]): the
    per-lane argbest of _lane_argbest vectorized over a leading
    query-block dim."""
    g, r, l = scores3.shape
    if largest:
        best = jnp.max(scores3, axis=1)
    else:
        best = jnp.min(scores3, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, r, l), 1)
    hit = scores3 == best[:, None, :]
    first = jnp.min(jnp.where(hit, rows, jnp.int32(r)), axis=1)  # [G, L]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (g, l), 1)
    return best, (base_row + first) * LANES + lanes


def _scores_kernel_batched(qsel: int, largest: bool, s_ref, val_ref,
                           idx_ref):
    # [QSEL, R, 128]: one grid step reduces a whole query BLOCK's tile —
    # per-query (1, R, 128) blocks measured ~8 ms of pure grid-step
    # overhead at Q=32 over 10M rows (9760 steps x 128 KB); 8-query
    # blocks cut the step count 8x and the same selection costs ~2 ms
    scores = s_ref[:]
    out_dtype = scores.dtype
    if scores.dtype == jnp.bfloat16:
        # VMEM-local upcast: Mosaic rejects the bf16 compare-broadcast
        # in the argbest ("invalid relayout" on the 3D i1 mask); the
        # HBM stream stays bf16 — only the in-register math widens
        scores = scores.astype(jnp.float32)
    base_row = pl.program_id(1) * ROWS_PER_TILE
    best, gidx = _qblock_argbest(scores, largest, base_row)
    val_ref[0, 0] = best.astype(out_dtype)
    idx_ref[0, 0] = gidx


def _dots_norm_kernel_batched(d_ref, rn_ref, n_ref, q_ref, val_ref,
                              idx_ref):
    """Batched twin of _dots_norm_kernel: [QSEL, R, 128] i32 GEMM dots
    + shared row norms + prefix validity + per-query 1/|q| -> per-lane
    argbest, one query block per grid step (no [Q, C] f32 normalize
    pass ever hits HBM)."""
    dots = d_ref[:].astype(jnp.float32)   # [QSEL, R, 128]
    rn = rn_ref[:]                        # [R, 128] shared across queries
    n = n_ref[0, 0]                       # prefix validity length (i32)
    inv_q = q_ref[:][:, 0]                # [QSEL] f32 per-query 1/|q|
    g, r, l = dots.shape
    base_row = pl.program_id(1) * ROWS_PER_TILE
    rows = base_row + jax.lax.broadcasted_iota(jnp.int32, (r, l), 0)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    ok = ((rows * LANES + lanes2) < n) & (rn > 0.0)  # [R, L]
    scores = jnp.where(
        ok[None], dots / jnp.maximum(rn, 1e-9)[None]
        * inv_q[:, None, None], -jnp.inf,
    )
    best, gidx = _qblock_argbest(scores, True, base_row)
    val_ref[0, 0] = best
    idx_ref[0, 0] = gidx


@functools.partial(jax.jit, static_argnums=(4,))
def dots_norm_topk_fused_batched(dots: jax.Array, row_norm: jax.Array,
                                 n_valid: jax.Array, inv_qnorm: jax.Array,
                                 k: int):
    """Batched partial-reduce cosine top-k straight off the MXU GEMM
    output: dots [Q, C] i32, row_norm [C] f32, n_valid scalar i32
    (prefix validity), inv_qnorm [Q] f32 -> ([Q, k] f32, [Q, k] i32).
    Replaces the separate [Q, C] f32 convert/mask/divide XLA pass +
    scores_topk_fused_batched launch (a 2x [Q, C] HBM bounce at 10M)
    with one streaming pass; same candidate semantics. Zero-norm rows
    self-mask; padded query rows are sliced off before the final
    top-k."""
    q, c = dots.shape
    if c % (ROWS_PER_TILE * LANES):
        raise ValueError(
            f"dots_norm_topk_fused_batched requires C % "
            f"{ROWS_PER_TILE * LANES} == 0, got {c}"
        )
    qsel = QSEL if q >= QSEL else q
    qpad = -(-q // qsel) * qsel
    d3 = dots if qpad == q else jnp.concatenate(
        [dots, jnp.zeros((qpad - q, c), dots.dtype)]
    )
    iq = inv_qnorm.astype(jnp.float32)
    if qpad != q:
        iq = jnp.concatenate([iq, jnp.zeros((qpad - q,), jnp.float32)])
    r_total = c // LANES
    grid_t = r_total // ROWS_PER_TILE
    d3 = d3.reshape(qpad, r_total, LANES)
    rn2 = row_norm.reshape(r_total, LANES)
    n_s = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    val_t, idx_t = pl.pallas_call(
        _dots_norm_kernel_batched,
        grid=(qpad // qsel, grid_t),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((qsel, ROWS_PER_TILE, LANES),
                         lambda qi, i: (qi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PER_TILE, LANES), lambda qi, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda qi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qsel, 1), lambda qi, i: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, qsel, LANES), lambda qi, i: (qi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qsel, LANES), lambda qi, i: (qi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qpad // qsel, grid_t, qsel, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((qpad // qsel, grid_t, qsel, LANES),
                                 jnp.int32),
        ],
    )(d3, rn2, n_s, iq.reshape(qpad, 1))
    flat_v = jnp.moveaxis(val_t, 2, 1).reshape(qpad, -1)[:q]
    flat_i = jnp.moveaxis(idx_t, 2, 1).reshape(qpad, -1)[:q]
    vals, pos = jax.lax.top_k(flat_v, k)
    return vals, jnp.take_along_axis(flat_i, pos, axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def scores_topk_fused_batched(scores: jax.Array, k: int,
                              largest: bool = True,
                              approx: bool = False):
    """Batched partial-reduce top-k: scores [Q, C] -> ([Q, k], [Q, k]).

    One pallas launch over a (Q/QSEL, tiles) grid — the batched
    companion of scores_topk_fused for multi-query serving (knn_batch):
    all queries' candidates reduce in one kernel instead of Q separate
    launches, QSEL query rows per grid step. Q pads to the block height
    with -inf rows (skipped when Q < QSEL: the block height drops to Q
    instead, so single-query callers pay no padding traffic).

    Accepts bf16 scores (returned values keep the input dtype; prefilter
    callers only use them for -inf slot masking before an exact
    rescore). approx=True selects the final k per query with
    lax.approx_max_k instead of top_k — the large-k pool selection of
    the batched int4 prefilter measured ~5 ms of pure top_k at
    (Q=32, 39k candidates, k=640) where approx_max_k at its default
    0.95 recall target costs a fraction; only valid with largest=True,
    and callers must tolerate ~5% pool-boundary loss (the int4 rescore
    pool carries a 16x rank-error margin)."""
    q, c = scores.shape
    if approx and not largest:
        raise ValueError("approx selection supports largest=True only")
    if c % (ROWS_PER_TILE * LANES):
        raise ValueError(
            f"scores_topk_fused_batched requires C % {ROWS_PER_TILE * LANES}"
            f" == 0, got {c}"
        )
    qsel = QSEL if q >= QSEL else q
    qpad = -(-q // qsel) * qsel
    fill = -jnp.inf if largest else jnp.inf
    s3 = scores if qpad == q else jnp.concatenate(
        [scores, jnp.full((qpad - q, c), fill, scores.dtype)]
    )
    r_total = c // LANES
    grid_t = r_total // ROWS_PER_TILE
    s3 = s3.reshape(qpad, r_total, LANES)
    val_t, idx_t = pl.pallas_call(
        functools.partial(_scores_kernel_batched, qsel, largest),
        grid=(qpad // qsel, grid_t),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((qsel, ROWS_PER_TILE, LANES),
                         lambda qi, i: (qi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # block (1, 1, qsel, LANES): the last two dims equal the
            # array's, satisfying the Mosaic sublane-divisibility rule
            # (a [qpad, grid_t, LANES] layout with (qsel, 1, LANES)
            # blocks fails it — same constraint as int4_masked_scores)
            pl.BlockSpec((1, 1, qsel, LANES), lambda qi, i: (qi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qsel, LANES), lambda qi, i: (qi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qpad // qsel, grid_t, qsel, LANES),
                                 scores.dtype),
            jax.ShapeDtypeStruct((qpad // qsel, grid_t, qsel, LANES),
                                 jnp.int32),
        ],
    )(s3)
    # [G, T, qsel, L] -> per-query rows [qpad, T*L]
    flat_v = jnp.moveaxis(val_t, 2, 1).reshape(qpad, -1)[:q]
    flat_i = jnp.moveaxis(idx_t, 2, 1).reshape(qpad, -1)[:q]
    if approx:
        vals, pos = jax.lax.approx_max_k(flat_v.astype(jnp.float32), k)
        vals = vals.astype(scores.dtype)
    elif largest:
        vals, pos = jax.lax.top_k(flat_v, k)
    else:
        neg, pos = jax.lax.top_k(-flat_v, k)
        vals = -neg
    return vals, jnp.take_along_axis(flat_i, pos, axis=1)


@functools.partial(jax.jit, static_argnums=(3,))
def cosine_int8_topk_hybrid(
    q8: jax.Array,  # [D] int8
    db8: jax.Array,  # [C, D] int8, C % (ROWS_PER_TILE*128) == 0
    row_norm: jax.Array,  # [C] f32
    k: int,
):
    """MXU matmul (XLA) + fused normalize/partial-reduce top-k. The
    fastest 10M cosine path: the all-pallas variant pays a 60% penalty
    doing the dot products on the VPU (measured 4.9 ms vs 3.0 ms XLA vs
    this), and the fused normalize kernel replaces the separate f32
    convert/divide pass + scores_topk_fused launch (three [C]-sized
    materializations) with one streaming pass over the GEMV output."""
    dots = jax.lax.dot_general(
        q8.reshape(1, -1), db8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )[0]
    return dots_norm_topk_fused(
        dots, row_norm, jnp.int32(db8.shape[0]), jnp.float32(1.0), k
    )


def _cosine_i8_kernel(q_ref, db_ref, rn_ref, val_ref, idx_ref):
    tile = db_ref[:].astype(jnp.int32)  # [R, D, 128]
    q = q_ref[:].astype(jnp.int32)  # [1, D, 1]
    dots = jnp.sum(tile * q, axis=1).astype(jnp.float32)  # [R, 128]
    rn = rn_ref[:]  # [R, 128]
    scores = dots / jnp.maximum(rn, 1e-9)
    best, row = _lane_argbest(scores, largest=True)
    base_row = pl.program_id(0) * ROWS_PER_TILE_C
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    gidx = (base_row + row) * LANES + lanes
    val_ref[0, 0:1, :] = best
    val_ref[0, 1:SUB, :] = jnp.full((SUB - 1, LANES), -jnp.inf, jnp.float32)
    idx_ref[0, 0:1, :] = gidx
    idx_ref[0, 1:SUB, :] = jnp.zeros((SUB - 1, LANES), jnp.int32)


@functools.partial(jax.jit, static_argnums=(3,))
def cosine_int8_topk_fused(
    q8: jax.Array,  # [D] int8 (pre-quantized query)
    db8: jax.Array,  # [C, D] int8, C % (ROWS_PER_TILE*128) == 0
    row_norm: jax.Array,  # [C] f32
    k: int,
):
    """-> (scores [k] f32 = dot/|row| — divide by |q8| outside, idx [k])."""
    c, d = db8.shape
    if c % (ROWS_PER_TILE_C * LANES):
        raise ValueError(
            f"cosine_int8_topk_fused requires C % {ROWS_PER_TILE_C * LANES} == 0, "
            f"got {c}"
        )
    r_total = c // LANES
    grid = r_total // ROWS_PER_TILE_C
    db3 = db8.reshape(r_total, LANES, d).swapaxes(1, 2)
    rn3 = row_norm.reshape(r_total, LANES)
    q3 = q8.reshape(1, d, 1)
    val_t, idx_t = pl.pallas_call(
        _cosine_i8_kernel,
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, d, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ROWS_PER_TILE_C, d, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ROWS_PER_TILE_C, LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32),
        ],
    )(q3, db3, rn3)
    flat_v = val_t[:, 0, :].reshape(-1)
    flat_i = idx_t[:, 0, :].reshape(-1)
    vals, pos = jax.lax.top_k(flat_v, k)
    return vals, flat_i[pos]

# -- fused MXU int8 cosine ----------------------------------------------------
#
# The int8 scan is bandwidth-bound (10M x 64 int8 = 640 MB). Measured
# at 10M x 64 with varying queries on a v5e chip: this kernel 0.59 ms
# vs 0.48 ms for cosine_int8_topk_hybrid — the XLA int8 GEMV is already
# near speed-of-light on a healthy runtime, and this kernel's
# 128/useful-columns MXU waste (~0.83 ms FLOP bound at D=64) caps it
# slightly behind. It remains valuable as (a) a single-dispatch path
# with no materialized 10M-score array (40 MB less HBM churn when
# capacity is tight), and (b) the faster option on runtimes where the
# XLA GEMV degrades (the tunneled runtime measured the hybrid at
# 2.8 ms, 6x this kernel's cost model).
# This kernel does the dot on the MXU *inside* pallas: pack 128//D
# db rows into each 128-lane row (db8.reshape — free, no transpose),
# convert to bf16 in-register (exact for int8: 8-bit mantissa), and
# multiply by a [128, 128] block-diagonal matrix whose j-th useful
# column holds the query in rows j*D..(j+1)*D. f32 MXU accumulation is
# exact at these magnitudes (|dot| <= 64*127^2 < 2^24), so dots are
# bit-identical to the int32 GEMV. Norm division happens afterward on
# the tiny candidate set only (per-tile/lane winners), keeping scores
# identical to the hybrid path up to candidate selection: each
# (tile, lane-pair) keeps its best DOT rather than best dot/|row|; with
# per-row |q8 row| within ~0.4% of 127*sqrt(1) of each other the
# selection differs only among near-ties (same class of approximation
# as the documented per-(tile,lane) collision bound).


def _cosine_i8_mxu_kernel(rpt, per, w_ref, db_ref, val_ref, idx_ref):
    x = db_ref[:].astype(jnp.bfloat16)  # [R, 128] = per db rows per line
    w = w_ref[:]  # [128, 128] bf16; cols 0..per-1 hold the query
    dots = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, 128]; cols >= per are 0
    # only `per` lanes carry scores, so a single per-lane winner would
    # leave a thin candidate pool; emit SUB per-segment winners instead
    # (all 8 output sublanes useful -> grid*SUB*per candidates)
    seg = rpt // SUB
    d3 = dots.reshape(SUB, seg, LANES)
    best = jnp.max(d3, axis=1)  # [SUB, 128]
    rows = jax.lax.broadcasted_iota(jnp.int32, (SUB, seg, LANES), 1)
    row = jnp.min(
        jnp.where(d3 == best[:, None, :], rows, jnp.int32(seg)), axis=1
    )  # [SUB, 128] row-within-segment of each winner
    base = pl.program_id(0) * rpt
    segs = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    gidx = per * (base + segs * seg + row) + lanes  # valid for lanes < per
    val_ref[0, :, :] = best
    idx_ref[0, :, :] = gidx


def _pick_rpt(packed_rows: int) -> int:
    """Largest sublane-aligned tile height dividing the packed row count."""
    for rpt in (1024, 800, 512, 320, 256, 160, 128, 96, 64, 32):
        if packed_rows % rpt == 0:
            return rpt
    raise ValueError(
        f"packed row count {packed_rows} has no 32-multiple tile divisor "
        f"<= 1024; pad the candidate set"
    )


@functools.partial(jax.jit, static_argnums=(3,))
def cosine_int8_topk_mxu(
    q8: jax.Array,  # [D] int8, D in {32, 64, 128}
    db8: jax.Array,  # [C, D] int8, (C*D/128) % 32 == 0
    row_norm: jax.Array,  # [C] f32 (|int8 row|)
    k: int,
):
    """-> (scores [k] f32 = dot/|row| — divide by |q8| outside, idx [k])."""
    c, d = db8.shape
    if LANES % d:
        raise ValueError(f"cosine_int8_topk_mxu requires 128 % D == 0, got D={d}")
    per = LANES // d  # db rows per packed 128-lane row
    if c % per:
        raise ValueError(f"C={c} must be a multiple of {per} for D={d}")
    packed = c // per
    rpt = _pick_rpt(packed)
    grid = packed // rpt
    db_packed = db8.reshape(packed, LANES)
    qb = q8.astype(jnp.bfloat16)
    w = jnp.zeros((LANES, LANES), jnp.bfloat16)
    for j in range(per):
        w = w.at[j * d:(j + 1) * d, j].set(qb)
    val_t, idx_t = pl.pallas_call(
        functools.partial(_cosine_i8_mxu_kernel, rpt, per),
        grid=(grid,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpt, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32),
        ],
    )(w, db_packed)
    dots = val_t[:, :, 0:per].reshape(-1)  # [grid*SUB*per] candidate dots
    idxs = idx_t[:, :, 0:per].reshape(-1)
    if k > dots.shape[0]:
        raise ValueError(
            f"k={k} exceeds the candidate pool {dots.shape[0]} "
            f"(grid {grid} x {SUB} segments x {per} rows/line)"
        )
    cand = dots / jnp.maximum(row_norm[idxs], 1e-9)
    vals, pos = jax.lax.top_k(cand, k)
    return vals, idxs[pos]
