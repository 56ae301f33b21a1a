"""ICI-sharded brute-force top-k: the north-star query kernel.

Replaces the reference's single-host rayon cosine scan
(src/index/embedded/mod.rs:268-360) with a row-sharded HBM-resident
matrix over a jax.sharding.Mesh:

  * the fingerprint/embedding matrix [C, D] is sharded on rows across
    the "d" axis (each chip holds C/n rows in HBM)
  * the query is replicated; each chip computes its local scores with
    one MXU matmul (cosine) or XOR+popcount (Hamming)
  * per-chip lax.top_k(k) reduces the candidate set n*k << C
  * one all_gather over ICI moves n*k candidates everywhere; a final
    lax.top_k(k) merges — the classic two-stage distributed top-k

Scaling: for 10M x 768 f32 that is 30 GB — 3.8 GB/chip on a v5e-8,
inside the 16 GB HBM budget; per-query FLOPs 2*C*D/n per chip ride the
MXU and the collective moves only k rows. Tie behavior matches the
single-chip path: lax.top_k prefers the lower (global) row index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

AXIS = "d"


def _flat_shard_index(axes: tuple) -> "jax.Array":
    """Flattened shard id for rows sharded over several mesh axes in
    P(axes, ...) order (major axis first)."""
    idx = jnp.int32(0)
    for ax in axes:
        idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return idx


def _merge_axis(vals, idx, ax: str, k: int):
    """One two-stage top-k merge step over a mesh axis: gather every
    shard's candidates along `ax`, keep the best k. Called innermost
    axis first so ICI absorbs the wide merge and only k candidates per
    slice ride the slower cross-slice links (DCN)."""
    va = jax.lax.all_gather(vals, ax)  # [n, Q, kc]
    ia = jax.lax.all_gather(idx, ax)
    q = vals.shape[0]
    vc = jnp.moveaxis(va, 0, 1).reshape(q, -1)
    ic = jnp.moveaxis(ia, 0, 1).reshape(q, -1)
    fv, pos = jax.lax.top_k(vc, min(k, vc.shape[1]))
    return fv, jnp.take_along_axis(ic, pos, axis=1)


def shard_matrix(mesh: Mesh, matrix, valid):
    """Place [C, D] rows and [C] validity across the mesh (C % n == 0)."""
    ms = NamedSharding(mesh, P(AXIS, None))
    vs = NamedSharding(mesh, P(AXIS))
    return jax.device_put(matrix, ms), jax.device_put(valid, vs)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _sharded_cosine_impl(query, matrix, valid, k: int, mesh: Mesh,
                         axes: tuple = (AXIS,)):
    def local(q, m, v):
        # q [Q, D] replicated; m [C/n, D]; v [C/n]
        # a shard can contribute at most ALL of its rows, so clamping the
        # local top-k to the shard height keeps any k <= C exact
        k_local = min(k, m.shape[0])
        row_norm = jnp.linalg.norm(m, axis=1)
        q_norm = jnp.linalg.norm(q, axis=1, keepdims=True)
        dots = jax.lax.dot_general(
            q, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        denom = q_norm * row_norm[None, :]
        ok = v[None, :] & (row_norm[None, :] > 0.0) & (q_norm > 0.0)
        scores = jnp.where(ok, dots / jnp.where(denom == 0.0, 1.0, denom),
                           -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k_local)  # [Q, k_local] local
        gidx = idx + _flat_shard_index(axes) * m.shape[0]
        # hierarchical merge: innermost axis (ICI) first, so only k
        # candidates per slice cross the slower outer links (DCN)
        for ax in reversed(axes):
            vals, gidx = _merge_axis(vals, gidx, ax, k)
        return vals, gidx

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs replicated via all_gather + local merge
    )(query, matrix, valid)


def sharded_cosine_topk(query, matrix, valid, k: int, mesh: Mesh,
                        axes: tuple = (AXIS,)):
    """query [Q, D] f32, matrix [C, D] row-sharded over `axes`, valid [C]
    -> ([Q,k], [Q,k]). axes=("s","d") = rows over slices x ICI with a
    hierarchical cross-chip merge."""
    return _sharded_cosine_impl(query, matrix, valid, k, mesh, tuple(axes))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _sharded_hamming_impl(query, matrix, valid, k: int, mesh: Mesh,
                          axes: tuple = (AXIS,)):
    def local(q, m, v):
        # q [Q, W] uint32; m [C/n, W]. Accumulate per-word so the live
        # intermediate is [Q, C/n] int32, never [Q, C/n, W].
        k_local = min(k, m.shape[0])
        dist = jnp.zeros((q.shape[0], m.shape[0]), jnp.int32)
        for w in range(m.shape[1]):
            x = jnp.bitwise_xor(q[:, w][:, None], m[None, :, w])
            dist = dist + jax.lax.population_count(x).astype(jnp.int32)
        big = jnp.int32(0x7FFFFFFF)
        dist = jnp.where(v[None, :], dist, big)
        vals, idx = jax.lax.top_k(-dist, k_local)
        gidx = idx + _flat_shard_index(axes) * m.shape[0]
        for ax in reversed(axes):
            vals, gidx = _merge_axis(vals, gidx, ax, k)
        return -vals, gidx

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs replicated via all_gather + local merge
    )(query, matrix, valid)


def sharded_hamming_topk(query, matrix, valid, k: int, mesh: Mesh,
                         axes: tuple = (AXIS,)):
    """query [Q, W] u32 packed bits, matrix [C, W] row-sharded -> dist, idx."""
    return _sharded_hamming_impl(query, matrix, valid, k, mesh, tuple(axes))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sharded_hamming_fused_impl(query, matrix, k: int, mesh: Mesh):
    from ..ops import pallas_scan

    def local(q, m):
        # q [W] replicated; m [C/n, W]; fused pallas per-lane scan
        dist, idx = pallas_scan.hamming_topk_fused(q, m, k)
        gidx = idx + jax.lax.axis_index(AXIS) * m.shape[0]
        dist_all = jax.lax.all_gather(dist, AXIS).reshape(-1)
        idx_all = jax.lax.all_gather(gidx, AXIS).reshape(-1)
        neg, pos = jax.lax.top_k(-dist_all, k)
        return -neg, idx_all[pos]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(query, matrix)


def sharded_hamming_topk_fused(query, matrix, k: int, mesh: Mesh):
    """Fused pallas scan per shard + cross-chip merge — the big-catalog
    path (sub-ms at 10M rows on ONE chip; each of n chips scans C/n).
    query [W] uint32, matrix [C, W] row-sharded with
    (C/n) % (ROWS_PER_TILE*128) == 0; no validity mask — callers keep
    the matrix dense (the embedded backend's fused path compacts rows)."""
    return _sharded_hamming_fused_impl(query, matrix, k, mesh)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _sharded_cosine_int8_impl(q8, db8, row_norm, valid, k: int, mesh: Mesh):
    def local(q, m, rn, v):
        # q [D] int8 replicated; m [C/n, D] int8; rn [C/n] f32
        k_local = min(k, m.shape[0])
        dots = jax.lax.dot_general(
            q.reshape(1, -1), m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )[0].astype(jnp.float32)
        ok = v & (rn > 0.0)
        scores = jnp.where(ok, dots / jnp.maximum(rn, 1e-9), -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k_local)
        gidx = idx + jax.lax.axis_index(AXIS) * m.shape[0]
        vals_all = jax.lax.all_gather(vals, AXIS).reshape(-1)
        idx_all = jax.lax.all_gather(gidx, AXIS).reshape(-1)
        fv, pos = jax.lax.top_k(vals_all, k)
        return fv, idx_all[pos]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q8, db8, row_norm, valid)


def sharded_cosine_int8_topk(q8, db8, row_norm, valid, k: int, mesh: Mesh):
    """int8 row-sharded scan: the 10M x 768 catalog is 7.5 GB at int8
    (f32 would be 30 GB), so a v5e-8 holds ~1 GB/chip; the per-shard
    scan measured 1.6-2.0 ms at 10M/8 x 768 on one chip (round 4 — the
    0.94 GB stream is ~1.2 ms, the rest is fixed dispatch overhead).
    At 10M x 64 the FULL one-chip scan is 0.48 ms.
    q8 [D] int8 (pre-quantized, scores are dot/|row| — divide by |q8|
    outside), db8 [C, D] int8 row-sharded, row_norm/valid [C]."""
    return _sharded_cosine_int8_impl(q8, db8, row_norm, valid, k, mesh)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _sharded_cosine_sketch_impl(query, planes, db8, row_norm, sketch, valid,
                                k: int, cand: int, mesh: Mesh,
                                axes: tuple = (AXIS,)):
    from ..ops import knn as knn_ops

    total_c = db8.shape[0]

    def local(q, pl, m, rn, sk, v):
        # each shard runs the sketch prefilter + exact rescore over its
        # own rows with a PROPORTIONAL share of the pool (the pool is a
        # fraction of rows, and each shard holds rows/n — so per-chip
        # traffic divides by the mesh size), then the standard two-stage
        # top-k merge. The per-shard floor keeps tiny shards exact.
        k_local = min(k, m.shape[0])
        cand_local = min(
            m.shape[0],
            max(512, 16 * k, (cand * m.shape[0] + total_c - 1) // total_c),
        )
        vals, idx = knn_ops.cosine_sketch_topk(
            q, pl, m, rn, sk, v, k_local, cand_local
        )
        gidx = idx + _flat_shard_index(axes) * m.shape[0]
        vals, gidx = vals[None, :], gidx[None, :]
        for ax in reversed(axes):
            vals, gidx = _merge_axis(vals, gidx, ax, k)
        return vals[0], gidx[0]

    sk_spec = (P(axes, None, None) if sketch.ndim == 3  # lane-tiled
               else P(axes, None))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axes, None), P(axes), sk_spec, P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )(query, planes, db8, row_norm, sketch, valid)


def sharded_cosine_sketch_topk(query, planes, db8, row_norm, sketch, valid,
                               k: int, cand: int, mesh: Mesh,
                               axes: tuple = (AXIS,)):
    """Sharded sketch-prefilter cosine: query [D] f32 replicated,
    db8/sketch row-sharded over `axes`. Each chip scans only its own
    sketch shard (960 MB / n at 10M x 768) and rescores its
    proportional share of the pool (cand * rows_local / rows_total) —
    per-chip HBM BANDWIDTH divides by the mesh size; per-dispatch fixed
    overhead does not. Round-4 shard-scale measurement (BENCH_r04): one
    chip serves a 10M/8 = 1.25M-row shard in 1.0-1.2 ms (exact shard
    scan 1.6-2.0 ms), + ~0.1 ms modeled k-row all-gather merge → a
    v5e-8 derives to ~1.1-1.4 ms at recall >= 0.9 (~1.6-2.1 ms exact)
    for the BASELINE 10M x 768 shape. The sketch pipeline's gather +
    composition overhead keeps it ABOVE sub-ms at 8 chips; the leaner
    packed-int4 path below (0.65-0.88 ms/shard measured, ~0.75-0.98 ms
    derived v5e-8 at measured-recall ~1.0) is the sharded tier that
    reaches the sub-ms @10M single-query target. Returns
    ([k] scores, [k] global idx)."""
    return _sharded_cosine_sketch_impl(query, planes, db8, row_norm, sketch,
                                       valid, k, cand, mesh, tuple(axes))


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 10))
def _sharded_cosine_int4_impl(query, db8, row_norm, packed_t, inv_n4,
                              valid, k: int, mesh: Mesh,
                              axes: tuple = (AXIS,),
                              n_valid=None, kind: str = "int4"):
    from ..ops import knn as knn_ops

    topk_fn = (knn_ops.cosine_int2_topk if kind == "int2"
               else knn_ops.cosine_int4_topk)
    pool_fn = knn_ops.int2_pool if kind == "int2" else knn_ops.int4_pool

    def local(q, m, rn, pk, inv, v, *nv):
        # each shard runs the packed prefilter + exact rescore over
        # its own rows. The pool is FIXED-size (int4/int2 rank error is
        # quantization noise, not bit starvation), so each shard keeps
        # its own full pool — per-shard recall only improves vs the
        # single-chip path while the scanned bytes divide by the mesh.
        k_local = min(k, m.shape[0])
        pool_local = pool_fn(m.shape[0], k)
        if nv:
            # global prefix validity maps to a per-shard prefix (rows
            # are contiguous blocks), unlocking the fused kernel on
            # every shard
            n_local = jnp.clip(
                nv[0] - _flat_shard_index(axes) * m.shape[0],
                0, m.shape[0],
            ).astype(jnp.int32)
            vals, idx = topk_fn(
                q, m, rn, pk, inv, v, k_local, pool_local,
                n_valid=n_local,
            )
        else:
            vals, idx = topk_fn(
                q, m, rn, pk, inv, v, k_local, pool_local
            )
        gidx = idx + _flat_shard_index(axes) * m.shape[0]
        vals, gidx = vals[None, :], gidx[None, :]
        for ax in reversed(axes):
            vals, gidx = _merge_axis(vals, gidx, ax, k)
        return vals[0], gidx[0]

    args = (query, db8, row_norm, packed_t, inv_n4, valid)
    in_specs = [P(), P(axes, None), P(axes), P(None, axes), P(axes),
                P(axes)]
    if n_valid is not None:
        args = args + (jnp.asarray(n_valid, jnp.int32),)
        in_specs.append(P())
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*args)


def sharded_cosine_int4_topk(query, db8, row_norm, packed_t, inv_n4,
                             valid, k: int, mesh: Mesh,
                             axes: tuple = (AXIS,), n_valid=None):
    """Sharded packed-int4 prefilter cosine: query [D] f32 replicated;
    db8 [C, D] row-sharded; packed_t [D/2, C] COLUMN-sharded over the
    same axes (catalog rows ride the lane axis of the packed layout,
    so the shard split lands on axis 1 — index/embedded.py
    _put_packed). Each chip streams half its int8 shard bytes, rescores
    its own fixed pool exactly, then the standard two-stage top-k
    merge. Round-4 shard-scale measurement (BENCH_r04): one chip serves
    a 10M/8 = 1,245,184-row shard in 0.65-0.88 ms across fused
    captures (query_sharded_per_shard_int4_p50_ms, 64-iter device-loop
    calibration — shorter loops at this scale are jitter-dominated),
    + ~0.1 ms modeled merge → v5e-8 derives to ~0.75-0.98 ms at
    measured-recall ~1.0 — the BASELINE sub-ms @10M single-query
    target as shard-scale arithmetic. Returns ([k] scores, [k] global
    idx)."""
    return _sharded_cosine_int4_impl(query, db8, row_norm, packed_t,
                                     inv_n4, valid, k, mesh, tuple(axes),
                                     n_valid)


def sharded_cosine_int2_topk(query, db8, row_norm, packed_t, inv_n2,
                             valid, k: int, mesh: Mesh,
                             axes: tuple = (AXIS,), n_valid=None):
    """Sharded packed-int2 prefilter cosine: the int4 impl with the
    quarter-byte scan + its fixed 8k pool per shard (ops/knn.py
    cosine_int2_topk). packed_t [D/4, C] COLUMN-sharded like the int4
    columns (_put_packed). Returns ([k] scores, [k] global idx)."""
    return _sharded_cosine_int4_impl(query, db8, row_norm, packed_t,
                                     inv_n2, valid, k, mesh, tuple(axes),
                                     n_valid, kind="int2")


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _sharded_cosine_int4_batch_impl(query, db8, row_norm, packed_t,
                                    inv_n4, n_valid, k: int, mesh: Mesh,
                                    axes: tuple = (AXIS,),
                                    kind: str = "int4"):
    from ..ops import knn as knn_ops

    batched = (knn_ops.cosine_int2_topk_batched if kind == "int2"
               else knn_ops.cosine_int4_topk_batched)
    batch_pool = (knn_ops.int2_batch_pool if kind == "int2"
                  else knn_ops.int4_batch_pool)

    def local(q, m, rn, pk, inv, nv):
        # each shard runs ONE packed scan for the whole query block +
        # per-query exact rescore of its own (batch-sized) pool. The
        # global prefix maps to a per-shard prefix exactly as in the
        # single-query impl (rows are contiguous blocks).
        k_local = min(k, m.shape[0])
        pool_local = batch_pool(m.shape[0], k)
        n_local = jnp.clip(
            nv - _flat_shard_index(axes) * m.shape[0], 0, m.shape[0]
        ).astype(jnp.int32)
        vals, idx = batched(
            q, m, rn, pk, inv, n_local, k_local, pool_local
        )
        gidx = idx + _flat_shard_index(axes) * m.shape[0]
        for ax in reversed(axes):
            vals, gidx = _merge_axis(vals, gidx, ax, k)
        return vals, gidx

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes), P(None, axes), P(axes),
                  P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(query, db8, row_norm, packed_t, inv_n4,
      jnp.asarray(n_valid, jnp.int32))


def sharded_cosine_int4_batch_topk(query, db8, row_norm, packed_t,
                                   inv_n4, n_valid, k: int, mesh: Mesh,
                                   axes: tuple = (AXIS,)):
    """Batched sharded packed-int4 prefilter: query [Q, D] f32
    replicated, db8 row-sharded, packed_t column-sharded (as in
    sharded_cosine_int4_topk). PREFIX-VALIDITY ONLY (unfiltered
    serving): validity must be `arange < n_valid` globally — filtered
    batches ride the exact sharded GEMM. Each chip streams HALF its
    int8 shard bytes once for the whole block; the standard two-stage
    merge crosses k candidates per shard. Returns ([Q, k] scores,
    [Q, k] global idx)."""
    return _sharded_cosine_int4_batch_impl(query, db8, row_norm, packed_t,
                                           inv_n4, n_valid, k, mesh,
                                           tuple(axes))


def sharded_cosine_int2_batch_topk(query, db8, row_norm, packed_t,
                                   inv_n2, n_valid, k: int, mesh: Mesh,
                                   axes: tuple = (AXIS,)):
    """Batched sharded packed-int2 prefilter: the int4 batch impl with
    the quarter-byte scan + segmented-quota selection per shard
    (ops/knn.py cosine_int2_topk_batched). packed_t [D/4, C]
    COLUMN-sharded like the int4 columns. PREFIX-VALIDITY ONLY.
    Returns ([Q, k] scores, [Q, k] global idx)."""
    return _sharded_cosine_int4_batch_impl(query, db8, row_norm, packed_t,
                                           inv_n2, n_valid, k, mesh,
                                           tuple(axes), kind="int2")


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _sharded_cosine_int8_batch_impl(query, db8, row_norm, valid, k: int,
                                    mesh: Mesh, axes: tuple = (AXIS,)):
    def local(q, m, rn, v):
        # q [Q, D] f32 replicated; m [C/n, D] int8; rn/v [C/n]
        k_local = min(k, m.shape[0])
        qa = jnp.max(jnp.abs(q), axis=1, keepdims=True)
        qs = jnp.where(qa == 0.0, 1.0, qa / 127.0)
        qq = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
        dots = jax.lax.dot_general(
            qq, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [Q, C/n]
        qn = jnp.linalg.norm(qq.astype(jnp.float32), axis=1, keepdims=True)
        denom = jnp.maximum(qn, 1e-9) * jnp.maximum(rn, 1e-9)[None, :]
        ok = v[None, :] & (rn[None, :] > 0.0) & (qn > 0.0)
        scores = jnp.where(ok, dots / denom, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k_local)
        gidx = idx + _flat_shard_index(axes) * m.shape[0]
        for ax in reversed(axes):
            vals, gidx = _merge_axis(vals, gidx, ax, k)
        return vals, gidx

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )(query, db8, row_norm, valid)


def sharded_cosine_int8_batch_topk(query, db8, row_norm, valid, k: int,
                                   mesh: Mesh, axes: tuple = (AXIS,)):
    """Batched serving variant: query [Q, D] f32 (quantized on device,
    semantics identical to ops.knn.cosine_topk_int8 — scores are cosines
    of the quantized rows), db8 [C, D] int8 row-sharded over the mesh.
    Returns ([Q, k] scores, [Q, k] global row idx)."""
    return _sharded_cosine_int8_batch_impl(query, db8, row_norm, valid, k,
                                           mesh, tuple(axes))


# ---------------------------------------------------------------------------
# ICI merge cost model (the cross-chip term of the derived v5e-8 keys)
# ---------------------------------------------------------------------------

# v5e ICI per-link bandwidth, bytes/s each direction. Public v5e system
# spec: 4 ICI links/chip at 400 Gbps apiece (1,600 Gbps aggregate);
# 400 Gbps = 50 GB/s per direction per link. The all_gather rides ONE
# ring direction per hop, so the per-hop wire time uses the single-link
# figure, not the aggregate.
V5E_LINK_BYTES_PER_S = 50e9
# per-hop latency floor for a small ICI transfer (DMA issue + switch +
# synchronization). Public microbenchmarks of small TPU collectives sit
# at ~1-2 us/hop; 2 us is the conservative end.
ICI_HOP_LATENCY_S = 2e-6


def ici_merge_model(n_shards: int, k: int, *, candidate_bytes: int = 8,
                    topology: str = "ring",
                    link_bytes_per_s: float = V5E_LINK_BYTES_PER_S,
                    hop_latency_s: float = ICI_HOP_LATENCY_S) -> dict:
    """Parameterized cost model for the two-stage top-k merge collective.

    After each shard's local top-k, the merge is one all_gather of
    [k] x (f32 score + i32 global index) = k * candidate_bytes per
    shard, followed by an [n_shards * k] lax.top_k on every chip
    (sub-microsecond at these sizes; carried in the latency term).

    Ring all_gather (bidirectional exchange): ceil((S-1)/2) sequential
    hop-steps, each moving the growing candidate block over one link;
    total wire bytes per link ~= (S-1) * k * candidate_bytes. The 2x4
    v5e-8 slice is a (2, 4) torus: gathering over the 4-ring then the
    2-ring costs ceil(3/2) + ceil(1/2) = 3 hop-steps with the same
    total payload, which `topology="2x4"` models (the hierarchical
    `_merge_axis` call order in this module).

    Latency dominates at serving k: at k=10, payload = 80 B/shard and
    the wire time is ~11 ns/hop against a ~2 us/hop floor — the model
    is honest about WHY the merge is cheap (it is latency-bound, not
    bandwidth-bound). Returns every input so the bench can publish the
    derivation, not just the result.
    """
    if topology == "ring":
        hops = max(1, (n_shards - 1 + 1) // 2) if n_shards > 1 else 0
    elif topology in ("2x4", "torus2d"):
        a = 2
        b = max(1, n_shards // a)
        hops = ((b - 1 + 1) // 2) + ((a - 1 + 1) // 2) if n_shards > 1 else 0
    else:
        raise ValueError(f"unknown topology {topology!r}")
    payload_bytes = k * candidate_bytes
    wire_bytes = (n_shards - 1) * payload_bytes
    t = hops * hop_latency_s + wire_bytes / link_bytes_per_s
    return {
        "n_shards": n_shards,
        "k": k,
        "candidate_bytes": candidate_bytes,
        "payload_bytes_per_shard": payload_bytes,
        "wire_bytes_per_link": wire_bytes,
        "topology": topology,
        "hops": hops,
        "link_gbytes_per_s": link_bytes_per_s / 1e9,
        "hop_latency_us": hop_latency_s * 1e6,
        "total_ms": round(t * 1e3, 4),
    }
