#!/usr/bin/env python3
"""On-chip stage decomposition of the int2 single-query pipeline at the
BASELINE 10M x 768 shape. Times, as device fori_loops:

  scan   : pallas int2_masked_scores only
  sel    : scan + segmented approx_max_k quota selection
  shrink : sel + stage-2 pool shrink
  full   : cosine_int2_topk (adds the 8k gather + exact rescore)

Methodology: bench.py's _timed (median of three (t(N)-t(1)) pairs).
"""

import functools
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(n_rows=10_000_000, k=10, iters=16):
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import knn as knn_ops
    from ucfp_tpu.ops import pallas_int2, pallas_scan

    tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n = (n_rows // tile) * tile
    d = 768

    @jax.jit
    def gen(keys):
        def one(kk):
            bits = jax.random.bits(kk, (n // 16, d // 4), jnp.uint32)
            bytes4 = [
                ((bits >> (8 * i)) & 0xFF).astype(jnp.uint8)
                for i in range(4)
            ]
            by = jnp.stack(bytes4, axis=-1).reshape(n // 16, d)
            return (by.astype(jnp.int16) - 128).astype(jnp.int8)

        return jax.lax.map(one, keys).reshape(n, d)

    m8 = jax.block_until_ready(
        gen(jax.random.split(jax.random.PRNGKey(0), 16))
    )
    rn = jax.block_until_ready(bench._row_norms_int8(m8, tile))
    packed2_t, inv_n2 = (
        jax.block_until_ready(a)
        for a in knn_ops.pack_int2_cols_chunked(m8, chunk=tile)
    )
    qf = jax.random.normal(jax.random.PRNGKey(7), (d,), jnp.float32) * 40.0
    pool = knn_ops.int2_pool(n, k)
    nv = jnp.int32(n)
    print(f"n={n} pool={pool}", file=sys.stderr)

    rpt = pallas_int2.pick_rpt(n)
    seg = knn_ops.SKETCH_SEG
    nseg = n // seg
    quota = min(seg, max(8, -(-int(pool * 1.3) // nseg)))
    print(f"rpt={rpt} seg={seg} nseg={nseg} quota={quota}", file=sys.stderr)

    # arrays ride as ARGUMENTS: closing over them captures multi-GB
    # compile-time constants (the CLAUDE.md timing-loop trap — the
    # first run lowered a 9.6 GB program and broke the remote compile)
    def scan_scores(q, pk, inv):
        qq = knn_ops._quantize_query(q)
        wa, wb, wc, wd, corr = knn_ops._int2_query_parts(qq, d // 4)
        return pallas_int2.int2_masked_scores(
            pk, wa, wb, wc, wd, rpt, corr, inv, nv
        )

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop_scan(q, pk, inv, it):
        def body(_i, carry):
            s2 = scan_scores(carry, pk, inv)
            return jnp.clip(carry + s2[0] * 1e-6, -127.0, 127.0)

        return jnp.sum(jax.lax.fori_loop(0, it, body, q))

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def loop_sel(q, pk, inv, it, with_shrink):
        def body(_i, carry):
            s2 = scan_scores(carry, pk, inv)
            _sv, si = jax.lax.approx_max_k(s2.reshape(nseg, seg), quota)
            gidx = (
                si + (jnp.arange(nseg, dtype=jnp.int32) * seg)[:, None]
            ).reshape(-1)
            if with_shrink and nseg * quota > 2 * pool:
                flat_v = _sv.reshape(-1)
                v2, p2 = jax.lax.approx_max_k(flat_v, pool)
                gidx = jnp.take(gidx, p2)
            return jnp.clip(
                carry + gidx[0].astype(jnp.float32) * 1e-9, -127.0, 127.0
            )

        return jnp.sum(jax.lax.fori_loop(0, it, body, q))

    @functools.partial(jax.jit, static_argnums=(6,))
    def loop_full(q, m, rnv, pk, inv, nvs, it):
        vd = jnp.ones((m.shape[0],), bool)

        def body(_i, carry):
            _vals, idx = knn_ops.cosine_int2_topk(
                carry, m, rnv, pk, inv, vd, k, pool, n_valid=nvs
            )
            return jnp.clip(
                carry + m[idx[0]].astype(jnp.float32) / 127.0,
                -127.0, 127.0,
            )

        return jnp.sum(jax.lax.fori_loop(0, it, body, q))

    out = {}
    out["scan"] = bench._timed(
        lambda it: float(loop_scan(qf, packed2_t, inv_n2, it)), iters) * 1e3
    out["sel"] = bench._timed(
        lambda it: float(loop_sel(qf, packed2_t, inv_n2, it, False)),
        iters) * 1e3
    out["shrink"] = bench._timed(
        lambda it: float(loop_sel(qf, packed2_t, inv_n2, it, True)),
        iters) * 1e3
    out["full"] = bench._timed(
        lambda it: float(loop_full(qf, m8, rn, packed2_t, inv_n2, nv, it)),
        iters) * 1e3
    for kk, v in out.items():
        print(f"{kk:8s} {v:7.3f} ms")
    print(f"sel-scan    {out['sel']-out['scan']:7.3f} ms")
    print(f"shrink-sel  {out['shrink']-out['sel']:7.3f} ms")
    print(f"full-shrink {out['full']-out['shrink']:7.3f} ms")


if __name__ == "__main__":
    main()
