#!/usr/bin/env python3
"""Time the int2 masked-scores scan at tile widths 4096 vs 8192 at the
10M x 768 shape (is the 3.42 ms scan grid-step-bound or MXU-bound?)."""

import functools
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main(n_rows=10_000_000, iters=16):
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
            by = jnp.stack(
                [((bits >> (8 * i)) & 0xFF).astype(jnp.uint8)
                 for i in range(4)], axis=-1
            ).reshape(n // 16, d)
            return (by.astype(jnp.int16) - 128).astype(jnp.int8)

        return jax.lax.map(one, keys).reshape(n, d)

    m8 = jax.block_until_ready(
        gen(jax.random.split(jax.random.PRNGKey(0), 16)))
    packed2_t, inv_n2 = (
        jax.block_until_ready(a)
        for a in knn_ops.pack_int2_cols_chunked(m8, chunk=tile)
    )
    del m8
    qf = jax.random.normal(jax.random.PRNGKey(7), (d,), jnp.float32) * 40.0
    nv = jnp.int32(n)

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def loop_scan(q, pk, inv, rpt, it):
        def body(_i, carry):
            qq = knn_ops._quantize_query(carry)
            wa, wb, wc, wd, corr = knn_ops._int2_query_parts(qq, d // 4)
            s2 = pallas_int2.int2_masked_scores(
                pk, wa, wb, wc, wd, rpt, corr, inv, nv)
            return jnp.clip(carry + s2[0] * 1e-6, -127.0, 127.0)

        return jnp.sum(jax.lax.fori_loop(0, it, body, q))

    for rpt in (4096, 8192, 16384):
        if n % rpt:
            continue
        ms = bench._timed(
            lambda it: float(loop_scan(qf, packed2_t, inv_n2, rpt, it)),
            iters) * 1e3
        print(f"rpt={rpt}: scan {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
