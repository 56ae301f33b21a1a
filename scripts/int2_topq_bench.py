#!/usr/bin/env python3
"""Time the in-kernel-selection int2 single-query path at 10M x 768 on
the real chip (bench.py methodology: 64/8-iter device loops, median of
three calibration pairs)."""

import functools
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main(n_rows=10_000_000, k=10, iters=8):
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import knn as knn_ops
    from ucfp_tpu.ops import pallas_scan

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
    print(f"n={n} pool={pool}", flush=True)

    # arrays ride as ARGUMENTS: closing over them captures multi-GB
    # compile-time constants (the CLAUDE.md timing-loop trap — the
    # first attempt lowered a 9.63 GB program and broke the tunnel's
    # remote-compile pipe)
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

    for r in range(3):
        ms = bench._timed(
            lambda it: float(
                loop_full(qf, m8, rn, packed2_t, inv_n2, nv, it)
            ),
            iters,
        ) * 1e3
        print(f"round {r}: int2-topq full pipeline {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
