"""Per-query cost of the batched serving paths vs batch size Q.

The published batched numbers are Q=32 (0.26-0.35 ms/query int4, 0.52-0.62
exact). The packed scan re-streams the catalog once per 64-query chunk and
the [Q, C] score bounce is per-query-constant, so per-query cost should
keep dropping toward the bounce+selection floor as Q grows:

    int4:  (3.75 GB scan + Q * 40 MB bf16 bounce r/w) / Q
    exact: (7.5 GB GEMM read + Q * 80 MB i32 dots r/w) / Q

This probe measures Q in {32, 64, 128} for both paths at the BASELINE
shape (10M x 768) on the real chip. HBM budget rules out Q=256 for the
exact path (10.2 GB dots beside the 7.15 GB catalog); int4 Q=128 fits
(3.75 packed + 7.15 int8 + 2.56 bounce).

Usage: python scripts/int4_batch_q_sweep.py [--rows 10000000] [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

from bench import _timed, _row_norms_int8  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--qs", type=str, default="32,64,128")
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import knn as knn_ops
    from ucfp_tpu.ops import pallas_scan

    tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n = (args.rows // tile) * tile
    d = 768
    k = 10

    @jax.jit
    def gen(keys):
        def one(kk):
            bits = jax.random.bits(kk, (n // 16, d // 4), jnp.uint32)
            bytes4 = [
                ((bits >> (8 * i)) & 0xFF).astype(jnp.uint8) for i in range(4)
            ]
            by = jnp.stack(bytes4, axis=-1).reshape(n // 16, d)
            return (by.astype(jnp.int16) - 128).astype(jnp.int8)

        return jax.lax.map(one, keys).reshape(n, d)

    m8 = jax.block_until_ready(gen(jax.random.split(jax.random.PRNGKey(0), 16)))
    rn = jax.block_until_ready(_row_norms_int8(m8, tile))
    packed_t, inv_n4 = (
        jax.block_until_ready(a)
        for a in knn_ops.pack_int4_cols_chunked(m8, chunk=tile)
    )

    @functools.partial(jax.jit, static_argnums=(5, 6))
    def loop_i4(q, m, rnv, pk, inv, it, pool):
        def body(_i, carry):
            _vals, idx = knn_ops.cosine_int4_topk_batched(
                carry, m, rnv, pk, inv, jnp.int32(n), k, pool,
            )
            return jnp.clip(
                carry + m[idx[0, 0]].astype(jnp.float32)[None, :] / 127.0,
                -127.0, 127.0,
            )

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop_exact(q, m, rnv, it):
        def body(_i, carry):
            dots = jax.lax.dot_general(
                carry, m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            _vals, idx = pallas_scan.dots_norm_topk_fused_batched(
                dots, rnv, jnp.int32(m.shape[0]),
                jnp.ones((q.shape[0],), jnp.float32), k,
            )
            return jnp.clip(
                carry.astype(jnp.int32)
                + m[idx[0, 0]].astype(jnp.int32)[None, :] // 127,
                -127, 127,
            ).astype(jnp.int8)

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out.astype(jnp.int32))

    results = {}
    for q in (int(s) for s in args.qs.split(",")):
        pool = knn_ops.int4_batch_pool(n, k)
        qi = jax.random.randint(
            jax.random.PRNGKey(4), (q, d), -127, 128, dtype=jnp.int8
        )
        qf = qi.astype(jnp.float32)
        ms = _timed(
            lambda it: float(loop_i4(qf, m8, rn, packed_t, inv_n4, it, pool)),
            args.iters,
        ) * 1000.0
        results[f"int4_q{q}_total_ms"] = round(ms, 3)
        results[f"int4_q{q}_ms_per_query"] = round(ms / q, 4)
        print(json.dumps({f"int4_q{q}": results[f"int4_q{q}_ms_per_query"]}),
              flush=True)
        if not args.skip_exact and q <= 64:
            # Q=128 exact would stage a 5.1 GB [Q, C] i32 dots array
            # beside the 7.15 GB catalog + 3.75 GB packed cache — OOM.
            ms = _timed(lambda it: float(loop_exact(qi, m8, rn, it)),
                        args.iters) * 1000.0
            results[f"exact_q{q}_total_ms"] = round(ms, 3)
            results[f"exact_q{q}_ms_per_query"] = round(ms / q, 4)
            print(json.dumps(
                {f"exact_q{q}": results[f"exact_q{q}_ms_per_query"]}),
                flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
