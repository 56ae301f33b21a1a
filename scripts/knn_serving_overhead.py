"""Measure the knn serving envelope's host overhead at catalog scale.

The BASELINE target metric is "/v1/query p50 top-k @10M records" — the
SERVED path, not the raw kernel. The bench's query p50s are device-loop
kernel timings (the tunnel's ~25 ms dispatch makes wall-clock serving
timings fiction there), so this harness pins the missing piece: what the
`EmbeddedBackend.knn` envelope (async hop + lock + device snapshot +
dispatch + deferred rid resolve + Hit construction) adds ON TOP of the
kernel, as a function of catalog size.

The claim under test: the envelope is O(k) host work, independent of
catalog size. Before the deferred-rid-mapping change it copied the
whole rid list under the writer lock — `list(cache.rids)` measures
70-120 ms at 10M rows, ~20x the on-chip device scan itself — which this
harness also reports (`rid_copy_ms`) for contrast, since that is
exactly the cost the generation-counter design removed.

Methodology: the kernel op the exact path dispatches to
(`knn_ops.cosine_topk`) is wrapped with an in-place timer that forces
host sync inside the timed section; each served call's envelope is then
total − inner-kernel, per call. (An A/B scheme — served call vs raw
kernel call, subtract medians — was tried first and CANNOT resolve the
envelope at 10M rows: the 1-core CPU kernel term is ~300 ms with ~±20 ms
per-iteration jitter, so the subtraction's run-to-run noise is ~±8 ms
against a ~0.5 ms envelope.) The envelope is representation-independent
(the same snapshot/resolve code wraps every quant tier), so the f32
path is measured. Runs on the CPU backend (--cpu) by design: the
quantity measured is host Python work, and CPU removes tunnel jitter.

Prints one JSON line, e.g.
  {"n": 10000000, "serving_overhead_p50_ms": 0.51, "rid_copy_ms": 71.8, ...}
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (jax.config, not env: "
                         "the axon plugin injects itself ahead of env)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # single-device serving path regardless of ambient device count
    # (under the test env's 8 virtual CPU devices the backend would
    # auto-mesh and dispatch to sharded_cosine_topk instead of the
    # wrapped kernel) — the envelope under measurement is the same
    # host code either way
    import os

    os.environ["UCFP_SHARD"] = "off"

    import numpy as np

    sys.path.insert(0, ".")
    from ucfp_tpu.index.embedded import EmbeddedBackend, _VecCache
    from ucfp_tpu.ops import knn as knn_ops

    n, d, k = args.n, args.d, args.k
    b = EmbeddedBackend(tempfile.mkdtemp(prefix="ucfp-overhead-"))

    # Synthesize the row cache directly (10M upserts through the WAL is
    # an ingest bench, not a serving one) with the exact shapes the
    # upsert path builds: capacity-doubled data, dense prefix validity,
    # rid list + rid->row dict.
    cap = 1024
    while cap < n:
        cap *= 2
    rng = np.random.default_rng(0)
    c = _VecCache(d)
    c.data = np.zeros((cap, d), np.float32)
    c.data[:n] = rng.standard_normal((n, d)).astype(np.float32)
    c.tags = np.zeros((cap, 2), np.int32)
    c.rids = list(range(n))
    c.rows = {i: i for i in range(n)}
    c.n = n
    c.dirty = True
    b._vec[(0, d)] = c

    q = rng.standard_normal(d).astype(np.float32)
    qv = [float(x) for x in q]

    # wrap the kernel the exact f32 path dispatches to, forcing host
    # sync INSIDE the timed section so the envelope excludes all device
    # wait (the served path's own np.asarray then re-converts for free)
    inner: list[float] = []
    orig = knn_ops.cosine_topk

    def timed_kernel(*a, **kw):
        t0 = time.perf_counter()
        s, i = orig(*a, **kw)
        s, i = np.asarray(s), np.asarray(i)
        inner.append((time.perf_counter() - t0) * 1e3)
        return s, i

    knn_ops.cosine_topk = timed_kernel
    try:
        async def measure():
            hits = await b.knn(0, qv, k, exact=True)  # warm + compile
            assert len(hits) == k
            inner.clear()
            env, totals = [], []
            # one persistent event loop for every served call, like the
            # server's — asyncio.run per query would bill loop setup
            # (~0.5 ms) to the serving envelope
            for _ in range(args.iters):
                t0 = time.perf_counter()
                await b.knn(0, qv, k, exact=True)
                total = (time.perf_counter() - t0) * 1e3
                totals.append(total)
                env.append(total - inner[-1])
            return env, totals

        env, totals = asyncio.run(measure())
    finally:
        knn_ops.cosine_topk = orig

    rid_copy = []
    for _ in range(5):
        t0 = time.perf_counter()
        snap = list(c.rids)
        rid_copy.append((time.perf_counter() - t0) * 1e3)
        del snap

    env_sorted = sorted(env)
    print(json.dumps({
        "n": n,
        "d": d,
        "k": k,
        "iters": args.iters,
        "serving_overhead_p50_ms": round(statistics.median(env), 3),
        "serving_overhead_p90_ms": round(
            env_sorted[int(len(env_sorted) * 0.9)], 3
        ),
        "served_total_p50_ms": round(statistics.median(totals), 3),
        "kernel_p50_ms": round(statistics.median(inner), 3),
        "rid_copy_ms": round(statistics.median(rid_copy), 3),
    }))
    b.close()


if __name__ == "__main__":
    main()
