"""Headline benchmark: phash images/sec/chip on the real device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline (BASELINE.md): driver target is >= 50 000 images/sec/chip for
the 256x256 pHash ingest path on v5e; vs_baseline is value / 50000.
Secondary numbers (multi-hash bundle throughput, audio xRT, top-k query
latency) ride along in "extra" for the record.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_phash(batch=512, iters=20, warmup=3):
    import jax

    from ucfp_tpu.ops import imagehash

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(batch, 256, 256, 3), dtype=np.uint8)
    dimgs = jax.device_put(imgs)

    def run():
        return imagehash.single_hash_kernel(dimgs, 256, 256, "phash")

    for _ in range(warmup):
        jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_multihash(batch=256, iters=10, warmup=2):
    import jax

    from ucfp_tpu.ops import imagehash

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(batch, 256, 256, 3), dtype=np.uint8)
    dimgs = jax.device_put(imgs)

    def run():
        return imagehash.multihash_kernel(dimgs, 256, 256)

    for _ in range(warmup):
        jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_audio_xrt(secs=60.0, iters=5):
    """Wang landmark extraction real-time factor (hours of audio per sec)."""
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops.audio import constellation, dsp

    sr = 8000
    t = np.arange(int(secs * sr)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0)
         ).astype(np.float32)
    cfg = constellation.WangConfig()

    def run():
        power = dsp.stft_power(jnp.asarray(x), 1024, 256, True)
        slab = sr // 256
        tt, ff, vv = constellation.pick_peaks(
            power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db
        )
        return constellation.wang_pairs(
            tt, ff, vv, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
        )

    jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return secs * iters / dt  # x real time


def bench_query_p50(n=1_000_000, d=64, k=10, iters=50):
    """Single-chip cosine top-k latency over n rows (ms, p50)."""
    import jax

    from ucfp_tpu.ops import knn as knn_ops

    rng = np.random.default_rng(0)
    matrix = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
    valid = jax.device_put(np.ones(n, bool))
    q = rng.normal(size=(1, d)).astype(np.float32)
    jax.block_until_ready(knn_ops.cosine_topk(q, matrix, valid, k))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(knn_ops.cosine_topk(q, matrix, valid, k))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def main():
    phash_ips = bench_phash()
    extra = {}
    try:
        extra["multihash_images_per_sec"] = round(bench_multihash(), 1)
        extra["audio_wang_xrt"] = round(bench_audio_xrt(), 1)
        extra["query_cosine_p50_ms_1m_x64"] = round(bench_query_p50(), 3)
    except Exception as e:  # secondary metrics must not sink the headline
        extra["error"] = f"{type(e).__name__}: {e}"
    print(
        json.dumps(
            {
                "metric": "phash images/sec/chip",
                "value": round(phash_ips, 1),
                "unit": "images/s",
                "vs_baseline": round(phash_ips / 50_000.0, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
