"""Measured decomposition of the served audio-ingest path: where the
~330-670x-RT served number comes from when the kernel runs ~130,000x RT
(VERDICT r04 #5 — the tunnel transfer floor, measured).

Per 32-clip batch at the soak's workload (4 s clips, 8 kHz):

  * naive `device_put(...).block_until_ready()` reads ~1 ms — ILLUSORY:
    the tunnel runtime defers the actual wire transfer until a kernel
    consumes the buffer (the same fiction as its ~25 ms dispatch).
  * forcing consumption (put -> jit(sum) -> fetch scalar) measures the
    REAL per-batch wire cost: ~450-560 ms for the 4.1 MB f32 body,
    ~255-330 ms for the 2.05 MB s16 body (~8-9.5 MB/s effective) —
    matching the ingest soak's access-log per-request elapsed and
    CLAUDE.md's 480-980 ms congested-window observation, and showing
    the s16 wire saving ~170 ms/batch (the mechanism behind
    `ingest_audio_http_s16_vs_f32` > 1 in clean windows).
  * the wang batch kernel itself: 128 s of audio per batch at ~130k x
    RT ≈ 1 ms of device time — 2-3 ORDERS below the transfer.

So through THIS tunnel the served path is transfer-bound at
~15 ms/clip/connection (66 clips/s/conn; 16 overlapping conns measured
83-126 aggregate, i.e. the tunnel serializes most of the wire). On
direct-attached hardware (PCIe, 10-30 GB/s) the same 4.1 MB costs
0.15-0.4 ms and the wall moves to host HTTP framing + WAL — the
per-core ceilings in BASELINE.md "Served ceilings".

Usage: python scripts/audio_served_decomp.py   (needs the chip)
Prints one JSON line with the measured medians.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    f32 = rng.standard_normal((32, 32000)).astype(np.float32)
    i16 = (f32 * 8000).astype(np.int16)

    consume = jax.jit(
        lambda x: jnp.sum(x, dtype=jnp.float32)
        if x.dtype == jnp.float32 else jnp.sum(x.astype(jnp.int32)))
    float(consume(jax.device_put(f32)))  # compile both variants
    float(consume(jax.device_put(i16)))

    def naive_put_ms(a, n=10):
        ts = []
        for i in range(n):
            b = a.copy()
            b.flat[0] = i  # novel buffer: defeat memoization
            t0 = time.perf_counter()
            jax.device_put(b).block_until_ready()
            ts.append((time.perf_counter() - t0) * 1000)
        return sorted(ts)[n // 2]

    def forced_ms(a, n=10):
        ts = []
        for i in range(n):
            b = a.copy()
            b.flat[0] = i
            t0 = time.perf_counter()
            float(consume(jax.device_put(b)))
            ts.append((time.perf_counter() - t0) * 1000)
        ts.sort()
        return ts[n // 2], ts[0], ts[-1]

    f_med, f_lo, f_hi = forced_ms(f32)
    i_med, i_lo, i_hi = forced_ms(i16)
    out = {
        "batch_shape": "32 x 32000 (4 s @ 8 kHz)",
        "naive_put_ms_f32": round(naive_put_ms(f32), 1),
        "forced_transfer_ms_f32": round(f_med, 1),
        "forced_transfer_range_f32": [round(f_lo, 1), round(f_hi, 1)],
        "forced_transfer_ms_s16": round(i_med, 1),
        "forced_transfer_range_s16": [round(i_lo, 1), round(i_hi, 1)],
        "effective_mb_per_s_f32": round(f32.nbytes / 1e3 / f_med, 1),
        "kernel_ms_per_batch_est": round(32 * 4.0 / 130_000 * 1000, 2),
        "clips_per_sec_per_conn_floor": round(32 / (f_med / 1000), 1),
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
