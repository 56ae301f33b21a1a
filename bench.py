"""Headline benchmark: phash images/sec/chip on the real device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Measurement design: the remote/tunneled TPU runtime acks dispatch before
compute finishes and device->host fetches carry seconds of fixed tunnel
latency, so naive wall-clock timing is fiction. Every benchmark here
runs its iteration loop ON DEVICE inside one jit (lax.fori_loop with a
data dependency between iterations so nothing can be elided or
overlapped), fetches one scalar at the end to force completion, and
subtracts a 1-iteration calibration run to cancel dispatch + transfer
overhead:

    per_iter = (t(N) - t(1)) / (N - 1)

Baseline (BASELINE.md): driver target >= 50 000 images/sec/chip for
256x256 pHash ingest on v5e; vs_baseline = value / 50000. Secondary
metrics (multi-hash bundle, audio Wang xRT, 1M-row cosine top-k p50)
ride along in "extra".
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def _timed(fn, n_iters: int) -> float:
    """Seconds per iteration via the (t(N)-t(1))/(N-1) calibration.

    Tunnel dispatch jitter is the same order as a short device loop, so
    a single pair can be wildly off in EITHER direction (round 1 vs 2's
    phantom multihash 'regression' was this — first-positive-pair
    estimates of the identical kernel moved 684k -> 563k, and a
    contended run once printed 4.2M). Take the MEDIAN of three pairs
    (positives only), with the raw t(N)/N upper bound as the fallback.
    """
    fn(1)  # compile both variants + warm
    fn(n_iters)
    estimates = []
    fallback = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn(1)
        t1 = time.perf_counter()
        fn(n_iters)
        t2 = time.perf_counter()
        fallback = (t2 - t1) / n_iters
        delta = (t2 - t1) - (t1 - t0)
        if delta > 0:
            estimates.append(delta / (n_iters - 1))
    if estimates:
        return sorted(estimates)[len(estimates) // 2]
    return max(fallback, 1e-9)


def bench_phash(batch=512, iters=256):
    # 256 iters ~= 170 ms of device time per loop call: an order of
    # magnitude above tunnel jitter, so the calibration pairs converge
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import imagehash

    rng = np.random.default_rng(0)
    # select-chain: the loop picks one of 4 pre-staged batches by a
    # hash-derived index — a real data dependency that defeats loop-
    # invariant hoisting WITHOUT adding synthetic write traffic (the
    # whole-array bump variant measured ~6% slower)
    stack4 = jax.device_put(
        rng.integers(0, 256, size=(4, batch, 256, 256, 3), dtype=np.uint8)
    )

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(s4, n):
        def body(_i, carry):
            x = jax.lax.dynamic_index_in_dim(s4, carry % 4, 0, keepdims=False)
            h = imagehash.single_hash_kernel(x, 256, 256, "phash")
            return (carry + jnp.sum(h[:, 0].astype(jnp.int32))) % 1000003

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def run(n):
        return int(loop(stack4, n))

    per_iter = _timed(run, iters)
    return batch / per_iter


def bench_multihash(batch=256, iters=256):
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import imagehash

    rng = np.random.default_rng(0)
    stack4 = jax.device_put(
        rng.integers(0, 256, size=(4, batch, 256, 256, 3), dtype=np.uint8)
    )

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(s4, n):
        def body(_i, carry):
            x = jax.lax.dynamic_index_in_dim(s4, carry % 4, 0, keepdims=False)
            out = imagehash.multihash_kernel(x, 256, 256)
            return (carry + jnp.sum(out["phash"][:, 0].astype(jnp.int32))) % 1000003

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def run(n):
        return int(loop(stack4, n))

    per_iter = _timed(run, iters)
    return batch / per_iter


def bench_audio_xrt(secs=60.0, iters=128):
    """Wang constellation extraction real-time factor (x real time).

    Measures the PRODUCTION pipeline — the bit-exact integer
    spectrogram (dsp.stft_power_int, what extract_landmarks serves) →
    peak picking → pairing — not the float inspect-path STFT.
    Round-4 session-10 rewrite: the STFT framing and the [P, W]
    successor windows were gather-formulated (x[idx] over 1.9M indices,
    t[succ_c] over 3x[1800, 256]) and paid the ~10 ns/element TPU
    gather constant — 23 ms of the 24 ms clip. Static shifted slices
    (dsp._frame_rows, constellation._successor_window) are
    bit-identical (parity_ok re-verified on-chip) and took the 60 s
    clip to ~0.4 ms: xRT ~2.5k → ~150k. iters=128: at ~0.4 ms/iter the
    loop must put ~50 ms on-device so the ~30-60 ms dispatch jitter
    cannot dominate the (t(N)-t(1))/(N-1) estimate (the shard-scale
    lesson)."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from ucfp_tpu.ops.audio import constellation, dsp

    sr = 8000
    t = np.arange(int(secs * sr)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0)
    ).astype(np.float32)
    cfg = constellation.WangConfig()
    xd = jax.device_put(x)

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(samples, n):
        def body(_i, carry):
            power = dsp.stft_power_int(carry, 1024, 256, True).astype(
                jnp.float32
            )
            slab = sr // 256
            tt, ff, vv = constellation.pick_peaks(
                power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db
            )
            h, t1, ok = constellation.wang_pairs(
                tt, ff, vv, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
            )
            # dependency: perturb the first sample by the landmark count
            delta = jnp.sum(ok.astype(jnp.int32)) % 7
            return carry.at[0].add(delta.astype(jnp.float32) * 1e-7)

        out = jax.lax.fori_loop(0, n, body, samples)
        return jnp.sum(out[:8])

    def run(n):
        with enable_x64():  # the int64 spectrogram needs x64 tracing
            return float(loop(xd, n))

    per_iter = _timed(run, iters)
    return secs / per_iter


def bench_audio_xrt_panako_haitsma(secs=60.0, iters_p=128, iters_h=32,
                                   iters_hf=8):
    """Panako and Haitsma extraction xRT (production integer pipelines)
    — the remaining published audio throughput claims, captured by the
    driver instead of quoted from ad-hoc scripts. Returns
    (panako_xrt, haitsma_xrt, haitsma_fft_xrt) where the last is the
    flagged ucfp-int-fft-v1 spectrogram (HaitsmaConfig(fft=True),
    VERDICT r04 #9) — measured ~16 ms/clip vs the dense DFT's ~1.4:
    the honest answer to "would an integer FFT cut deeper?" is no on
    this hardware (BASELINE.md "Haitsma integer FFT" has the
    decomposition); the key exists so the claim stays
    driver-reproducible. Loop sizing per the jitter rule: Panako
    ~0.42 ms/iter x 128 ≈ 54 ms, Haitsma ~1.7 ms/iter x 32 ≈ 54 ms,
    FFT-path ~16 ms/iter x 8 ≈ 128 ms — all above the ~30-60 ms
    dispatch-jitter band."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from ucfp_tpu.ops.audio import constellation, dsp
    from ucfp_tpu.ops.audio import haitsma as hops

    sr = 8000
    t = np.arange(int(secs * sr)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0)
    ).astype(np.float32)
    pcfg = constellation.PanakoConfig()
    xd = jax.device_put(x)
    slab = sr // 256

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_panako(samples, n):
        def body(_i, carry):
            power = dsp.stft_power_int(carry, 1024, 256, True).astype(
                jnp.float32
            )
            tt, ff, vv = constellation.pick_peaks(
                power, slab, pcfg.peaks_per_sec, pcfg.min_anchor_mag_db
            )
            h, aux, ok = constellation.panako_triplets(
                tt, ff, vv, pcfg.fan_out, pcfg.target_zone_t,
                pcfg.target_zone_f,
            )
            delta = jnp.sum(ok.astype(jnp.int32)) % 7
            return carry.at[0].add(delta.astype(jnp.float32) * 1e-7)

        return jnp.sum(jax.lax.fori_loop(0, n, body, samples)[:8])

    t5 = np.arange(int(secs * hops.HAITSMA_SR)) / hops.HAITSMA_SR
    x5 = (
        0.4 * np.sin(2 * np.pi * 440 * t5)
        + 0.2 * np.sin(2 * np.pi * 1200 * t5)
    ).astype(np.float32)
    x5d = jax.device_put(x5)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def loop_haitsma(samples, n, fft=False):
        def body(_i, carry):
            w = hops.haitsma_words(carry, 300.0, 2000.0, fft)
            delta = jnp.sum(w & jnp.uint32(7)) % jnp.uint32(7)
            return carry.at[0].add(delta.astype(jnp.float32) * 1e-7)

        return jnp.sum(jax.lax.fori_loop(0, n, body, samples)[:8])

    def run_p(n):
        with enable_x64():
            return float(loop_panako(xd, n))

    def run_h(n):
        with enable_x64():
            return float(loop_haitsma(x5d, n))

    def run_hf(n):
        with enable_x64():
            return float(loop_haitsma(x5d, n, True))

    return (secs / _timed(run_p, iters_p), secs / _timed(run_h, iters_h),
            secs / _timed(run_hf, iters_hf))


def bench_query_p50(n=1_000_000, d=64, k=10, iters=64):
    """Cosine top-k latency over n rows (ms per query)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    matrix = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
    valid = jax.device_put(np.ones(n, bool))
    q0 = jax.device_put(rng.normal(size=(1, d)).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop(q, m, v, it):
        row_norm = jnp.linalg.norm(m, axis=1)

        def body(_i, carry):
            dots = jax.lax.dot_general(
                carry, m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            qn = jnp.linalg.norm(carry, axis=1, keepdims=True)
            scores = jnp.where(
                v[None, :], dots / (qn * row_norm[None, :] + 1e-9), -jnp.inf
            )
            vals, idx = jax.lax.top_k(scores, k)
            # dependency: rotate the query by the top hit's row
            return carry + m[idx[0, 0]][None, :] * 1e-6

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    def run(it):
        return float(loop(q0, matrix, valid, it))

    per_iter = _timed(run, iters)
    return per_iter * 1000.0


def bench_hamming_10m(n=10_000_000, w=2, k=10, iters=64):
    """Hamming top-k over 10M packed 64-bit fingerprints (ms per query).
    Data generated on device (80 MB) to skip host transfer."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    matrix = jax.random.randint(
        key, (n, w), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    matrix = jax.block_until_ready(matrix)
    q0 = jnp.asarray(np.array([[12345, 67890]], np.uint32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(q, m, it):
        def body(_i, carry):
            x = jnp.bitwise_xor(carry[:, None, :], m[None, :, :])
            dist = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
            _vals, idx = jax.lax.top_k(-dist, k)
            return jnp.bitwise_xor(carry, m[idx[0, 0]][None, :])

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out.astype(jnp.int32))

    def run(it):
        return int(loop(q0, matrix, it))

    return _timed(run, iters) * 1000.0


def bench_cosine_int8_10m(n=10_000_000, d=64, k=10, iters=32):
    """int8-quantized cosine top-k over 10M x 64 rows (ms per query);
    the quantized representation the sub-ms @10M design calls for.
    640 MB generated on device."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(1)
    m8 = jax.random.randint(key, (n, d), -127, 128, dtype=jnp.int32).astype(
        jnp.int8
    )
    m8 = jax.block_until_ready(m8)
    row_norm = jnp.linalg.norm(m8.astype(jnp.float32), axis=1)
    q0 = jnp.asarray(np.random.default_rng(2).normal(size=(1, d)).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop(q, m, rn, it):
        def body(_i, carry):
            qa = jnp.max(jnp.abs(carry), axis=1, keepdims=True)
            qs = jnp.where(qa == 0.0, 1.0, qa / 127.0)
            qq = jnp.clip(jnp.round(carry / qs), -127, 127).astype(jnp.int8)
            dots = jax.lax.dot_general(
                qq, m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            qn = jnp.linalg.norm(qq.astype(jnp.float32), axis=1, keepdims=True)
            scores = dots / (qn * rn[None, :] + 1e-9)
            _vals, idx = jax.lax.top_k(scores, k)
            return carry + m[idx[0, 0]].astype(jnp.float32)[None, :] * 1e-6

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    def run(it):
        return float(loop(q0, m8, row_norm, it))

    return _timed(run, iters) * 1000.0


def bench_hamming_10m_fused(k=10, iters=64):
    """Pallas fused per-lane-reduce Hamming top-k at 10M (ms per query)."""
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import pallas_scan

    tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n = (10_000_000 // tile) * tile
    key = jax.random.PRNGKey(0)
    db = jax.random.randint(key, (n, 2), 0, 2**31 - 1, dtype=jnp.int32).astype(
        jnp.uint32
    )
    db = jax.block_until_ready(db)
    q0 = jnp.asarray(np.array([12345, 678901], np.uint32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(q, m, it):
        def body(_i, carry):
            _dist, idx = pallas_scan.hamming_topk_fused(carry, m, k)
            return jnp.bitwise_xor(carry, m[idx[0]])

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out.astype(jnp.int32))

    def run(it):
        return int(loop(q0, db, it))

    return _timed(run, iters) * 1000.0


def bench_cosine_int8_10m_hybrid(k=10, iters=32):
    """MXU matmul + pallas partial-reduce top-k at 10M x 64 (ms/query)."""
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import pallas_scan

    tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n = (10_000_000 // tile) * tile
    key = jax.random.PRNGKey(0)
    m8 = jax.random.randint(key, (n, 64), -127, 128, dtype=jnp.int32).astype(
        jnp.int8
    )
    m8 = jax.block_until_ready(m8)
    rn = jnp.linalg.norm(m8.astype(jnp.float32), axis=1)
    q0 = jax.random.randint(
        jax.random.PRNGKey(3), (64,), -127, 128, dtype=jnp.int32
    ).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop(q, m, rnv, it):
        def body(_i, carry):
            _vals, idx = pallas_scan.cosine_int8_topk_hybrid(carry, m, rnv, k)
            return jnp.clip(
                carry.astype(jnp.int32) + m[idx[0]].astype(jnp.int32) // 127,
                -127, 127,
            ).astype(jnp.int8)

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out.astype(jnp.int32))

    def run(it):
        return int(loop(q0, m8, rn, it))

    return _timed(run, iters) * 1000.0


def bench_cosine_int8_10m_mxu(k=10, iters=32):
    """Fused all-pallas MXU int8 cosine at 10M x 64 (ms/query). On a
    healthy runtime the XLA-GEMV hybrid wins by ~20%; on the tunneled
    runtime the XLA GEMV degrades ~6x and this kernel is the fast path
    (ops/pallas_scan.py:321-346) — benched so the driver captures
    whichever runtime it runs on."""
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import pallas_scan

    tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n = (10_000_000 // tile) * tile
    key = jax.random.PRNGKey(0)
    m8 = jax.random.randint(key, (n, 64), -127, 128, dtype=jnp.int32).astype(
        jnp.int8
    )
    m8 = jax.block_until_ready(m8)
    rn = jnp.linalg.norm(m8.astype(jnp.float32), axis=1)
    q0 = jax.random.randint(
        jax.random.PRNGKey(3), (64,), -127, 128, dtype=jnp.int32
    ).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop(q, m, rnv, it):
        def body(_i, carry):
            _vals, idx = pallas_scan.cosine_int8_topk_mxu(carry, m, rnv, k)
            return jnp.clip(
                carry.astype(jnp.int32) + m[idx[0]].astype(jnp.int32) // 127,
                -127, 127,
            ).astype(jnp.int8)

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out.astype(jnp.int32))

    def run(it):
        return int(loop(q0, m8, rn, it))

    return _timed(run, iters) * 1000.0


def _row_norms_int8(m8, chunk):
    """|row| of an int8 matrix without materializing an int32 copy:
    lax.map over row blocks keeps the live intermediate at [chunk, D]."""
    import jax
    import jax.numpy as jnp

    n, d = m8.shape
    assert n % chunk == 0

    def f(block):
        x = block.astype(jnp.int32)
        return jnp.sqrt(jnp.sum(x * x, axis=1).astype(jnp.float32))

    return jax.lax.map(f, m8.reshape(n // chunk, chunk, d)).reshape(n)


def bench_cosine_int8_10m_768(k=10, iters=8, qbatch=32,
                              n_rows=10_000_000, rounds=3,
                              recall_q=104, shards=8):
    """The BASELINE target shape: int8 cosine top-k over 10M x 768.

    Returns a dict of driver-facing metrics. The catalog is 7.5 GB at
    int8 — the representation that fits one v5e HBM (f32 would be 30 GB).
    A single-query scan is HBM-bandwidth-bound: 7.5 GB / ~819 GB/s
    (v5e) = 9.2 ms floor on ONE chip, sub-ms only with the matrix
    ICI-sharded over 8+ chips (each streams ~1 GB). The batched GEMM
    amortizes the stream across Q queries, so per-query cost divides by
    Q — the serving path for fleet traffic (knn_batch).

    Statistical design (round-4 directives):
      * every latency that proved tunnel-sensitive (exact single, both
        sketch tiers) is measured `rounds` times SPREAD across the
        session (recall work interleaved between rounds), reported as
        median with [min, max]; `unstable` is set when any spread
        exceeds 2x — a flag that the environment was contended and the
        medians should not be quoted as stable truth.
      * recall is measured over `recall_q` random queries (k=10 each →
        ~1k Bernoulli trials) with a 95% binomial interval, not 8
        draws; ground truth is the exact int8 ranking batched through
        one GEMM per 26-query chunk.
      * the v5e-8 story is MEASURED at its own shard shape: the full
        per-shard pipeline (sketch scan → selection → gather → rescore,
        and the exact int8 shard scan) at n/8 rows on this one chip,
        plus an explicit all-gather-of-k merge cost model → a derived
        v5e-8 estimate that is arithmetic, not faith.
    """
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops import pallas_scan

    tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
    n = (n_rows // tile) * tile
    d = 768

    @jax.jit
    def gen(keys):
        # chunked generation: randint would stage a full uint32 copy and
        # bitcast pads its layout — both OOM at 10M x 768. lax.map keeps
        # the live intermediates at one chunk (~1 GB) beside the 7.15 GB
        # int8 output.
        def one(k):
            bits = jax.random.bits(k, (n // 16, d // 4), jnp.uint32)
            bytes4 = [
                ((bits >> (8 * i)) & 0xFF).astype(jnp.uint8) for i in range(4)
            ]
            by = jnp.stack(bytes4, axis=-1).reshape(n // 16, d)
            return (by.astype(jnp.int16) - 128).astype(jnp.int8)

        return jax.lax.map(one, keys).reshape(n, d)

    m8 = jax.block_until_ready(
        gen(jax.random.split(jax.random.PRNGKey(0), 16))
    )
    rn = jax.block_until_ready(_row_norms_int8(m8, tile))
    q_single = jax.random.randint(
        jax.random.PRNGKey(3), (d,), -127, 128, dtype=jnp.int8
    )
    q_batch = jax.random.randint(
        jax.random.PRNGKey(4), (qbatch, d), -127, 128, dtype=jnp.int8
    )

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop_single(q, m, rnv, it):
        def body(_i, carry):
            _vals, idx = pallas_scan.cosine_int8_topk_hybrid(carry, m, rnv, k)
            return jnp.clip(
                carry.astype(jnp.int32) + m[idx[0]].astype(jnp.int32) // 127,
                -127, 127,
            ).astype(jnp.int8)

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out.astype(jnp.int32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop_batch(q, m, rnv, it):
        # the exact batched SERVING path: one MXU GEMM + the fused
        # normalize/select kernel (no [Q, C] f32 mask/divide bounce)
        def body(_i, carry):
            dots = jax.lax.dot_general(
                carry, m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [Q, C] one MXU GEMM for the batch
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

    def t_batch():
        # full `iters`: at ~10-20 ms/iter a 4-iteration loop's
        # calibration delta is only ~2x the tunnel jitter
        return _timed(lambda it: int(loop_batch(q_batch, m8, rn, it)),
                      iters) * 1000.0

    # -- sketch prefilter path (UCFP_KNN_QUANT=sketch) -----------------
    # 768-bit SimHash per row (lane-tiled pallas scan), ASYMMETRIC
    # 4-level scoring + segmented quota selection + one sorted gather +
    # exact int8 rescore. The pool fraction is the recall knob, so the
    # bench reports the TRADEOFF: the default "quality" pool and the
    # "fast" pool (core.POOL_FRAC_TIERS[0]), each with p50 [min, max]
    # and random-query recall@10 ± CI vs the exact int8 ranking (random
    # queries = worst case; planted near-duplicates = the product
    # workload, measured at the fast pool where they are hardest).
    from ucfp_tpu.core import POOL_FRAC_TIERS
    from ucfp_tpu.ops import knn as knn_ops

    planes = jnp.asarray(knn_ops.sketch_planes(d))
    sketch = jax.block_until_ready(
        knn_ops.tile_sketch(
            knn_ops.build_sketch_chunked(m8, planes, chunk=tile * 8)
        )
    )
    valid = jnp.ones(n, bool)
    cand = knn_ops.sketch_pool(n, k)  # default (quality) pool
    cand_fast = knn_ops.sketch_pool(n, k, POOL_FRAC_TIERS[0])

    @functools.partial(jax.jit, static_argnums=(6, 7))
    def loop_sketch(q, pl, m, rnv, sk, vd, it, pool):
        def body(_i, carry):
            _vals, idx = knn_ops.cosine_sketch_topk(
                carry, pl, m, rnv, sk, vd, k, pool
            )
            return jnp.clip(
                carry + m[idx[0]].astype(jnp.float32) / 127.0, -127.0, 127.0
            )

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    qf = q_single.astype(jnp.float32)

    # -- packed-int4 prefilter path (UCFP_KNN_QUANT=int4) --------------
    # nibble-packed [D/2, C] columns: half the exact scan's HBM bytes
    # with near-exact int4 ordering + a fixed 2048-row exact rescore
    # pool (ops/knn.py int4 section). One tier — no recall knob.
    packed_t, inv_n4 = (
        jax.block_until_ready(a)
        for a in knn_ops.pack_int4_cols_chunked(m8, chunk=tile)
    )
    pool_i4 = knn_ops.int4_pool(n, k)

    @functools.partial(jax.jit, static_argnums=(6, 7))
    def loop_int4(q, m, rnv, pk, inv, nv, it, pool):
        # nv = prefix-validity scalar -> the FUSED masked-scores kernel,
        # exactly the unfiltered serving path (ops/pallas_int4.py). The
        # `valid` arg is built in-trace (never read on the fused path;
        # closing over the real [n] array would bake a trace constant)
        vd = jnp.ones((m.shape[0],), bool)

        def body(_i, carry):
            _vals, idx = knn_ops.cosine_int4_topk(
                carry, m, rnv, pk, inv, vd, k, pool, n_valid=nv,
            )
            return jnp.clip(
                carry + m[idx[0]].astype(jnp.float32) / 127.0, -127.0, 127.0
            )

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    def t_int4(m=None, rnv=None, pk=None, inv=None, nv=None, pool=None,
               it=None):
        return _timed(
            lambda nit: float(
                loop_int4(
                    qf,
                    m if m is not None else m8,
                    rnv if rnv is not None else rn,
                    pk if pk is not None else packed_t,
                    inv if inv is not None else inv_n4,
                    nv if nv is not None else jnp.int32(n),
                    nit,
                    pool if pool is not None else pool_i4,
                )
            ),
            it if it is not None else iters,
        ) * 1000.0

    # batched int4: one packed scan serves the whole 32-query block
    # (UCFP_KNN_QUANT=int4 knn_batch serving path)
    pool_i4b = knn_ops.int4_batch_pool(n, k)
    qbf = q_batch.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=(6, 7))
    def loop_i4_batch(q, m, rnv, pk, inv, nv, it, pool):
        def body(_i, carry):
            _vals, idx = knn_ops.cosine_int4_topk_batched(
                carry, m, rnv, pk, inv, nv, k, pool,
            )
            return jnp.clip(
                carry + m[idx[0, 0]].astype(jnp.float32)[None, :] / 127.0,
                -127.0, 127.0,
            )

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    # Q=64: the batched sweet spot — one packed scan serves the whole
    # 64-row chunk (INT4_BATCH_QB), so the scan amortizes 2x further
    # than Q=32 while the per-query bf16 bounce bytes stay constant.
    # Q=128 regresses (session-9 sweep, scripts/int4_batch_q_sweep.py:
    # 0.318 / 0.241 / 0.303 ms/query at Q=32/64/128 — the second scan
    # chunk plus Q-scaling selection eat the amortization).
    qb64f = jax.random.randint(
        jax.random.PRNGKey(5), (64, d), -127, 128, dtype=jnp.int8
    ).astype(jnp.float32)

    def t_i4_batch(qv=None, m=None, rnv=None, pk=None, inv=None, nv=None,
                   pool=None, it=None):
        qv = qbf if qv is None else qv
        return _timed(
            lambda nit: float(loop_i4_batch(
                qv,
                m if m is not None else m8,
                rnv if rnv is not None else rn,
                pk if pk is not None else packed_t,
                inv if inv is not None else inv_n4,
                nv if nv is not None else jnp.int32(n),
                nit,
                pool if pool is not None else pool_i4b,
            )),
            it if it is not None else iters,
        ) * 1000.0

    def t_exact():
        return _timed(
            lambda it: int(loop_single(q_single, m8, rn, it)), iters
        ) * 1000.0

    def t_sketch(pool):
        return _timed(
            lambda it: float(
                loop_sketch(qf, planes, m8, rn, sketch, valid, it, pool)
            ),
            iters,
        ) * 1000.0

    # recall work, chunked so timing rounds can interleave with it (the
    # "spread across the session" requirement: a single contended window
    # then poisons at most one round, and the spread exposes it)
    kq, kp = jax.random.split(jax.random.PRNGKey(9))
    queries = jax.random.normal(kq, (recall_q, d), jnp.float32) * 40.0
    gt_chunk = 26  # [26, 10M] f32 scores ≈ 1 GB live per chunk

    def ground_truth():
        out = []
        for i in range(0, recall_q, gt_chunk):
            _s, ig = knn_ops.cosine_topk_int8(
                queries[i : i + gt_chunk], m8, rn, valid, k
            )
            out.extend(set(row.tolist()) for row in np.asarray(ig))
        return out

    def sketch_hits(exact_sets, pool):
        hits = 0
        for i, es in enumerate(exact_sets):
            _s, isk = knn_ops.cosine_sketch_topk(
                queries[i], planes, m8, rn, sketch, valid, k, pool
            )
            hits += len(es & set(isk.tolist()))
        return hits

    def int4_hits(exact_sets):
        hits = 0
        for i, es in enumerate(exact_sets):
            _s, ii = knn_ops.cosine_int4_topk(
                queries[i], m8, rn, packed_t, inv_n4, valid, k, pool_i4,
                n_valid=jnp.int32(n),  # the fused serving path
            )
            hits += len(es & set(ii.tolist()))
        return hits

    def int4_batch_hits(exact_sets):
        # the BATCHED serving path at its own (smaller) pool, in the
        # same 26-query chunks as the ground truth
        hits = 0
        for i in range(0, recall_q, gt_chunk):
            _s, ib = knn_ops.cosine_int4_topk_batched(
                queries[i : i + gt_chunk], m8, rn, packed_t, inv_n4,
                jnp.int32(n), k, pool_i4b,
            )
            for j, row in enumerate(np.asarray(ib)):
                hits += len(exact_sets[i + j] & set(row.tolist()))
        return hits

    times: dict = {"exact": [], "sketch": [], "fast": [], "int4": [],
                   "batch": [], "int4b": [], "int4b64": []}
    exact_sets = None
    hits_q = hits_f = hits_i4 = hits_i4b = 0
    for r in range(rounds):
        times["exact"].append(t_exact())
        times["sketch"].append(t_sketch(cand))
        times["fast"].append(t_sketch(cand_fast))
        times["int4"].append(t_int4())
        times["batch"].append(t_batch())
        times["int4b"].append(t_i4_batch())
        times["int4b64"].append(t_i4_batch(qb64f))
        # interleave the (device-heavy) recall batches between rounds
        if r == 0:
            exact_sets = ground_truth()
        elif r == 1:
            hits_q = sketch_hits(exact_sets, cand)
            hits_i4 = int4_hits(exact_sets)
        elif r == 2:
            hits_f = sketch_hits(exact_sets, cand_fast)
            hits_i4b = int4_batch_hits(exact_sets)

    # planted near-duplicates (the product workload): a noisy copy of a
    # stored row at cosine ~0.99/0.7/0.5 must surface — measured at the
    # FAST pool, the hardest setting. Per-dim noise sigma for a target
    # cosine vs uniform-int8 rows (row rms ~73.9/dim): tan(theta) =
    # sigma/73.9.
    planted = {0.99: 0, 0.7: 0, 0.5: 0}
    sigma = {0.99: 10.5, 0.7: 75.0, 0.5: 128.0}
    kdr = jax.random.split(kp, 8)
    for t in range(8):
        k_row, *k_noise = jax.random.split(kdr[t], 1 + len(sigma))
        row = int(jax.random.randint(k_row, (), 0, n))
        for kn, (cos_t, sg) in zip(k_noise, sigma.items()):
            qp = m8[row].astype(jnp.float32) + \
                jax.random.normal(kn, (d,), jnp.float32) * sg
            _, ipl = knn_ops.cosine_sketch_topk(
                qp, planes, m8, rn, sketch, valid, k, cand_fast
            )
            planted[cos_t] += int(row in ipl.tolist())

    # -- the v5e-8 shard shape, MEASURED on this chip -------------------
    # One shard of the 8-way row-sharded mesh serves n/8 rows; the
    # sharded query path (parallel/sharded_knn.py) runs this same
    # pipeline per chip, then merges 8 * k candidates with one
    # all-gather. Merge cost model: 8 shards x k x 8 B (score+idx) =
    # ~640 B over ICI (one all_gather, latency-bound: ~10-25 us on a
    # v5e-8 ring) + a [8k] top_k (microseconds). 0.1 ms is a
    # conservative ceiling; the derived estimate is per-shard p50 + it.
    shard_n = (n // shards // tile) * tile
    if shard_n:
        m8_s, rn_s = m8[:shard_n], rn[:shard_n]
        sk_s = sketch[: shard_n // knn_ops.SKETCH_LANES]
        vd_s = jnp.ones(shard_n, bool)
        cand_s = knn_ops.sketch_pool(shard_n, k)
        # 8x the iterations of the full-catalog loops: per-shard
        # pipelines run ~0.3-1.5 ms/iter, so an 8-iteration loop's
        # (t(N)-t(1)) delta is the same order as tunnel dispatch jitter
        # and the calibration can print physically impossible numbers
        # (a rehearsal once captured 0.28 ms for a 0.48 GB stream =
        # 1.7 TB/s > HBM peak). 64 iters puts ~20-90 ms of device time
        # in the loop — an order of magnitude above the jitter.
        iters_shard = iters * 8
        shard_exact_ms = _timed(
            lambda it: int(loop_single(q_single, m8_s, rn_s, it)),
            iters_shard,
        ) * 1000.0
        shard_sketch_ms = _timed(
            lambda it: float(
                loop_sketch(qf, planes, m8_s, rn_s, sk_s, vd_s, it, cand_s)
            ),
            iters_shard,
        ) * 1000.0
        shard_int4_ms = t_int4(
            m=m8_s, rnv=rn_s, pk=packed_t[:, :shard_n],
            inv=inv_n4[:shard_n], nv=jnp.int32(shard_n),
            pool=knn_ops.int4_pool(shard_n, k), it=iters_shard,
        )
        # per-shard BATCHED int4 (round-4 verdict #2a): batched serving
        # is the production shape — measuring the Q=32/64 pipelines at
        # the 1.25M-row shard makes the derived v5e-8 batched keys a
        # shard-scale measurement + a merge model, not an inference
        # from the 10M-catalog number. Batched iters stay at `iters`*4:
        # each iteration runs ~8-15 ms of device work at the shard
        # (Q x scan), two orders above the tunnel jitter.
        pool_i4b_s = knn_ops.int4_batch_pool(shard_n, k)
        shard_i4_b32_ms = t_i4_batch(
            m=m8_s, rnv=rn_s, pk=packed_t[:, :shard_n],
            inv=inv_n4[:shard_n], nv=jnp.int32(shard_n),
            pool=pool_i4b_s, it=iters * 4,
        )
        shard_i4_b64_ms = t_i4_batch(
            qv=qb64f, m=m8_s, rnv=rn_s, pk=packed_t[:, :shard_n],
            inv=inv_n4[:shard_n], nv=jnp.int32(shard_n),
            pool=pool_i4b_s, it=iters * 4,
        )
    else:  # catalog too small to slice a tile-aligned shard (smoke runs)
        shard_exact_ms = shard_sketch_ms = shard_int4_ms = float("nan")
        shard_i4_b32_ms = shard_i4_b64_ms = float("nan")
    # cross-chip merge term (round-4 verdict #2b): the fixed 0.1 ms
    # constant is replaced by the parameterized ICI model
    # (parallel/sharded_knn.py ici_merge_model — k x 8 B candidates,
    # v5e 400 Gbps/link, hop counts for ring vs the 2x4 slice). The
    # model says the merge is LATENCY-bound (~6-8 us); the derived
    # keys still quote a 0.1 ms conservative ceiling (>12x the model)
    # so the published numbers don't lean on the 2 us/hop estimate,
    # and both the model's inputs and its total ride the bench JSON.
    from ucfp_tpu.parallel.sharded_knn import ici_merge_model

    merge_model = ici_merge_model(shards, k, topology="2x4")
    merge_model_batch = ici_merge_model(shards, 64 * k, topology="2x4")
    merge_model_ms = 0.1  # quoted ceiling, not the model output

    # -- packed-int2 prefilter tier (UCFP_KNN_QUANT=int2), own phase ----
    # A 16 GB v5e cannot hold int8 + int4 + sketch + int2 at once
    # (7.15 + 3.6 + 0.9 + 1.8 GB plus the ~1 GB recall transients), so
    # the int2 tier runs after the int4/sketch arrays are dropped. Its
    # three timing rounds interleave with the (device-heavy) recall
    # measurement for the same contention-spread reason as the main
    # loop; the shared `unstable` flag covers its spread too.
    del packed_t, inv_n4, sketch
    if shard_n:
        del sk_s
    packed2_t, inv_n2 = (
        jax.block_until_ready(a)
        for a in knn_ops.pack_int2_cols_chunked(m8, chunk=tile)
    )
    pool_i2 = knn_ops.int2_pool(n, k)

    @functools.partial(jax.jit, static_argnums=(6, 7))
    def loop_int2(q, m, rnv, pk, inv, nv, it, pool):
        # same fused-path shape as loop_int4: nv = prefix-validity
        # scalar, `valid` built in-trace (never read on the fused path)
        vd = jnp.ones((m.shape[0],), bool)

        def body(_i, carry):
            _vals, idx = knn_ops.cosine_int2_topk(
                carry, m, rnv, pk, inv, vd, k, pool, n_valid=nv,
            )
            return jnp.clip(
                carry + m[idx[0]].astype(jnp.float32) / 127.0, -127.0, 127.0
            )

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    def t_int2(m=None, rnv=None, pk=None, inv=None, nv=None, pool=None,
               it=None):
        return _timed(
            lambda nit: float(
                loop_int2(
                    qf,
                    m if m is not None else m8,
                    rnv if rnv is not None else rn,
                    pk if pk is not None else packed2_t,
                    inv if inv is not None else inv_n2,
                    nv if nv is not None else jnp.int32(n),
                    nit,
                    pool if pool is not None else pool_i2,
                )
            ),
            it if it is not None else iters,
        ) * 1000.0

    def int2_hits(exact_sets):
        hits = 0
        for i, es in enumerate(exact_sets):
            _s, ii = knn_ops.cosine_int2_topk(
                queries[i], m8, rn, packed2_t, inv_n2, valid, k, pool_i2,
                n_valid=jnp.int32(n),  # the fused serving path
            )
            hits += len(es & set(ii.tolist()))
        return hits

    pool_i2b = knn_ops.int2_batch_pool(n, k)

    def int2_batch_hits(exact_sets):
        # the batched serving path at its own pool (the 4096 floor sits
        # AT the measured worst-rank boundary — this is the measurement
        # that backs it; int2_batch_pool docstring cites this key)
        hits = 0
        for i in range(0, recall_q, gt_chunk):
            _s, ib = knn_ops.cosine_int2_topk_batched(
                queries[i : i + gt_chunk], m8, rn, packed2_t, inv_n2,
                jnp.int32(n), k, pool_i2b,
            )
            for j, row in enumerate(np.asarray(ib)):
                hits += len(exact_sets[i + j] & set(row.tolist()))
        return hits

    # small-Q batched int2: the only batch regime where the cost model
    # dispatches it (the segmented selection scales ~linearly with Q —
    # at Q=32 it measured 1.36 ms/query, losing to the exact GEMM's
    # 0.57; at Q=2 the model says the quarter-byte scan wins)
    q2f = q_batch[:2].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=(5,))
    def loop_i2_batch2(q, m, rnv, pk, inv, it):
        def body(_i, carry):
            _vals, idx = knn_ops.cosine_int2_topk_batched(
                carry, m, rnv, pk, inv, jnp.int32(n), k, pool_i2b,
            )
            return jnp.clip(
                carry + m[idx[0, 0]].astype(jnp.float32)[None, :] / 127.0,
                -127.0, 127.0,
            )

        out = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(out)

    times["int2"] = []
    times["int2b2"] = []
    hits_i2 = hits_i2b = 0
    for r in range(rounds):
        times["int2"].append(t_int2())
        times["int2b2"].append(_timed(
            lambda it: float(
                loop_i2_batch2(q2f, m8, rn, packed2_t, inv_n2, it)
            ),
            iters,
        ) * 1000.0)
        if r == 0 and exact_sets is not None:
            hits_i2 = int2_hits(exact_sets)
        elif r == 1 and exact_sets is not None:
            hits_i2b = int2_batch_hits(exact_sets)
    import os

    if shard_n and os.environ.get("UCFP_BENCH_FULL") == "1":
        # the per-shard int2 number costs a second remote compile and
        # the v5e-8 story rests on int4 (int2 measured slightly worse:
        # 0.75 vs 0.71 ms/shard) — full runs re-capture it, the default
        # driver set skips it
        shard_int2_ms = t_int2(
            m=m8_s, rnv=rn_s, pk=packed2_t[:, :shard_n],
            inv=inv_n2[:shard_n], nv=jnp.int32(shard_n),
            pool=knn_ops.int2_pool(shard_n, k), it=iters_shard,
        )
    else:
        shard_int2_ms = float("nan")

    def _stats(xs):
        xs = sorted(xs)
        return {
            "p50": round(xs[len(xs) // 2], 3),
            "range": [round(xs[0], 3), round(xs[-1], 3)],
        }

    n_trials = recall_q * k
    rq, rf = hits_q / n_trials, hits_f / n_trials
    ri4 = hits_i4 / n_trials
    ri4b = hits_i4b / n_trials
    ri2 = hits_i2 / n_trials
    ri2b = hits_i2b / n_trials

    def _ci95(p):
        return round(1.96 * (p * (1.0 - p) / n_trials) ** 0.5, 3)

    st = {kk_: _stats(v) for kk_, v in times.items()}
    unstable = any(
        s["range"][0] > 0 and s["range"][1] / s["range"][0] > 2.0
        for s in st.values()
    )
    return {
        "query_cosine_int8_p50_ms_10m_x768": st["exact"]["p50"],
        "query_cosine_int8_range_ms": st["exact"]["range"],
        "query_cosine_int8_batch32_ms_per_query_10m_x768": round(
            st["batch"]["p50"] / qbatch, 4
        ),
        "query_cosine_int8_batch32_range_ms_per_query": [
            round(x / qbatch, 4) for x in st["batch"]["range"]
        ],
        "query_cosine_int4_batch32_ms_per_query_10m_x768": round(
            st["int4b"]["p50"] / qbatch, 4
        ),
        "query_cosine_int4_batch32_range_ms_per_query": [
            round(x / qbatch, 4) for x in st["int4b"]["range"]
        ],
        # Q=64 rides the identical per-query selection + pool (recall is
        # Q-independent — each query's pool is picked from its own score
        # row), so int4_batch_recall10_random_10m_x768 covers it too
        "query_cosine_int4_batch64_ms_per_query_10m_x768": round(
            st["int4b64"]["p50"] / 64, 4
        ),
        "query_cosine_int4_batch64_range_ms_per_query": [
            round(x / 64, 4) for x in st["int4b64"]["range"]
        ],
        "int4_batch_recall10_random_10m_x768": round(ri4b, 3),
        "int4_batch_recall10_ci95": _ci95(ri4b),
        "query_cosine_sketch_p50_ms_10m_x768": st["sketch"]["p50"],
        "query_cosine_sketch_range_ms": st["sketch"]["range"],
        "sketch_fast_p50_ms_10m_x768": st["fast"]["p50"],
        "sketch_fast_range_ms": st["fast"]["range"],
        "query_cosine_int4_p50_ms_10m_x768": st["int4"]["p50"],
        "query_cosine_int4_range_ms": st["int4"]["range"],
        "int4_recall10_random_10m_x768": round(ri4, 3),
        "int4_recall10_ci95": _ci95(ri4),
        "query_cosine_int2_p50_ms_10m_x768": st["int2"]["p50"],
        "query_cosine_int2_range_ms": st["int2"]["range"],
        "int2_recall10_random_10m_x768": round(ri2, 3),
        "int2_recall10_ci95": _ci95(ri2),
        "query_cosine_int2_batch2_ms_per_query_10m_x768": round(
            st["int2b2"]["p50"] / 2, 4
        ),
        "query_cosine_int2_batch2_range_ms_per_query": [
            round(x / 2, 4) for x in st["int2b2"]["range"]
        ],
        "int2_batch_recall10_random_10m_x768": round(ri2b, 3),
        "int2_batch_recall10_ci95": _ci95(ri2b),
        "sketch_timing_unstable": unstable,
        "sketch_recall10_random_10m_x768": round(rq, 3),
        "sketch_recall10_ci95": _ci95(rq),
        "sketch_fast_recall10_random": round(rf, 3),
        "sketch_fast_recall10_ci95": _ci95(rf),
        "recall_queries": recall_q,
        **{
            f"sketch_top1_planted_cos{str(c).replace('0.', '')}":
                round(v / 8.0, 3)
            for c, v in planted.items()
        },
        "query_sharded_per_shard_exact_p50_ms": round(shard_exact_ms, 3),
        "query_sharded_per_shard_p50_ms": round(shard_sketch_ms, 3),
        "query_sharded_per_shard_int4_p50_ms": round(shard_int4_ms, 3),
        # int2 shard keys appear only under UCFP_BENCH_FULL=1 (NaN is
        # not valid strict JSON, and the default set skips the metric)
        **({"query_sharded_per_shard_int2_p50_ms": round(shard_int2_ms, 3),
            "query_v5e8_derived_int2_ms": round(
                shard_int2_ms + merge_model_ms, 3)}
           if shard_int2_ms == shard_int2_ms else {}),
        "query_sharded_merge_model_ms": merge_model_ms,
        "query_sharded_merge_model": merge_model,
        "query_sharded_merge_model_batch64": merge_model_batch,
        "query_v5e8_derived_exact_ms": round(
            shard_exact_ms + merge_model_ms, 3
        ),
        "query_v5e8_derived_sketch_ms": round(
            shard_sketch_ms + merge_model_ms, 3
        ),
        "query_v5e8_derived_int4_ms": round(
            shard_int4_ms + merge_model_ms, 3
        ),
        # batched derived keys (verdict #2a): per-query = (measured
        # per-shard batch pipeline + merge ceiling) / Q — the
        # production serving shape, with a margin the single-query key
        # doesn't have (Q=64: ~0.2-0.3 ms/query derived)
        "query_sharded_per_shard_int4_batch32_ms_per_query": round(
            shard_i4_b32_ms / qbatch, 4),
        "query_sharded_per_shard_int4_batch64_ms_per_query": round(
            shard_i4_b64_ms / 64, 4),
        "query_v5e8_derived_int4_batch32_ms": round(
            (shard_i4_b32_ms + merge_model_ms) / qbatch, 4),
        "query_v5e8_derived_int4_batch_ms": round(
            (shard_i4_b64_ms + merge_model_ms) / 64, 4),
        "sharded_rows_per_shard": shard_n,
    }


def bench_audio_match(n_records=10_000, per=100, queries=15) -> float:
    """Landmark offset-vote match p50 (ms) at 10^6 postings across 10^4
    records — the host-side audio retrieval path (consolidated-numpy
    postings + vectorized voting, index/embedded.py:_LandmarkIndex).
    Proves host headroom an order of magnitude past the test suite's
    scale case (tests/test_audio_match.py::TestScale)."""
    import asyncio
    import tempfile

    from ucfp_tpu.core import Modality, Record
    from ucfp_tpu.index.embedded import EmbeddedBackend

    rng = np.random.default_rng(7)
    b = EmbeddedBackend(tempfile.mkdtemp(prefix="ucfp-amatch-"))

    async def go():
        keep = {}
        batch = []
        for rid in range(1, n_records + 1):
            h = rng.integers(0, 1 << 30, size=per, dtype=np.uint32)
            t = np.sort(rng.integers(0, 2000, size=per)).astype(np.uint32)
            pairs = np.stack([h, t], axis=1)
            if rid % 997 == 0:
                keep[rid] = pairs
            batch.append(Record(0, rid, Modality.AUDIO, "audiofp-wang-v1",
                                pairs.astype("<u4").tobytes()))
            if len(batch) >= 1000:
                await b.upsert(batch)
                batch = []
        if batch:
            await b.upsert(batch)
        lat = []
        rids = sorted(keep)
        for i in range(queries):
            rid = rids[i % len(rids)]
            qp = keep[rid].copy()
            qp[:, 1] += 137
            fp = qp.astype("<u4").tobytes()
            t0 = time.perf_counter()
            hits = await b.knn_audio(0, "audiofp-wang-v1", fp, 3)
            lat.append(time.perf_counter() - t0)
            assert hits and hits[0].record_id == rid
        return sorted(lat)[len(lat) // 2] * 1000.0

    try:
        return asyncio.run(go())
    finally:
        b.close()


def bench_parity() -> tuple[bool, list]:
    """Driver-captured CPU<->TPU bit-identity: recompute the conformance
    corpus ON THIS DEVICE and diff against the goldens committed from
    the CPU run (tests/goldens/conformance.json; the exact-integer
    contract — float encoder families are excluded by design, see
    test_conformance.FLOAT_KEYS). Returns (parity_ok, first mismatches)."""
    import pathlib
    import sys

    here = pathlib.Path(__file__).resolve().parent
    sys.path.insert(0, str(here / "tests"))
    import test_conformance as tc

    golden = json.loads(tc.GOLDEN.read_text())
    got = tc.build_corpus(skip_float=True)
    mismatches = sorted(
        k for k in golden
        if not k.startswith(tc.FLOAT_KEYS) and got.get(k) != golden[k]
    )
    return not mismatches, mismatches[:5]


#: filled by _prefer_direct_tpu, copied into the bench JSON `extra` so a
#: degraded (non-chip) capture is impossible to mistake for chip numbers
_PLATFORM_NOTE: dict = {}


def _prefer_direct_tpu():
    """Prefer a direct local TPU over the tunneled runtime when one is
    free. The tunnel acks dispatch early and compiles remotely (minutes
    per kernel, flaky on large pallas programs); the direct chip
    compiles locally in seconds and reports honest wall-clock. Probe in
    a subprocess first — a failed in-process init poisons jax's backend
    cache. If the direct chip is absent, watchdog-probe the default
    (tunnel) platform too: a downed axon link HANGS device discovery
    indefinitely, and a hung bench emits no JSON line at all — better
    to fall back to CPU with an explicit degraded marker in the output.
    UCFP_BENCH_PLATFORM=<name> forces a platform and skips every probe."""
    import os
    import subprocess
    import sys

    import jax

    want = os.environ.get("UCFP_BENCH_PLATFORM")
    if want:
        jax.config.update("jax_platforms", want or None)
        return
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','tpu'); "
             "jax.devices()"],
            capture_output=True, timeout=90,
        )
        if probe.returncode == 0:
            jax.config.update("jax_platforms", "tpu")
            jax.devices()
            return
    except Exception:
        try:
            # a failed in-process init poisons jax's backend cache —
            # clear it so the fallback paths below can still init
            import jax.extend.backend

            jax.extend.backend.clear_backends()
            jax.config.update("jax_platforms", None)
        except Exception:
            pass
    # No direct chip: probe the default platform (the axon tunnel on
    # this host) with a hard timeout. Discovery over a healthy tunnel is
    # seconds — no compiles involved — so 240 s distinguishes "slow" from
    # "down" with a wide margin.
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=240,
        )
        if probe.returncode == 0:
            return  # default (tunnel) platform is alive
        reason = "device platform init failed"
    except subprocess.TimeoutExpired:
        reason = "device platform init timed out (tunnel down?)"
    except Exception as e:  # pragma: no cover - probe launch failure
        reason = f"device platform probe failed: {type(e).__name__}"
    jax.config.update("jax_platforms", "cpu")
    _PLATFORM_NOTE.update({
        "platform_degraded": "cpu",
        "platform_degraded_reason":
            reason + "; values are NOT chip numbers",
    })
    print(f"bench: {reason}; falling back to CPU (degraded run)",
          file=sys.stderr)


def main():
    import contextlib
    import os

    _prefer_direct_tpu()
    # NOTE: a persistent jax compilation cache was tried here and
    # REMOVED — under the tunneled runtime a bench run with the cache
    # enabled stalled with no output for 30+ minutes (cache lookup /
    # serialization interacting badly with the remote backend), and on
    # the direct chip compiles are cheap enough not to need it.
    profile_dir = os.environ.get("UCFP_PROFILE_DIR")
    ctx = contextlib.nullcontext()
    if profile_dir:
        # JAX profiler -> Perfetto/XPlane traces (the reference's
        # criterion-with-debug profiling entry point, TPU edition)
        import jax

        ctx = jax.profiler.trace(profile_dir)
    with ctx:
        _run_all()


def _run_all():
    import os

    _only_env = [
        s for s in os.environ.get("UCFP_BENCH_ONLY", "").split(",") if s
    ]
    phash_ips = (
        bench_phash()
        if not _only_env or any(s in "phash" for s in _only_env)
        else 0.0
    )
    extra = {}
    extra.update(_PLATFORM_NOTE)
    # Each secondary metric costs two jit compiles through the device
    # tunnel (~1-2 min each); the default set is trimmed to fit the
    # driver's window. UCFP_BENCH_FULL=1 adds the comparison kernels
    # (exact 1M cosine, exact 10M int8) whose numbers are recorded in
    # README.md / ROUND_NOTES.md.
    full = os.environ.get("UCFP_BENCH_FULL") == "1"
    # hard wall: remote-tunnel compiles can take minutes each; whatever
    # doesn't fit the budget is skipped so the JSON line always prints.
    # 1800 s: the asym-sketch kernel alone can cost ~10 min of remote
    # compile on a COLD tunnel runtime, and the 10M x 768 bench now
    # carries four tiers (exact/sketch/int4/int2) — a 900 s budget
    # measured tight enough that the int2 phase could push _pair_768
    # past it and silently skip every later metric; direct-TPU runs
    # finish far inside either budget
    budget_s = float(os.environ.get("UCFP_BENCH_BUDGET_S", "1800"))
    t_start = time.perf_counter()
    def _pair_768():
        out = bench_cosine_int8_10m_768()
        headline = out.pop("query_cosine_int8_p50_ms_10m_x768")
        extra.update(out)
        return headline

    def _parity():
        ok, mismatches = bench_parity()
        if not ok:
            extra["parity_first_mismatches"] = mismatches
        return ok

    def _ingest_http():
        """End-to-end HTTP -> decode -> host luma -> device hash batch ->
        WAL-durable store, images/s (the serving-path number the
        kernel-only phash_ips cannot claim). EXACTLY the documented soak
        configuration (CLAUDE.md: scripts/soak_ingest.py --conns 16
        --batch 1024 --quiet) so the driver-captured number and the
        soak command reproduce each other. batch=1024 (the route max)
        became the optimum once the whole-batch native decode +
        vectorized store path (round-4 second half) cut the host cost
        per image — the larger dispatch amortizes the tunnel's
        ~30-60 ms per-kernel round trip (at the old host cost, 256-image
        batches degraded under concurrent load; measured at the new
        path: 128 -> 5.0-6.0k, 512 -> 8.4k, 1024 -> 13.4-16.1k).
        conns=16 keeps the tunnel filled (8 -> 10.9k, 4 -> 11.8k,
        24 -> 9.6k overloads); quiet skips per-record hex."""
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
        from soak_ingest import run_soak

        # median of 3 windows: a single 6 s window is exposed to tunnel
        # congestion transients — one rehearsal captured 4.4k imgs/s
        # where three standalone runs minutes later gave 10.4-15.5k
        # (per-batch elapsed 480-980 ms vs the ~76 ms steady state).
        # The range + instability flag make a congested capture visible
        # instead of masquerading as a regression.
        runs = [run_soak(seconds=4.0, conns=16, algorithm="phash",
                         batch=1024, quiet=True) for _ in range(3)]
        # warmup_degraded = a run hit the soak's wall-clock warmup
        # deadline (observed: one remote compile took 480+ s through a
        # congested tunnel window) — the captured rate is compile-bound,
        # not the serving path's. Quote the median over CLEAN runs when
        # any exist (one poisoned window measured 0 imgs/s / 16384
        # errors and would drag the median below every real capture);
        # the degraded flag + per-run rates keep the exclusion visible.
        clean = [r for r in runs if not r.get("warmup_degraded")]
        rates = sorted(r["req_per_sec"] for r in (clean or runs))
        extra["ingest_http_errors"] = sum(r["errors"] for r in runs)
        extra["ingest_http_runs_imgs_per_sec"] = [
            round(r["req_per_sec"], 1) for r in runs]
        extra["ingest_http_range_imgs_per_sec"] = [rates[0], rates[-1]]
        extra["ingest_http_unstable"] = bool(
            rates[0] > 0 and rates[-1] / rates[0] > 2.0
        )
        if len(clean) < len(runs):
            extra["ingest_http_degraded"] = True
        # Same soak through the C++ epoll front (--native / --native-http
        # in production): the asyncio StreamReader's bytearray churn on
        # 12 MB request bodies measured ~30% of the single core under
        # cProfile; the native front frames in C++ and hands one
        # contiguous body to the handler (measured +20-25% on the
        # CPU-bound side). Secondary capture — a failure here must not
        # sink the primary metric.
        try:
            nruns = [run_soak(seconds=4.0, conns=16, algorithm="phash",
                              batch=1024, quiet=True, native=True)
                     for _ in range(3)]
            nclean = [r for r in nruns if not r.get("warmup_degraded")]
            nrates = sorted(r["req_per_sec"] for r in (nclean or nruns))
            extra["ingest_http_native_imgs_per_sec"] = nrates[len(nrates) // 2]
            extra["ingest_http_native_range_imgs_per_sec"] = [
                nrates[0], nrates[-1]]
            extra["ingest_http_native_unstable"] = bool(
                nrates[0] > 0 and nrates[-1] / nrates[0] > 2.0
            )
            if len(nclean) < len(nruns):
                extra["ingest_http_native_degraded"] = True
        except Exception as e:
            extra["ingest_http_native_imgs_per_sec"] = (
                f"error: {type(e).__name__}: {e}")
        # Multi-worker stack (round-4 verdict #1): the REAL owner + 2
        # SO_REUSEPORT worker subprocesses (server/multiworker.py) —
        # correctness-under-load is test_multiworker.py's job; this key
        # documents the measured 1-core throughput of the 3-process
        # stack (processes time-slice one core here, so it reads BELOW
        # the single-process number by design — the scaling model in
        # BASELINE.md is per-core ceilings, not this host). batch=256:
        # the measured 1-core multiprocess optimum (1024-image pickles
        # stall the owner longer than the WAL work they amortize).
        try:
            from soak_ingest import run_soak_multiworker

            # cpu=True: image ingest through the stack is host-path
            # end to end (workers hash on CPU jax, the owner only does
            # WAL + tables) — and the bench process already holds the
            # tunnel chip, which a second process must not claim
            w2 = run_soak_multiworker(2, seconds=4.0, conns=16,
                                      algorithm="phash", batch=256,
                                      quiet=True, cpu=True)
            extra["ingest_http_imgs_per_sec_w2"] = w2["req_per_sec"]
            if w2.get("warmup_degraded"):
                extra["ingest_http_w2_degraded"] = True
        except Exception as e:
            extra["ingest_http_imgs_per_sec_w2"] = (
                f"error: {type(e).__name__}: {e}")
        # the owner's single-core ingest ceiling (WAL + tables + IPC) —
        # the serialization point the per-core scaling model divides by
        # (scripts/owner_ceiling.py; host-side quantity, CPU subprocess)
        try:
            import subprocess

            script = pathlib.Path(__file__).resolve().parent / \
                "scripts" / "owner_ceiling.py"
            out = subprocess.run(
                [sys.executable, str(script), "--cpu", "--seconds", "3"],
                capture_output=True, text=True, timeout=300, check=True)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            extra["ingest_owner_ceiling_fp_per_sec"] = \
                r["owner_ipc_fp_per_sec"]
            extra["ingest_owner_inproc_fp_per_sec"] = \
                r["owner_inproc_fp_per_sec"]
        except Exception as e:
            extra["ingest_owner_ceiling_fp_per_sec"] = (
                f"error: {type(e).__name__}")
        return rates[len(rates) // 2]

    def _ingest_text_http():
        """End-to-end HTTP text ingest: NDJSON batch route -> native
        UAX#29 tokenize + shingle-XXH3 + minhash (host) -> WAL group
        commit, docs/s at the reference's criterion workload (~5.6 KiB
        pangram per doc, benches/end_to_end.rs:24-42). Host-bound (no
        device dispatch), so less tunnel-sensitive than the image soak;
        median of 3 windows with the same degraded-exclusion contract.
        Reproduce: scripts/soak_ingest.py --modality text --conns 16
        --batch 128 --quiet --algorithm minhash."""
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
        from soak_ingest import run_soak

        runs = [run_soak(seconds=4.0, conns=16, algorithm="minhash",
                         batch=128, quiet=True, modality="text")
                for _ in range(3)]
        clean = [r for r in runs if not r.get("warmup_degraded")]
        rates = sorted(r["req_per_sec"] for r in (clean or runs))
        extra["ingest_text_http_runs_docs_per_sec"] = [
            round(r["req_per_sec"], 1) for r in runs]
        extra["ingest_text_http_errors"] = sum(r["errors"] for r in runs)
        if len(clean) < len(runs):
            extra["ingest_text_http_degraded"] = True
        return rates[len(rates) // 2]

    def _ingest_audio_http():
        """End-to-end HTTP audio ingest: binary clip-batch route ->
        device wang pipeline (vmapped per equal-length group) -> WAL
        group commit, measured as clips/s AND seconds-of-audio per
        second (xRT) at the reference's criterion workload (4 s 8 kHz
        clips, benches/end_to_end.rs). The served counterpart of
        audio_wang_xrt (kernel-only). Reproduce:
        scripts/soak_ingest.py --modality audio --conns 16 --batch 32
        --quiet --algorithm wang."""
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
        from soak_ingest import run_soak

        # cap THIS soak's warmup budget: the wang [32, 32000] batch
        # shape cold-compiles in a fresh process and one congested
        # window measured it exceeding the server's 120 s request
        # timeout — a 240 s cap bounds what a bad window can take from
        # the bench budget (the poisoned first run is flagged degraded
        # and excluded; the compile completes server-side regardless,
        # so runs 2-3 measure warm)
        prior = os.environ.get("UCFP_SOAK_WARMUP_S")
        os.environ["UCFP_SOAK_WARMUP_S"] = "240"
        # s16 vs f32 is settled A/B-style (round-4 verdict #3):
        # INTERLEAVED windows — f32, s16, f32, s16, ... — so the
        # tunnel's 3x bandwidth swings hit both encodings equally
        # instead of whichever ran last; both sides quote the median
        # of 3, same methodology as every tunnel-sensitive metric
        runs, s16_runs = [], []
        try:
            for _ in range(3):
                runs.append(run_soak(seconds=4.0, conns=16,
                                     algorithm="wang", batch=32,
                                     quiet=True, modality="audio"))
                try:
                    s16_runs.append(run_soak(
                        seconds=4.0, conns=16, algorithm="wang",
                        batch=32, quiet=True, modality="audio",
                        encoding="s16"))
                except Exception as e:  # isolated: f32 metric lands
                    extra["ingest_audio_http_s16_error"] = \
                        type(e).__name__
            # amortization row (verdict #5b): 4x the clips per request
            # so the per-batch device+WAL cost spreads further; s16
            # wire keeps the 16 MiB body cap comfortable (8 MB)
            try:
                b128 = run_soak(seconds=6.0, conns=16, algorithm="wang",
                                batch=128, quiet=True, modality="audio",
                                encoding="s16")
                extra["ingest_audio_http_clips_per_sec_s16_b128"] = \
                    round(b128["req_per_sec"], 1)
                if b128.get("warmup_degraded"):
                    extra["ingest_audio_http_s16_b128_degraded"] = True
            except Exception as e:
                extra["ingest_audio_http_s16_b128_error"] = \
                    type(e).__name__
        finally:
            if prior is None:
                os.environ.pop("UCFP_SOAK_WARMUP_S", None)
            else:
                os.environ["UCFP_SOAK_WARMUP_S"] = prior

        def med(rs):
            clean = [r for r in rs if not r.get("warmup_degraded")]
            vals = sorted(r["req_per_sec"] for r in (clean or rs))
            return vals[len(vals) // 2], len(clean) < len(rs)

        f32_med, f32_deg = med(runs)
        extra["ingest_audio_http_runs_clips_per_sec"] = [
            round(r["req_per_sec"], 1) for r in runs]
        extra["ingest_audio_http_errors"] = sum(
            r["errors"] for r in runs + s16_runs)
        if f32_deg:
            extra["ingest_audio_http_degraded"] = True
        best = f32_med
        if s16_runs:
            s16_med, s16_deg = med(s16_runs)
            extra["ingest_audio_http_s16_runs_clips_per_sec"] = [
                round(r["req_per_sec"], 1) for r in s16_runs]
            extra["ingest_audio_http_clips_per_sec_s16"] = round(
                s16_med, 1)
            if s16_deg:
                extra["ingest_audio_http_s16_degraded"] = True
            if f32_med > 0:
                extra["ingest_audio_http_s16_vs_f32"] = round(
                    s16_med / f32_med, 3)
            best = max(best, s16_med)
        b128_rate = extra.get("ingest_audio_http_clips_per_sec_s16_b128")
        if isinstance(b128_rate, (int, float)):
            best = max(best, b128_rate)
        extra["ingest_audio_http_served_xrt"] = round(
            f32_med * 4.0, 1)  # 4 s of audio per clip
        extra["ingest_audio_http_served_xrt_best"] = round(best * 4.0, 1)
        return f32_med

    def _query_http():
        """End-to-end HTTP /v1/query soak (scripts/soak_query.py): JSON
        parse -> auth -> micro-batched device kNN -> JSON response,
        measured as queries/s + client latency percentiles over a
        65k x 768 int8 catalog at 16 connections. This is the layer the
        kernel p50s and the knn_serving_overhead envelope don't cover —
        concurrent plain queries coalesce into ONE padded batched
        dispatch per 2 ms deadline window (UCFP_QUERY_BATCH_MS), so
        through the tunnel (~30 ms/dispatch) QPS ~= conns/dispatch
        rather than 1/dispatch. The exact-mode contrast run (batching
        off, one dispatch per request) quantifies exactly that win
        (CPU-backend: 521 vs 103 qps). Median of 3 batched windows +
        range/unstable/degraded flags (same contract as the ingest
        soak)."""
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
        from soak_query import run_query_soak

        # stage budget: the first batched compile was observed taking
        # >400 s through a congested tunnel window (the soak's warmup
        # deadline absorbs it, flagged degraded); this cap keeps a
        # pathological window from starving the rest of the bench
        stage_budget = float(
            os.environ.get("UCFP_BENCH_QUERY_BUDGET_S", "900"))
        t0 = time.perf_counter()
        runs = []
        for _ in range(3):
            runs.append(run_query_soak(seconds=4.0, conns=16, n=65_536,
                                       d=768, quant="int8"))
            if time.perf_counter() - t0 > stage_budget:
                break
        # a degraded run measured its window DURING the first compile
        # (qps ~0): quote the median of clean runs, keep every run's
        # rate visible so a congested capture can't masquerade as a
        # serving regression
        clean = [r for r in runs if not r.get("warmup_degraded")] or runs
        rates = sorted(r["qps"] for r in clean)
        med = rates[len(rates) // 2]
        mid = [r for r in clean if r["qps"] == med][0]
        extra["query_http_errors"] = sum(r["errors"] for r in runs)
        extra["query_http_runs_qps"] = sorted(
            round(r["qps"], 1) for r in runs)
        extra["query_http_p50_ms"] = mid["p50_ms"]
        extra["query_http_p99_ms"] = mid["p99_ms"]
        extra["query_http_avg_batch"] = mid["avg_batch"]
        extra["query_http_unstable"] = bool(
            len(rates) > 1
            and (rates[0] <= 0 or rates[-1] / rates[0] > 2.0)
        )
        if any(r.get("warmup_degraded") for r in runs):
            extra["query_http_degraded"] = True
        # per-dispatch contrast (micro-batching off): a failure here
        # must not sink the primary metric. The 0.5 s absorber run
        # exists to take the exact kernel's first compile OUT of the
        # measured window (compiles persist process-wide).
        try:
            if time.perf_counter() - t0 > stage_budget:
                raise TimeoutError("query bench stage budget exhausted")
            run_query_soak(seconds=0.5, conns=16, n=65_536, d=768,
                           quant="int8", exact=True)
            ex = run_query_soak(seconds=4.0, conns=16, n=65_536, d=768,
                                quant="int8", exact=True)
            extra["query_http_exact_qps"] = ex["qps"]
            extra["query_http_exact_p50_ms"] = ex["p50_ms"]
            if ex.get("warmup_degraded"):
                extra["query_http_exact_degraded"] = True
        except Exception as e:
            extra["query_http_exact_qps"] = (
                f"error: {type(e).__name__}: {e}")
        return med

    def _query_http_c1():
        """Served SINGLE-REQUEST /v1/query latency (round-4 verdict
        #4): conns=1 and conns=4 at the exact (f32) and int4 tiers,
        emitted as query_http_{tier}_p50_ms_c{N} — the keys a reader
        compares directly against the kernel p50s plus the ~0.5 ms
        serving envelope (knn_serving_overhead_ms_10m). Micro-batching
        is OFF (per-request dispatch): at 1 connection coalescing only
        adds deadline latency. On-chip rows include the tunnel's
        ~25-30 ms dispatch floor; the CPU-subprocess rows measure the
        identical host path without it, so the pair brackets what real
        co-located hardware would see. Compile warm-over rides each
        soak's internal bounded warmup loop."""
        import pathlib
        import subprocess
        import sys

        sys.path.insert(0, str(
            pathlib.Path(__file__).resolve().parent / "scripts"))
        from soak_query import run_query_soak

        stage_budget = float(
            os.environ.get("UCFP_BENCH_QUERY_C1_BUDGET_S", "900"))
        t0 = time.perf_counter()
        headline = None
        for quant, tag in ((None, "exact"), ("int4", "int4")):
            for conns in (1, 4):
                key = f"query_http_{tag}_p50_ms_c{conns}"
                if time.perf_counter() - t0 > stage_budget:
                    extra[key] = "skipped: stage budget exhausted"
                    continue
                try:
                    r = run_query_soak(seconds=4.0, conns=conns,
                                       n=65_536, d=768, quant=quant,
                                       exact=True)
                except Exception as e:
                    extra[key] = f"error: {type(e).__name__}: {e}"
                    continue
                extra[key] = r["p50_ms"]
                extra[f"query_http_{tag}_p99_ms_c{conns}"] = r["p99_ms"]
                extra[f"query_http_{tag}_qps_c{conns}"] = r["qps"]
                if r.get("warmup_degraded"):
                    extra[f"query_http_{tag}_c{conns}_degraded"] = True
                if tag == "exact" and conns == 1:
                    headline = r["p50_ms"]
        # identical host path, CPU backend, no tunnel dispatch floor
        script = pathlib.Path(__file__).resolve().parent / "scripts" / \
            "soak_query.py"
        for quant_args, tag in (([], "exact"), (["--quant", "int4"],
                                                "int4")):
            key = f"query_http_cpu_{tag}_p50_ms_c1"
            try:
                out = subprocess.run(
                    [sys.executable, str(script), "--cpu", "--seconds",
                     "4", "--conns", "1", "--exact"] + quant_args,
                    capture_output=True, text=True, timeout=600,
                    check=True)
                r = json.loads(out.stdout.strip().splitlines()[-1])
                extra[key] = r["p50_ms"]
                extra[f"query_http_cpu_{tag}_qps_c1"] = r["qps"]
            except Exception as e:
                extra[key] = f"error: {type(e).__name__}"
        return headline

    def _panako_haitsma_xrt():
        """Panako + Haitsma extraction xRT — driver-captured so the
        published ~142k / ~34k claims reproduce from the bench JSON."""
        p_xrt, h_xrt, hf_xrt = bench_audio_xrt_panako_haitsma()
        extra["audio_haitsma_xrt"] = round(h_xrt, 1)
        extra["audio_haitsma_fft_xrt"] = round(hf_xrt, 1)
        return round(p_xrt, 1)

    def _knn_serving_overhead():
        """Host overhead of the EmbeddedBackend.knn serving envelope on
        top of the raw kernel (scripts/knn_serving_overhead.py): the
        BASELINE "/v1/query p50 @10M" target is about the SERVED path,
        and the envelope must stay O(k) — catalog-independent — for the
        kernel p50s to reach users. CPU subprocess by design: the
        quantity is host Python work and the tunnel's ~25 ms dispatch
        would drown it. Also records what `list(cache.rids)` alone
        would cost at 10M rows (the O(catalog) copy the deferred
        rid-mapping design removed from every query)."""
        import pathlib
        import subprocess
        import sys

        script = pathlib.Path(__file__).resolve().parent / "scripts" / \
            "knn_serving_overhead.py"
        out = subprocess.run(
            [sys.executable, str(script), "--cpu", "--iters", "20"],
            capture_output=True, text=True, timeout=600, check=True,
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        extra["knn_rid_copy_ms_10m"] = r["rid_copy_ms"]
        extra["knn_serving_kernel_cpu_p50_ms_10m"] = r["kernel_p50_ms"]
        return r["serving_overhead_p50_ms"]

    def _text_minhash():
        """Host-side text fingerprint throughput on the reference's own
        bench workload (benches/end_to_end.rs:24-42: a ~5.6 KiB pangram
        document per iteration). Tunnel-insensitive: the whole path is
        host CPU (canonicalize + native UAX#29-ASCII tokenize + fused
        shingle-XXH3-minhash, native/textsig.cpp). Reference claims
        sub-millisecond text fingerprints (REPORT.md:41); this records
        the measured ms/doc beside docs/s."""
        from ucfp_tpu.modality.text import fingerprint_minhash

        pangram = "The quick brown fox jumps over the lazy dog. "
        doc = (pangram * (5734 // len(pangram) + 1))[:5734]
        fingerprint_minhash(doc, 1, 1)  # warm (builds the .so if stale)
        n = 200
        t0 = time.perf_counter()
        for i in range(n):
            fingerprint_minhash(doc, 1, i)
        per = (time.perf_counter() - t0) / n
        extra["text_minhash_ms_per_doc_5k6"] = round(per * 1e3, 4)
        # the same byte size in mixed French/CJK — the full-Unicode
        # native scanner path (wb_table.h); published in BASELINE.md
        # as 0.59 ms/doc, so the driver must be able to reproduce it
        udoc = (
            "Voilà l'objectif qu'il préférait — déjà vu, café, naïve, "
            "中文混入 textes français avec des accents éèêë. " * 64
        )[:5600]
        fingerprint_minhash(udoc, 1, 1)
        t0 = time.perf_counter()
        for i in range(n):
            fingerprint_minhash(udoc, 1, i)
        extra["text_minhash_unicode_ms_per_doc_5k6"] = round(
            (time.perf_counter() - t0) / n * 1e3, 4
        )
        return round(1.0 / per, 1)

    # UCFP_BENCH_ONLY=<substr>[,<substr>...] runs only matching metrics
    # (builder-side selective runs; the driver never sets it)
    only = [s for s in os.environ.get("UCFP_BENCH_ONLY", "").split(",") if s]
    for name, fn in [
        ("parity_ok", _parity),
        ("ingest_http_imgs_per_sec", _ingest_http),
        ("ingest_text_http_docs_per_sec", _ingest_text_http),
        ("query_http_qps_64k_x768", _query_http),
        ("query_http_exact_p50_ms_c1", _query_http_c1),
        ("text_minhash_docs_per_sec", _text_minhash),
        ("knn_serving_overhead_ms_10m", _knn_serving_overhead),
        # the BASELINE target shape (10M x 768) runs EARLY: the sketch
        # recall + p50 pair is the round-3 headline directive and its
        # kernel carries the largest compile cost
        ("query_cosine_int8_p50_ms_10m_x768", _pair_768),
        ("multihash_images_per_sec", lambda: round(bench_multihash(), 1)),
        ("audio_wang_xrt", lambda: round(bench_audio_xrt(), 1)),
        ("audio_panako_xrt", _panako_haitsma_xrt),
        # late on purpose: its cold batch-shape compile (capped 240 s
        # warmup) must not be able to starve the query-tier metrics
        ("ingest_audio_http_clips_per_sec", _ingest_audio_http),
        ("query_hamming_fused_p50_ms_10m_x64bit",
         lambda: round(bench_hamming_10m_fused(iters=32), 3)),
        ("query_cosine_int8_hybrid_p50_ms_10m_x64",
         lambda: round(bench_cosine_int8_10m_hybrid(iters=16), 3)),
        ("query_cosine_int8_mxu_p50_ms_10m_x64",
         lambda: round(bench_cosine_int8_10m_mxu(iters=16), 3)),
        ("audio_match_p50_ms_1m_landmarks",
         lambda: round(bench_audio_match(), 3)),
    ] + ([
        ("query_cosine_p50_ms_1m_x64", lambda: round(bench_query_p50(), 3)),
        ("query_cosine_int8_p50_ms_10m_x64",
         lambda: round(bench_cosine_int8_10m(), 3)),
    ] if full else []):
        if only and not any(s in name for s in only):
            continue
        if time.perf_counter() - t_start > budget_s:
            extra[name] = "skipped: bench budget exhausted"
            continue
        try:
            extra[name] = fn()
        except Exception as e:  # secondary metrics must not sink the headline
            extra[name] = f"error: {type(e).__name__}: {e}"
        finally:
            # drop dead device buffers before the next multi-GB working
            # set: exception tracebacks pin a failed bench's arrays, and
            # back-to-back 10M benches would otherwise stack in HBM
            import gc

            import jax as _jax

            gc.collect()
            try:
                for dev in _jax.local_devices():
                    _jax.device_put(0, dev).block_until_ready()
            except Exception:
                pass
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
