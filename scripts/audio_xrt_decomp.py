"""On-chip stage decomposition of the Wang xRT pipeline (60 s clip).

Times each stage of bench_audio_xrt's loop body separately with the
same device-loop methodology (arrays passed as ARGUMENTS — closing over
them captures them as compile-time constants and can break the remote
compile, see CLAUDE.md). Run: python scripts/audio_xrt_decomp.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _timed  # the jitter-guarded device-loop calibration


def main():
    import jax
    import jax.numpy as jnp

    from ucfp_tpu.ops.audio import constellation, dsp

    secs, sr = 60.0, 8000
    t = np.arange(int(secs * sr)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 0.5 * t) > 0)
    ).astype(np.float32)
    cfg = constellation.WangConfig()
    xd = jax.device_put(x)
    slab = sr // 256

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_stft(samples, n):
        def body(_i, carry):
            power = dsp.stft_power(carry, 1024, 256, True)
            return carry.at[0].add(jnp.sum(power[0, :4]) * 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, n, body, samples)[:8])

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_peaks(samples, n):
        power0 = dsp.stft_power(samples, 1024, 256, True)

        def body(_i, carry):
            tt, ff, vv = constellation.pick_peaks(
                carry, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db
            )
            delta = (jnp.sum(tt) + jnp.sum(ff)) % 7
            return carry.at[0, 0].add(delta.astype(jnp.float32) * 1e-7)

        return jnp.sum(jax.lax.fori_loop(0, n, body, power0)[0, :8])

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_pairs(samples, n):
        power0 = dsp.stft_power(samples, 1024, 256, True)
        tt0, ff0, vv0 = constellation.pick_peaks(
            power0, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db
        )

        def body(_i, carry):
            tt, ff, vv = carry
            h, t1, ok = constellation.wang_pairs(
                tt, ff, vv, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
            )
            delta = jnp.sum(ok.astype(jnp.int32)) % 7
            return (tt.at[0].add(delta), ff, vv)

        tt, ff, vv = jax.lax.fori_loop(0, n, body, (tt0, ff0, vv0))
        return jnp.sum(tt[:8])

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_full(samples, n):
        def body(_i, carry):
            power = dsp.stft_power(carry, 1024, 256, True)
            tt, ff, vv = constellation.pick_peaks(
                power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db
            )
            h, t1, ok = constellation.wang_pairs(
                tt, ff, vv, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
            )
            delta = jnp.sum(ok.astype(jnp.int32)) % 7
            return carry.at[0].add(delta.astype(jnp.float32) * 1e-7)

        return jnp.sum(jax.lax.fori_loop(0, n, body, samples)[:8])

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_full_int(samples, n):
        """The PRODUCTION pipeline: bit-exact integer STFT (the one
        extract_landmarks serves) -> f32 convert -> peaks -> pairs."""
        def body(_i, carry):
            power = dsp.stft_power_int(carry, 1024, 256, True).astype(
                jnp.float32
            )
            tt, ff, vv = constellation.pick_peaks(
                power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db
            )
            h, t1, ok = constellation.wang_pairs(
                tt, ff, vv, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
            )
            delta = jnp.sum(ok.astype(jnp.int32)) % 7
            return carry.at[0].add(delta.astype(jnp.float32) * 1e-7)

        return jnp.sum(jax.lax.fori_loop(0, n, body, samples)[:8])

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name, fn in [("stft", loop_stft), ("peaks", loop_peaks),
                     ("pairs", loop_pairs), ("full", loop_full)]:
        per = _timed(lambda n, f=fn: float(f(xd, n)), iters)
        print(f"{name:8s} {per * 1e3:8.3f} ms/clip  (xRT {secs / per:8.0f})",
              flush=True)
    from jax import enable_x64

    with enable_x64():  # int64 spectrogram needs x64 tracing (production)
        per = _timed(lambda n: float(loop_full_int(xd, n)), iters)
    print(f"{'full_int':8s} {per * 1e3:8.3f} ms/clip  (xRT {secs / per:8.0f})",
          flush=True)


if __name__ == "__main__":
    main()
