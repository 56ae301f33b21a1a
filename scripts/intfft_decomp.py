"""Stage decomposition of the flagged ucfp-int-fft-v1 Haitsma
spectrogram vs the dense integer DFT — the measurement behind
BASELINE.md "Haitsma integer FFT" (round 5, VERDICT r04 #9).

Runs cumulative prefixes of the staged pipeline in a device fori_loop
(bench._timed calibration) so each line's delta is one stage's cost:

    upto=0  framing + window multiply
    upto=1  + transpose to the q-batched [N2, T, N1] layout
    upto=2  + stage-1 twiddle-folded limb dots (q-batched)
    upto=3  + re-layout into the stage-2 [N1, T, 2*N2] packed operand
    upto=4  + stage-2 packed K=64 limb dots (r-batched)
    upto=5  + output transpose + int64 power       (= the full kernel)
    dense   dsp.stft_power_int at the same shape, for contrast

Usage: python scripts/intfft_decomp.py [--secs 60]
(on the chip by default; the conclusion — dense wins — is a TPU
statement, CPU numbers are not comparable).
"""

import argparse
import functools
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=60.0)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    import bench
    from ucfp_tpu.ops.audio import dsp, intfft

    sr = 5000
    n, hop, n1 = 2048, 64, intfft.N1
    n2 = n // n1
    t5 = np.arange(int(args.secs * sr)) / sr
    x5 = (0.4 * np.sin(2 * np.pi * 440 * t5)).astype(np.float32)
    xi = jax.device_put(jnp.asarray(dsp.quantize_samples_i16(x5)))

    def stages(samples, upto):
        xq = samples.astype(jnp.int32)
        t = (xq.shape[0] - n) // hop + 1
        frames = dsp._frame_rows(xq, n, hop, t)
        xw = (frames * jnp.asarray(intfft._window_q(n))[None, :]) >> 14
        if upto == 0:
            return jnp.sum(xw)
        m = jnp.max(jnp.abs(xw))
        amp_bits = jnp.sum(
            (m >= (jnp.int32(1) << jnp.arange(15, dtype=jnp.int32)))
            .astype(jnp.int32))
        s1 = jnp.maximum(jnp.int32(14), amp_bits + 6)
        xt = xw.reshape(t, n1, n2).transpose(2, 0, 1)
        if upto == 1:
            return jnp.sum(xt)
        cq = intfft._limb_matmul14(
            xt, jnp.asarray(intfft._stage1_basis(n)), 2 * n1, batched=True)
        c_re = cq[..., :n1] >> (s1 - 14)
        c_im = cq[..., n1:] >> (s1 - 14)
        if upto == 2:
            return jnp.sum(c_re) + jnp.sum(c_im)
        v = jnp.concatenate(
            [c_re.transpose(2, 1, 0), c_im.transpose(2, 1, 0)], axis=2)
        if upto == 3:
            return jnp.sum(v)
        basis2 = jnp.broadcast_to(
            jnp.asarray(intfft._stage2_basis(n))[None],
            (n1, 2 * n2, 4 * n2))
        d = intfft._limb_matmul14(v, basis2, 2 * n2, batched=True)
        if upto == 4:
            return jnp.sum(d)
        d_re = d[..., :n2].transpose(1, 2, 0).reshape(t, n)[:, : n // 2 + 1]
        d_im = d[..., n2:].transpose(1, 2, 0).reshape(t, n)[:, : n // 2 + 1]
        re64 = d_re.astype(jnp.int64)
        im64 = d_im.astype(jnp.int64)
        return jnp.sum(re64 * re64 + im64 * im64)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def loop(samples, it, upto):
        def body(_i, carry):
            v = stages(carry, upto)
            return carry.at[0].add((v % 3).astype(jnp.int16))

        return jnp.sum(
            jax.lax.fori_loop(0, it, body, samples)[:8].astype(jnp.int32))

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_dense(samples, it):
        def body(_i, carry):
            p = dsp.stft_power_int(carry, n, hop, False, shift=14)
            return carry.at[0].add((jnp.sum(p) % 3).astype(jnp.int16))

        return jnp.sum(
            jax.lax.fori_loop(0, it, body, samples)[:8].astype(jnp.int32))

    prev = 0.0
    for upto in range(6):
        def run(k, upto=upto):
            with enable_x64():
                return float(loop(xi, k, upto))

        per = bench._timed(run, args.iters)
        print(f"upto={upto}: {per * 1000:8.3f} ms  (+{(per - prev) * 1000:.3f})")
        prev = per

    def run_dense(k):
        with enable_x64():
            return float(loop_dense(xi, k))

    per = bench._timed(run_dense, args.iters)
    print(f"dense DFT: {per * 1000:7.3f} ms")


if __name__ == "__main__":
    main()
