"""Shipping pre-quantized i16 samples to the integer STFT must be
byte-identical to shipping f32 and quantizing on device — the audio
twin of the host image resize ("ship the smallest exact
representation"). dsp.quantize_samples_i16 replicates the kernel's
`round(clip(x,-1,1) * 16383)` with numpy's round-half-to-even, halving
the device transfer for every wang/panako/haitsma ingest."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import enable_x64

from ucfp_tpu.ops.audio import dsp


def _device_quantize(x: np.ndarray) -> np.ndarray:
    """The kernel's own f32-branch math, run standalone."""
    return np.asarray(jnp.round(
        jnp.clip(jnp.nan_to_num(jnp.asarray(x, jnp.float32)), -1.0, 1.0)
        * dsp.SAMPLE_Q
    ).astype(jnp.int32))


def _boundary_samples() -> np.ndarray:
    """f32 inputs whose product with 16383 is EXACTLY k+0.5 in f32 —
    the round-half-to-even cases where np/jnp disagreement would show."""
    k = np.arange(0, 16383, dtype=np.float64)
    x = ((k + 0.5) / 16383.0).astype(np.float32)
    prod = x * np.float32(dsp.SAMPLE_Q)
    exact = prod == (k + 0.5).astype(np.float32)
    hits = x[exact]
    assert hits.size > 100  # the boundary really is exercised
    return np.concatenate([hits, -hits]).astype(np.float32)


class TestQuantizeEquality:
    def test_random_fuzz(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1.3, 1.3, 65536).astype(np.float32)
        host = dsp.quantize_samples_i16(x)
        assert host.dtype == np.int16
        assert np.array_equal(host.astype(np.int32), _device_quantize(x))

    def test_edges_and_tiny(self):
        x = np.array([-2.0, -1.0, -1e-9, 0.0, 1e-9, 0.5, 1.0, 2.0,
                      np.nextafter(np.float32(1.0), np.float32(0.0)),
                      np.nextafter(np.float32(-1.0), np.float32(0.0))],
                     np.float32)
        assert np.array_equal(dsp.quantize_samples_i16(x).astype(np.int32),
                              _device_quantize(x))

    def test_half_to_even_boundaries(self):
        x = _boundary_samples()
        assert np.array_equal(dsp.quantize_samples_i16(x).astype(np.int32),
                              _device_quantize(x))

    def test_range_fits_i16(self):
        x = np.array([-10.0, 10.0], np.float32)
        q = dsp.quantize_samples_i16(x)
        assert q.min() == -dsp.SAMPLE_Q and q.max() == dsp.SAMPLE_Q

    def test_s16_direct_full_range(self):
        # the i16 fast branch (raw s16 wire samples straight into the
        # quantizer) must equal decode-then-quantize over the ENTIRE
        # int16 domain — the single-rounding argument in the docstring,
        # verified exhaustively rather than trusted
        all_i16 = np.arange(-32768, 32768, dtype=np.int16)
        direct = dsp.quantize_samples_i16(all_i16)
        decoded = all_i16.astype(np.float32) * np.float32(1.0 / 32768.0)
        via_f32 = dsp.quantize_samples_i16(decoded)
        assert np.array_equal(direct, via_f32)

    def test_batch_i16_clips_bit_identical(self):
        # fingerprint_audio_batch accepts raw i16 clips (the s16 batch
        # route): every algorithm/rate combination must produce the
        # same fingerprints as the decoded-f32 clips — the canonical
        # rate rides the integer fast path, the rest decode internally
        from ucfp_tpu.modality import audio as amod

        rng = np.random.default_rng(3)
        for sr in (8000, 16000):
            xi = (rng.integers(-32768, 32768, size=2 * sr)
                  .astype(np.int16))
            xf = xi.astype(np.float32) * np.float32(1.0 / 32768.0)
            for algo in ("wang", "panako", "haitsma"):
                if algo == "panako" and sr != 8000:
                    continue
                ri = amod.fingerprint_audio_batch(
                    algo, [xi, xi[: sr]], sr, 0, [1, 2])
                rf = amod.fingerprint_audio_batch(
                    algo, [xf, xf[: sr]], sr, 0, [1, 2])
                for a, b in zip(ri, rf):
                    assert a.fingerprint == b.fingerprint, (algo, sr)

    def test_non_finite_deterministic(self):
        # a NaN/inf in a wire body must quantize deterministically
        # (NaN->0, +/-inf -> +/-SAMPLE_Q) with no RuntimeWarning, and
        # host/device branches must agree on the degenerate values too
        x = np.array([np.nan, np.inf, -np.inf, 0.25, -np.nan],
                     np.float32)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            q = dsp.quantize_samples_i16(x)
        assert q[0] == 0 and q[4] == 0
        assert q[1] == dsp.SAMPLE_Q and q[2] == -dsp.SAMPLE_Q
        assert np.array_equal(q.astype(np.int32), _device_quantize(x))


class TestStftEquality:
    @pytest.mark.parametrize("center,shift,n_fft,hop", [
        (True, 8, 1024, 256),    # wang/panako shape
        (False, 14, 2048, 64),   # haitsma shape
    ])
    def test_i16_input_identical_power(self, center, shift, n_fft, hop):
        rng = np.random.default_rng(1)
        x = (0.7 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
             + 0.1 * rng.standard_normal(8000)).astype(np.float32)
        with enable_x64():
            via_f32 = np.asarray(dsp.stft_power_int(
                jnp.asarray(x, jnp.float32), n_fft, hop, center, shift))
            via_i16 = np.asarray(dsp.stft_power_int(
                jnp.asarray(dsp.quantize_samples_i16(x)),
                n_fft, hop, center, shift))
        assert np.array_equal(via_f32, via_i16)

    def test_wire_bytes_halve(self):
        x = np.zeros(32000, np.float32)
        assert dsp.quantize_samples_i16(x).nbytes * 2 == x.nbytes
