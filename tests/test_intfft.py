"""ucfp-int-fft-v1 (ops/audio/intfft.py) — the flagged Haitsma FFT.

Contract under test:
  1. the jitted int8-limb MXU path is bit-identical to the plain-int64
     numpy mirror of the same spec (the limb algebra proof);
  2. the staged transform tracks the dense integer DFT closely in a
     relative sense (it IS a spectrogram, not noise);
  3. flagged Haitsma words self-match (sub-clip lookup finds the right
     offset at BER ~ 0) and cross-match the DFT-path words approximately;
  4. the flag forks config_hash; the default path is untouched.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ucfp_tpu.modality import audio as amod  # noqa: E402
from ucfp_tpu.ops.audio import dsp, haitsma, intfft  # noqa: E402


def _clip(seconds=2.0, sr=5000, seed=0, amp=0.9):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 880 * t + 1.0)
         + 0.2 * rng.standard_normal(len(t)))
    return (amp * x / np.max(np.abs(x))).astype(np.float32)


class TestSpecMirror:
    @pytest.mark.parametrize("seed,amp", [(0, 0.9), (1, 0.9), (2, 0.01)])
    def test_jitted_equals_mirror(self, seed, amp):
        x = _clip(1.0, seed=seed, amp=amp)
        with jax.enable_x64(True):
            got = np.asarray(intfft.stft_power_int_fft(
                jnp.asarray(x), 2048, 64, False))
        want = intfft.stft_power_int_fft_mirror(x, 2048, 64, False)
        np.testing.assert_array_equal(got, want)

    def test_i16_input_equals_f32_input(self):
        x = _clip(1.0, seed=3)
        xi = dsp.quantize_samples_i16(x)
        with jax.enable_x64(True):
            a = np.asarray(intfft.stft_power_int_fft(
                jnp.asarray(x), 2048, 64, False))
            b = np.asarray(intfft.stft_power_int_fft(
                jnp.asarray(xi), 2048, 64, False))
        np.testing.assert_array_equal(a, b)

    def test_block_exponent_quiet_clip(self):
        """A quiet clip exercises the s1 < 20 branch of the per-clip
        block exponent; the mirror must still agree bit for bit."""
        x = _clip(0.8, seed=4, amp=0.004)
        with jax.enable_x64(True):
            got = np.asarray(intfft.stft_power_int_fft(
                jnp.asarray(x), 2048, 64, False))
        want = intfft.stft_power_int_fft_mirror(x, 2048, 64, False)
        np.testing.assert_array_equal(got, want)
        assert got.any(), "quiet clip must not collapse to zero"

    def test_degenerate_inputs(self):
        for x in (np.zeros(4096, np.float32),
                  np.full(4096, np.nan, np.float32)):
            with jax.enable_x64(True):
                got = np.asarray(intfft.stft_power_int_fft(
                    jnp.asarray(x), 2048, 64, False))
            np.testing.assert_array_equal(
                got, intfft.stft_power_int_fft_mirror(x, 2048, 64, False))
            assert not got.any()


class TestSpectralFidelity:
    def test_tracks_dense_dft(self):
        """Per-frame relative error vs the dense integer DFT, compared
        on normalized power (each spec carries its own fixed scale)."""
        x = _clip(1.0, seed=5)
        with jax.enable_x64(True):
            p_fft = np.asarray(intfft.stft_power_int_fft(
                jnp.asarray(x), 2048, 64, False)).astype(np.float64)
            p_dft = np.asarray(dsp.stft_power_int(
                jnp.asarray(x), 2048, 64, False, shift=14)
            ).astype(np.float64)
        a = p_fft / p_fft.sum(axis=1, keepdims=True)
        b = p_dft / p_dft.sum(axis=1, keepdims=True)
        # L1 distance between normalized spectra, per frame
        l1 = np.abs(a - b).sum(axis=1)
        assert np.median(l1) < 0.02, np.median(l1)
        assert l1.max() < 0.1, l1.max()


class TestFlaggedHaitsma:
    def test_words_fork_and_default_unchanged(self):
        x = _clip(2.0, seed=6)
        base = haitsma.fingerprint_frames(x, 5000, haitsma.HaitsmaConfig())
        fft = haitsma.fingerprint_frames(
            x, 5000, haitsma.HaitsmaConfig(fft=True))
        assert base.shape == fft.shape
        assert (base != fft).any()  # different exactness spec
        # ... but MOSTLY agreeing bits: same algorithm, coarser rounding
        ber = np.mean(
            np.unpackbits(
                (base ^ fft).view(np.uint8)).astype(np.float64))
        assert ber < 0.15, ber

    def test_self_match_subclip(self):
        x = _clip(4.0, seed=7)
        cfg = haitsma.HaitsmaConfig(fft=True)
        db = haitsma.fingerprint_frames(x, 5000, cfg)
        sub = haitsma.fingerprint_frames(x[5000:15000], 5000, cfg)
        ber, off = haitsma.min_ber(db, sub)
        assert ber < 0.05, ber
        # hop 64 at 5 kHz: 5000 samples = ~78 frames
        assert abs(off - 78) <= 1, off

    def test_batch_matches_single(self):
        cfg = haitsma.HaitsmaConfig(fft=True)
        stack = np.stack([_clip(1.5, seed=s) for s in (8, 9, 10)])
        singles = [haitsma.fingerprint_frames(r, 5000, cfg) for r in stack]
        batched = haitsma.fingerprint_frames_batch(stack, cfg)
        for a, b in zip(singles, batched):
            np.testing.assert_array_equal(a, b)

    def test_config_hash_forks(self):
        x = _clip(1.0, seed=11)
        r0 = amod.fingerprint_haitsma(x, 5000, 1, 1)
        r1 = amod.fingerprint_haitsma(
            x, 5000, 1, 1, cfg=haitsma.HaitsmaConfig(fft=True))
        assert r0.config_hash != r1.config_hash
        # and the default hash is exactly the historical formula
        from ucfp_tpu.modality.confighash import config_hash64
        assert r0.config_hash == config_hash64(
            "audiofp-haitsma-v1", fmin=300.0, fmax=2000.0)


class TestFftHttpSurface:
    """The ?fft=1 flag through the real router: batch and single routes
    agree, the config_hash forks from the default, and the flagged
    records are queryable."""

    def test_batch_route_fft_flag(self, tmp_path):
        import struct

        from test_server import make_app, call

        def jbody(resp):
            import json
            assert resp.status in (200, 201), resp.body
            return json.loads(resp.body)

        clip = _clip(1.5, sr=8000, seed=20)
        raw = clip.astype("<f4").tobytes()
        frames = struct.pack("<QI", 1, len(raw)) + raw
        app, _ = make_app(tmp_path)
        batch = jbody(call(
            app, "POST", "/v1/ingest/audio/batch/0", frames,
            query="sample_rate=8000&algorithm=haitsma&fft=1"))
        single = jbody(call(
            app, "POST", "/v1/ingest/audio/0/2", raw,
            query="sample_rate=8000&algorithm=haitsma&fft=1"))
        default = jbody(call(
            app, "POST", "/v1/ingest/audio/0/3", raw,
            query="sample_rate=8000&algorithm=haitsma"))
        rec = batch["records"][0]
        assert rec["fingerprint_hex"] == single["fingerprint_hex"]
        assert single["config_hash"] != default["config_hash"]
        assert single["fingerprint_hex"] != default["fingerprint_hex"]
