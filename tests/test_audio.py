"""Audio pipeline tests: DSP primitives vs scipy oracle, peak picking,
Wang/Panako/Haitsma properties, neural, watermark, streaming, inspect."""

import math

import numpy as np
import pytest

from ucfp_tpu.core import ModalityError
from ucfp_tpu.modality import audio as amod
from ucfp_tpu.ops.audio import constellation, dsp, haitsma as hops


def sine(freq=440.0, secs=4.0, sr=8000, amp=0.5):
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * math.pi * freq * t)).astype(np.float32)


def two_tone(secs=4.0, sr=8000):
    t = np.arange(int(secs * sr)) / sr
    x = 0.4 * np.sin(2 * math.pi * 440 * t)
    x += 0.3 * np.sin(2 * math.pi * 1200 * t) * (np.sin(2 * math.pi * 0.5 * t) > 0)
    return x.astype(np.float32)


class TestDsp:
    def test_stft_matches_scipy(self):
        """Matmul-DFT magnitudes vs scipy rfft on the same frames."""
        import jax.numpy as jnp

        x = sine(secs=0.5)
        power = np.asarray(dsp.stft_power(jnp.asarray(x), 1024, 256, False))
        w = dsp.hann_periodic(1024)
        f0 = x[:1024] * w
        ref = np.abs(np.fft.rfft(f0)) ** 2
        np.testing.assert_allclose(power[0], ref, rtol=1e-3, atol=1e-3)

    def test_frame_rows_slice_path_equals_gather(self):
        """The hop-divides-n_fft framing (shifted reshapes, no gather)
        must produce the identical frame matrix to the gather
        formulation — the frames feed bit-exact integer matmuls."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        for n, n_fft, hop in [
            (5000, 1024, 256), (2048, 2048, 64), (1500, 256, 128),
            (1024, 1024, 256), (3000, 512, 100),  # 100 does not divide
        ]:
            x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            t = (n - n_fft) // hop + 1
            got = dsp._frame_rows(x, n_fft, hop, t)
            idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
            ref = np.asarray(x)[idx]
            assert got.shape == (t, n_fft)
            np.testing.assert_array_equal(np.asarray(got), ref)

    def test_stft_power_int_shift14_matches_generic_recombine(self):
        """The int32 recombine fast path (shift=14, the Haitsma config)
        must be bit-identical to the generic int64
        (hh<<14 + mid<<7 + ll) >> shift recombine — verified against a
        numpy int64 reference over random signed samples."""
        import jax.numpy as jnp
        from jax import enable_x64

        from ucfp_tpu.ops.audio.dsp import SAMPLE_Q, dft_basis_int_limbs

        rng = np.random.default_rng(23)
        n_fft, hop = 512, 128
        x = rng.uniform(-1.2, 1.2, 4000).astype(np.float32)
        xq = np.round(np.clip(x, -1.0, 1.0) * SAMPLE_Q).astype(np.int64)
        t = (len(xq) - n_fft) // hop + 1
        idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
        frames = xq[idx]
        fh = np.floor_divide(frames, 128)
        fl = frames - 128 * fh
        ch, cl, sh, sl = (
            a.astype(np.int64) for a in dft_basis_int_limbs(n_fft)
        )
        for shift in (14, 15):  # 15 exercises the composed extra shift
            with enable_x64():
                got = np.asarray(
                    dsp.stft_power_int(jnp.asarray(x), n_fft, hop, False,
                                       shift)
                )

            def combine(bh, bl):
                hh = fh @ bh
                mid = fh @ bl + fl @ bh
                ll = fl @ bl
                return ((hh << 14) + (mid << 7) + ll) >> shift

            re = combine(ch, cl)
            im = combine(sh, sl)
            ref = re * re + im * im
            assert got.dtype == np.int64
            np.testing.assert_array_equal(got, ref)

    def test_successor_window_equals_gather(self):
        """_successor_window (static shifted slices) must equal the
        clamped-gather formulation a[min(i+j, p-1)] exactly."""
        rng = np.random.default_rng(11)
        for p, w in [(8, 3), (50, 30), (128, 127), (300, 256), (2, 1)]:
            a = rng.integers(0, 1000, p).astype(np.int32)
            got = np.asarray(constellation._successor_window(a, w))
            idx = np.minimum(
                np.arange(p)[:, None] + np.arange(1, w + 1)[None, :], p - 1
            )
            np.testing.assert_array_equal(got, a[idx])
            b = rng.random(p) > 0.5  # bool operand (the validity mask)
            np.testing.assert_array_equal(
                np.asarray(constellation._successor_window(b, w)), b[idx]
            )

    def test_wang_pairs_matches_gather_reference(self):
        """wang_pairs after the gather-free rewrite must be
        bit-identical to the original gather formulation."""
        import jax.numpy as jnp

        rng = np.random.default_rng(13)
        p = 240
        t = jnp.asarray(np.sort(rng.integers(0, 2000, p)).astype(np.int32))
        f = jnp.asarray(rng.integers(0, 513, p).astype(np.int32))
        valid = jnp.asarray(rng.random(p) > 0.2)
        fan_out, zone_t, zone_f = 10, 63, 64
        h, t1, ok = constellation.wang_pairs(t, f, valid, fan_out, zone_t, zone_f)
        # reference: the pre-rewrite gather formulation
        w = min(constellation.PAIR_WINDOW, p - 1)
        tn, fn, vn = np.asarray(t), np.asarray(f), np.asarray(valid)
        succ = np.arange(p)[:, None] + np.arange(1, w + 1)[None, :]
        in_range = succ < p
        sc = np.minimum(succ, p - 1)
        dt = tn[sc] - tn[:, None]
        df = np.abs(fn[sc] - fn[:, None])
        ok_ref = (in_range & vn[:, None] & vn[sc] & (dt > 0)
                  & (dt <= zone_t) & (df <= zone_f))
        rank = np.cumsum(ok_ref.astype(np.int32), axis=1) - 1
        ok_ref &= rank < fan_out
        h_ref = ((fn[:, None].astype(np.uint32) << 22)
                 | (fn[sc].astype(np.uint32) << 12) | dt.astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(ok), ok_ref)
        np.testing.assert_array_equal(np.asarray(h), h_ref)
        np.testing.assert_array_equal(
            np.asarray(t1), np.broadcast_to(tn[:, None].astype(np.uint32), h_ref.shape)
        )

    def test_panako_triplets_matches_argsort_reference(self):
        """panako_triplets' top_k target selection (and the gather-free
        successor windows) must reproduce the original
        argsort-and-gather formulation exactly — including the
        tie order among invalid lanes (top_k and stable argsort both
        prefer lower indices)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(17)
        p = 240
        tn = np.sort(rng.integers(0, 2000, p)).astype(np.int32)
        fn = rng.integers(0, 513, p).astype(np.int32)
        vn = rng.random(p) > 0.2
        fan_out, zone_t, zone_f = 5, 96, 96
        h, aux, ok = constellation.panako_triplets(
            jnp.asarray(tn), jnp.asarray(fn), jnp.asarray(vn),
            fan_out, zone_t, zone_f,
        )
        # reference: the pre-rewrite formulation (clamped gather +
        # full argsort + flat t[g] gather)
        w = min(constellation.PAIR_WINDOW, p - 1)
        succ = np.arange(p)[:, None] + np.arange(1, w + 1)[None, :]
        in_range = succ < p
        sc = np.minimum(succ, p - 1)
        dt = tn[sc] - tn[:, None]
        df = np.abs(fn[sc] - fn[:, None])
        ok_ref = (in_range & vn[:, None] & vn[sc] & (dt > 0)
                  & (dt <= zone_t) & (df <= zone_f))
        rank = np.cumsum(ok_ref.astype(np.int32), axis=1) - 1
        ok_ref &= rank < fan_out + 1
        sort_key = np.where(ok_ref, np.arange(w)[None, :], w + 1)
        order = np.argsort(sort_key, axis=1, kind="stable")[:, : fan_out + 1]
        g = np.take_along_axis(sc, order, axis=1)
        gv = np.take_along_axis(ok_ref, order, axis=1)
        t2, f2 = tn[g], fn[g]
        i1, i2 = np.triu_indices(fan_out + 1, k=1)
        pair_ok_ref = gv[:, i1] & gv[:, i2]
        np.testing.assert_array_equal(np.asarray(ok), pair_ok_ref)
        # hash equality on the VALID lanes (the wire contract: the host
        # packs h[ok]); recompute the reference hash fields
        t2a, t3a = t2[:, i1], t2[:, i2]
        f2a, f3a = f2[:, i1], f2[:, i2]
        denom = np.maximum(t3a - tn[:, None], 1)
        ratio = np.clip(
            (15 * (t2a - tn[:, None]) + denom // 2) // denom, 0, 15
        ).astype(np.uint32)
        bt = constellation._band_table_np(7.8125)
        lb1, lb2, lb3 = bt[fn[:, None]], bt[f2a], bt[f3a]
        db12 = np.clip(lb2 - lb1 + 128, 0, 255).astype(np.uint32)
        db23 = np.clip(lb3 - lb2 + 128, 0, 255).astype(np.uint32)
        b1c = np.clip(lb1 >> 3, 0, 255).astype(np.uint32)
        h_ref = (db12 << 24) | (db23 << 16) | (ratio << 12) | (b1c << 4)
        np.testing.assert_array_equal(
            np.asarray(h)[pair_ok_ref], h_ref[pair_ok_ref]
        )

    def test_stft_peak_at_tone_bin(self):
        import jax.numpy as jnp

        x = sine(freq=1000.0, secs=1.0)
        power = np.asarray(dsp.stft_power(jnp.asarray(x), 1024, 256, True))
        # 1000 Hz at 8 kHz, n_fft 1024 -> bin 128
        assert abs(int(np.argmax(power[4])) - 128) <= 1

    def test_centered_frame_count(self):
        import jax.numpy as jnp

        x = sine(secs=1.0)
        power = np.asarray(dsp.stft_power(jnp.asarray(x), 1024, 256, True))
        assert power.shape == (8000 // 256 + 1, 513)

    def test_resample_linear(self):
        x = np.arange(10, dtype=np.float32)
        y = dsp.resample_linear(x, 10, 20)
        assert len(y) == 20
        np.testing.assert_allclose(y[:4], [0.0, 0.5, 1.0, 1.5])
        # identity
        np.testing.assert_array_equal(dsp.resample_linear(x, 10, 10), x)

    def test_mel_bank_shape_and_coverage(self):
        bank = dsp.mel_filterbank(64, 1024, 8000, 0.0, 4000.0)
        assert bank.shape == (513, 64)
        assert (bank.sum(axis=0) > 0).all()  # every band has support


class TestPeaks:
    def test_single_tone_peaks_at_bin(self):
        x = sine(freq=1000.0, secs=2.0)
        t, f, mags, _ = constellation.peaks_for_inspect(
            x, 8000, constellation.WangConfig()
        )
        assert len(t) > 0
        # the strongest peaks sit at the tone bin (128); weaker floor
        # peaks may pass the -50 dB gate but never outrank the ridge
        order = np.argsort(-mags)
        top = f.astype(int)[order[: max(1, len(order) // 2)]]
        assert np.all(np.abs(top - 128) <= 1)
        # and the ridge is picked repeatedly across time slabs
        assert len(np.unique(t[np.abs(f.astype(int) - 128) <= 1])) >= 10

    def test_peaks_per_sec_cap(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=8000 * 2).astype(np.float32)
        cfg = constellation.WangConfig(peaks_per_sec=10)
        t, f, mags, power = constellation.peaks_for_inspect(x, 8000, cfg)
        slab = 8000 // 256
        n_slabs = -(-power.shape[0] // slab)
        assert len(t) <= n_slabs * 10

    def test_local_floor_keeps_quiet_sections(self):
        """A loud passage suppresses quiet-section peaks under the global
        floor; the opt-in per-slab floor keeps them."""
        quiet = 0.002 * np.sin(2 * np.pi * 700 * np.arange(16000) / 8000)  # -54 dB
        loud = 1.0 * np.sin(2 * np.pi * 440 * np.arange(16000) / 8000)
        x = np.concatenate([loud, quiet]).astype(np.float32)
        g = constellation.WangConfig()  # global floor (-50 dB of max)
        lf = constellation.WangConfig(local_floor=True)
        tg, fg, _, _ = constellation.peaks_for_inspect(x, 8000, g)
        tl, fl, _, _ = constellation.peaks_for_inspect(x, 8000, lf)
        # peaks in the quiet half (frames > ~62)
        quiet_global = int(np.sum(tg > 70))
        quiet_local = int(np.sum(tl > 70))
        assert quiet_global == 0  # -48 dB tone is under the global floor
        assert quiet_local > 10  # but well above its own slab's floor

    def test_silence_no_peaks(self):
        x = np.zeros(8000, np.float32)
        t, f, mags, _ = constellation.peaks_for_inspect(
            x, 8000, constellation.WangConfig()
        )
        assert len(t) == 0


class TestWang:
    def test_fingerprint_roundtrip(self):
        rec = amod.fingerprint_wang(two_tone(), 8000, 0, 1)
        assert rec.algorithm == "audiofp-wang-v1"
        assert len(rec.fingerprint) % 8 == 0
        n = len(rec.fingerprint) // 8
        assert n > 0
        arr = np.frombuffer(rec.fingerprint, dtype="<u4").reshape(n, 2)
        dts = arr[:, 0] & 0xFFF
        assert (dts > 0).all() and (dts <= 63).all()

    def test_deterministic(self):
        a = amod.fingerprint_wang(two_tone(), 8000, 0, 1)
        b = amod.fingerprint_wang(two_tone(), 8000, 0, 2)
        assert a.fingerprint == b.fingerprint

    def test_resamples_non_canonical_rate(self):
        x16 = dsp.resample_linear(two_tone(), 8000, 16000)
        rec = amod.fingerprint_wang(x16, 16000, 0, 1)
        assert len(rec.fingerprint) > 0

    def test_fan_out_respected(self):
        cfg = constellation.WangConfig(fan_out=2)
        rec = amod.fingerprint_wang(two_tone(), 8000, 0, 1, cfg)
        arr = np.frombuffer(rec.fingerprint, dtype="<u4").reshape(-1, 2)
        from collections import Counter

        # an anchor peak is identified by (t1 frame, f1 bin)
        per_anchor = Counter(
            (int(t), int(h) >> 22) for h, t in arr.tolist()
        )
        assert max(per_anchor.values()) <= 2

    def test_overlap_shares_hashes(self):
        """A clip and the same clip with a prefix share many hash values
        (time-offset invariance of the hash field)."""
        x = two_tone(secs=3.0)
        # hop- and slab-aligned prefix (31 frames * 256 hop = 7936 samples)
        # so the test exercises the pairing rule, not STFT phase jitter.
        # Prefix amplitude stays BELOW the content's 0.4 peak: the -50 dB
        # magnitude floor is relative to the global max, so a louder
        # prefix would shift the floor and change peak selection (a known
        # sensitivity of global-relative floors; local adaptive
        # thresholds are the eventual fix).
        pre = np.concatenate([sine(220.0, 7936 / 8000.0, amp=0.3), x])
        h1 = np.frombuffer(
            amod.fingerprint_wang(x, 8000, 0, 1).fingerprint, dtype="<u4"
        ).reshape(-1, 2)[:, 0]
        h2 = np.frombuffer(
            amod.fingerprint_wang(pre, 8000, 0, 2).fingerprint, dtype="<u4"
        ).reshape(-1, 2)[:, 0]
        inter = len(set(h1.tolist()) & set(h2.tolist()))
        assert inter >= len(h1) * 0.3


class TestPanako:
    def test_roundtrip(self):
        rec = amod.fingerprint_panako(two_tone(), 8000, 0, 1)
        assert rec.algorithm == "audiofp-panako-v1"
        assert len(rec.fingerprint) % 8 == 0 and len(rec.fingerprint) > 0

    def test_requires_8k(self):
        with pytest.raises(ModalityError):
            amod.fingerprint_panako(two_tone(), 16000, 0, 1)

    def test_tempo_invariance_floor(self):
        """Triplet hashes survive a 3% resample stretch at a usable rate
        (manifest claims tempo-invariance +/-5%; exact-hash overlap is
        bounded by peak-constellation survival, so the floor is modest —
        retrieval uses many hashes per clip + offset voting)."""
        x = two_tone(secs=3.0)
        stretched = dsp.resample_linear(x, 8000, 8240).astype(np.float32)
        h1 = set(
            np.frombuffer(
                amod.fingerprint_panako(x, 8000, 0, 1).fingerprint, "<u4"
            ).reshape(-1, 2)[:, 0].tolist()
        )
        h2 = set(
            np.frombuffer(
                amod.fingerprint_panako(stretched, 8000, 0, 2).fingerprint, "<u4"
            ).reshape(-1, 2)[:, 0].tolist()
        )
        assert len(h1 & h2) >= 0.04 * len(h1)


class TestHaitsma:
    def test_density_312_bytes_per_sec(self):
        """The manifest's density contract: ~312 B per second of audio."""
        rec = amod.fingerprint_haitsma(sine(secs=4.0), 8000, 0, 1)
        bps = len(rec.fingerprint) / 4.0
        assert 280 <= bps <= 315  # (T-1) frames and edge effects

    def test_band_matrix(self):
        m = hops.band_matrix(300.0, 2000.0)
        assert m.shape == (1025, 33)
        assert (m.sum(axis=1) <= 1.0 + 1e-6).all()  # non-overlapping

    def test_robust_to_small_noise(self):
        # broadband content: sparse pure tones leave most of the 33 bands
        # empty, where the double-differential sign is noise-dominated.
        rng0 = np.random.default_rng(42)
        x = rng0.normal(size=16000).astype(np.float32)
        x = np.convolve(x, np.ones(8) / 8, mode="same").astype(np.float32)
        rng = np.random.default_rng(1)
        noisy = (x + 0.001 * rng.normal(size=len(x)).astype(np.float32)).astype(
            np.float32
        )
        a = np.frombuffer(
            amod.fingerprint_haitsma(x, 8000, 0, 1).fingerprint, dtype="<u4"
        )
        b = np.frombuffer(
            amod.fingerprint_haitsma(noisy, 8000, 0, 2).fingerprint, dtype="<u4"
        )
        n = min(len(a), len(b))
        ber = np.unpackbits(
            (a[:n] ^ b[:n]).view(np.uint8)
        ).mean()
        assert ber < 0.15  # bit error rate small under light noise

    def test_distinguishes_content(self):
        a = np.frombuffer(
            amod.fingerprint_haitsma(two_tone(secs=2.0), 8000, 0, 1).fingerprint,
            dtype="<u4",
        )
        rng = np.random.default_rng(2)
        other = rng.normal(size=16000).astype(np.float32)
        b = np.frombuffer(
            amod.fingerprint_haitsma(other, 8000, 0, 2).fingerprint, dtype="<u4"
        )
        n = min(len(a), len(b))
        ber = np.unpackbits((a[:n] ^ b[:n]).view(np.uint8)).mean()
        assert ber > 0.25


class TestNeural:
    def test_embeddings(self):
        rec = amod.fingerprint_neural(two_tone(secs=4.0), 8000, 0, 1)
        assert rec.algorithm == "audiofp-neural-v1"
        assert rec.model_id == amod.NEURAL_MODEL_ID
        assert len(rec.embedding) == 128
        assert abs(np.linalg.norm(rec.embedding) - 1.0) < 1e-4
        # multiple windows packed
        assert len(rec.fingerprint) >= 128 * 4

    def test_similarity_ordering(self):
        a = np.array(amod.fingerprint_neural(two_tone(), 8000, 0, 1).embedding)
        b = np.array(
            amod.fingerprint_neural(two_tone() * 0.8, 8000, 0, 2).embedding
        )
        rng = np.random.default_rng(3)
        c = np.array(
            amod.fingerprint_neural(
                rng.normal(size=32000).astype(np.float32), 8000, 0, 3
            ).embedding
        )
        assert a @ b > a @ c


class TestWatermark:
    CFG = amod.WatermarkConfig(key="tenant-7-secret")

    def test_embed_detect_roundtrip(self):
        x = sine(secs=5.0)
        marked = amod.embed_watermark(x, 8000, payload=0xBEEF, cfg=self.CFG)
        rep = amod.detect_watermark(marked, 8000, self.CFG)
        assert rep.detected
        assert rep.payload == 0xBEEF
        assert rep.confidence > 0.5

    def test_wrong_key_not_detected(self):
        """The PN key is the secret: detection with any other key sees
        only noise — the mark cannot be read, stripped, or forged
        without it."""
        x = sine(secs=5.0)
        marked = amod.embed_watermark(x, 8000, payload=0xBEEF, cfg=self.CFG)
        rep = amod.detect_watermark(
            marked, 8000, amod.WatermarkConfig(key="other-tenant")
        )
        assert not rep.detected
        assert rep.payload is None

    def test_empty_key_rejected(self):
        with pytest.raises(ModalityError):
            amod.detect_watermark(
                sine(secs=5.0), 8000, amod.WatermarkConfig(key="")
            )

    def test_unmarked_not_detected(self):
        rep = amod.detect_watermark(sine(secs=5.0), 8000, self.CFG)
        assert not rep.detected
        assert rep.payload is None

    def test_short_input(self):
        rep = amod.detect_watermark(sine(secs=0.1), 8000, self.CFG)
        assert not rep.detected and rep.confidence == 0.0


def program_audio(secs=5.2, seed=0, rms=0.3):
    """Program-like test audio: low-passed noise at a given rms (what
    the spread-spectrum mark actually has to survive on — a pure tone
    is both easier for correlation and unrepresentative)."""
    rng = np.random.default_rng(seed)
    n = int(8000 * secs)
    x = rng.normal(size=n + 64).astype(np.float32)
    kern = np.hanning(33).astype(np.float32)
    x = np.convolve(x, kern / kern.sum(), mode="same")[:n]
    return (x / (np.sqrt(np.mean(x * x)) + 1e-12) * rms).astype(np.float32)


class TestWatermarkRobustness:
    """The attack envelope (docs/api-reference.md): graded additive
    noise, linear gain, time shift, linear resample, clipping — each
    must keep the RIGHT key detecting (payload intact) and the WRONG
    key blind. Reference capability: AudioSeal's channel-robust
    detector (audio.rs:333-400); this is the classical equivalent via
    z-score decode + keyed-pilot sync/rate search."""

    CFG = amod.WatermarkConfig(key="tenant-7-secret")
    PAYLOAD = 0xC0DE

    def _marked(self, seed=1):
        x = program_audio(seed=seed)
        return amod.embed_watermark(x, 8000, payload=self.PAYLOAD,
                                    cfg=self.CFG)

    def _assert_detected(self, y, note):
        rep = amod.detect_watermark(y, 8000, self.CFG)
        assert rep.detected, f"{note}: confidence={rep.confidence:.3f}"
        assert rep.payload == self.PAYLOAD, note
        return rep

    def test_additive_noise_graded_snr(self):
        marked = self._marked()
        rng = np.random.default_rng(9)
        sig_rms = float(np.sqrt(np.mean(marked**2)))
        for snr_db in (20.0, 10.0, 0.0):
            noise_rms = sig_rms / (10.0 ** (snr_db / 20.0))
            noisy = marked + rng.normal(
                size=len(marked)).astype(np.float32) * noise_rms
            self._assert_detected(noisy, f"snr={snr_db}dB")

    def test_amplitude_scale(self):
        marked = self._marked()
        for gain in (0.25, 2.0):
            self._assert_detected(marked * gain, f"gain={gain}")

    def test_time_shift(self):
        marked = self._marked()
        rng = np.random.default_rng(11)
        for shift in (137, 1000, 3500):
            pad = rng.normal(size=shift).astype(np.float32) * 0.1
            self._assert_detected(
                np.concatenate([pad, marked]), f"shift={shift}")

    def test_linear_resample(self):
        marked = self._marked()
        for f in (1.03, 0.97, 1.011):
            # attacker time-stretch: y[i] = x(i / f)
            pos = np.arange(int(len(marked) * f), dtype=np.float64) / f
            pos = pos[pos <= len(marked) - 1]
            y = np.interp(pos, np.arange(len(marked), dtype=np.float64),
                          marked).astype(np.float32)
            self._assert_detected(y, f"resample={f}")

    def test_resample_plus_shift(self):
        marked = self._marked()
        f = 1.02
        pos = np.arange(int(len(marked) * f), dtype=np.float64) / f
        pos = pos[pos <= len(marked) - 1]
        y = np.interp(pos, np.arange(len(marked), dtype=np.float64),
                      marked).astype(np.float32)
        pad = np.zeros(500, np.float32)
        self._assert_detected(np.concatenate([pad, y]),
                              "resample 1.02 + shift 500")

    def test_clipping(self):
        marked = self._marked()
        lim = 0.6 * float(np.abs(marked).max())
        self._assert_detected(np.clip(marked, -lim, lim), "clip 60%")

    def test_wrong_key_blind_under_attack(self):
        marked = self._marked()
        shifted = np.concatenate([np.zeros(1000, np.float32), marked])
        rep = amod.detect_watermark(
            shifted, 8000, amod.WatermarkConfig(key="not-the-key"))
        assert not rep.detected and rep.payload is None

    def test_unmarked_program_audio_not_detected(self):
        rep = amod.detect_watermark(program_audio(seed=5), 8000, self.CFG)
        assert not rep.detected

    def test_shift_needs_sync(self):
        """Why the pilot exists: with sync off, a shifted mark is
        invisible (PN decorrelates at one sample) — the envelope's
        shift/resample rows are properties of the sync search."""
        marked = self._marked()
        shifted = np.concatenate([np.zeros(1000, np.float32), marked])
        cfg_nosync = amod.WatermarkConfig(key="tenant-7-secret", sync=False)
        assert not amod.detect_watermark(shifted, 8000, cfg_nosync).detected
        assert amod.detect_watermark(marked, 8000, cfg_nosync).detected

    def test_pre_pilot_marks_still_detect(self):
        """Back-compat: marks embedded WITHOUT the pilot (older builds /
        sync=False) must detect under the default detector at lag 0."""
        x = program_audio(seed=3)
        cfg_old = amod.WatermarkConfig(key="tenant-7-secret", sync=False)
        marked = amod.embed_watermark(x, 8000, payload=0x1234, cfg=cfg_old)
        rep = amod.detect_watermark(marked, 8000, self.CFG)
        assert rep.detected and rep.payload == 0x1234


def _mulaw_roundtrip(y: np.ndarray, mu: float = 255.0) -> np.ndarray:
    """8-bit mu-law companding round trip (G.711-style proxy for a
    telephony codec): compress, quantize to 8 bits, expand."""
    y = np.clip(y, -1.0, 1.0)
    c = np.sign(y) * np.log1p(mu * np.abs(y)) / np.log1p(mu)
    q = np.round(c * 127.0) / 127.0
    return (np.sign(q) * ((1.0 + mu) ** np.abs(q) - 1.0) / mu).astype(
        np.float32
    )


def _halfband_roundtrip(y: np.ndarray) -> np.ndarray:
    """8 kHz -> 4 kHz -> 8 kHz: brickwall lowpass at half Nyquist,
    2:1 decimate, linear upsample back — the decimation proxy for the
    16->8->16 kHz codec chain (kills the PN's upper band entirely)."""
    spec = np.fft.rfft(y)
    spec[len(spec) // 2:] = 0.0
    lp = np.fft.irfft(spec, len(y))
    dec = lp[::2]
    up = np.interp(np.arange(len(y)) / 2.0, np.arange(len(dec)), dec)
    return up.astype(np.float32)


class TestWatermarkCodecAttacks:
    """Codec-proxy attacks (round-4 verdict #7): requantization,
    decimation round trips, and pitch shift — the lossy-channel attacks
    AudioSeal-class marks exist to survive. The half-band rows exercise
    the detector's lowpass-matched template retry (_lowpass_pn)."""

    CFG = amod.WatermarkConfig(key="tenant-7-secret")
    PAYLOAD = 0xC0DE

    def _marked(self, seed=1):
        return amod.embed_watermark(
            program_audio(seed=seed), 8000, payload=self.PAYLOAD,
            cfg=self.CFG)

    def _assert_detected(self, y, note):
        rep = amod.detect_watermark(
            np.asarray(y, np.float32), 8000, self.CFG)
        assert rep.detected, f"{note}: confidence={rep.confidence:.3f}"
        assert rep.payload == self.PAYLOAD, note
        return rep

    def test_mulaw_8bit_roundtrip(self):
        self._assert_detected(_mulaw_roundtrip(self._marked()),
                              "mu-law 8-bit")

    def test_linear_8bit_requantization(self):
        m = self._marked()
        self._assert_detected(
            np.round(np.clip(m, -1, 1) * 127.0) / 127.0, "linear 8-bit")

    def test_halfband_decimation_roundtrip(self):
        self._assert_detected(_halfband_roundtrip(self._marked()),
                              "8k->4k->8k")

    def test_pitch_shift(self):
        # resample WITHOUT length correction: pitch and speed move
        # together, the classic cheap de-watermarking attack
        m = self._marked()
        for f in (1.01, 0.99, 1.02):
            pos = np.arange(int(len(m) * f), dtype=np.float64) / f
            pos = pos[pos <= len(m) - 1]
            y = np.interp(pos, np.arange(len(m), dtype=np.float64), m)
            self._assert_detected(y, f"pitch shift {f}")

    def test_shift_plus_mulaw(self):
        m = self._marked()
        y = _mulaw_roundtrip(
            np.concatenate([np.zeros(800, np.float32), m]))
        self._assert_detected(y, "shift 800 + mu-law")

    def test_lowpass_retry_no_false_positives(self):
        """The half-band-matched retry must not turn unmarked or
        wrong-key audio into detections — the retry path itself is
        exercised (plain confidence on these inputs is < 0.75)."""
        clean = _halfband_roundtrip(program_audio(seed=5))
        assert not amod.detect_watermark(clean, 8000, self.CFG).detected
        marked = _halfband_roundtrip(self._marked())
        rep = amod.detect_watermark(
            marked, 8000, amod.WatermarkConfig(key="not-the-key"))
        assert not rep.detected and rep.payload is None


class TestStreaming:
    def test_requires_8k(self):
        with pytest.raises(ModalityError):
            amod.StreamingWangSession(0, 1, 16000)

    def test_segments_emitted(self):
        s = amod.StreamingWangSession(0, 1, 8000, segment_secs=2.0)
        x = two_tone(secs=7.0)
        recs = []
        for i in range(0, len(x), 8000):
            recs.extend(s.push(x[i : i + 8000]))
        recs.extend(s.finalize())
        assert len(recs) >= 3
        assert recs[0].metadata == b"segment=0"
        assert all(len(r.fingerprint) > 0 for r in recs)

    def test_closed_session(self):
        s = amod.StreamingWangSession(0, 1, 8000)
        s.finalize()
        with pytest.raises(ModalityError):
            s.push(np.zeros(100, np.float32))


class TestDecodeAndInspect:
    def test_decode_f32le(self):
        x = np.array([1.0, -0.5], np.float32)
        out = amod.decode_f32le(x.tobytes())
        np.testing.assert_array_equal(out, x)
        with pytest.raises(ModalityError):
            amod.decode_f32le(b"\x00\x01\x02")  # not multiple of 4
        with pytest.raises(ModalityError):
            amod.decode_f32le(b"")

    def test_inspect_stages(self):
        res = amod.inspect_audio(two_tone(secs=2.0), 8000)
        assert res["algorithm"] == "audiofp-wang-v1"
        assert len(res["envelope"]) == 256
        assert res["total_peaks"] > 0
        assert res["total_landmarks"] > 0
        assert res["mel_bands"] == 64
        assert res["duration_secs"] == pytest.approx(2.0)
        # viridis spectrogram PNGs for the playground (reference
        # audio.rs:648-652)
        import base64

        for key in ("lin_spec_png_b64", "mel_spec_png_b64"):
            png = base64.b64decode(res[key])
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_inspect_empty_rejected(self):
        with pytest.raises(ModalityError):
            amod.inspect_audio(np.zeros(0, np.float32), 8000)


class TestWavDecode:
    def test_wav_to_f32_widths(self):
        """Server-side stdlib WAV decode: PCM 8/16-bit, stereo to mono."""
        import io
        import wave

        from ucfp_tpu.modality.audio import wav_to_f32

        t = np.arange(800) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 440 * t)

        def pack(width, ch):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(ch)
                w.setsampwidth(width)
                w.setframerate(8000)
                if width == 1:
                    data = ((x * 127) + 128).astype(np.uint8)
                else:
                    data = (x * 32767).astype("<i2")
                if ch == 2:
                    data = np.repeat(data, 2)
                w.writeframes(data.tobytes())
            return buf.getvalue()

        for width, ch in ((2, 1), (2, 2), (1, 1)):
            pcm, sr = wav_to_f32(pack(width, ch))
            assert sr == 8000
            y = np.frombuffer(pcm, "<f4")
            assert len(y) == 800
            # decoded waveform tracks the source within quantization noise
            tol = 0.02 if width == 1 else 0.001
            assert float(np.abs(y - x).max()) < tol


class TestStreamingFinalizeTail:
    def test_boundary_end_emits_no_duplicate_segment(self):
        """A stream ending exactly at a segment boundary must not emit a
        finalize record made entirely of the carried halo (every landmark
        would duplicate the previous segment's)."""
        from ucfp_tpu.modality.audio import StreamingWangSession

        s = StreamingWangSession(0, 100, 8000, segment_secs=2.0)
        t = np.arange(s.segment + s.halo) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1400 * t)
             * (np.sin(2 * np.pi * 1.1 * t) > 0)).astype(np.float32)
        recs = s.push(x)
        assert len(recs) == 1           # one full segment emitted
        assert s.finalize() == []       # only the halo remains: nothing new

    def test_fresh_tail_still_emits(self):
        from ucfp_tpu.modality.audio import StreamingWangSession

        s = StreamingWangSession(0, 100, 8000, segment_secs=2.0)
        n = s.segment + s.halo + 8000   # one full second beyond the halo
        t = np.arange(n) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1400 * t)
             * (np.sin(2 * np.pi * 1.1 * t) > 0)).astype(np.float32)
        recs = s.push(x)
        assert len(recs) == 1
        tail = s.finalize()
        assert len(tail) == 1 and tail[0].record_id == 101


class TestPanakoStreaming:
    def test_streaming_panako_segments(self):
        """algorithm="panako" streams tempo-invariant triplets (beyond
        the reference, whose streaming is Wang-only); segment content
        matches the one-shot panako fingerprint of the same window."""
        from ucfp_tpu.modality.audio import (
            StreamingWangSession,
            fingerprint_panako,
        )

        s = StreamingWangSession(0, 500, 8000, segment_secs=2.0,
                                 algorithm="panako")
        n = s.segment + s.halo
        t = np.arange(n) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1400 * t)
             * (np.sin(2 * np.pi * 1.1 * t) > 0)).astype(np.float32)
        recs = s.push(x)
        assert len(recs) == 1
        assert recs[0].algorithm == "audiofp-panako-v1"
        assert recs[0].record_id == 500
        one_shot = fingerprint_panako(x[:n], 8000, 0, 999)
        assert recs[0].fingerprint == one_shot.fingerprint

    def test_streaming_rejects_unknown_algorithm(self):
        from ucfp_tpu.core import ModalityError
        from ucfp_tpu.modality.audio import StreamingWangSession

        with pytest.raises(ModalityError):
            StreamingWangSession(0, 1, 8000, algorithm="haitsma")
