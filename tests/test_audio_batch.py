"""Batched audio ingest: the vmapped group pipeline must be
bit-identical to the single-clip fingerprints, and the
/v1/ingest/audio/batch route must match the single route's records."""

import struct

import numpy as np
import pytest

from ucfp_tpu.modality import audio as amod
from ucfp_tpu.ops.audio.constellation import PanakoConfig, WangConfig
from ucfp_tpu.ops.audio.haitsma import HaitsmaConfig

from test_server import call, jbody, make_app  # noqa: E402 (shared fixtures)


def _tone(seconds: float, sr: int, freq: float = 440.0, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr), dtype=np.float32) / sr
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    return (x + 0.1 * rng.standard_normal(x.size).astype(np.float32)).astype(
        np.float32
    )


CLIPS = [
    _tone(2.0, 8000, 440.0, 1),
    _tone(2.0, 8000, 523.0, 2),   # same length -> same group
    _tone(1.5, 8000, 660.0, 3),   # different length -> own group
    _tone(2.0, 8000, 880.0, 4),   # group of 3 -> padded to 4
]


class TestBatchBitIdentity:
    @pytest.mark.parametrize("algorithm,single,cfg", [
        ("wang", amod.fingerprint_wang, WangConfig()),
        ("panako", amod.fingerprint_panako, PanakoConfig()),
        ("haitsma", amod.fingerprint_haitsma, HaitsmaConfig()),
    ])
    def test_batch_equals_single(self, algorithm, single, cfg):
        rids = [11, 12, 13, 14]
        recs = amod.fingerprint_audio_batch(
            algorithm, CLIPS, 8000, 7, rids, cfg)
        assert [r.record_id for r in recs] == rids
        for clip, rec in zip(CLIPS, recs):
            ref = single(clip, 8000, 7, rec.record_id, cfg)
            assert rec.fingerprint == ref.fingerprint
            assert rec.config_hash == ref.config_hash
            assert rec.algorithm == ref.algorithm

    def test_wang_resample_path(self):
        clips = [_tone(1.0, 16000, 440.0, 5), _tone(1.0, 16000, 700.0, 6)]
        recs = amod.fingerprint_audio_batch("wang", clips, 16000, 0, [1, 2])
        for clip, rec in zip(clips, recs):
            ref = amod.fingerprint_wang(clip, 16000, 0, rec.record_id)
            assert rec.fingerprint == ref.fingerprint

    def test_panako_requires_canonical_rate(self):
        from ucfp_tpu.core import ModalityError

        with pytest.raises(ModalityError):
            amod.fingerprint_audio_batch(
                "panako", [_tone(1.0, 16000)], 16000, 0, [1])

    def test_short_clip_error_matches_single(self):
        from ucfp_tpu.core import ModalityError

        with pytest.raises(ModalityError):
            amod.fingerprint_audio_batch(
                "wang", [np.zeros(100, np.float32)], 8000, 0, [1])

    def test_panako_short_clip_accepted_like_single(self):
        """The minimum-length gate is wang-only: fingerprint_panako
        accepts sub-1024 clips (centered STFT pads them), so the batch
        must too — a review pass caught the batch 400ing whole batches
        the single route accepts."""
        clip = _tone(500 / 8000, 8000, 440.0, 9)[:500]
        ref = amod.fingerprint_panako(clip, 8000, 0, 1)
        recs = amod.fingerprint_audio_batch("panako", [clip], 8000, 0, [1])
        assert recs[0].fingerprint == ref.fingerprint

    def test_haitsma_short_clip_empty_frames(self):
        # < FRAME + HOP samples after the 5 kHz resample -> empty
        # fingerprint, same as the single path
        clip = _tone(0.3, 8000)
        recs = amod.fingerprint_audio_batch("haitsma", [clip], 8000, 0, [1])
        ref = amod.fingerprint_haitsma(clip, 8000, 0, 1)
        assert recs[0].fingerprint == ref.fingerprint == b""


def _frames(pairs):
    out = bytearray()
    for rid, clip in pairs:
        raw = clip.astype("<f4").tobytes()
        out += struct.pack("<QI", rid, len(raw))
        out += raw
    return bytes(out)


class TestBatchRoute:
    def test_batch_matches_single_route(self, tmp_path):
        app, _ = make_app(tmp_path)
        pairs = [(21, CLIPS[0]), (22, CLIPS[2])]
        body = jbody(call(
            app, "POST", "/v1/ingest/audio/batch/0", _frames(pairs),
            query="sample_rate=8000&algorithm=wang"))
        assert body["count"] == 2
        by_rid = {r["record_id"]: r for r in body["records"]}
        for rid, clip in pairs:
            single = jbody(call(
                app, "POST", f"/v1/ingest/audio/0/{100 + rid}",
                clip.astype("<f4").tobytes(),
                query="sample_rate=8000&algorithm=wang"))
            assert by_rid[rid]["fingerprint_hex"] == single["fingerprint_hex"]
        # durable: describe finds them
        meta = jbody(call(app, "GET", "/v1/records/0/21"))
        assert meta["algorithm"] == "audiofp-wang-v1"

    def test_haitsma_and_quiet(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(
            app, "POST", "/v1/ingest/audio/batch/0",
            _frames([(1, CLIPS[0])]),
            query="sample_rate=8000&algorithm=haitsma&quiet=1"))
        assert body == {"count": 1, "algorithm": "audiofp-haitsma-v1"}

    def test_framing_and_validation_errors(self, tmp_path):
        app, _ = make_app(tmp_path)
        good = _frames([(1, CLIPS[0])])
        q = "sample_rate=8000&algorithm=wang"
        assert call(app, "POST", "/v1/ingest/audio/batch/0",
                    good[:-5], query=q).status == 400
        assert call(app, "POST", "/v1/ingest/audio/batch/0",
                    good[:6], query=q).status == 400
        assert call(app, "POST", "/v1/ingest/audio/batch/0",
                    b"", query=q).status == 400
        # missing sample_rate
        assert call(app, "POST", "/v1/ingest/audio/batch/0", good,
                    query="algorithm=wang").status == 400
        # unsupported algorithm
        assert call(app, "POST", "/v1/ingest/audio/batch/0", good,
                    query="sample_rate=8000&algorithm=neural").status == 400
        # misaligned clip length
        bad = struct.pack("<QI", 1, 6) + b"\x00" * 6
        assert call(app, "POST", "/v1/ingest/audio/batch/0", bad,
                    query=q).status == 400

    def test_cross_tenant_403(self, tmp_path):
        from ucfp_tpu.server.auth import StaticSingleKey

        app, _ = make_app(
            tmp_path, api_keys=StaticSingleKey("tok", tenant_id=5))
        resp = call(app, "POST", "/v1/ingest/audio/batch/0",
                    _frames([(1, CLIPS[0])]),
                    query="sample_rate=8000&algorithm=wang",
                    token="tok")
        assert resp.status == 403
