"""s16 audio wire encoding: half the bytes of the f32 contract, and
EXACTLY value-identical for 16-bit-sourced audio — `i16 -> f32 * 2^-15`
is exact in f32 (every int16 is representable; the scale is a power of
two), so decode_s16le matches both client-side conversion and
wav_to_f32's width-2 path bit for bit. Extension over the reference's
raw-f32 wire (src/server/handlers.rs:737-750)."""

import io
import struct
import wave

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                       / "clients" / "python"))

from ucfp_tpu.core import ModalityError
from ucfp_tpu.modality import audio as amod

from test_server import call, jbody, make_app  # noqa: E402 (shared fixtures)


def _i16_tone(seconds: float = 2.0, sr: int = 8000, freq: float = 440.0,
              seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = 0.6 * np.sin(2 * np.pi * freq * t)
    x = x + 0.05 * rng.standard_normal(t.size)
    return np.round(np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2")


def _f32_wire(i16: np.ndarray) -> bytes:
    """What a client shipping the f32 contract would send for the same
    16-bit source: convert then serialize."""
    return (i16.astype(np.float32) * np.float32(1.0 / 32768.0)).astype(
        "<f4").tobytes()


class TestDecodeS16:
    def test_bit_exact_vs_client_conversion(self):
        i16 = _i16_tone()
        via_wire = amod.decode_s16le(i16.tobytes())
        client = np.frombuffer(_f32_wire(i16), "<f4")
        assert via_wire.dtype == np.float32
        assert np.array_equal(via_wire, client)

    def test_bit_exact_vs_wav_pipeline(self):
        i16 = _i16_tone(seed=1)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(i16.tobytes())
        pcm, sr = amod.wav_to_f32(buf.getvalue())
        assert sr == 8000
        assert np.array_equal(np.frombuffer(pcm, "<f4"),
                              amod.decode_s16le(i16.tobytes()))

    def test_extremes(self):
        edge = np.array([-32768, -1, 0, 1, 32767], "<i2")
        out = amod.decode_s16le(edge.tobytes())
        assert out[0] == np.float32(-1.0)
        assert out[2] == np.float32(0.0)
        assert out[-1] == np.float32(32767.0 / 32768.0)

    def test_errors(self):
        with pytest.raises(ModalityError):
            amod.decode_s16le(b"")
        with pytest.raises(ModalityError):
            amod.decode_s16le(b"\x00\x00\x00")

    def test_accepts_memoryview(self):
        i16 = _i16_tone(0.5)
        raw = i16.tobytes()
        assert np.array_equal(amod.decode_s16le(memoryview(raw)),
                              amod.decode_s16le(raw))


def _frames(pairs, encoding: str = "s16") -> bytes:
    out = bytearray()
    for rid, i16 in pairs:
        raw = i16.tobytes() if encoding == "s16" else _f32_wire(i16)
        out += struct.pack("<QI", rid, len(raw))
        out += raw
    return bytes(out)


class TestRoutes:
    @pytest.mark.parametrize("algorithm", ["wang", "panako", "haitsma"])
    def test_single_route_identical_fingerprint(self, tmp_path, algorithm):
        app, _ = make_app(tmp_path)
        i16 = _i16_tone(seed=2)
        via_f32 = jbody(call(
            app, "POST", "/v1/ingest/audio/0/1", _f32_wire(i16),
            query=f"sample_rate=8000&algorithm={algorithm}"))
        via_s16 = jbody(call(
            app, "POST", "/v1/ingest/audio/0/2", i16.tobytes(),
            query=f"sample_rate=8000&algorithm={algorithm}&encoding=s16"))
        assert via_s16["fingerprint_hex"] == via_f32["fingerprint_hex"]
        assert via_s16["config_hash"] == via_f32["config_hash"]

    def test_batch_route_identical_to_f32_wire(self, tmp_path):
        app, _ = make_app(tmp_path)
        pairs = [(21, _i16_tone(seed=3)), (22, _i16_tone(1.5, seed=4))]
        f32 = jbody(call(
            app, "POST", "/v1/ingest/audio/batch/0",
            _frames(pairs, "f32"), query="sample_rate=8000&algorithm=wang"))
        s16_pairs = [(rid + 100, clip) for rid, clip in pairs]
        s16 = jbody(call(
            app, "POST", "/v1/ingest/audio/batch/0",
            _frames(s16_pairs, "s16"),
            query="sample_rate=8000&algorithm=wang&encoding=s16"))
        by_rid_f32 = {r["record_id"]: r for r in f32["records"]}
        by_rid_s16 = {r["record_id"]: r for r in s16["records"]}
        for rid, _ in pairs:
            assert (by_rid_s16[rid + 100]["fingerprint_hex"]
                    == by_rid_f32[rid]["fingerprint_hex"])
        # wire bytes really are half
        assert len(_frames(pairs, "s16")) < len(_frames(pairs, "f32"))

    def test_inspect_route_encoding(self, tmp_path):
        app, _ = make_app(tmp_path)
        i16 = _i16_tone(seed=5)
        a = jbody(call(app, "POST", "/v1/inspect/audio", _f32_wire(i16),
                       query="sample_rate=8000&algorithm=wang"))
        b = jbody(call(app, "POST", "/v1/inspect/audio", i16.tobytes(),
                       query="sample_rate=8000&algorithm=wang&encoding=s16"))
        assert a == b

    def test_stream_route_s16_identical(self, tmp_path):
        app, _ = make_app(tmp_path)
        i16 = _i16_tone(12.0, seed=11)  # 3 x 4 s segments
        # bases far apart: per-segment record ids derive from the base
        # rid, so nearby bases would collide and overwrite each other
        a = jbody(call(
            app, "POST", "/v1/ingest/audio/0/41/stream", _f32_wire(i16),
            query="sample_rate=8000&segment_secs=4"))
        b = jbody(call(
            app, "POST", "/v1/ingest/audio/0/9041/stream", i16.tobytes(),
            query="sample_rate=8000&segment_secs=4&encoding=s16"))
        assert a["segments"] == b["segments"] > 0

        def fp(rid):
            return jbody(call(
                app, "GET", f"/v1/records/0/{rid}",
                query="include=fingerprint"))["fingerprint_hex"]

        assert ([fp(r["record_id"]) for r in a["records"]]
                == [fp(r["record_id"]) for r in b["records"]])

    def test_stream_s16_odd_tail_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        i16 = _i16_tone(1.0, seed=12)
        resp = call(app, "POST", "/v1/ingest/audio/0/43/stream",
                    i16.tobytes() + b"\x00",
                    query="sample_rate=8000&encoding=s16")
        assert resp.status == 400

    def test_validation(self, tmp_path):
        app, _ = make_app(tmp_path)
        i16 = _i16_tone(0.5, seed=6)
        # bad encoding value
        assert call(app, "POST", "/v1/ingest/audio/0/3", i16.tobytes(),
                    query="sample_rate=8000&encoding=s24").status == 400
        # odd byte length under s16
        assert call(app, "POST", "/v1/ingest/audio/0/3",
                    i16.tobytes() + b"\x00",
                    query="sample_rate=8000&encoding=s16").status == 400
        # batch: misaligned s16 clip (odd length) rejected, and an
        # f32-aligned-but-odd-for-s16 length of 6 is ACCEPTED under s16
        bad = struct.pack("<QI", 1, 5) + b"\x00" * 5
        assert call(app, "POST", "/v1/ingest/audio/batch/0", bad,
                    query=("sample_rate=8000&algorithm=haitsma"
                           "&encoding=s16")).status == 400
        ok6 = struct.pack("<QI", 1, 6) + b"\x00" * 6
        assert call(app, "POST", "/v1/ingest/audio/batch/0", ok6,
                    query=("sample_rate=8000&algorithm=haitsma"
                           "&encoding=s16")).status == 201
        # bad batch encoding value
        good = _frames([(1, i16)], "s16")
        assert call(app, "POST", "/v1/ingest/audio/batch/0", good,
                    query=("sample_rate=8000&algorithm=wang"
                           "&encoding=pcm")).status == 400


class TestSdkPayload:
    def test_int16_array(self):
        from ucfp._common import audio_payload

        i16 = _i16_tone(seed=7)
        pcm, sr = audio_payload(i16, 8000, "s16")
        assert pcm == i16.tobytes()
        assert sr == 8000

    def test_float_refused(self):
        from ucfp._common import audio_payload

        with pytest.raises(ValueError, match="quantize"):
            audio_payload(np.zeros(16, np.float32), 8000, "s16")

    def test_wav_16bit_mono_passthrough(self):
        from ucfp._common import audio_payload

        i16 = _i16_tone(seed=8)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(i16.tobytes())
        pcm, sr = audio_payload(buf.getvalue(), None, "s16")
        assert pcm == i16.tobytes()
        assert sr == 8000

    def test_wav_stereo_refused_under_s16(self):
        from ucfp._common import audio_payload

        i16 = _i16_tone(0.5, seed=9)
        stereo = np.repeat(i16, 2)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(stereo.tobytes())
        with pytest.raises(ValueError, match="mono"):
            audio_payload(buf.getvalue(), None, "s16")

    def test_raw_bytes_passthrough(self):
        from ucfp._common import audio_payload

        raw = _i16_tone(0.5, seed=10).tobytes()
        pcm, sr = audio_payload(raw, 8000, "s16")
        assert pcm == raw
        assert sr == 8000
