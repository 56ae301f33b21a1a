"""Property-fuzz the bulk-ingest decoders: arbitrary bytes must never
crash the WAV decoder or the NDJSON record parser — they either produce
a valid result or raise the narrow, caught error types (the spool
contract: one bad input can never wedge a drain)."""

import io
import json
import wave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ucfp_tpu.core import ModalityError
from ucfp_tpu.modality.audio import wav_to_f32
from ucfp_tpu.ingest.filesource import _record_from_row


class TestWavFuzz:
    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=2048))
    def test_arbitrary_bytes_never_crash(self, data):
        # wave.Error / EOFError for junk, ModalityError for unsupported
        # widths — anything else is a bug
        try:
            pcm, sr = wav_to_f32(data)
        except (wave.Error, EOFError, ModalityError):
            return
        assert sr > 0 and len(pcm) % 4 == 0

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 2).map(lambda w: w * 2 // 2),  # widths 1..2
        st.integers(1, 2),
        st.integers(1, 500),
        st.integers(1000, 96000),
    )
    def test_wellformed_roundtrip(self, width, ch, frames, rate):
        rng = np.random.default_rng(frames)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(width)
            w.setframerate(rate)
            n = frames * ch
            data = (
                rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                if width == 1
                else rng.integers(-32768, 32768, n, dtype="<i2").tobytes()
            )
            w.writeframes(data)
        pcm, sr = wav_to_f32(buf.getvalue())
        assert sr == rate
        y = np.frombuffer(pcm, "<f4")
        assert len(y) == frames
        assert np.all(np.isfinite(y)) and float(np.abs(y).max()) <= 1.01


_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-(10**20), 10**20),
    st.floats(allow_nan=False), st.text(max_size=20),
)


class TestNdjsonRowFuzz:
    @settings(max_examples=150, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(
                ["tenant_id", "record_id", "modality", "algorithm",
                 "fingerprint", "embedding", "metadata", "config_hash",
                 "format_version", "text", "model_id", "extra"]
            ),
            st.one_of(
                _json_scalars,
                st.lists(_json_scalars, max_size=8),
            ),
            max_size=8,
        )
    )
    def test_arbitrary_rows_never_crash(self, row):
        # the loader catches exactly (ValueError, KeyError, TypeError);
        # any other exception type would crash the drain loop
        try:
            rec = _record_from_row(row)
        except (ValueError, KeyError, TypeError):
            return
        assert rec.tenant_id >= 0 and rec.record_id >= 0
        assert isinstance(rec.fingerprint, bytes)
        assert len(rec.metadata) < 10_000  # no giant zero-allocations

    def test_row_is_json_roundtrip_stable(self):
        row = {"tenant_id": 1, "record_id": 2, "modality": "text",
               "algorithm": "a", "fingerprint": "0aff", "config_hash": 3}
        rec = _record_from_row(json.loads(json.dumps(row)))
        assert rec.fingerprint == bytes.fromhex("0aff")


class TestRowCacheTagInvariant:
    """The filter tags must mirror the row motions (swap-with-last)
    exactly — a drifted tag would filter the WRONG record."""

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.tuples(st.booleans(), st.integers(0, 30), st.integers(0, 3)),
        min_size=1, max_size=120,
    ))
    def test_tags_track_rows_through_random_churn(self, ops):
        from ucfp_tpu.index.embedded import _RowCache

        cache = _RowCache(width=4, dtype=np.float32, track_tags=True)
        expect = {}  # rid -> (vec0, tag)
        for is_upsert, rid, tagv in ops:
            if is_upsert:
                vec = np.full(4, float(rid * 31 + tagv), np.float32)
                cache.upsert(rid, vec, tag=(tagv, tagv + 100))
                expect[rid] = (vec[0], tagv)
            else:
                cache.remove(rid)
                expect.pop(rid, None)
        assert cache.n == len(expect)
        for rid, (v0, tagv) in expect.items():
            row = cache.rows[rid]
            assert cache.data[row][0] == v0
            assert tuple(cache.tags[row]) == (tagv, tagv + 100)


class TestWalCodecRoundTrip:
    """The binary WAL codec is the storage wire format (CLAUDE.md
    invariant: both engines stay replay-compatible) — every encodable
    event must decode back identically."""

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(0, 2**32 - 1),
        st.integers(0, 2**63 - 1),
        st.sampled_from(["text", "image", "audio"]),
        st.text(max_size=24).filter(lambda s: s),
        st.binary(max_size=64),
        st.one_of(st.none(), st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32), max_size=8)),
        st.one_of(st.none(), st.text(max_size=16).filter(lambda s: s)),
        st.binary(max_size=32),
        st.one_of(st.none(), st.text(max_size=48)),
    )
    def test_upsert_roundtrip(self, tid, rid, mod, alg, fp, emb, model,
                              meta, text):
        from ucfp_tpu.index import wal as walmod

        ev = {"op": "upsert", "tenant_id": tid, "record_id": rid,
              "modality": mod, "algorithm": alg, "fingerprint": fp,
              "format_version": 1, "config_hash": rid % (2**63),
              "embedding": emb, "model_id": model, "metadata": meta,
              "text": text}
        back = walmod.decode_event(walmod.encode_event(ev))
        for k in ("op", "tenant_id", "record_id", "modality", "algorithm",
                  "fingerprint", "model_id", "metadata", "text"):
            assert back[k] == ev[k], k
        if emb is None:
            assert back["embedding"] is None
        else:
            assert back["embedding"] == pytest.approx(emb, abs=1e-3)
        # and the JSON engine round-trips the same event
        j = walmod.JsonWal._from_json(
            json.loads(json.dumps(walmod.JsonWal._to_json(ev)))
        )
        assert j["fingerprint"] == fp and j["metadata"] == meta
