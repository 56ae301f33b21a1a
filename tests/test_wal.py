"""WAL engine tests: binary codec round-trip, native C++ log, torn-tail
tolerance, cross-engine sniffing, compaction."""

import os

import pytest

from ucfp_tpu.index import wal as walmod
from ucfp_tpu.native import load_walstore


def upsert_ev(rid=1, emb=None, text=None):
    return {
        "op": "upsert",
        "tenant_id": 7,
        "record_id": rid,
        "modality": "image",
        "format_version": 1,
        "config_hash": 123456789,
        "algorithm": "imgfprint-phash-v1",
        "fingerprint": bytes(range(8)),
        "embedding": emb,
        "model_id": "m1" if emb else None,
        "metadata": b"\x01\x02",
        "text": text,
    }


class TestCodec:
    def test_upsert_roundtrip(self):
        ev = upsert_ev(emb=[0.5, -1.25], text="héllo")
        back = walmod.decode_event(walmod.encode_event(ev))
        assert back == ev

    def test_upsert_minimal(self):
        ev = upsert_ev()
        back = walmod.decode_event(walmod.encode_event(ev))
        assert back["embedding"] is None and back["text"] is None
        assert back["fingerprint"] == bytes(range(8))

    def test_delete_roundtrip(self):
        ev = {"op": "delete", "tenant_id": 3, "record_ids": [1, 2, 2**63]}
        assert walmod.decode_event(walmod.encode_event(ev)) == ev

    def test_fast_path_bytes_identical_to_generic(self):
        """The single-struct.pack fast path for fingerprint-only events
        must emit byte-for-byte what the generic builder emits — the WAL
        frame layout is the storage wire format both engines replay."""
        import struct

        ev = upsert_ev()  # no embedding/model/text: takes the fast path
        got = walmod.encode_event(ev)
        # reference encoding: the generic field-by-field build
        alg = ev["algorithm"].encode()
        fp = ev["fingerprint"]
        meta = ev["metadata"]
        ref = bytearray()
        ref += struct.pack("<BIQBIQB", walmod.OP_UPSERT, ev["tenant_id"],
                           ev["record_id"], 1, ev["format_version"],
                           ev["config_hash"], 0)
        ref += struct.pack("<H", len(alg)) + alg
        ref += struct.pack("<I", len(fp)) + fp
        ref += struct.pack("<I", len(meta)) + meta
        assert got == bytes(ref)
        assert walmod.decode_event(got) == ev

    def test_fast_path_accepts_bytearray_fingerprint(self):
        ev = upsert_ev()
        ev["fingerprint"] = bytearray(range(8))
        back = walmod.decode_event(walmod.encode_event(ev))
        assert back["fingerprint"] == bytes(range(8))

    def test_batch_encoder_identical_to_per_event(self):
        """encode_events_batch == [encode_event(e)] byte-for-byte on
        every shape: the vectorized fast path (uniform fingerprint-only
        runs, the batch-ingest shape) and every fallback trigger."""
        import random

        rng = random.Random(0xBA7C4)
        uniform = [
            dict(upsert_ev(rid), fingerprint=bytes(
                rng.randrange(256) for _ in range(8)))
            for rid in range(1, 64)
        ]
        assert walmod.encode_events_batch(uniform) == [
            walmod.encode_event(e) for e in uniform
        ]
        # every fallback trigger, mixed into otherwise-uniform batches
        variants = [
            dict(upsert_ev(99), embedding=[1.0], model_id="m1"),
            dict(upsert_ev(99), text="t"),
            dict(upsert_ev(99), metadata=b"\x07"),
            dict(upsert_ev(99), algorithm="other-alg"),
            dict(upsert_ev(99), config_hash=42),
            dict(upsert_ev(99), format_version=2),
            dict(upsert_ev(99), tenant_id=8),
            dict(upsert_ev(99), modality="audio"),
            dict(upsert_ev(99), fingerprint=bytes(16)),
            {"op": "delete", "tenant_id": 7, "record_ids": [1]},
        ]
        for v in variants:
            batch = uniform[:5] + [v] + uniform[5:10]
            assert walmod.encode_events_batch(batch) == [
                walmod.encode_event(e) for e in batch
            ], f"fallback mismatch for variant {v}"
        # sub-threshold batches, empty + bytearray fingerprints,
        # non-ASCII algorithm (encoded length != len(str))
        small = uniform[:3]
        assert walmod.encode_events_batch(small) == [
            walmod.encode_event(e) for e in small
        ]
        oddball = [
            dict(upsert_ev(rid), algorithm="ålg-v1",
                 fingerprint=bytearray(b"") if rid % 2 else b"")
            for rid in range(1, 12)
        ]
        assert walmod.encode_events_batch(oddball) == [
            walmod.encode_event(e) for e in oddball
        ]

    def test_batch_encoder_never_truncates_bad_record_ids(self):
        """A float/negative/huge record_id must behave exactly like the
        per-event encoder (raise), never silently truncate into a
        durably-logged wrong id (np.array(..., '<u8') would floor 3.7
        to 3 — memory and replay would diverge forever)."""
        base = [upsert_ev(r) for r in range(1, 9)]
        for bad in (3.7, -1, 2**64, True):
            batch = base[:4] + [dict(upsert_ev(99), record_id=bad)] + base[4:]
            try:
                ref = [walmod.encode_event(e) for e in batch]
                ref_exc = None
            except Exception as e:
                ref, ref_exc = None, type(e)
            try:
                got = walmod.encode_events_batch(batch)
                got_exc = None
            except Exception as e:
                got, got_exc = None, type(e)
            assert got_exc == ref_exc, (bad, got_exc, ref_exc)
            if ref is not None:
                assert got == ref, bad

    def test_batch_encoder_random_fuzz(self):
        """Random event soups: batch output equals per-event output
        regardless of composition."""
        import random

        rng = random.Random(1234)
        algs = ["a", "imgfprint-phash-v1", "x" * 40]
        for _ in range(60):
            batch = []
            for i in range(rng.randrange(1, 24)):
                ev = upsert_ev(rng.randrange(2**48))
                ev["fingerprint"] = bytes(
                    rng.randrange(256)
                    for _ in range(rng.choice([0, 8, 8, 8, 64]))
                )
                ev["algorithm"] = rng.choice(algs)
                if rng.random() < 0.15:
                    ev["embedding"] = [0.5] * 4
                    ev["model_id"] = "m"
                if rng.random() < 0.1:
                    ev["text"] = "tt"
                if rng.random() < 0.1:
                    ev["metadata"] = bytes(rng.randrange(256) for _ in range(3))
                if rng.random() < 0.05:
                    ev = {"op": "delete", "tenant_id": 7,
                          "record_ids": [rng.randrange(2**32)]}
                batch.append(ev)
            assert walmod.encode_events_batch(batch) == [
                walmod.encode_event(e) for e in batch
            ]


class TestNativeWal:
    def test_toolchain_available(self):
        assert load_walstore() is not None, "g++ toolchain should be present"

    def test_append_replay(self, tmp_path):
        p = str(tmp_path / "n.wal")
        w = walmod.open_wal(p, "native")
        assert isinstance(w, walmod.NativeWal)
        w.append_events([upsert_ev(1), upsert_ev(2, emb=[1.0])])
        w.append_events([{"op": "delete", "tenant_id": 7, "record_ids": [1]}])
        w.close()
        w2 = walmod.open_wal(p, "native")
        evs = list(w2.replay())
        assert [e["op"] for e in evs] == ["upsert", "upsert", "delete"]
        assert evs[1]["embedding"] == [1.0]
        w2.close()

    def test_append_many_file_identical_to_per_blob(self, tmp_path):
        """The one-ctypes-call batch append (ucfp_wal_append_many) must
        produce a byte-identical log to per-blob ucfp_wal_append calls —
        same framing, same CRCs, same replay."""
        blobs = [walmod.encode_event(upsert_ev(r)) for r in range(1, 40)]
        pa, pb = str(tmp_path / "a.wal"), str(tmp_path / "b.wal")
        wa = walmod.open_wal(pa, "native")
        for b in blobs:  # single-blob calls take the per-blob path
            wa.append_encoded_nosync([b])
        wa.flush()
        wa.close()
        wb = walmod.open_wal(pb, "native")
        wb.append_encoded_nosync(blobs)  # multi-blob: one append_many
        wb.flush()
        wb.close()
        with open(pa, "rb") as f:
            da = f.read()
        with open(pb, "rb") as f:
            db = f.read()
        assert da == db and len(da) > 0
        w2 = walmod.open_wal(pb, "native")
        assert [e["record_id"] for e in w2.replay()] == list(range(1, 40))
        w2.close()

    def test_torn_tail_dropped(self, tmp_path):
        p = str(tmp_path / "t.wal")
        w = walmod.open_wal(p, "native")
        w.append_events([upsert_ev(1)])
        w.close()
        with open(p, "ab") as f:
            f.write(b"PFCU\xff\xff")  # garbage partial frame
        w2 = walmod.open_wal(p, "native")
        evs = list(w2.replay())
        assert len(evs) == 1 and evs[0]["record_id"] == 1
        w2.close()

    def test_rewrite_compacts(self, tmp_path):
        p = str(tmp_path / "c.wal")
        w = walmod.open_wal(p, "native")
        w.append_events([upsert_ev(i) for i in range(10)])
        size_before = os.path.getsize(p)
        w.rewrite([upsert_ev(99)])
        w.close()
        assert os.path.getsize(p) < size_before
        w2 = walmod.open_wal(p, "native")
        evs = list(w2.replay())
        assert [e["record_id"] for e in evs] == [99]
        w2.close()

    def test_append_after_rewrite(self, tmp_path):
        p = str(tmp_path / "a.wal")
        w = walmod.open_wal(p, "native")
        w.append_events([upsert_ev(1)])
        w.rewrite([upsert_ev(2)])
        w.append_events([upsert_ev(3)])
        w.close()
        w2 = walmod.open_wal(p, "native")
        assert [e["record_id"] for e in w2.replay()] == [2, 3]
        w2.close()


class TestWalFirstSemantics:
    def test_failed_wal_append_applies_nothing(self, tmp_path):
        """WAL-first at the append stage: if buffering the event fails
        (encode error, closed log), no in-memory mutation happens —
        queries never serve phantom records."""
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        b = EmbeddedBackend(str(tmp_path / "db"))
        asyncio.run(b.upsert([Record(0, 1, Modality.TEXT, "a", b"\x01",
                                     embedding=[1.0, 0.0], text="kept")]))

        class FailingWal:
            def append_buffered(self, events):
                raise OSError("disk full")

            def append_events(self, events):
                raise OSError("disk full")

            async def wait_durable(self, seq):
                pass

            def flush(self):
                pass

            def close(self):
                pass

        b._wal = FailingWal()
        with pytest.raises(OSError):
            asyncio.run(b.upsert([Record(0, 2, Modality.TEXT, "a", b"\x02",
                                         embedding=[0.0, 1.0], text="phantom")]))
        # record 2 must be invisible everywhere
        assert asyncio.run(b.bm25(0, ["phantom"], 5)) == []
        hits = asyncio.run(b.knn(0, [0.0, 1.0], 5))
        assert [h.record_id for h in hits] == [1]
        with pytest.raises(Exception):
            asyncio.run(b.get_record_metadata(0, 2))
        # deletes behave the same
        with pytest.raises(OSError):
            asyncio.run(b.delete(0, [1]))
        assert [h.record_id for h in asyncio.run(b.bm25(0, ["kept"], 5))] == [1]

    def test_fsync_failure_surfaces_to_caller(self, tmp_path):
        """A failed group fsync raises on the awaiting caller — the write
        is never ack'd. (True durability loss needs a crash; in-process
        the OS page cache keeps the bytes, so only the error contract is
        testable here.)"""
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        b = EmbeddedBackend(str(tmp_path / "db"))
        inner = b._wal._inner

        orig_flush = inner.flush
        inner.flush = lambda: (_ for _ in ()).throw(OSError("fsync EIO"))
        try:
            with pytest.raises(OSError):
                asyncio.run(b.upsert([
                    Record(0, 9, Modality.TEXT, "a", b"\x09", text="lost")
                ]))
            # a follow-up durability wait also surfaces the failure
            with pytest.raises(OSError):
                asyncio.run(b.flush())
        finally:
            inner.flush = orig_flush
        # once fsync recovers, the restored buffer drains and the log heals
        asyncio.run(b.flush())
        b.close()


class TestGroupCommit:
    def _wal(self, tmp_path, engine="json"):
        inner = (walmod.JsonWal(str(tmp_path / "g.wal")) if engine == "json"
                 else walmod.open_wal(str(tmp_path / "g.wal"), engine))
        return walmod.GroupCommitWal(inner)

    def _ev(self, rid):
        return {"op": "upsert", "tenant_id": 0, "record_id": rid,
                "modality": "text", "algorithm": "a", "config_hash": 0,
                "format_version": 1, "fingerprint": bytes([rid % 251]),
                "embedding": None, "model_id": None, "metadata": b"",
                "text": None}

    @pytest.mark.parametrize("engine", ["json", "native"])
    def test_concurrent_appenders_all_durable(self, tmp_path, engine):
        import threading

        w = self._wal(tmp_path, engine)
        n_threads, per = 8, 25
        errs = []

        def writer(base):
            try:
                for i in range(per):
                    w.append_events([self._ev(base + i)])
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=writer, args=(t * 1000,))
              for t in range(n_threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        w.close()
        w2 = walmod.open_wal(str(tmp_path / "g.wal"), "auto")
        rids = sorted(ev["record_id"] for ev in w2.replay())
        assert rids == sorted(t * 1000 + i for t in range(n_threads)
                              for i in range(per))
        w2.close()

    def test_async_wait_durable(self, tmp_path):
        import asyncio

        w = self._wal(tmp_path)

        async def go():
            seqs = [w.append_buffered([self._ev(i)]) for i in range(10)]
            await asyncio.gather(*(w.wait_durable(s) for s in seqs))

        asyncio.run(go())
        w.close()
        w2 = walmod.JsonWal(str(tmp_path / "g.wal"))
        assert len(list(w2.replay())) == 10
        w2.close()

    def test_flush_covers_buffered(self, tmp_path):
        w = self._wal(tmp_path)
        w.append_buffered([self._ev(1), self._ev(2)])
        w.flush()
        # durable now even though nobody waited on the original ticket
        w2 = walmod.JsonWal(str(tmp_path / "g.wal"))
        assert [e["record_id"] for e in w2.replay()] == [1, 2]
        w2.close()
        w.close()

    def test_rewrite_satisfies_buffered_waiters(self, tmp_path):
        w = self._wal(tmp_path)
        w.append_events([self._ev(1)])
        seq = w.append_buffered([self._ev(2)])
        # rewrite with a snapshot that already contains rid 2's effect
        w.rewrite([self._ev(1), self._ev(2)])
        w.sync_until(seq)  # must not hang: rewrite committed it
        w.close()
        w2 = walmod.JsonWal(str(tmp_path / "g.wal"))
        assert sorted(e["record_id"] for e in w2.replay()) == [1, 2]
        w2.close()

    def test_encode_failure_fails_fast(self, tmp_path):
        w = self._wal(tmp_path)
        bad = self._ev(1)
        bad["fingerprint"] = None  # not bytes: encode must fail
        with pytest.raises(Exception):
            w.append_buffered([bad])
        # the log stays healthy for later appends
        w.append_events([self._ev(5)])
        w.close()

    def test_wait_durable_after_close_raises(self, tmp_path):
        """A waiter arriving after close() must fail fast, never park on
        a dead writer thread (advisor r3 finding)."""
        import asyncio

        w = self._wal(tmp_path)
        seq = w.append_buffered([self._ev(1)])
        w.sync_until(seq)
        w.close()
        with pytest.raises(OSError):
            # ticket beyond anything committed, registered post-close
            asyncio.run(w.wait_durable(seq + 10))

    def test_close_fails_parked_waiters(self, tmp_path):
        """close() with a failing fsync must reject (not strand) waiters
        whose events never became durable."""
        import asyncio
        import threading

        w = self._wal(tmp_path)
        w.flush()
        w._inner.flush = lambda: (_ for _ in ()).throw(OSError("EIO"))

        async def wait(seq):
            await w.wait_durable(seq)

        seq = w.append_buffered([self._ev(2)])
        result = {}

        def waiter():
            try:
                asyncio.run(wait(seq))
                result["r"] = "ok"
            except BaseException as e:  # noqa: BLE001
                result["r"] = e

        t = threading.Thread(target=waiter)
        t.start()
        import time

        time.sleep(0.15)  # let at least one fsync round fail
        w.close()
        t.join(timeout=5.0)
        assert not t.is_alive(), "waiter stranded after close"
        assert isinstance(result.get("r"), OSError)


class TestDurabilityGate:
    def test_degraded_wal_refuses_new_ingest(self, tmp_path):
        """While the WAL cannot fsync, NEW writes are refused with 503
        (IngestError) and never applied to memory — bounding the
        served-but-not-durable divergence window to the writes already
        in flight at first failure (advisor r3 medium finding)."""
        import asyncio
        import time

        from ucfp_tpu.core import IngestError, Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        b = EmbeddedBackend(str(tmp_path / "db"))
        inner = b._wal._inner
        orig_flush = inner.flush
        inner.flush = lambda: (_ for _ in ()).throw(OSError("fsync ENOSPC"))
        try:
            # the in-flight write at failure time: applied, lost-ack (500)
            with pytest.raises(OSError):
                asyncio.run(b.upsert([
                    Record(0, 1, Modality.TEXT, "a", b"\x01", text="inflight")
                ]))
            # wait until the failed round marks the WAL degraded
            deadline = time.monotonic() + 5.0
            while not b._wal.degraded and time.monotonic() < deadline:
                time.sleep(0.01)
            assert b._wal.degraded
            # a NEW write is refused up front and NOT applied to memory
            with pytest.raises(IngestError):
                asyncio.run(b.upsert([
                    Record(0, 2, Modality.TEXT, "a", b"\x02", text="refused")
                ]))
            assert (0, 2) not in b._records
            with pytest.raises(IngestError):
                asyncio.run(b.delete(0, [1]))
            # healthz's flush-ping fails too, so orchestrators see it
            with pytest.raises(OSError):
                asyncio.run(b.flush())
        finally:
            inner.flush = orig_flush
        # once fsync recovers the retry round drains the buffer, the
        # gate lifts, and ingest resumes
        asyncio.run(b.flush())
        assert not b._wal.degraded
        asyncio.run(b.upsert([
            Record(0, 3, Modality.TEXT, "a", b"\x03", text="recovered")
        ]))
        assert (0, 3) in b._records
        b.close()


class TestBackendIntegration:
    def test_native_store_survives_restart(self, tmp_path):
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        d = str(tmp_path / "db")
        b = EmbeddedBackend(d, wal_engine="native")
        asyncio.run(
            b.upsert(
                [
                    Record(0, 1, Modality.TEXT, "a", b"\x01",
                           embedding=[1.0, 0.0], text="hello world"),
                ]
            )
        )
        b.close()
        # the log is binary, not JSON
        with open(os.path.join(d, "ucfp.wal"), "rb") as f:
            assert f.read(4) == b"PFCU"
        b2 = EmbeddedBackend(d)  # auto-sniffs native format
        hits = asyncio.run(b2.knn(0, [1.0, 0.0], 5))
        assert [h.record_id for h in hits] == [1]
        assert [h.record_id for h in asyncio.run(b2.bm25(0, ["hello"], 5))] == [1]
        b2.close()

    def test_json_store_still_reopens(self, tmp_path):
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        d = str(tmp_path / "db")
        b = EmbeddedBackend(d, wal_engine="json")
        asyncio.run(b.upsert([Record(0, 5, Modality.TEXT, "a", b"\x01", text="x y")]))
        b.close()
        with open(os.path.join(d, "ucfp.wal"), "rb") as f:
            assert f.read(1) == b"{"
        b2 = EmbeddedBackend(d)
        assert [h.record_id for h in asyncio.run(b2.bm25(0, ["x"], 5))] == [5]
        b2.close()


class TestTornTailTruncation:
    def test_appends_after_torn_tail_survive_restart(self, tmp_path):
        """A crash-torn tail must be TRUNCATED at open: with O_APPEND,
        frames written after garbage would be permanently invisible to
        replay (it stops at the first bad frame)."""
        from ucfp_tpu.native import load_walstore
        from ucfp_tpu.index.wal import NativeWal

        if load_walstore() is None:
            pytest.skip("no toolchain")
        path = str(tmp_path / "w.wal")
        ev1 = {"op": "delete", "tenant_id": 1, "record_ids": [1]}
        ev2 = {"op": "delete", "tenant_id": 2, "record_ids": [2]}
        w = NativeWal(path, load_walstore())
        w.append_events([ev1])
        w.close()
        # simulate a crash mid-commit: partial frame at the tail
        with open(path, "ab") as f:
            f.write(b"PFCU\x10\x00")  # magic + truncated header
        # restart 1: open truncates the torn tail, then appends
        w = NativeWal(path, load_walstore())
        w.append_events([ev2])
        w.close()
        # restart 2: BOTH events must replay (pre-fix: only ev1)
        w = NativeWal(path, load_walstore())
        events = list(w.replay())
        w.close()
        assert ev1 in events and ev2 in events
        assert len(events) == 2


class TestJsonWalTornTail:
    def test_appends_after_torn_tail_survive_restart(self, tmp_path):
        """Same blackhole as the native engine: the JSON log must
        truncate a crash-torn tail at open, or post-crash appends land
        after (or ONTO) the partial line and vanish from replay."""
        from ucfp_tpu.index.wal import JsonWal

        path = str(tmp_path / "w.wal")
        ev1 = {"op": "delete", "tenant_id": 1, "record_ids": [1]}
        ev2 = {"op": "delete", "tenant_id": 2, "record_ids": [2]}
        w = JsonWal(path)
        w.append_events([ev1])
        w.close()
        with open(path, "ab") as f:
            f.write(b'{"op":"dele')  # torn line, no newline
        w = JsonWal(path)
        w.append_events([ev2])
        w.close()
        w = JsonWal(path)
        events = list(w.replay())
        w.close()
        assert ev1 in events and ev2 in events and len(events) == 2


class TestJsonWalPartialWriteRollback:
    def test_partial_write_rolled_back(self, tmp_path):
        """A mid-batch write failure must truncate back to the pre-write
        offset — otherwise the group-commit retry appends after a torn
        fragment and replay silently drops every later event."""
        w = walmod.JsonWal(str(tmp_path / "p.wal"))
        w.append_events([{"op": "delete", "tenant_id": 0, "record_ids": [1]}])

        real_f = w._f

        class PartialFile:
            def __getattr__(self, name):
                return getattr(real_f, name)

            def write(self, data):
                real_f.write(data[: len(data) // 2])  # torn mid-line
                raise OSError("ENOSPC")

        w._f = PartialFile()
        with pytest.raises(OSError):
            w.append_encoded_nosync([w.encode(
                {"op": "delete", "tenant_id": 0, "record_ids": [2]}
            )])
        w._f = real_f
        # retry after recovery: the log must stay parseable end to end
        w.append_events([{"op": "delete", "tenant_id": 0, "record_ids": [3]}])
        w.close()
        w2 = walmod.JsonWal(str(tmp_path / "p.wal"))
        rids = [ev["record_ids"][0] for ev in w2.replay()]
        assert rids == [1, 3]
        w2.close()

    def test_rewrite_failure_reattaches_handle(self, tmp_path, monkeypatch):
        """A failed rewrite must leave a LIVE append handle on the
        original log (a closed handle fails every retry round forever)."""
        w = walmod.JsonWal(str(tmp_path / "r.wal"))
        w.append_events([{"op": "delete", "tenant_id": 0, "record_ids": [1]}])

        real_replace = os.replace

        def boom(src, dst):
            raise OSError("EIO")

        monkeypatch.setattr(os, "replace", boom)
        with pytest.raises(OSError):
            w.rewrite([{"op": "delete", "tenant_id": 0, "record_ids": [9]}])
        monkeypatch.setattr(os, "replace", real_replace)
        # the handle must be usable again
        w.append_events([{"op": "delete", "tenant_id": 0, "record_ids": [2]}])
        w.close()
        w2 = walmod.JsonWal(str(tmp_path / "r.wal"))
        rids = [ev["record_ids"][0] for ev in w2.replay()]
        assert rids == [1, 2]
        w2.close()


class TestFpRunEncoder:
    """encode_fp_run / append_buffered_run: the array-direct WAL path
    for uniform fingerprint-only runs must be byte-identical to the
    per-event dict protocol (the storage wire format) on every engine."""

    def _run_args(self, rng, n=40, flen=12, alg="imgfprint-phash-v1"):
        rids = [rng.randrange(2**64) for _ in range(n)]
        fps = [bytes(rng.randrange(256) for _ in range(flen))
               for _ in range(n)]
        return rids, fps, alg

    def test_fp_run_identical_to_per_event_fuzz(self):
        import random

        rng = random.Random(0xF9B)
        for flen in (0, 4, 8, 64, 536):
            for alg in ("a", "imgfprint-multi-v1", "ålg-v1"):
                rids, fps, alg = self._run_args(rng, 17, flen, alg)
                got = walmod.encode_fp_run(
                    7, "image", rids, fps, algorithm=alg,
                    config_hash=123456789, format_version=1,
                    metadata=b"\x01\x02")
                want = [walmod.encode_event({
                    "op": "upsert", "tenant_id": 7, "record_id": rid,
                    "modality": "image", "format_version": 1,
                    "config_hash": 123456789, "algorithm": alg,
                    "fingerprint": fp, "metadata": b"\x01\x02",
                    "embedding": None, "model_id": None, "text": None,
                }) for rid, fp in zip(rids, fps)]
                assert got == want, (flen, alg)

    def test_fp_run_rejects_bad_inputs(self):
        ok = walmod.encode_fp_run(0, "image", [1], [b"\x00" * 4],
                                  algorithm="a")
        assert len(ok) == 1
        with pytest.raises(ValueError):
            walmod.encode_fp_run(0, "image", [1.5], [b"\x00" * 4],
                                 algorithm="a")  # float rid would truncate
        with pytest.raises(ValueError):
            walmod.encode_fp_run(0, "image", [2**64], [b"\x00" * 4],
                                 algorithm="a")
        with pytest.raises(ValueError):
            walmod.encode_fp_run(0, "image", [1, 2],
                                 [b"\x00" * 4, b"\x00" * 8],
                                 algorithm="a")  # non-uniform width
        with pytest.raises(ValueError):
            walmod.encode_fp_run(0, "image", [1], ["notbytes"],
                                 algorithm="a")
        assert walmod.encode_fp_run(0, "image", [], [], algorithm="a") == []

    @pytest.mark.parametrize("engine", ["json", "native"])
    def test_append_buffered_run_replay_identity(self, tmp_path, engine):
        """A run appended via append_buffered_run must replay exactly
        like the same records appended as per-record dicts — on the
        native engine (array-direct encode) AND the JSON engine (dict
        fallback)."""
        import random

        rng = random.Random(0x5EED)
        rids, fps, alg = self._run_args(rng, 25, 8)

        def mk(path):
            inner = (walmod.JsonWal(path) if engine == "json"
                     else walmod.open_wal(path, engine))
            return walmod.GroupCommitWal(inner)

        wa = mk(str(tmp_path / "run.wal"))
        t = wa.append_buffered_run(3, "image", rids, fps, algorithm=alg,
                                   config_hash=5, format_version=1)
        wa.sync_until(t)
        wa.close()

        wb = mk(str(tmp_path / "dict.wal"))
        t = wb.append_buffered([{
            "op": "upsert", "tenant_id": 3, "record_id": rid,
            "modality": "image", "format_version": 1, "config_hash": 5,
            "algorithm": alg, "fingerprint": fp, "metadata": b"",
            "embedding": None, "model_id": None, "text": None,
        } for rid, fp in zip(rids, fps)])
        wb.sync_until(t)
        wb.close()

        ia = (walmod.JsonWal(str(tmp_path / "run.wal")) if engine == "json"
              else walmod.open_wal(str(tmp_path / "run.wal"), engine))
        ib = (walmod.JsonWal(str(tmp_path / "dict.wal")) if engine == "json"
              else walmod.open_wal(str(tmp_path / "dict.wal"), engine))
        ra, rb = list(ia.replay()), list(ib.replay())
        ia.close(), ib.close()
        assert ra == rb
        assert [ev["record_id"] for ev in ra] == rids
        assert [bytes(ev["fingerprint"]) for ev in ra] == fps


class TestEmbRunEncoder:
    """encode_emb_run / encode_emb_run_block / append_buffered_emb_run:
    the array-direct WAL path for uniform embedding runs must be
    byte-identical to the per-event dict protocol on every engine."""

    def _run_args(self, rng, n=20, flen=8, d=12):
        import numpy as np

        rids = [rng.randrange(2**64) for _ in range(n)]
        fps = [bytes(rng.randrange(256) for _ in range(flen))
               for _ in range(n)]
        mat = np.array(
            [[rng.uniform(-10, 10) for _ in range(d)] for _ in range(n)],
            np.float32,
        )
        return rids, fps, mat

    def _events(self, rids, fps, mat, *, alg, model, meta=b"\x01",
                tenant=7, cfg=42):
        return [{
            "op": "upsert", "tenant_id": tenant, "record_id": rid,
            "modality": "image", "format_version": 1,
            "config_hash": cfg, "algorithm": alg,
            "fingerprint": fp, "metadata": meta,
            "embedding": mat[i].tolist(), "model_id": model,
            "text": None,
        } for i, (rid, fp) in enumerate(zip(rids, fps))]

    def test_emb_run_identical_to_per_event_fuzz(self):
        import random

        rng = random.Random(0xE3B)
        for d in (1, 4, 384, 768):
            for model in (None, "model-x"):
                for flen in (0, 8, 4 * d):
                    rids, fps, mat = self._run_args(rng, 11, flen, d)
                    got = walmod.encode_emb_run(
                        7, "image", rids, fps, mat, algorithm="alg-v1",
                        model_id=model, config_hash=42,
                        format_version=1, metadata=b"\x01")
                    want = [walmod.encode_event(e) for e in self._events(
                        rids, fps, mat, alg="alg-v1", model=model)]
                    assert got == want, (d, model, flen)
                    blk, fl, cnt = walmod.encode_emb_run_block(
                        7, "image", rids, fps, list(mat),
                        algorithm="alg-v1", model_id=model,
                        config_hash=42, format_version=1,
                        metadata=b"\x01")
                    assert blk == b"".join(want) and cnt == len(want)
                    assert fl == len(want[0])

    def test_batch_encoder_rounds_doubles_like_struct(self):
        """encode_events_batch's numpy f32 cast must round raw Python
        doubles exactly like struct.pack '<f' — including subnormals,
        inf/nan, and negative zero."""
        import math
        import random

        rng = random.Random(0xD0B)
        vals = [0.1, -0.0, 1e-45, 3.4e38, math.inf, -math.inf,
                math.nan, 2**-149, 1/3, 1e-310, 6.1e-5]
        events = []
        for i in range(22):
            emb = [rng.uniform(-1e38, 1e38) for _ in range(6)]
            emb[0] = vals[i % len(vals)]  # exact corner values too
            events.append({
                "op": "upsert", "tenant_id": 1, "record_id": i,
                "modality": "text", "format_version": 1,
                "config_hash": 0, "algorithm": "a",
                "fingerprint": b"\x00" * 4, "metadata": b"",
                "embedding": emb, "model_id": None, "text": None,
            })
        assert walmod.encode_events_batch(events) == [
            walmod.encode_event(e) for e in events
        ]

    def test_batch_encoder_finite_overflow_raises_like_struct(self):
        """A FINITE double that overflows f32 (1e39) raises
        OverflowError on the per-event encoder — the batch path must
        fall back and raise the same error, never silently log inf."""
        events = [{
            "op": "upsert", "tenant_id": 1, "record_id": i,
            "modality": "text", "format_version": 1,
            "config_hash": 0, "algorithm": "a",
            "fingerprint": b"\x00" * 4, "metadata": b"",
            "embedding": [1.0, 1e39 if i == 5 else 2.0],
            "model_id": None, "text": None,
        } for i in range(8)]
        with pytest.raises(OverflowError):
            walmod.encode_events_batch(events)

    def test_batch_encoder_mixed_models_fall_back(self):
        rids = list(range(8))
        events = self._events(
            rids, [b"\x00" * 8] * 8,
            __import__("numpy").ones((8, 4), "float32"),
            alg="a", model="m")
        events[3] = dict(events[3], model_id="other")
        got = walmod.encode_events_batch(events)
        assert got == [walmod.encode_event(e) for e in events]

    def test_emb_run_rejects_bad_inputs(self):
        import numpy as np

        ok = walmod.encode_emb_run(0, "image", [1, 2],
                                   [b"\x00" * 4] * 2,
                                   np.ones((2, 3), np.float32),
                                   algorithm="a")
        assert len(ok) == 2
        with pytest.raises(ValueError):
            walmod.encode_emb_run(0, "image", [1], [b"\x00" * 4],
                                  np.ones((2, 3), np.float32),
                                  algorithm="a")  # n mismatch
        with pytest.raises(ValueError):
            walmod.encode_emb_run(0, "image", [1], [b"\x00" * 4],
                                  np.ones((1, 0), np.float32),
                                  algorithm="a")  # empty dim
        with pytest.raises(ValueError):
            walmod.encode_emb_run(0, "image", [1.5], [b"\x00" * 4],
                                  np.ones((1, 3), np.float32),
                                  algorithm="a")  # float rid

    @pytest.mark.parametrize("engine", ["json", "native"])
    def test_append_buffered_emb_run_replay_identity(self, tmp_path,
                                                     engine):
        """An embedding run appended via append_buffered_emb_run must
        replay exactly like the same records appended as per-record
        dicts — native (array-direct) AND JSON (dict fallback)."""
        import random

        rng = random.Random(0x5EE2)
        rids, fps, mat = self._run_args(rng, 15, 8, 5)

        def mk(path):
            inner = (walmod.JsonWal(path) if engine == "json"
                     else walmod.open_wal(path, engine))
            return walmod.GroupCommitWal(inner)

        wa = mk(str(tmp_path / "run.wal"))
        t = wa.append_buffered_emb_run(
            3, "image", rids, fps, mat, algorithm="alg-v1",
            model_id="mm", config_hash=5, format_version=1)
        wa.sync_until(t)
        wa.close()

        wb = mk(str(tmp_path / "dict.wal"))
        t = wb.append_buffered(self._events(
            rids, fps, mat, alg="alg-v1", model="mm", meta=b"",
            tenant=3, cfg=5))
        wb.sync_until(t)
        wb.close()

        ia = (walmod.JsonWal(str(tmp_path / "run.wal")) if engine == "json"
              else walmod.open_wal(str(tmp_path / "run.wal"), engine))
        ib = (walmod.JsonWal(str(tmp_path / "dict.wal")) if engine == "json"
              else walmod.open_wal(str(tmp_path / "dict.wal"), engine))
        ra, rb = list(ia.replay()), list(ib.replay())
        ia.close(), ib.close()
        assert len(ra) == len(rb) == 15
        for a, b in zip(ra, rb):
            assert _norm_ev(a) == _norm_ev(b)
        assert [ev["record_id"] for ev in ra] == rids
        assert [list(ev["embedding"]) for ev in ra] == mat.tolist()

    def test_emb_run_groups_columnar(self):
        """A uniform embedding run through iter_frame_groups decodes as
        ONE emb_run; per-frame equality is the _assert_identity
        contract below (extended soup fuzz)."""
        import numpy as np

        rids = list(range(32))
        mat = np.arange(32 * 4, dtype=np.float32).reshape(32, 4) * 0.25
        events = self._events(rids, [b"\xab" * 8] * 32, mat,
                              alg="alg-v1", model="m2")
        frames = [walmod.encode_event(e) for e in events]
        helper = TestReplayGroups()
        data, offs = helper._frames_to_arrays(frames)
        items = list(walmod.iter_frame_groups(data, offs))
        assert [k for k, _ in items] == ["emb_run"]
        run = items[0][1]
        assert run["record_ids"] == rids and run["model_id"] == "m2"
        assert run["emb_mat"].tolist() == mat.tolist()
        flat, runs = _flatten_groups(iter(items))
        for a, b in zip(flat, (walmod.decode_event(f) for f in frames)):
            assert _norm_ev(a) == _norm_ev(b)


def _norm_ev(ev):
    return {k: (bytes(v) if isinstance(v, (bytes, bytearray)) else v)
            for k, v in ev.items()}


def _flatten_groups(groups):
    flat = []
    runs = 0
    for kind, payload in groups:
        if kind == "fp_run":
            runs += 1
            flat.extend(walmod.fp_run_events(payload))
        elif kind == "emb_run":
            runs += 1
            flat.extend(walmod.emb_run_events(payload))
        else:
            flat.extend(payload)
    return flat, runs


class TestReplayGroups:
    """Bulk grouped replay (iter_frame_groups / NativeWal.replay_groups):
    the concatenation of the yielded groups must equal the per-frame
    decode_event stream EXACTLY — the columnar restart path is a decode
    optimization, never a semantics fork."""

    def _frames_to_arrays(self, frames):
        import numpy as np

        data = np.frombuffer(b"".join(frames), np.uint8)
        offs = np.zeros(len(frames) + 1, np.uint64)
        off = 0
        for i, f in enumerate(frames):
            off += len(f)
            offs[i + 1] = off
        return data, offs

    def _assert_identity(self, events):
        frames = [walmod.encode_event(e) for e in events]
        data, offs = self._frames_to_arrays(frames)
        flat, runs = _flatten_groups(walmod.iter_frame_groups(data, offs))
        want = [walmod.decode_event(f) for f in frames]
        assert len(flat) == len(want)
        for a, b in zip(flat, want):
            assert _norm_ev(a) == _norm_ev(b)
        return runs

    def test_uniform_run_decodes_columnar(self):
        events = [upsert_ev(i) for i in range(64)]
        runs = self._assert_identity(events)
        assert runs == 1

    def test_short_run_stays_per_event(self):
        # below _MIN_RUN the vectorized template validation costs more
        # than it saves — but the OUTPUT must be identical either way
        events = [upsert_ev(i) for i in range(walmod._MIN_RUN - 1)]
        runs = self._assert_identity(events)
        assert runs == 0

    def test_adjacent_same_length_templates_split(self):
        """Two runs with identical frame lengths differing only in one
        header field (tenant) must split into two runs — the length/op
        boundary scan alone cannot see this; template equality must."""
        a = [dict(upsert_ev(i), tenant_id=7) for i in range(16)]
        b = [dict(upsert_ev(100 + i), tenant_id=8) for i in range(16)]
        frames = [walmod.encode_event(e) for e in a + b]
        data, offs = self._frames_to_arrays(frames)
        flat, runs = _flatten_groups(walmod.iter_frame_groups(data, offs))
        assert runs == 2
        assert [e["tenant_id"] for e in flat] == [7] * 16 + [8] * 16

    def test_random_soup_fuzz(self):
        """Random mixed streams: uniform runs, deletes, embeddings,
        text, metadata variance, zero-length fingerprints, mixed
        algorithms/widths — grouped decode equals per-frame decode."""
        import random

        rng = random.Random(0x9E0)
        algs = ["a", "imgfprint-phash-v1", "x" * 40]
        for trial in range(30):
            events = []
            while len(events) < rng.randrange(2, 120):
                kind = rng.random()
                if kind < 0.5:
                    # a run of uniform fingerprint-only upserts
                    alg = rng.choice(algs)
                    flen = rng.choice([0, 4, 8, 8, 64])
                    t = rng.randrange(3)
                    meta = rng.choice([b"", b"\x01\x02"])
                    for _ in range(rng.randrange(1, 40)):
                        ev = upsert_ev(rng.randrange(2**64))
                        ev["algorithm"] = alg
                        ev["tenant_id"] = t
                        ev["metadata"] = meta
                        ev["fingerprint"] = bytes(
                            rng.randrange(256) for _ in range(flen))
                        events.append(ev)
                elif kind < 0.6:
                    # a run of uniform embedding upserts (varying
                    # floats + fingerprints; shared template)
                    alg = rng.choice(algs)
                    d = rng.choice([1, 3, 16])
                    model = rng.choice([None, "m", "model-long"])
                    t = rng.randrange(3)
                    for _ in range(rng.randrange(1, 24)):
                        ev = upsert_ev(rng.randrange(2**64))
                        ev["algorithm"] = alg
                        ev["tenant_id"] = t
                        ev["embedding"] = [rng.uniform(-9, 9)
                                           for _ in range(d)]
                        ev["model_id"] = model
                        events.append(ev)
                elif kind < 0.7:
                    ev = upsert_ev(rng.randrange(2**32))
                    if rng.random() < 0.5:
                        ev["embedding"] = [0.5] * 4
                        ev["model_id"] = "m"
                    else:
                        ev["text"] = "tt"
                    events.append(ev)
                else:
                    events.append({"op": "delete", "tenant_id": 7,
                                   "record_ids": [rng.randrange(2**32)]})
            self._assert_identity(events)

    def test_native_replay_groups_matches_replay(self, tmp_path):
        """File-level: NativeWal.replay_groups over a real log equals
        replay(), including the torn-tail rule."""
        import random

        rng = random.Random(3)
        events = [upsert_ev(i) for i in range(50)]
        events.append({"op": "delete", "tenant_id": 7, "record_ids": [3]})
        events += [dict(upsert_ev(100 + i), algorithm="other",
                        fingerprint=bytes(rng.randrange(256)
                                          for _ in range(16)))
                   for i in range(20)]
        p = str(tmp_path / "g.wal")
        w = walmod.open_wal(p, "native")
        w.append_events(events)
        w.close()
        # torn tail: truncate the last frame mid-payload
        size = os.path.getsize(p)
        with open(p, "r+b") as f:
            f.truncate(size - 5)
        r1 = walmod.open_wal(p, "native")
        flat, runs = _flatten_groups(r1.replay_groups())
        r1.close()
        r2 = walmod.open_wal(p, "native")
        per = list(r2.replay())
        r2.close()
        assert runs >= 1
        assert len(flat) == len(per) == len(events) - 1
        for a, b in zip(flat, per):
            assert _norm_ev(a) == _norm_ev(b)

    def test_native_replay_groups_empty_and_missing(self, tmp_path):
        p = str(tmp_path / "none.wal")
        w = walmod.open_wal(p, "native")
        assert list(w.replay_groups()) == []
        w.close()

    def _state(self, b):
        """Comparable snapshot of an EmbeddedBackend's full in-memory
        state: catalog rows, tenant ordering, and hamming cache rows."""
        recs = {k: dict(v, fingerprint=bytes(v["fingerprint"]),
                        metadata=bytes(v["metadata"]),
                        # stored as np.float32 rows: normalize for ==
                        embedding=(None if v["embedding"] is None
                                   else tuple(float(x)
                                              for x in v["embedding"])))
                for k, v in b._records.items()}
        ham = {
            key: {rid: h.data[row].tobytes()
                  for rid, row in h.rows.items()}
            for key, h in b._ham.items()
        }
        order = {t: list(rows) for t, rows in b._tenant_rows.items()}
        return recs, ham, order

    def test_restart_columnar_equals_per_event(self, tmp_path, monkeypatch):
        """The store reopened through the columnar fp-run replay must be
        state-identical to the per-event replay of the same log —
        including update runs (same rids twice: the gate must fall back
        to per-event semantics), metadata, deletes, and text rows."""
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        d = str(tmp_path / "db")
        b = EmbeddedBackend(d, wal_engine="native")

        async def build():
            rids = list(range(1, 65))
            fps = [bytes([i] * 8) for i in rids]
            await b.upsert_fingerprint_batch(
                5, "imgfprint-phash-v1", rids, fps,
                modality=Modality.IMAGE, config_hash=9)
            # update run: SAME rids, new fingerprints — replay must not
            # treat the second run as fresh rows
            fps2 = [bytes([255 - i] * 8) for i in rids]
            await b.upsert_fingerprint_batch(
                5, "imgfprint-phash-v1", rids, fps2,
                modality=Modality.IMAGE, config_hash=9)
            await b.upsert([Record(5, 1000, Modality.TEXT, "a", b"\x01",
                                   text="hello world")])
            await b.delete(5, [3, 7])

        asyncio.run(build())
        want = self._state(b)
        b.close()

        b_cols = EmbeddedBackend(d)
        got_cols = self._state(b_cols)
        b_cols.close()

        # force the per-event fallback and reopen the same log
        monkeypatch.setattr(walmod.GroupCommitWal, "replay_groups",
                            lambda self: None)
        b_per = EmbeddedBackend(d)
        got_per = self._state(b_per)
        b_per.close()

        assert got_cols == got_per == want


class TestColumnarCompaction:
    """compact() on the native engine emits array-direct run frames
    (rewrite_encoded). The compacted log must be BYTE-IDENTICAL to the
    per-event dict path's output — compaction changes cost, never bytes."""

    def _build(self, d, engine):
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        b = EmbeddedBackend(d, wal_engine=engine)

        async def fill():
            rids = list(range(1, 40))
            fps = [bytes([i] * 8) for i in rids]
            await b.upsert_fingerprint_batch(
                5, "imgfprint-phash-v1", rids, fps,
                modality=Modality.IMAGE, config_hash=9)
            # churn: updates + deletes so compaction actually drops rows
            await b.upsert_fingerprint_batch(
                5, "imgfprint-phash-v1", rids[:10],
                [bytes([200 + i]) * 8 for i in range(10)],
                modality=Modality.IMAGE, config_hash=9)
            await b.delete(5, [2, 4])
            await b.upsert([
                Record(5, 500, Modality.TEXT, "a", b"\x01",
                       text="hello world"),
                Record(6, 1, Modality.TEXT, "b", b"\x02",
                       embedding=[1.0, 0.0], model_id="m"),
                Record(5, 501, Modality.IMAGE, "imgfprint-phash-v1",
                       b"\x07" * 8, config_hash=9,
                       metadata=b"\xaa"),  # meta differs: breaks the run
            ])
            # a genuine embedding run (snapshot emits encode_emb_run_block)
            await b.upsert_embedding_batch(
                7, "emb-v1", list(range(20, 32)),
                [[0.25 * i, -1.5, 3.0 + i] for i in range(12)],
                fingerprints=[bytes([i] * 4) for i in range(12)],
                modality=Modality.TEXT, model_id="mx", config_hash=3)

        asyncio.run(fill())
        return b

    def test_native_compacted_log_byte_identical_to_dict_path(
            self, tmp_path):
        from ucfp_tpu.index.embedded import EmbeddedBackend, _upsert_event

        d = str(tmp_path / "db")
        b = self._build(d, "native")
        # expected log: the per-event dict path's bytes, in sorted order
        want = b"".join(
            walmod.encode_event(_upsert_event(tid, rid, row))
            for (tid, rid), row in sorted(b._records.items()))
        before = os.path.getsize(os.path.join(d, "ucfp.wal"))
        b.compact()
        after = os.path.getsize(os.path.join(d, "ucfp.wal"))
        assert after < before
        # strip the per-frame headers: replay and re-encode
        r = walmod.open_wal(os.path.join(d, "ucfp.wal"), "native")
        got = b"".join(walmod.encode_event(ev) for ev in r.replay())
        r.close()
        assert got == want
        state = TestReplayGroups._state(TestReplayGroups(), b)
        b.close()
        b2 = EmbeddedBackend(d)
        assert TestReplayGroups._state(TestReplayGroups(), b2) == state
        b2.close()

    def test_json_engine_compaction_still_works(self, tmp_path):
        from ucfp_tpu.index.embedded import EmbeddedBackend

        d = str(tmp_path / "db")
        b = self._build(d, "json")
        state = TestReplayGroups._state(TestReplayGroups(), b)
        b.compact()
        b.close()
        b2 = EmbeddedBackend(d)
        assert TestReplayGroups._state(TestReplayGroups(), b2) == state
        b2.close()

    def test_rewrite_encoded_failure_restores_buffer(self, tmp_path,
                                                     monkeypatch):
        """A failed encoded rewrite must restore the group-commit buffer
        (same contract as the dict path) so nothing buffered is lost."""
        p = str(tmp_path / "e.wal")
        w = walmod.GroupCommitWal(walmod.open_wal(p, "native"))
        t = w.append_buffered([{"op": "delete", "tenant_id": 0,
                                "record_ids": [1]}])
        w.sync_until(t)
        w.append_buffered([{"op": "delete", "tenant_id": 0,
                            "record_ids": [2]}])  # parked in the buffer

        def boom(self, blobs):
            raise OSError("EIO")

        monkeypatch.setattr(walmod.NativeWal, "rewrite_encoded", boom)
        with pytest.raises(OSError):
            w.rewrite_encoded([walmod.encode_event(
                {"op": "delete", "tenant_id": 0, "record_ids": [9]})])
        monkeypatch.undo()
        w.flush()
        w.close()
        r = walmod.open_wal(p, "native")
        rids = [ev["record_ids"][0] for ev in r.replay()]
        r.close()
        assert rids == [1, 2]


class TestTwoPhaseCompaction:
    """compact() holds the store lock only for the snapshot; the file
    write runs outside it. Events buffered AFTER the snapshot mark must
    land in the NEW log; events before it are covered by the snapshot."""

    def test_post_mark_appends_land_in_new_log(self, tmp_path):
        p = str(tmp_path / "t.wal")
        w = walmod.GroupCommitWal(walmod.open_wal(p, "native"))
        t = w.append_buffered([{"op": "delete", "tenant_id": 0,
                                "record_ids": [1]}])
        w.sync_until(t)
        ctx = w.begin_rewrite()
        w.mark_rewrite(ctx)
        # buffered after the mark: NOT covered by the snapshot
        t2 = w.append_buffered([{"op": "delete", "tenant_id": 0,
                                 "record_ids": [2]}])
        w.commit_rewrite(ctx, events=[
            {"op": "delete", "tenant_id": 0, "record_ids": [99]}])
        w.sync_until(t2)  # resumed writer drains it to the NEW log
        w.close()
        r = walmod.open_wal(p, "native")
        rids = [ev["record_ids"][0] for ev in r.replay()]
        r.close()
        assert rids == [99, 2]

    def test_concurrent_ingest_during_compact_survives_restart(
            self, tmp_path, monkeypatch):
        """Ingest issued WHILE the compaction file-write is in flight
        must apply (no store-lock stall) and be durable in the new log."""
        import asyncio
        import threading

        from ucfp_tpu.core import Modality
        from ucfp_tpu.index.embedded import EmbeddedBackend

        d = str(tmp_path / "db")
        b = EmbeddedBackend(d, wal_engine="native")
        rids = list(range(1, 33))
        fps = [bytes([i] * 8) for i in rids]
        asyncio.run(b.upsert_fingerprint_batch(
            5, "imgfprint-phash-v1", rids, fps, modality=Modality.IMAGE))

        gate = threading.Event()
        entered = threading.Event()
        real = walmod.NativeWal.rewrite_encoded

        def slow(self, blobs):
            entered.set()
            assert gate.wait(timeout=30)
            return real(self, blobs)

        monkeypatch.setattr(walmod.NativeWal, "rewrite_encoded", slow)
        compact_t = threading.Thread(target=b.compact)
        compact_t.start()
        assert entered.wait(timeout=30)
        # compaction file-write is parked: this ingest must still apply
        # to memory promptly (store lock free) and then ack durability
        # once the writer drains to the new log
        applied = threading.Event()

        def ingest():
            async def go():
                await b.upsert_fingerprint_batch(
                    5, "imgfprint-phash-v1", [100 + i for i in range(16)],
                    [bytes([200 + i] * 8) for i in range(16)],
                    modality=Modality.IMAGE)
            asyncio.run(go())
            applied.set()

        ingest_t = threading.Thread(target=ingest)
        ingest_t.start()
        # memory apply must not wait for the rewrite
        deadline = 10.0
        import time as _time
        t0 = _time.monotonic()
        while (5, 100) not in b._records:
            assert _time.monotonic() - t0 < deadline, \
                "memory apply stalled behind the compaction file write"
            _time.sleep(0.01)
        assert not applied.is_set()  # durability ack still parked
        gate.set()
        compact_t.join(timeout=30)
        ingest_t.join(timeout=30)
        assert applied.is_set()
        assert len(b._records) == 48
        b.close()
        b2 = EmbeddedBackend(d)
        assert len(b2._records) == 48
        assert (5, 100) in b2._records and (5, 1) in b2._records
        b2.close()

    def test_abort_rewrite_resumes_writer(self, tmp_path, monkeypatch):
        p = str(tmp_path / "a.wal")
        w = walmod.GroupCommitWal(walmod.open_wal(p, "native"))

        def boom(self, blobs):
            raise OSError("EIO")

        monkeypatch.setattr(walmod.NativeWal, "rewrite_encoded", boom)
        with pytest.raises(OSError):
            w.rewrite_encoded([walmod.encode_event(
                {"op": "delete", "tenant_id": 0, "record_ids": [9]})])
        monkeypatch.undo()
        # the writer must be resumed: a normal append completes
        t = w.append_buffered([{"op": "delete", "tenant_id": 0,
                                "record_ids": [3]}])
        w.sync_until(t)
        w.close()
        r = walmod.open_wal(p, "native")
        assert [ev["record_ids"][0] for ev in r.replay()] == [3]
        r.close()
