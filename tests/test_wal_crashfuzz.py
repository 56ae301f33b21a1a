"""Crash-point torture fuzz for both WAL engines: truncate the log at
EVERY byte offset (the kill -9 / power-cut model — a crash can only
leave a prefix of written bytes) and assert replay recovers an EXACT
event prefix: never a corrupt event, never a skipped-middle, never a
crash. The native engine's CRC framing additionally gets a bit-flip
sweep (media corruption model): any single-bit flip must degrade replay
to a clean prefix, not an altered event.

Reference durability contract: redb's crash-safe commits
(/root/reference/docs/ARCHITECTURE.md:30-40); this build's WAL framing
(ucfp_tpu/native/walstore.cpp:12-14, index/wal.py torn-tail guards)."""

import os
import random

import pytest

from ucfp_tpu.index import wal as walmod
from ucfp_tpu.native import load_walstore


def diverse_events():
    """A mixed-shape event stream: fingerprint-only fast-path frames,
    embedding rows, metadata/text carriers, deletes."""
    evs = []
    rng = random.Random(42)
    for i in range(30):
        kind = i % 5
        if kind == 4:
            evs.append({"op": "delete", "tenant_id": 1,
                        "record_ids": [i, i + 1000]})
            continue
        ev = {
            "op": "upsert",
            "tenant_id": 1,
            "record_id": i,
            "modality": "text" if kind == 1 else "image",
            "algorithm": "minhash-h128" if kind == 1 else "phash-v1",
            "config_hash": rng.randrange(1 << 63),
            "format_version": 1,
            "fingerprint": bytes(rng.randrange(256) for _ in range(24)),
        }
        if kind == 1:
            ev["text"] = f"document {i} body with some words"
        if kind == 2:
            ev["embedding"] = [rng.uniform(-1, 1) for _ in range(4)]
        if kind == 3:
            ev["metadata"] = f'{{"source":"s{i}"}}'.encode()
        evs.append(ev)
    return evs


def build_log(tmp_path, engine, name):
    """Append events ONE PER COMMIT, recording the file size after each
    — the frame boundaries the crash model cuts against."""
    p = str(tmp_path / name)
    w = walmod.open_wal(p, engine)
    evs = diverse_events()
    bounds = []
    for e in evs:
        w.append_events([e])
        bounds.append(os.path.getsize(p))
    w.close()
    return p, evs, bounds


def replay_of(path, engine):
    w = walmod.open_wal(path, engine)
    try:
        return list(w.replay())
    finally:
        w.close()


def canon(e):
    """Replay round-trips through the codec (f32 embeddings, empty-bytes
    defaults for metadata/model_id); compare canonicalized."""
    out = dict(e)
    if out.get("embedding") is not None:
        import numpy as np

        out["embedding"] = np.asarray(out["embedding"], np.float32).tolist()
    return {k: v for k, v in out.items()
            if v is not None and (k not in ("metadata", "model_id") or v)}


class TestTruncationEveryOffset:
    @pytest.mark.parametrize("engine", ["native", "json"])
    def test_every_crash_point_recovers_exact_prefix(self, tmp_path, engine):
        if engine == "native" and load_walstore() is None:
            pytest.skip("native walstore unavailable")
        p, evs, bounds = build_log(tmp_path, engine, f"{engine}.wal")
        total = bounds[-1]
        blob = open(p, "rb").read()
        assert len(blob) == total
        want = [canon(e) for e in evs]

        # expected events for a cut at offset t: every frame fully
        # inside t. Both engines commit at the frame terminator — the
        # native CRC frame must be whole, and the JSON engine treats an
        # unterminated final line as torn even when its content parses
        # (JsonWal._truncate_torn_tail drops it at open; the newline IS
        # the commit point).
        def expected(t):
            n = 0
            for b in bounds:
                if t >= b:
                    n += 1
                else:
                    break
            return n

        cut = str(tmp_path / f"cut-{engine}.wal")
        step = 1 if total <= 4096 else 3  # keep the sweep bounded
        # commit-point offsets (and their neighbors) are the most
        # interesting cuts — never let the stride skip them
        offsets = sorted(
            set(range(0, total + 1, step))
            | set(bounds) | {b - 1 for b in bounds}
        )
        for t in offsets:
            with open(cut, "wb") as f:
                f.write(blob[:t])
            got = [canon(e) for e in replay_of(cut, engine)]
            exp = want[: expected(t)]
            assert got == exp, (
                f"cut at {t}/{total}: replayed {len(got)} events, "
                f"expected {len(exp)}"
            )

    def test_native_sweep_hits_every_offset(self, tmp_path):
        """The stream above must stay small enough that the sweep is
        exhaustive (step 1) — if events grow, shrink them, don't stride."""
        if load_walstore() is None:
            pytest.skip("native walstore unavailable")
        _, _, bounds = build_log(tmp_path, "native", "sz.wal")
        assert bounds[-1] <= 4096


class TestBitFlipNative:
    def test_single_bit_flips_degrade_to_clean_prefix(self, tmp_path):
        """CRC framing: ANY single-bit flip must yield a replay that is
        an exact prefix of the original stream (the flipped frame and
        everything after drop) — never an altered event, never a crash.
        (The JSON engine documents weaker torn-tail-only semantics; a
        flip inside a JSON literal has no checksum to catch it.)"""
        if load_walstore() is None:
            pytest.skip("native walstore unavailable")
        p, evs, bounds = build_log(tmp_path, "native", "flip.wal")
        blob = bytearray(open(p, "rb").read())
        want = [canon(e) for e in evs]
        rng = random.Random(7)
        cut = str(tmp_path / "flipped.wal")
        trials = [(rng.randrange(len(blob)), rng.randrange(8))
                  for _ in range(300)]
        # plus directed flips: every frame's first header byte
        trials += [(b, 0) for b in [0] + bounds[:-1]]
        for off, bit in trials:
            mutated = bytearray(blob)
            mutated[off] ^= 1 << bit
            with open(cut, "wb") as f:
                f.write(mutated)
            got = [canon(e) for e in replay_of(cut, "native")]
            # must be an exact prefix, and must drop at least the
            # frame containing the flip
            frame = next(i for i, b in enumerate(bounds) if off < b)
            assert len(got) <= frame, f"flip at {off}.{bit}"
            assert got == want[: len(got)], f"flip at {off}.{bit}"


class TestStoreLevelCrashRecovery:
    def test_truncate_reopen_continue_cycles(self, tmp_path):
        """End-to-end crash model at the BACKEND layer: ingest, cut the
        log at a random offset (kill -9), reopen, assert the store
        serves an exact record prefix AND keeps accepting writes — then
        crash it again. Three cycles; both engines."""
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        for engine in ("native", "json"):
            if engine == "native" and load_walstore() is None:
                continue
            d = str(tmp_path / f"db-{engine}")
            wal_path = os.path.join(d, "ucfp.wal")
            rng = random.Random(3)
            committed = []  # record ids whose append returned (durable)
            next_id = 0
            b = EmbeddedBackend(d, wal_engine=engine)
            for cycle in range(3):
                for _ in range(8):
                    rid = next_id
                    next_id += 1
                    asyncio.run(b.upsert([Record(
                        0, rid, Modality.TEXT, "raw",
                        bytes([rid % 256] * 8), text=f"doc {rid} words",
                    )]))
                    committed.append(rid)
                b.close()
                blob = open(wal_path, "rb").read()
                # crash: keep a random prefix of the log
                t = rng.randrange(len(blob) + 1)
                with open(wal_path, "wb") as f:
                    f.write(blob[:t])
                b = EmbeddedBackend(d, wal_engine=engine)
                rows, _total = b.list_records(0, limit=1000)
                got = sorted(r["record_id"] for r in rows)
                # exact prefix of the durable ids — never a hole, never
                # a phantom
                assert got == committed[: len(got)], (engine, cycle, t, got)
                committed = got[:]  # survivors are the new truth
            b.close()
            # each engine must have kept SOMETHING across three cycles
            # of 8 appends — all-zero survivors means replay is broken
            assert committed, f"{engine}: fuzz never kept any records"
