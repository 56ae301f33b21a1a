"""File-based ingest sources: NDJSON spool with durable resume offsets,
content-directory spool through the modality pipeline, and the
python -m ucfp_tpu.ingest CLI."""

import asyncio
import json

import numpy as np
import pytest

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.ingest.filesource import (
    NdjsonIngestSource,
    SpoolDirectoryIngestSource,
)
from ucfp_tpu.ingest.source import run_ingest_loop

from test_imagehash import synthetic_png


def run(coro):
    return asyncio.run(coro)


def row(rid, text=None):
    return {
        "tenant_id": 3, "record_id": rid, "modality": "text",
        "algorithm": "custom-v1", "config_hash": 1,
        "fingerprint": [1, 2, rid % 251], "text": text,
    }


class TestNdjson:
    def test_drain_and_resume(self, tmp_path):
        spool = tmp_path / "rows.ndjson"
        with open(spool, "w") as f:
            for i in range(7):
                f.write(json.dumps(row(i)) + "\n")

        idx = EmbeddedBackend(str(tmp_path / "db"))
        src = NdjsonIngestSource(str(spool))
        total = run(run_ingest_loop(src, idx, batch_size=3))
        assert total == 7
        assert run(idx.get_record_metadata(3, 5)).algorithm == "custom-v1"

        # append more rows; a FRESH source resumes from the ack offset
        with open(spool, "a") as f:
            for i in range(7, 10):
                f.write(json.dumps(row(i)) + "\n")
        src2 = NdjsonIngestSource(str(spool))
        assert run(run_ingest_loop(src2, idx, batch_size=3)) == 3
        assert run(idx.get_record_metadata(3, 9)).record_id == 9
        idx.close()

    def test_malformed_lines_skipped(self, tmp_path):
        spool = tmp_path / "rows.ndjson"
        bomb = dict(row(2))
        bomb["metadata"] = 10_000_000_000  # bytes(int) would zero-alloc 10 GB
        with open(spool, "w") as f:
            f.write(json.dumps(row(0)) + "\n")
            f.write("not json at all\n")
            f.write(json.dumps({"tenant_id": 1}) + "\n")  # missing fields
            f.write(json.dumps(bomb) + "\n")
            f.write(json.dumps(row(1)) + "\n")
        idx = EmbeddedBackend(str(tmp_path / "db"))
        src = NdjsonIngestSource(str(spool))
        assert run(run_ingest_loop(src, idx, batch_size=10)) == 2
        assert src.skipped == 3
        idx.close()


class TestSpoolDirectory:
    def test_mixed_content_drain(self, tmp_path):
        spool = tmp_path / "spool"
        spool.mkdir()
        (spool / "5_100.txt").write_text(
            "the quick brown fox jumps over the lazy dog"
        )
        (spool / "5_101.png").write_bytes(synthetic_png(64, 64))
        t = np.arange(8000) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1300 * t)
             * (np.sin(2 * np.pi * 0.9 * t) > 0)).astype("<f4")
        (spool / "5_102.f32").write_bytes(x.tobytes())
        (spool / "5_103.txt").write_bytes(b"\xff\xfe broken utf8")

        idx = EmbeddedBackend(str(tmp_path / "db"))
        src = SpoolDirectoryIngestSource(str(spool))
        total = run(run_ingest_loop(src, idx, batch_size=8))
        assert total == 3
        assert run(idx.get_record_metadata(5, 100)).algorithm.startswith(
            "minhash"
        )
        assert run(idx.get_record_metadata(5, 101)).algorithm == \
            "imgfprint-multi-v1"
        assert run(idx.get_record_metadata(5, 102)).algorithm == \
            "audiofp-wang-v1"
        # acked files moved to done/, the broken one quarantined
        assert sorted(p.name for p in (spool / "done").iterdir()) == [
            "5_100.txt", "5_101.png", "5_102.f32"
        ]
        assert [p.name for p in (spool / "failed").iterdir()] == ["5_103.txt"]
        assert src.errors and src.errors[0][0] == "5_103.txt"
        idx.close()

    def test_unprefixed_names_get_stable_ids(self, tmp_path):
        spool = tmp_path / "spool"
        spool.mkdir()
        (spool / "notes.txt").write_text("stable id fingerprint content")
        idx = EmbeddedBackend(str(tmp_path / "db"))
        src = SpoolDirectoryIngestSource(str(spool), default_tenant=9)
        assert run(run_ingest_loop(src, idx, batch_size=4)) == 1
        src2 = SpoolDirectoryIngestSource(str(spool), default_tenant=9)
        tid, rid = src2._ids_for(spool / "done" / "notes.txt")
        assert tid == 9
        assert run(idx.get_record_metadata(9, rid)).record_id == rid
        idx.close()


class TestCli:
    def test_cli_ndjson(self, tmp_path, capsys):
        from ucfp_tpu.ingest.__main__ import main

        spool = tmp_path / "rows.ndjson"
        with open(spool, "w") as f:
            for i in range(4):
                f.write(json.dumps(row(i)) + "\n")
        rc = main(["--data-dir", str(tmp_path / "db"),
                   "--ndjson", str(spool)])
        assert rc == 0
        assert "ingested 4 record(s)" in capsys.readouterr().out
        # records durable: a fresh open sees them
        idx = EmbeddedBackend(str(tmp_path / "db"))
        assert run(idx.get_record_metadata(3, 2)).record_id == 2
        idx.close()
