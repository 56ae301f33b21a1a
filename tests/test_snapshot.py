"""snapshot.sh backup/restore loop against a live WAL."""

import asyncio
import pathlib
import subprocess

from ucfp_tpu.core import Modality, Record
from ucfp_tpu.index.embedded import EmbeddedBackend

SCRIPT = str(pathlib.Path(__file__).parent.parent / "scripts" / "snapshot.sh")


def run(coro):
    return asyncio.run(coro)


def sh(*args):
    return subprocess.run(["bash", SCRIPT, *args], capture_output=True, text=True)


class TestSnapshot:
    def test_backup_restore_cycle(self, tmp_path):
        data = tmp_path / "data"
        backup = tmp_path / "backup"
        b = EmbeddedBackend(str(data))
        run(b.upsert([Record(0, 1, Modality.TEXT, "a", b"\x01",
                             embedding=[1.0, 0.0], text="snapshot me")]))
        b.close()
        r = sh("backup", str(data), str(backup))
        assert r.returncode == 0, r.stderr
        assert list(backup.glob("ucfp-*.wal"))
        # destroy the live store, restore, reopen
        (data / "ucfp.wal").unlink()
        r = sh("restore", str(data), str(backup))
        assert r.returncode == 0, r.stderr
        b2 = EmbeddedBackend(str(data))
        hits = run(b2.knn(0, [1.0, 0.0], 5))
        assert [h.record_id for h in hits] == [1]
        assert [h.record_id for h in run(b2.bm25(0, ["snapshot"], 5))] == [1]
        b2.close()

    def test_prune_keeps_newest(self, tmp_path):
        data = tmp_path / "data"
        backup = tmp_path / "backup"
        b = EmbeddedBackend(str(data))
        run(b.upsert([Record(0, 1, Modality.TEXT, "a", b"\x01")]))
        b.close()
        import os

        env = dict(os.environ, KEEP="2")
        for _ in range(4):
            subprocess.run(["bash", SCRIPT, "backup", str(data), str(backup)],
                           capture_output=True, env=env)
            import time

            time.sleep(1.05)  # distinct timestamps
        assert len(list(backup.glob("ucfp-*.wal"))) == 2

    def test_restore_empty_backup_ok(self, tmp_path):
        r = sh("restore", str(tmp_path / "d"), str(tmp_path / "nothing"))
        assert r.returncode == 0
        assert "no snapshot" in r.stdout


class TestCompaction:
    def test_admin_compact_route(self, tmp_path):
        import json as _json

        from test_server import call, jbody, make_app

        app, state = make_app(tmp_path)
        for rid in range(1, 30):
            call(app, "PUT", "/v1/records", _json.dumps(
                {"records": [{"tenant_id": 1, "record_id": rid % 3 + 1,
                              "modality": "text", "algorithm": "raw",
                              "fingerprint": [rid % 256]}]}).encode())
        r = call(app, "POST", "/v1/admin/compact", b"")
        assert r.status == 200
        b = jbody(r)
        assert b["compacted"] and b["wal_bytes_after"] < b["wal_bytes_before"]
        # a reopened store sees the compacted state
        state.index.close()
        from ucfp_tpu.index.embedded import EmbeddedBackend

        be2 = EmbeddedBackend(str(tmp_path / "db"))
        assert be2.get_record(1, 1) is not None
        be2.close()

    def test_autocompact_bounds_log_growth(self, tmp_path, monkeypatch):
        import asyncio as _aio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        monkeypatch.setenv("UCFP_AUTOCOMPACT_MB", "0.01")  # ~10 KB
        be = EmbeddedBackend(str(tmp_path / "db"))
        rec = Record(1, 1, Modality.TEXT, "raw", b"\x01" * 64,
                     text="some text " * 30)
        for _ in range(200):  # same record rewritten: pure churn
            _aio.run(be.upsert([rec]))
        size = be._wal_size()
        # without compaction the log would be ~200 events; with it the
        # snapshot holds ONE record
        assert size < 200 * 400
        be.close()
        be2 = EmbeddedBackend(str(tmp_path / "db"))
        assert be2.get_record(1, 1)["text"].startswith("some text")
        be2.close()
