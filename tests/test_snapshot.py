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
