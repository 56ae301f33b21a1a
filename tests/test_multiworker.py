"""Multi-worker serving stack (server/multiworker.py + server/ipc.py):
one owner process (WAL + stores + device) and N SO_REUSEPORT HTTP
workers. Round-4 verdict #1's done-conditions, as tests on one core:
concurrent ingest/query/compact through 2 workers, worker SIGKILL with
supervised restart, owner-kill -> 503 from workers, and WAL integrity
(everything acked over HTTP is present when the data dir is reopened
by a fresh single-process backend). The ownership protocol under test
is the reference's redb single-writer discipline
(/root/reference/src/index/embedded/mod.rs:157-227) made explicit as
a process boundary.
"""

import concurrent.futures
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _req(port, method, path, data=None, token="t", timeout=60,
         ctype="application/json"):
    headers = {}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    if ctype and data is not None:
        headers["content-type"] = ctype
    r = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, headers=headers,
        method=method)
    with urllib.request.urlopen(r, timeout=timeout) as resp:
        return resp.status, resp.read()


class _Stack:
    def __init__(self, data_dir: str, workers: int = 2):
        self.port = _free_port()
        self.data_dir = data_dir
        env = dict(os.environ, UCFP_JAX_PLATFORM="cpu", UCFP_WARMUP="0",
                   UCFP_LOG="warn", UCFP_DRAIN_SECS="5")
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "ucfp_tpu.server",
             "--bind", f"127.0.0.1:{self.port}", "--token", "t",
             "--data-dir", data_dir, "--workers", str(workers)],
            env=env,
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                st, _ = _req(self.port, "GET", "/healthz", token=None,
                             timeout=3)
                if st == 200:
                    return
            except (OSError, urllib.error.URLError):
                time.sleep(0.4)
        self.stop()
        pytest.fail("multi-worker stack never became healthy")

    def worker_pids(self) -> list[int]:
        out = subprocess.run(
            ["ps", "--ppid", str(self.proc.pid), "-o", "pid="],
            capture_output=True, text=True)
        return [int(x) for x in out.stdout.split()]

    def stop(self, sig=signal.SIGTERM, wait=20):
        if self.proc.poll() is None:
            self.proc.send_signal(sig)
            try:
                self.proc.wait(wait)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait(10)
        # orphaned workers (owner SIGKILL case): sweep children by pgid
        for pid in self.worker_pids():
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    st = _Stack(str(tmp_path_factory.mktemp("mw-data")), workers=2)
    yield st
    st.stop()


class TestMultiWorkerServing:
    def test_two_workers_running(self, stack):
        assert len(stack.worker_pids()) == 2

    def test_routes_roundtrip(self, stack):
        port = stack.port
        st, body = _req(port, "POST", "/v1/ingest/text/1/1",
                        b"the quick brown fox jumps over the lazy dog",
                        ctype="text/plain")
        assert st == 201 and b"minhash" in body
        # bm25 through the owner's engine
        st, body = _req(port, "POST", "/v1/query", json.dumps(
            {"tenant_id": 1, "modality": "text", "k": 5,
             "terms": ["quick", "fox"]}).encode())
        assert st == 200
        assert any(h["record_id"] == 1 for h in json.loads(body)["hits"])
        # raw record with embedding -> vector knn via the owner
        emb = [float(i % 7 - 3) / 3.0 for i in range(16)]
        st, _ = _req(port, "POST", "/v1/records", json.dumps(
            {"tenant_id": 1, "record_id": 5, "modality": "image",
             "algorithm": "embedding-image-local",
             "fingerprint": [0, 0], "embedding": emb}).encode())
        assert st in (200, 201)
        st, body = _req(port, "POST", "/v1/query", json.dumps(
            {"tenant_id": 1, "modality": "image", "k": 3,
             "vector": emb}).encode())
        assert st == 200
        assert json.loads(body)["hits"][0]["record_id"] == 5

    def test_concurrent_ingest_query_compact(self, stack):
        """The verdict's core scenario: many clients hammering both
        workers with writes + reads while a compact runs — every
        request must succeed and every write must be queryable."""
        port = stack.port
        n_threads, per = 8, 12

        def client(t):
            oks = 0
            for i in range(per):
                rid = 1000 + t * 100 + i
                st, _ = _req(port, "POST",
                             f"/v1/ingest/text/1/{rid}",
                             f"concurrent doc {t}-{i} mixed load".encode(),
                             ctype="text/plain")
                assert st == 201
                st, _ = _req(port, "POST", "/v1/query", json.dumps(
                    {"tenant_id": 1, "modality": "text", "k": 3,
                     "terms": ["concurrent", "doc"]}).encode())
                assert st == 200
                oks += 1
                if t == 0 and i == per // 2:
                    st, _ = _req(port, "POST", "/v1/admin/compact", b"")
                    assert st == 200
            return oks

        with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
            assert sum(ex.map(client, range(n_threads))) == n_threads * per
        # every write visible through either worker
        st, body = _req(port, "POST", "/v1/query", json.dumps(
            {"tenant_id": 1, "modality": "text", "k": 200,
             "terms": ["concurrent", "doc", "mixed", "load"]}).encode())
        hits = {h["record_id"] for h in json.loads(body)["hits"]}
        want = {1000 + t * 100 + i
                for t in range(n_threads) for i in range(per)}
        assert want <= hits

    def test_issued_key_works_via_any_worker(self, stack):
        """Keystore lives in the owner: a key issued through one worker
        must authenticate on every worker (RemoteKeyStore IPC)."""
        port = stack.port
        st, body = _req(port, "POST", "/v1/admin/keys", json.dumps(
            {"tenant_id": 7}).encode())
        assert st in (200, 201), body
        key = json.loads(body)["token"]
        for i in range(6):  # SO_REUSEPORT spreads these over workers
            st, _ = _req(port, "POST", f"/v1/ingest/text/7/{i}",
                         b"issued key doc", token=key,
                         ctype="text/plain")
            assert st == 201

    def test_worker_sigkill_service_continues_and_restarts(self, stack):
        port = stack.port
        pids = stack.worker_pids()
        assert len(pids) == 2
        os.kill(pids[0], signal.SIGKILL)
        # service stays up through the surviving worker (a connection
        # routed to the dead socket can fail once; urllib opens a fresh
        # connection per request, so retry-once covers the race)
        ok = 0
        for i in range(8):
            try:
                st, _ = _req(port, "POST", f"/v1/ingest/text/1/{9000+i}",
                             b"after worker crash", ctype="text/plain",
                             timeout=30)
                ok += st == 201
            except (OSError, urllib.error.URLError):
                pass
        assert ok >= 6
        # the supervisor restarts the dead worker
        deadline = time.time() + 20
        while time.time() < deadline:
            if len(stack.worker_pids()) == 2:
                break
            time.sleep(0.3)
        assert len(stack.worker_pids()) == 2


class TestDurabilityAcrossStack:
    def test_sigterm_then_reopen_preserves_acked_writes(self, tmp_path):
        stack = _Stack(str(tmp_path / "d"), workers=2)
        try:
            for i in range(10):
                st, _ = _req(stack.port, "POST",
                             f"/v1/ingest/text/1/{i}",
                             f"durable doc {i}".encode(),
                             ctype="text/plain")
                assert st == 201
        finally:
            stack.stop()  # SIGTERM drain
        assert stack.proc.returncode == 0
        self._assert_docs_present(str(tmp_path / "d"), range(10))

    def test_owner_sigkill_workers_503_and_wal_replays(self, tmp_path):
        stack = _Stack(str(tmp_path / "d"), workers=2)
        try:
            for i in range(5):
                st, _ = _req(stack.port, "POST",
                             f"/v1/ingest/text/1/{i}",
                             f"durable doc {i}".encode(),
                             ctype="text/plain")
                assert st == 201
            os.kill(stack.proc.pid, signal.SIGKILL)
            stack.proc.wait(10)
            # workers are orphaned but alive: the store is down, so
            # they must answer 5xx, not hang or fabricate success
            got_5xx = False
            for _ in range(4):
                try:
                    st, _ = _req(stack.port, "POST",
                                 "/v1/ingest/text/1/99",
                                 b"after owner death",
                                 ctype="text/plain", timeout=15)
                    assert st >= 500
                    got_5xx = True
                except urllib.error.HTTPError as e:
                    assert e.code >= 500
                    got_5xx = True
                except (OSError, urllib.error.URLError):
                    pass
            assert got_5xx
        finally:
            stack.stop(sig=signal.SIGKILL)
        # group-commit WAL: every HTTP-acked write replays on reopen
        self._assert_docs_present(str(tmp_path / "d"), range(5))

    @staticmethod
    def _assert_docs_present(data_dir, rids):
        code = (
            "import asyncio, jax, json, sys\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from ucfp_tpu.index.embedded import EmbeddedBackend\n"
            f"be = EmbeddedBackend({data_dir!r})\n"
            "hits = asyncio.run(be.bm25(1, ['durable', 'doc'], 100))\n"
            "print(json.dumps(sorted(h.record_id for h in hits)))\n"
            "be.close()\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=180,
            env=dict(os.environ, UCFP_LOG="warn"))
        assert out.returncode == 0, out.stderr[-2000:]
        got = set(json.loads(out.stdout.strip().splitlines()[-1]))
        assert set(rids) <= got, (sorted(got), out.stderr[-500:])


class TestIpcChannel:
    """Unit coverage of server/ipc.py edge paths the stack tests reach
    only racily: a connection dying between _ensure and write, and
    pending futures failing when the pump dies mid-flight."""

    def test_write_after_pump_death_raises_connection_error(self, tmp_path):
        import asyncio

        from ucfp_tpu.server.ipc import OwnerServer, _AsyncChannel

        class _Obj:
            async def flush(self):
                return "ok"

        async def run():
            sock = str(tmp_path / "o.sock")
            owner = OwnerServer(_Obj(), path=sock)
            await owner.start()
            chan = _AsyncChannel(sock)
            assert await chan.call("ix.flush") == "ok"
            # freeze _ensure (as if a concurrent call had just passed
            # it), then kill the connection: call() must surface
            # ConnectionError (-> the HTTP 503 envelope), never
            # AttributeError on the cleared writer
            async def noop():
                return None

            chan._ensure = noop
            chan._writer.transport.abort()
            await asyncio.sleep(0.1)  # pump sees the reset, clears state
            try:
                await chan.call("ix.flush")
                ok = False
            except ConnectionError:
                ok = True
            owner_close = asyncio.create_task(owner.close())
            await asyncio.wait_for(owner_close, timeout=5)
            return ok

        assert asyncio.run(run())

    def test_pump_death_fails_pending_futures(self, tmp_path):
        import asyncio

        from ucfp_tpu.server.ipc import OwnerServer, _AsyncChannel

        class _Slow:
            async def flush(self):
                await asyncio.sleep(30)

        async def run():
            sock = str(tmp_path / "o.sock")
            owner = OwnerServer(_Slow(), path=sock)
            await owner.start()
            chan = _AsyncChannel(sock)
            t = asyncio.create_task(chan.call("ix.flush"))
            await asyncio.sleep(0.1)  # request in flight, owner hanging
            chan._writer.transport.abort()  # the connection drops
            try:
                await asyncio.wait_for(t, timeout=5)
                ok = False
            except ConnectionError:
                ok = True  # pending future failed fast, no 30 s hang
            except asyncio.TimeoutError:
                ok = False
            await asyncio.wait_for(owner.close(), timeout=5)
            return ok

        assert asyncio.run(run())
