"""SIGTERM graceful drain (reference bin/ucfp.rs:279-284; docker stop
contract): stop accepting, finish in-flight requests, close the index,
exit 0 — no mid-request 500s."""

import asyncio
import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from ucfp_tpu.server.http import HttpError, HttpServer, Request, Response, Router


def run(coro):
    return asyncio.run(coro)


class TestDrainUnit:
    def test_inflight_request_completes_then_conn_closes(self):
        async def go():
            r = Router()
            release = asyncio.Event()

            async def slow(req):
                await release.wait()
                return Response.json({"ok": True})

            r.add("GET", "/slow", slow, protected=False)
            server = HttpServer(r, timeout_secs=30.0)
            srv = await server.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]

            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(b"GET /slow HTTP/1.1\r\nhost: x\r\n\r\n")
            await writer.drain()
            await asyncio.sleep(0.05)  # request is now in-flight

            drain_task = asyncio.create_task(server.drain(5.0))
            await asyncio.sleep(0.05)
            assert not drain_task.done()  # waiting on the in-flight req
            release.set()
            assert await drain_task is True
            head = await reader.readuntil(b"\r\n\r\n")
            assert b"200" in head.split(b"\r\n")[0]
            # draining responses close their connections
            assert b"connection: close" in head.lower()
            srv.close()
            await srv.wait_closed()

        run(go())

    def test_drain_times_out_on_stuck_handler(self):
        async def go():
            r = Router()

            async def stuck(req):
                await asyncio.sleep(60)
                return Response.json({})

            r.add("GET", "/stuck", stuck, protected=False)
            server = HttpServer(r, timeout_secs=120.0)
            srv = await server.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            _, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(b"GET /stuck HTTP/1.1\r\nhost: x\r\n\r\n")
            await writer.drain()
            await asyncio.sleep(0.05)
            assert await server.drain(0.2) is False
            srv.close()
            await srv.wait_closed()

        run(go())

    def test_idle_keepalive_conn_closed_by_drain(self):
        async def go():
            r = Router()

            async def ping(req):
                return Response.json({"ok": True})

            r.add("GET", "/ping", ping, protected=False)
            server = HttpServer(r)
            srv = await server.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n")
            await writer.drain()
            await reader.readuntil(b"\r\n\r\n")
            body = await reader.readexactly(11)  # {"ok":true} is 11 bytes
            assert body == b'{"ok":true}'
            # connection now idle keep-alive; drain must close it
            assert await server.drain(1.0) is True
            eof = await asyncio.wait_for(reader.read(1), 5.0)
            assert eof == b""
            srv.close()
            await srv.wait_closed()

        run(go())


SERVER_SNIPPET = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["ucfp-server", "--bind", "127.0.0.1:{port}",
            "--token", "t", "--data-dir", r"{data}"]
from ucfp_tpu.server.__main__ import main
main()
"""


class TestSigtermIntegration:
    def test_sigterm_mid_flood_exits_zero_no_5xx(self, tmp_path):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ, UCFP_LOG="warn", UCFP_WARMUP="0",
                   UCFP_DRAIN_SECS="10")
        proc = subprocess.Popen(
            [sys.executable, "-c",
             SERVER_SNIPPET.format(port=port, data=str(tmp_path / "d"))],
            env=env,
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    with socket.create_connection(("127.0.0.1", port), 1):
                        break
                except OSError:
                    time.sleep(0.3)
            else:
                pytest.fail("server never came up")

            statuses = []

            async def client(n):
                reader, writer = await asyncio.open_connection(
                    "127.0.0.1", port)
                try:
                    for i in range(200):
                        body = json.dumps({
                            "tenant_id": 0, "record_id": n * 1000 + i,
                            "modality": "text", "algorithm": "raw",
                            "fingerprint": [1, 2, 3],
                            "text": "drain flood doc",
                        }).encode()
                        writer.write(
                            b"POST /v1/records HTTP/1.1\r\nhost: x\r\n"
                            b"authorization: Bearer t\r\n"
                            b"content-type: application/json\r\n"
                            + f"content-length: {len(body)}\r\n\r\n".encode()
                            + body)
                        await writer.drain()
                        head = await reader.readuntil(b"\r\n\r\n")
                        clen = 0
                        for ln in head.split(b"\r\n"):
                            if ln.lower().startswith(b"content-length:"):
                                clen = int(ln.split(b":")[1])
                        if clen:
                            await reader.readexactly(clen)
                        statuses.append(int(head.split(b" ", 2)[1]))
                        if b"connection: close" in head.lower():
                            return
                except (asyncio.IncompleteReadError, ConnectionError):
                    return  # closed by drain between requests: fine
                finally:
                    writer.close()

            async def flood_and_kill():
                tasks = [asyncio.create_task(client(n)) for n in range(4)]
                await asyncio.sleep(1.0)
                proc.send_signal(signal.SIGTERM)
                await asyncio.gather(*tasks)

            run(flood_and_kill())
            rc = proc.wait(timeout=30)
            assert rc == 0
            assert statuses, "no responses completed before the signal"
            assert all(s < 500 for s in statuses), statuses
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=10)


class TestDrainOrdering:
    def test_drain_before_wait_closed_with_idle_keepalive(self):
        """Round-3 review repro: on Python >= 3.12.1 wait_closed() blocks
        until every connection handler exits, so an idle keep-alive
        connection parked SIGTERM shutdown forever when wait_closed ran
        before drain. Production order (close -> drain -> wait_closed)
        must complete promptly."""
        async def go():
            r = Router()

            async def ping(req):
                return Response.json({"ok": True})

            r.add("GET", "/ping", ping, protected=False)
            server = HttpServer(r)
            srv = await server.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n")
            await writer.drain()
            await reader.readuntil(b"\r\n\r\n")
            await reader.readexactly(11)
            # idle keep-alive parked; production shutdown order:
            srv.close()
            assert await server.drain(2.0) is True
            await asyncio.wait_for(srv.wait_closed(), timeout=5.0)

        run(go())
