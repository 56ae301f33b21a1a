"""Native epoll HTTP front: end-to-end over real sockets."""

import asyncio
import json
import socket
import urllib.request

import pytest

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.native import load_httpfront
from ucfp_tpu.server.app import ServerState, build_server
from ucfp_tpu.server.auth import StaticSingleKey
from ucfp_tpu.server.inputs_cache import InputsCache
from ucfp_tpu.server.nativehttp import NativeHttpBridge
from ucfp_tpu.server.ratelimit import NoopRateLimiter
from ucfp_tpu.server.usage import NoopUsageSink


@pytest.fixture
def bridge_runner(tmp_path):
    state = ServerState(
        index=EmbeddedBackend(str(tmp_path)),
        api_keys=StaticSingleKey("t"),
        rate_limit=NoopRateLimiter(),
        usage=NoopUsageSink(),
        inputs=InputsCache(),
    )
    srv = build_server(state, timeout_secs=60.0)

    def run_scenario(fn):
        async def go():
            bridge = NativeHttpBridge(srv, "127.0.0.1", 0)
            loop = asyncio.get_running_loop()
            import threading

            t = threading.Thread(
                target=bridge._pull_loop, args=(loop,), daemon=True
            )
            t.start()
            try:
                return await asyncio.wait_for(
                    asyncio.to_thread(fn, bridge.port), timeout=30
                )
            finally:
                bridge.stop()

        return asyncio.run(go())

    return run_scenario


def http(port, method, path, body=None, token="t"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method=method
    )
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class TestNativeHttpFront:
    def test_lib_loads(self):
        assert load_httpfront() is not None

    def test_health_info_and_ingest(self, bridge_runner):
        def scenario(port):
            s1, b1 = http(port, "GET", "/healthz", token=None)
            s2, b2 = http(port, "GET", "/v1/info", token=None)
            s3, b3 = http(
                port, "POST", "/v1/ingest/text/0/1?algorithm=minhash",
                body=b"the quick brown fox jumps over the lazy dog",
            )
            return (s1, b1, s2, b2, s3, json.loads(b3))

        s1, b1, s2, b2, s3, ing = bridge_runner(scenario)
        assert s1 == 200 and json.loads(b1)["status"] == "ok"
        assert s2 == 200 and json.loads(b2)["name"] == "ucfp-tpu"
        assert s3 == 201 and ing["fingerprint_bytes"] == 1032

    def test_auth_and_errors(self, bridge_runner):
        def scenario(port):
            s1, _ = http(port, "POST", "/v1/ingest/text/0/1", b"x", token=None)
            s2, _ = http(port, "GET", "/nope", token=None)
            return s1, s2

        s1, s2 = bridge_runner(scenario)
        assert (s1, s2) == (401, 404)

    def test_keepalive_sequential(self, bridge_runner):
        def scenario(port):
            with socket.create_connection(("127.0.0.1", port), timeout=5) as sk:
                out = b""
                for _ in range(3):
                    sk.sendall(b"GET /healthz HTTP/1.1\r\nhost: x\r\n\r\n")
                    while b'{"status":"ok"}' not in out:
                        out += sk.recv(4096)
                    out = b""
                return True

        assert bridge_runner(scenario)

    def test_native_413(self, bridge_runner):
        def scenario(port):
            with socket.create_connection(("127.0.0.1", port), timeout=5) as sk:
                sk.sendall(
                    b"POST /v1/ingest/text/0/1 HTTP/1.1\r\n"
                    b"content-length: 999999999\r\n\r\n"
                )
                return sk.recv(4096)

        out = bridge_runner(scenario)
        assert b"413" in out.split(b"\r\n")[0]

    def test_concurrent_clients(self, bridge_runner):
        def scenario(port):
            import concurrent.futures as cf

            def one(i):
                s, b = http(port, "POST", f"/v1/ingest/text/0/{i}",
                            body=f"document number {i} here".encode())
                return s

            with cf.ThreadPoolExecutor(8) as ex:
                return list(ex.map(one, range(24)))

        statuses = bridge_runner(scenario)
        assert statuses == [201] * 24


class TestNativePeerAddress:
    def test_remote_addr_reaches_per_ip_limits(self, bridge_runner):
        """The C front passes the client IP through the ABI so per-IP
        auth/demo limits key on the real peer, not one global '' bucket."""
        seen = []
        from ucfp_tpu.server import nativehttp as nh

        orig = nh.NativeHttpBridge._to_request

        def spy(self, raw):
            rid, req, close = orig(self, raw)
            seen.append(req.remote_addr)
            return rid, req, close

        nh.NativeHttpBridge._to_request = spy
        try:
            def scenario(port):
                return http(port, "GET", "/healthz", token=None)

            status, _ = bridge_runner(scenario)
            assert status == 200
        finally:
            nh.NativeHttpBridge._to_request = orig
        assert seen and all(a == "127.0.0.1" for a in seen)
