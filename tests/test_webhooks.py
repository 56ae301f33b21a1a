"""Webhook-backed auth / rate-limit / usage against a real local HTTP
endpoint (the reference's UCFP_KEY_LOOKUP_URL / UCFP_RATELIMIT_URL /
UCFP_USAGE_WEBHOOK_URL composition, bin/ucfp.rs:106-205)."""

import asyncio
import json
import threading

import pytest

from ucfp_tpu.server.auth import WebhookKeyLookup
from ucfp_tpu.server.ratelimit import WebhookRateLimiter
from ucfp_tpu.server.usage import UsageEvent, UsageOp, WebhookUsageSink
from ucfp_tpu.server.webhooks import (
    key_lookup_fetch,
    ratelimit_fetch,
    usage_post,
)


class WebhookEndpoint:
    """Tiny HTTP/1.1 responder: records request bodies, replies from a
    per-path handler."""

    def __init__(self):
        self.requests: list[tuple[str, dict]] = []
        self.handlers = {}  # path -> (status, dict-or-None)
        self._loop = None
        self._started = threading.Event()
        self.port = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(10)

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)

        async def client(reader, writer):
            try:
                head = await reader.readuntil(b"\r\n\r\n")
                lines = head.decode().split("\r\n")
                path = lines[0].split(" ")[1]
                clen = 0
                for ln in lines[1:]:
                    if ln.lower().startswith("content-length:"):
                        clen = int(ln.split(":")[1])
                body = json.loads(await reader.readexactly(clen)) if clen else {}
                self.requests.append((path, body))
                status, payload = self.handlers.get(path, (404, None))
                out = json.dumps(payload).encode() if payload is not None else b""
                writer.write(
                    f"HTTP/1.1 {status} X\r\ncontent-length: {len(out)}\r\n"
                    f"connection: close\r\n\r\n".encode() + out
                )
                await writer.drain()
            finally:
                writer.close()

        async def boot():
            srv = await asyncio.start_server(client, "127.0.0.1", 0)
            self.port = srv.sockets[0].getsockname()[1]
            self._started.set()

        self._loop.run_until_complete(boot())
        self._loop.run_forever()

    def url(self, path):
        return f"http://127.0.0.1:{self.port}{path}"

    def stop(self):
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=5)


@pytest.fixture()
def endpoint():
    ep = WebhookEndpoint()
    yield ep
    ep.stop()


def run(coro):
    return asyncio.run(coro)


class TestKeyLookupWebhook:
    def test_known_token_resolves_context(self, endpoint):
        endpoint.handlers["/keys"] = (200, {
            "tenant_id": 7, "key_id": "wk", "scopes": ["ingest"],
            "rate_limit_per_min": 10, "daily_quota": 100,
        })
        lk = WebhookKeyLookup(key_lookup_fetch(endpoint.url("/keys")))
        ctx = run(lk.lookup("tok-1"))
        assert ctx.tenant_id == 7 and ctx.key_id == "wk"
        assert ctx.scopes == ("ingest",)
        assert endpoint.requests[-1] == ("/keys", {"token": "tok-1"})
        # TTL cache: second lookup answers without a second webhook call
        run(lk.lookup("tok-1"))
        assert len(endpoint.requests) == 1

    def test_unknown_token_and_down_endpoint_fail_closed(self, endpoint):
        lk = WebhookKeyLookup(key_lookup_fetch(endpoint.url("/nope")))
        assert run(lk.lookup("x")) is None  # 404 -> unknown
        dead = WebhookKeyLookup(
            key_lookup_fetch("http://127.0.0.1:9/keys")  # refused port
        )
        assert run(dead.lookup("x")) is None  # unreachable -> unknown


class TestRateLimitWebhook:
    def test_deny_and_allow(self, endpoint):
        endpoint.handlers["/rl"] = (200, {
            "allowed": False, "retry_after_ms": 1500, "limit": 10,
        })
        rl = WebhookRateLimiter(ratelimit_fetch(endpoint.url("/rl")))
        d = run(rl.check(3, "bulk"))
        assert not d.allowed and d.retry_after_ms == 1500 and d.limit == 10
        assert endpoint.requests[-1] == (
            "/rl", {"tenant_id": 3, "rate_class": "bulk"}
        )

    def test_down_endpoint_fails_open(self):
        rl = WebhookRateLimiter(ratelimit_fetch("http://127.0.0.1:9/rl"))
        d = run(rl.check(3))
        assert d.allowed  # limiter outage must not take the API down


class TestUsageWebhook:
    def test_events_posted_in_batches(self, endpoint):
        endpoint.handlers["/usage"] = (200, {})

        async def go():
            sink = WebhookUsageSink(usage_post(endpoint.url("/usage")))
            for i in range(3):
                await sink.record(UsageEvent(
                    tenant_id=1, key_id="k", op=UsageOp.QUERY, bytes_in=i,
                    units=1, elapsed_ms=1.0, status=200, ts=i,
                ))
            await sink.close()

        run(go())
        paths = [p for p, _ in endpoint.requests]
        assert all(p == "/usage" for p in paths) and paths
        events = [e for _, b in endpoint.requests for e in b["events"]]
        assert len(events) == 3
        # the UsageOp enum serializes (default=str)
        assert all("query" in str(e["op"]).lower() for e in events)


class TestEnvWiring:
    def test_state_from_env_composes_webhooks(self, tmp_path, monkeypatch):
        from ucfp_tpu.server.app import state_from_env
        from ucfp_tpu.server.keystore import CompositeKeyLookup

        monkeypatch.setenv("UCFP_KEY_LOOKUP_URL", "http://127.0.0.1:9/k")
        monkeypatch.setenv("UCFP_RATELIMIT_URL", "http://127.0.0.1:9/r")
        monkeypatch.setenv("UCFP_USAGE_WEBHOOK_URL", "http://127.0.0.1:9/u")
        monkeypatch.setenv("UCFP_SHARD", "off")
        state = state_from_env(data_dir=str(tmp_path))
        assert isinstance(state.api_keys, CompositeKeyLookup)
        assert any(
            type(lk).__name__ == "WebhookKeyLookup"
            for lk in state.api_keys.lookups
        )
        assert type(state.rate_limit).__name__ == "WebhookRateLimiter"
        assert type(state.usage).__name__ == "WebhookUsageSink"
        state.index.close()


class TestDemoChallenge:
    """Anonymous-abuse challenge on /v1/demo/fingerprint (reference
    web/src/lib/server/turnstile.ts: anonymous ingest requires a CAPTCHA
    token on top of the IP limit). Default off; webhook-verified when
    UCFP_DEMO_CHALLENGE_URL is set; FAIL CLOSED on verifier outage."""

    def _app(self, tmp_path, challenge):
        from ucfp_tpu.index.embedded import EmbeddedBackend
        from ucfp_tpu.server.app import ServerState, build_server
        from ucfp_tpu.server.auth import StaticSingleKey
        from ucfp_tpu.server.inputs_cache import InputsCache
        from ucfp_tpu.server.ratelimit import NoopRateLimiter
        from ucfp_tpu.server.usage import NoopUsageSink

        state = ServerState(
            index=EmbeddedBackend(str(tmp_path / "db")),
            api_keys=StaticSingleKey("t"),
            rate_limit=NoopRateLimiter(),
            usage=NoopUsageSink(),
            inputs=InputsCache(),
            challenge=challenge,
        )
        return build_server(state, timeout_secs=120.0), state

    def test_enforced_and_stub_verified(self, endpoint, tmp_path):
        from ucfp_tpu.server.webhooks import challenge_verify_fetch

        from test_server import call

        endpoint.handlers["/siteverify"] = (200, {"success": True})
        app, _ = self._app(tmp_path, challenge_verify_fetch(
            endpoint.url("/siteverify"), "sec"))
        # no token -> 403 before any compute
        r = call(app, "POST", "/v1/demo/fingerprint", b"hello", token=None)
        assert r.status == 403 and b"challenge_required" in r.body
        # token rides either header name; siteverify wire shape preserved
        r = call(app, "POST", "/v1/demo/fingerprint", b"hello world",
                 token=None, headers={"x-challenge-token": "tok-1"})
        assert r.status == 200
        assert endpoint.requests[-1] == ("/siteverify", {
            "secret": "sec", "response": "tok-1", "remoteip": ""})
        r = call(app, "POST", "/v1/demo/fingerprint", b"hello world",
                 token=None, headers={"cf-turnstile-response": "tok-2"})
        assert r.status == 200
        # verifier says no -> 403
        endpoint.handlers["/siteverify"] = (200, {"success": False})
        r = call(app, "POST", "/v1/demo/fingerprint", b"hello",
                 token=None, headers={"x-challenge-token": "bad"})
        assert r.status == 403 and b"challenge_failed" in r.body

    def test_verifier_outage_fails_closed(self, tmp_path):
        from ucfp_tpu.server.webhooks import challenge_verify_fetch

        from test_server import call

        app, _ = self._app(tmp_path, challenge_verify_fetch(
            "http://127.0.0.1:9/siteverify"))
        r = call(app, "POST", "/v1/demo/fingerprint", b"hello",
                 token=None, headers={"x-challenge-token": "tok"})
        assert r.status == 403 and b"challenge_failed" in r.body

    def test_env_wiring_and_default_off(self, tmp_path, monkeypatch):
        from ucfp_tpu.server.app import state_from_env

        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_TOKEN", "t")
        s = state_from_env(data_dir=str(tmp_path / "a"))
        assert s.challenge is None  # default off (self-hosted divergence)
        s.index.close()
        monkeypatch.setenv("UCFP_DEMO_CHALLENGE_URL", "http://127.0.0.1:9/v")
        s = state_from_env(data_dir=str(tmp_path / "b"))
        assert s.challenge is not None
        s.index.close()


class TestTransportFailureNotCached:
    def test_blip_does_not_poison_ttl_cache(self, endpoint):
        """A transient transport failure must fail closed for that
        request only — never be cached as an authoritative 60 s miss."""
        calls = {"n": 0}

        async def flaky(token):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("connection reset")
            from ucfp_tpu.server.auth import ApiKeyContext

            return ApiKeyContext(tenant_id=5, key_id="ok")

        lk = WebhookKeyLookup(flaky)
        assert run(lk.lookup("tok")) is None   # blip: closed, uncached
        ctx = run(lk.lookup("tok"))            # next attempt recovers
        assert ctx is not None and ctx.tenant_id == 5
        # and the recovery IS cached
        run(lk.lookup("tok"))
        assert calls["n"] == 2


class TestStaleServeOnOutage:
    def test_expired_cache_served_while_endpoint_down(self):
        """Outage longer than the TTL: availability for already-seen keys
        beats freshness — serve the last-known answer, refresh on the
        first successful fetch. Unknown tokens still fail closed."""
        from ucfp_tpu.server.auth import ApiKeyContext

        clock = {"t": 0.0}
        calls = {"n": 0}

        async def fetch(token):
            calls["n"] += 1
            if calls["n"] > 1:
                raise OSError("endpoint down")
            return ApiKeyContext(tenant_id=5, key_id="k")

        lk = WebhookKeyLookup(fetch, clock=lambda: clock["t"])
        assert run(lk.lookup("tok")).tenant_id == 5
        clock["t"] = WebhookKeyLookup.TTL_SECS * 2  # cache expired, ep down
        ctx = run(lk.lookup("tok"))
        assert ctx is not None and ctx.tenant_id == 5  # stale, not lockout
        assert run(lk.lookup("never-seen")) is None  # still fails closed


class TestServerErrorsAreTransient:
    def test_5xx_and_429_not_cached_as_miss(self, endpoint):
        """Only 2xx/4xx webhook answers are authoritative: a 503/429 blip
        must not lock a valid token out for the whole 60 s TTL."""
        for blip in (503, 429):
            endpoint.requests.clear()
            endpoint.handlers["/keys"] = (blip, {})
            lk = WebhookKeyLookup(key_lookup_fetch(endpoint.url("/keys")))
            assert run(lk.lookup("tok")) is None  # closed for THIS request
            endpoint.handlers["/keys"] = (200, {"tenant_id": 7})
            ctx = run(lk.lookup("tok"))  # immediate recovery, no 60 s wait
            assert ctx is not None and ctx.tenant_id == 7
            assert len(endpoint.requests) == 2

    def test_default_key_id_is_per_tenant(self, endpoint):
        """A shared literal default would meter every tenant's per-key
        minute/day budget in ONE FixedWindowLimiter bucket."""
        endpoint.handlers["/keys"] = (200, {"tenant_id": 7})
        lk = WebhookKeyLookup(key_lookup_fetch(endpoint.url("/keys")))
        assert run(lk.lookup("a")).key_id == "webhook-t7"
