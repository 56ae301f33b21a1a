"""DI-seam behavior: webhook sinks/lookups, token-bucket mechanics.

The reference tests these through injected fakes (tests.rs:637-992);
same approach here — the webhook classes take injected fetch/post
callables, so no network is involved.
"""

import asyncio

import pytest

from ucfp_tpu.server.auth import ApiKeyContext, WebhookKeyLookup
from ucfp_tpu.server.ratelimit import InMemoryTokenBucket, WebhookRateLimiter, RateDecision
from ucfp_tpu.server.usage import UsageEvent, UsageOp, WebhookUsageSink


def run(coro):
    return asyncio.run(coro)


class TestWebhookKeyLookup:
    def test_ttl_cache(self):
        calls = []
        clock = [0.0]

        async def fetch(token):
            calls.append(token)
            return ApiKeyContext(tenant_id=5, key_id="wk")

        lk = WebhookKeyLookup(fetch, clock=lambda: clock[0])

        async def go():
            a = await lk.lookup("tok")
            b = await lk.lookup("tok")  # cached
            clock[0] += 61.0  # TTL is 60 s
            c = await lk.lookup("tok")  # refetched
            return a, b, c

        a, b, c = run(go())
        assert a.tenant_id == b.tenant_id == c.tenant_id == 5
        assert calls == ["tok", "tok"]

    def test_negative_results_cached(self):
        calls = []

        async def fetch(token):
            calls.append(token)
            return None

        lk = WebhookKeyLookup(fetch, clock=lambda: 0.0)

        async def go():
            assert await lk.lookup("bad") is None
            assert await lk.lookup("bad") is None

        run(go())
        assert calls == ["bad"]  # unknown keys don't hammer the webhook

    def test_cache_overflow_clears(self):
        async def fetch(token):
            return None

        lk = WebhookKeyLookup(fetch, clock=lambda: 0.0)
        lk.MAX_CACHE = 4

        async def go():
            for i in range(6):
                await lk.lookup(f"t{i}")

        run(go())
        assert len(lk._cache) <= 4 + 1  # clear-on-overflow


class TestTokenBucket:
    def test_burst_then_refill(self):
        clock = [0.0]
        tb = InMemoryTokenBucket(rate=10.0, burst=2.0, clock=lambda: clock[0])

        async def go():
            a = await tb.check(1)
            b = await tb.check(1)
            c = await tb.check(1)  # burst exhausted
            clock[0] += 0.2  # 2 tokens refill at 10/s
            d = await tb.check(1)
            return a, b, c, d

        a, b, c, d = run(go())
        assert a.allowed and b.allowed and not c.allowed and d.allowed
        assert c.retry_after_ms > 0

    def test_tenants_independent(self):
        tb = InMemoryTokenBucket(rate=10.0, burst=1.0, clock=lambda: 0.0)

        async def go():
            a = await tb.check(1)
            b = await tb.check(2)
            return a, b

        a, b = run(go())
        assert a.allowed and b.allowed

    def test_idle_eviction(self):
        clock = [0.0]
        tb = InMemoryTokenBucket(rate=10.0, burst=1.0, clock=lambda: clock[0])

        async def go():
            await tb.check(1)
            clock[0] += 4000.0  # past IDLE_EVICT + sweep interval
            await tb.check(2)  # triggers the sweep

        run(go())
        assert 1 not in tb._buckets


class TestWebhookSinks:
    def test_usage_batches_and_retries(self):
        posted = []
        fails = [2]  # fail the first two posts

        async def post(batch):
            if fails[0] > 0:
                fails[0] -= 1
                raise ConnectionError("transient")
            posted.append(list(batch))

        async def go():
            sink = WebhookUsageSink(post, backoff_base=0.001)
            for i in range(3):
                await sink.record(UsageEvent(tenant_id=0, key_id="k",
                                             op=UsageOp.INGEST, units=i))
            await sink.close()

        run(go())
        assert sum(len(b) for b in posted) == 3  # retried, nothing lost

    def test_usage_drops_after_max_retries(self):
        attempts = [0]

        async def post(batch):
            attempts[0] += 1
            raise ConnectionError("down")

        async def go():
            sink = WebhookUsageSink(post, backoff_base=0.0001)
            await sink.record(UsageEvent(tenant_id=0, key_id="k",
                                         op=UsageOp.QUERY))
            await sink.close()

        run(go())
        assert attempts[0] == WebhookUsageSink.MAX_RETRIES  # then dropped

    def test_webhook_ratelimiter_delegates(self):
        async def fetch(tenant, rate_class):
            return RateDecision(allowed=tenant != 9, retry_after_ms=500)

        rl = WebhookRateLimiter(fetch)

        async def go():
            return await rl.check(1), await rl.check(9)

        ok, denied = run(go())
        assert ok.allowed and not denied.allowed


class TestWebhookUsageBound:
    def test_queue_bounded_drops_oldest(self):
        import asyncio

        from ucfp_tpu.server.usage import UsageEvent, UsageOp, WebhookUsageSink

        async def go():
            never = asyncio.Event()

            async def post(batch):
                await never.wait()  # webhook hangs forever

            sink = WebhookUsageSink(post, backoff_base=0.01)
            sink.MAX_QUEUE = 50
            for i in range(200):
                await sink.record(UsageEvent(
                    tenant_id=0, key_id="k", op=UsageOp.QUERY,
                    bytes_in=i, units=1, elapsed_ms=0.0, status=200,
                    ts=i,
                ))
            assert sink._queue.qsize() <= 51
            assert sink.dropped >= 149
            never.set()

        asyncio.run(go())
