"""Deadline batcher tests: size-triggered flush, deadline flush, ordering,
error propagation, bucket isolation."""

import asyncio

import pytest

from ucfp_tpu.ingest.batcher import DeadlineBatcher


def run(coro):
    return asyncio.run(coro)


class TestBatcher:
    def test_size_triggered_flush(self):
        batches = []

        async def runner(bucket, payloads):
            batches.append(list(payloads))
            return [p * 10 for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=4, max_delay_ms=10_000)
            results = await asyncio.gather(*(b.submit("x", i) for i in range(4)))
            return results

        results = run(go())
        assert sorted(results) == [0, 10, 20, 30]
        assert len(batches) == 1 and len(batches[0]) == 4

    def test_deadline_flush(self):
        async def runner(bucket, payloads):
            return [p + 1 for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=100, max_delay_ms=5)
            return await asyncio.wait_for(b.submit("x", 41), timeout=2.0)

        assert run(go()) == 42

    def test_result_order_matches_submit_order(self):
        async def runner(bucket, payloads):
            return [f"{bucket}:{p}" for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=3, max_delay_ms=10_000)
            return await asyncio.gather(*(b.submit("b", i) for i in range(3)))

        assert run(go()) == ["b:0", "b:1", "b:2"]

    def test_buckets_are_isolated(self):
        batches = []

        async def runner(bucket, payloads):
            batches.append((bucket, list(payloads)))
            return payloads

        async def go():
            b = DeadlineBatcher(runner, max_batch=2, max_delay_ms=5)
            return await asyncio.gather(
                b.submit("small", 1), b.submit("large", 2), b.submit("small", 3)
            )

        run(go())
        assert sorted(b for b, _ in batches) == ["large", "small"]

    def test_error_propagates_to_all(self):
        async def runner(bucket, payloads):
            raise RuntimeError("device fault")

        async def go():
            b = DeadlineBatcher(runner, max_batch=2, max_delay_ms=10_000)
            return await asyncio.gather(
                b.submit("x", 1), b.submit("x", 2), return_exceptions=True
            )

        r = run(go())
        assert all(isinstance(e, RuntimeError) for e in r)


class TestCancellationSafety:
    def test_cancelled_submitter_does_not_orphan_siblings(self):
        """The submitter that trips the max_batch flush may be cancelled
        (client disconnect) while run_batch is in flight; every other
        future in the batch must still resolve."""
        import asyncio

        from ucfp_tpu.ingest.batcher import DeadlineBatcher

        async def go():
            started = asyncio.Event()
            release = asyncio.Event()

            async def run_batch(bucket, payloads):
                started.set()
                await release.wait()
                return [p * 2 for p in payloads]

            b = DeadlineBatcher(run_batch, max_batch=2, max_delay_ms=10_000)
            t1 = asyncio.create_task(b.submit("k", 1))
            await asyncio.sleep(0.01)
            t2 = asyncio.create_task(b.submit("k", 2))  # trips the flush
            await started.wait()
            t2.cancel()  # the flush-driving submitter dies mid-batch
            release.set()
            assert await asyncio.wait_for(t1, timeout=5) == 2
            with pytest.raises(asyncio.CancelledError):
                await t2

        asyncio.run(go())


class TestWeightedBatcher:
    """weigh= mode: payloads are groups; flush threshold and chunking go
    by total weight (rows), not item count."""

    def test_weight_triggered_flush(self):
        batches = []

        async def runner(bucket, payloads):
            batches.append(list(payloads))
            return [len(p) for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=8, max_delay_ms=10_000,
                                weigh=len)
            # 3 + 5 = 8 trips the weight threshold with only 2 items
            return await asyncio.gather(
                b.submit("x", [0] * 3), b.submit("x", [0] * 5)
            )

        assert run(go()) == [3, 5]
        assert len(batches) == 1 and len(batches[0]) == 2

    def test_weight_chunking_splits_overfull_queue(self):
        batches = []

        async def runner(bucket, payloads):
            batches.append([len(p) for p in payloads])
            return [len(p) for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=4, max_delay_ms=10_000,
                                weigh=len)
            # enqueue under a held lock-free window: deadline far out, so
            # the 4th submit trips the flush with 2+2+2+2 = 8 queued
            return await asyncio.gather(*(
                b.submit("x", [0] * 2) for _ in range(4)
            ))

        assert run(go()) == [2, 2, 2, 2]
        # chunked into weight<=4 launches, never one 8-row launch
        assert all(sum(c) <= 4 for c in batches)
        assert sum(len(c) for c in batches) == 4

    def test_single_overweight_group_still_runs(self):
        async def runner(bucket, payloads):
            return [len(p) for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=4, max_delay_ms=5,
                                weigh=len)
            return await asyncio.wait_for(b.submit("x", [0] * 9), timeout=2)

        assert run(go()) == 9

    def test_weight_resets_after_flush(self):
        batches = []

        async def runner(bucket, payloads):
            batches.append([len(p) for p in payloads])
            return [len(p) for p in payloads]

        async def go():
            b = DeadlineBatcher(runner, max_batch=4, max_delay_ms=10_000,
                                weigh=len)
            r1 = await asyncio.gather(
                b.submit("x", [0] * 2), b.submit("x", [0] * 2))
            # stale accumulated weight would flush the first group of
            # this pair ALONE (4+2 >= 4 on submit); a reset weight
            # coalesces the pair into one flush of [2, 2]
            r2 = await asyncio.wait_for(
                asyncio.gather(b.submit("x", [0] * 2),
                               b.submit("x", [0] * 2)),
                timeout=2,
            )
            return r1 + r2

        assert run(go()) == [2, 2, 2, 2]
        assert batches == [[2, 2], [2, 2]]
