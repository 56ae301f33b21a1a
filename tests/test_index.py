"""Index layer tests: BM25 engine, device knn kernels, embedded backend.

Mirrors the reference's unit tiers (src/index/embedded/bm25.rs:653-785 and
src/index/embedded/mod.rs:497-633): tokenize, tf ranking, tenant isolation,
delete, re-upsert replacement, upsert/knn round trip, missing-embedding
skip, WAL durability.
"""

import asyncio

import numpy as np
import pytest

from ucfp_tpu.core import Hit, HitSource, Modality, Query, Record, RecordNotFound
from ucfp_tpu.index.bm25 import Bm25Engine, tokenize
from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.matcher import Matcher, rrf, rrf_with_sources
from ucfp_tpu.ops import knn as knn_ops


def run(coro):
    return asyncio.run(coro)


def rec(tid, rid, emb=None, text=None, algo="test-v1", fp=b"\x01\x02\x03\x04"):
    return Record(
        tenant_id=tid,
        record_id=rid,
        modality=Modality.TEXT,
        algorithm=algo,
        fingerprint=fp,
        embedding=emb,
        text=text,
    )


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


class TestBm25:
    def test_tokenize(self):
        assert tokenize("Hello, World! foo_bar 42") == [
            "hello",
            "world",
            "foo",
            "bar",
            "42",
        ]

    def test_tf_ranking(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "apple apple apple banana")
        e.upsert_one(0, 2, "apple banana banana")
        e.upsert_one(0, 3, "cherry")
        res = e.search(0, ["apple"], 10)
        assert [d for d, _ in res][0] == 1  # higher tf wins
        assert {d for d, _ in res} == {1, 2}

    def test_multi_term(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "apple banana")
        e.upsert_one(0, 2, "apple")
        res = e.search(0, ["apple", "banana"], 10)
        assert res[0][0] == 1  # matches both terms

    def test_tenant_isolation(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "secret data")
        e.upsert_one(1, 2, "other tenant")
        assert e.search(1, ["secret"], 10) == []
        assert [d for d, _ in e.search(0, ["secret"], 10)] == [1]

    def test_unknown_term(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "hello")
        assert e.search(0, ["zzz"], 10) == []

    def test_delete(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "hello world")
        e.clear_one(0, 1)
        assert e.search(0, ["hello"], 10) == []
        assert e.stats(0)["doc_count"] == 0

    def test_reupsert_replaces(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "apple apple")
        e.upsert_one(0, 1, "banana")
        assert e.search(0, ["apple"], 10) == []
        assert [d for d, _ in e.search(0, ["banana"], 10)] == [1]

    def test_empty_text_removes(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "hello")
        e.upsert_one(0, 1, None)
        assert e.search(0, ["hello"], 10) == []

    def test_explain_contributions(self):
        e = Bm25Engine()
        e.upsert_one(0, 1, "apple banana apple")
        res = e.search_explain(0, ["apple banana"], 5)
        assert len(res) == 1
        _, score, ths = res[0]
        assert len(ths) == 2
        assert abs(sum(t.contribution for t in ths) - score) < 1e-9
        by_term = {t.term: t for t in ths}
        assert by_term["apple"].tf == 2 and by_term["banana"].tf == 1


# ---------------------------------------------------------------------------
# Device knn kernels
# ---------------------------------------------------------------------------


class TestKnnKernels:
    def test_cosine_matches_numpy(self):
        rng = np.random.default_rng(0)
        mat = rng.normal(size=(100, 16)).astype(np.float32)
        q = rng.normal(size=(1, 16)).astype(np.float32)
        valid = np.ones(100, bool)
        scores, idx = knn_ops.cosine_topk(q, mat, valid, 5)
        ref = (q @ mat.T) / (
            np.linalg.norm(q) * np.linalg.norm(mat, axis=1)[None, :]
        )
        order = np.argsort(-ref[0])[:5]
        np.testing.assert_array_equal(np.asarray(idx[0]), order)
        np.testing.assert_allclose(np.asarray(scores[0]), ref[0][order], rtol=1e-5)

    def test_cosine_skips_invalid_and_zero_norm(self):
        mat = np.eye(4, dtype=np.float32)
        mat[2] = 0.0  # zero-norm row
        valid = np.array([True, True, True, False])
        q = np.array([[1.0, 0, 0, 0]], np.float32)
        scores, idx = knn_ops.cosine_topk(q, mat, valid, 4)
        s = np.asarray(scores[0])
        finite = s[np.isfinite(s)]
        assert len(finite) == 2  # rows 0 and 1 only

    def test_hamming(self):
        db = np.array(
            [[0b1111, 0], [0b1010, 0], [0, 0]], dtype=np.uint32
        )
        q = np.array([[0b1111, 0]], np.uint32)
        valid = np.ones(3, bool)
        dist, idx = knn_ops.hamming_topk(q, db, valid, 3)
        d = dict(zip(np.asarray(idx[0]).tolist(), np.asarray(dist[0]).tolist()))
        assert d == {0: 0, 1: 2, 2: 4}

    def test_pack_bits(self):
        words = knn_ops.pack_bits_to_u32(b"\x01\x00\x00\x00\xff")
        assert words.dtype == np.uint32
        assert words.tolist() == [1, 0xFF]


# ---------------------------------------------------------------------------
# Embedded backend
# ---------------------------------------------------------------------------


class TestEmbeddedBackend:
    def test_upsert_knn_round_trip(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(
            b.upsert(
                [
                    rec(0, 1, emb=[1.0, 0.0]),
                    rec(0, 2, emb=[0.0, 1.0]),
                    rec(0, 3, emb=[0.7, 0.7]),
                ]
            )
        )
        hits = run(b.knn(0, [1.0, 0.0], 2))
        assert [h.record_id for h in hits] == [1, 3]
        assert hits[0].score == pytest.approx(1.0)

    def test_tenant_isolation(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0]), rec(7, 2, emb=[1.0, 0.0])]))
        hits = run(b.knn(7, [1.0, 0.0], 10))
        assert [h.record_id for h in hits] == [2]

    def test_delete(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0], text="hello")]))
        run(b.delete(0, [1]))
        assert run(b.knn(0, [1.0, 0.0], 10)) == []
        assert run(b.bm25(0, ["hello"], 10)) == []
        with pytest.raises(RecordNotFound):
            run(b.get_record_metadata(0, 1))

    def test_missing_embedding_skipped(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1), rec(0, 2, emb=[1.0, 0.0])]))
        hits = run(b.knn(0, [1.0, 0.0], 10))
        assert [h.record_id for h in hits] == [2]

    def test_dim_mismatch_skipped(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0, 0.0]), rec(0, 2, emb=[1.0, 0.0])]))
        hits = run(b.knn(0, [1.0, 0.0], 10))
        assert [h.record_id for h in hits] == [2]

    def test_zero_query_empty(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0])]))
        assert run(b.knn(0, [0.0, 0.0], 10)) == []
        assert run(b.knn(0, [], 10)) == []

    def test_bm25_via_upsert(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, text="the quick brown fox")]))
        hits = run(b.bm25(0, ["quick"], 10))
        assert [h.record_id for h in hits] == [1]
        assert hits[0].source is HitSource.BM25

    def test_metadata(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0], algo="phash-v1", fp=b"12345678")]))
        m = run(b.get_record_metadata(0, 1))
        assert m.algorithm == "phash-v1"
        assert m.fingerprint_bytes == 8
        assert m.has_embedding

    def test_wal_replay(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0], text="persist me")]))
        run(b.upsert([rec(0, 2, emb=[0.0, 1.0])]))
        run(b.delete(0, [2]))
        b.close()
        b2 = EmbeddedBackend(str(tmp_path))
        hits = run(b2.knn(0, [1.0, 0.0], 10))
        assert [h.record_id for h in hits] == [1]
        assert [h.record_id for h in run(b2.bm25(0, ["persist"], 10))] == [1]
        with pytest.raises(RecordNotFound):
            run(b2.get_record_metadata(0, 2))

    def test_compact_then_replay(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, i, emb=[float(i), 1.0]) for i in range(1, 6)]))
        run(b.delete(0, [3]))
        b.compact()
        b.close()
        b2 = EmbeddedBackend(str(tmp_path))
        hits = run(b2.knn(0, [1.0, 0.0], 10))
        assert 3 not in [h.record_id for h in hits]
        assert len(hits) == 4

    def test_reupsert_replaces_vector(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0])]))
        run(b.upsert([rec(0, 1, emb=[0.0, 1.0])]))
        hits = run(b.knn(0, [0.0, 1.0], 10))
        assert len(hits) == 1 and hits[0].score == pytest.approx(1.0)

    def test_incremental_device_sync_matches_rebuild(self, tmp_path):
        """Interleaved writes/queries exercise the scatter-update device
        sync (including the MAX_PENDING fallback); results must match a
        cold rebuild at every step."""
        import math

        b = EmbeddedBackend(str(tmp_path / "a"))

        def vec(i):
            th = i * 0.01
            return [math.cos(th), math.sin(th)]

        run(b.upsert([rec(0, i, emb=vec(i)) for i in range(50)]))
        run(b.knn(0, vec(3), 1))  # build the device cache
        # updates, removals, inserts — queried between batches
        for step in range(4):
            run(b.upsert([rec(0, i, emb=vec(i + 1000)) for i in range(step * 5, step * 5 + 5)]))
            run(b.delete(0, [40 + step]))
            run(b.upsert([rec(0, 100 + step, emb=vec(100 + step))]))
            hits = run(b.knn(0, vec(100 + step), 1))
            assert hits[0].record_id == 100 + step
        # exceed MAX_PENDING to force the bulk fallback
        run(b.upsert([rec(0, 200 + i, emb=vec(200 + i)) for i in range(300)]))
        got = run(b.knn(0, vec(250), 3))
        # cold rebuild reference
        b2 = EmbeddedBackend(str(tmp_path / "a") + "-rebuild")
        import shutil

        b.close()
        shutil.copytree(str(tmp_path / "a"), str(tmp_path / "c"))
        b3 = EmbeddedBackend(str(tmp_path / "c"))
        want = run(b3.knn(0, vec(250), 3))
        assert [(h.record_id, round(h.score, 6)) for h in got] == [
            (h.record_id, round(h.score, 6)) for h in want
        ]

    def test_hamming_fingerprint_knn(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(
            b.upsert(
                [
                    rec(0, 1, algo="phash-v1", fp=(0xFF).to_bytes(8, "little")),
                    rec(0, 2, algo="phash-v1", fp=(0xF0).to_bytes(8, "little")),
                    rec(0, 3, algo="phash-v1", fp=(0x00).to_bytes(8, "little")),
                ]
            )
        )
        hits = run(b.knn_fingerprint(0, "phash-v1", (0xFF).to_bytes(8, "little"), 2))
        assert [h.record_id for h in hits] == [1, 2]
        assert hits[0].score == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# RRF + Matcher
# ---------------------------------------------------------------------------


class TestBatchedApply:
    """The vectorized batch apply (_apply_upsert_batch) must be
    indistinguishable from the per-record path — same stored metadata,
    same fingerprint knn, same delete/re-upsert behavior afterwards."""

    @staticmethod
    def _img_recs(tid, rids, algo="phash-v1", width=8):
        return [
            Record(tenant_id=tid, record_id=r, modality=Modality.IMAGE,
                   algorithm=algo,
                   fingerprint=r.to_bytes(width, "little"),
                   config_hash=42, metadata=b"m%d" % r)
            for r in rids
        ]

    def test_equivalent_to_per_record(self, tmp_path):
        fast = EmbeddedBackend(str(tmp_path / "fast"))
        slow = EmbeddedBackend(str(tmp_path / "slow"))
        recs = self._img_recs(0, list(range(1, 40)))
        run(fast.upsert(recs))  # one batch: vectorized path
        for r in recs:  # singles: per-record path
            run(slow.upsert([r]))
        q = (7).to_bytes(8, "little")
        hf = run(fast.knn_fingerprint(0, "phash-v1", q, 5))
        hs = run(slow.knn_fingerprint(0, "phash-v1", q, 5))
        assert [(h.record_id, h.score) for h in hf] == \
               [(h.record_id, h.score) for h in hs]
        mf = run(fast.get_record_metadata(0, 3))
        ms = run(slow.get_record_metadata(0, 3))
        assert mf == ms

    def test_delete_and_reupsert_after_batch(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        recs = self._img_recs(0, list(range(1, 20)))
        run(b.upsert(recs))
        run(b.delete(0, [5, 19]))  # swap-with-last over bulk rows
        q = (5).to_bytes(8, "little")
        hits = run(b.knn_fingerprint(0, "phash-v1", q, 3))
        assert 5 not in [h.record_id for h in hits]
        # re-upsert an existing rid: batch path must decline (not new)
        # and the per-record path must replace in place
        run(b.upsert(self._img_recs(0, [7, 8])))
        hits = run(b.knn_fingerprint(0, "phash-v1",
                                     (7).to_bytes(8, "little"), 1))
        assert hits[0].record_id == 7 and hits[0].score == 1.0

    def test_mixed_batch_falls_back(self, tmp_path):
        """Mixed algorithms / embeddings / duplicate rids inside one
        batch take the per-record path and still land correctly."""
        b = EmbeddedBackend(str(tmp_path))
        mixed = self._img_recs(0, [1, 2]) + [
            rec(0, 3, emb=[1.0, 0.0]),
            Record(tenant_id=0, record_id=4, modality=Modality.IMAGE,
                   algorithm="dhash-v1", fingerprint=b"\x01" * 8),
        ]
        run(b.upsert(mixed))
        assert run(b.get_record_metadata(0, 4)).algorithm == "dhash-v1"
        assert [h.record_id for h in run(b.knn(0, [1.0, 0.0], 1))] == [3]
        dup = self._img_recs(0, [9, 9])  # last write wins, per-record
        dup[1] = Record(tenant_id=0, record_id=9, modality=Modality.IMAGE,
                        algorithm="phash-v1", fingerprint=b"\xff" * 8)
        run(b.upsert(dup))
        assert run(b.get_record_metadata(0, 9)).fingerprint_bytes == 8

    def test_batch_survives_restart(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert(self._img_recs(2, [1, 2, 3])))
        b.close()
        b2 = EmbeddedBackend(str(tmp_path))
        q = (2).to_bytes(8, "little")
        hits = run(b2.knn_fingerprint(2, "phash-v1", q, 1))
        assert hits[0].record_id == 2 and hits[0].score == 1.0

    def test_upsert_many_grows_capacity(self, tmp_path):
        from ucfp_tpu.index.embedded import _RowCache

        c = _RowCache(width=2, dtype=np.uint32)
        c.upsert(9999, np.array([1, 2], np.uint32))
        c.upsert_many(list(range(2000)),
                      np.tile(np.array([3, 4], np.uint32), (2000, 1)))
        assert c.n == 2001
        assert c.data.shape[0] >= 2001
        assert c.rows[1999] == 2000
        assert list(c.data[c.rows[9999]]) == [1, 2]
        assert list(c.data[c.rows[1500]]) == [3, 4]
        # growth invalidates incremental sync: full re-upload flagged
        assert c.dirty


def hit(rid, score, source=HitSource.VECTOR):
    return Hit(record_id=rid, score=score, source=source)


class TestRrf:
    def test_breakdown_on_overlap(self):
        vec = [hit(1, 0.9), hit(2, 0.8)]
        bm = [hit(2, 5.0, HitSource.BM25), hit(3, 4.0, HitSource.BM25)]
        fused = rrf_with_sources([vec, bm], [HitSource.VECTOR, HitSource.BM25], 60)
        by_id = {h.record_id: h for h in fused}
        # doc 2 appears in both: rank 2 in vec, rank 1 in bm25
        assert by_id[2].vector_score == pytest.approx(1 / 62)
        assert by_id[2].bm25_score == pytest.approx(1 / 61)
        assert by_id[2].score == pytest.approx(1 / 62 + 1 / 61)
        assert by_id[2].vector_rank == 2 and by_id[2].bm25_rank == 1
        assert fused[0].record_id == 2  # highest fused score
        assert by_id[1].bm25_score is None

    def test_legacy_equiv(self):
        vec = [hit(1, 0.9), hit(2, 0.8)]
        bm = [hit(2, 5.0, HitSource.BM25)]
        a = rrf([vec, bm], 60)
        b = rrf_with_sources([vec, bm], [], 60)
        assert [(h.record_id, h.score) for h in a] == [
            (h.record_id, h.score) for h in b
        ]


class TestMatcher:
    def test_hybrid_search(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(
            b.upsert(
                [
                    rec(0, 1, emb=[1.0, 0.0], text="apple pie recipe"),
                    rec(0, 2, emb=[0.9, 0.1], text="banana bread"),
                    rec(0, 3, emb=[0.0, 1.0], text="apple cider"),
                ]
            )
        )
        m = Matcher(b)
        q = Query(0, Modality.TEXT, k=3, vector=[1.0, 0.0], terms=["apple"], explain=True)
        hits = run(m.search(q))
        assert hits[0].source is HitSource.FUSED
        # doc 1 is rank 1 in vector and matches "apple" -> top
        assert hits[0].record_id == 1
        assert hits[0].term_hits is not None

    def test_vector_only(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, emb=[1.0, 0.0])]))
        hits = run(Matcher(b).search(Query(0, Modality.TEXT, k=5, vector=[1.0, 0.0])))
        assert [h.record_id for h in hits] == [1]
        assert hits[0].source is HitSource.VECTOR

    def test_terms_only(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, text="hello world")]))
        hits = run(Matcher(b).search(Query(0, Modality.TEXT, k=5, terms=["hello"])))
        assert [h.record_id for h in hits] == [1]

    def test_empty_query(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        assert run(Matcher(b).search(Query(0, Modality.TEXT, k=5))) == []


class TestDeferredRidMapping:
    """The query paths defer index->rid mapping to after the kernel
    (no O(catalog) rid-list copy under the lock); the cache's move
    generation must make that mapping exact under racing deletes."""

    def test_rowcache_gen_bumps_only_on_moves(self):
        from ucfp_tpu.index.embedded import _RowCache

        c = _RowCache(width=4)
        g0 = c.gen
        c.upsert(1, np.ones(4, np.float32))
        c.upsert(2, np.ones(4, np.float32))
        c.upsert(1, np.zeros(4, np.float32))  # in-place update
        c.upsert_many([3, 4], np.ones((2, 4), np.float32))
        assert c.gen == g0  # appends/in-place updates never move rows
        c.remove(1)
        assert c.gen == g0 + 1
        c.remove(99)  # absent rid: nothing moved
        assert c.gen == g0 + 1

    def test_knn_rids_exact_under_racing_deletes(self, tmp_path):
        """Plant near-orthogonal vectors so each query's top-1 rid is
        deterministic; race deletes of OTHER rids. A wrong deferred
        mapping (reading a moved rid slot) would surface a different
        record id for the top-1 hit."""
        import asyncio

        d = 32
        n = 400
        b = EmbeddedBackend(str(tmp_path))
        vecs = np.zeros((n, d), np.float32)
        for i in range(n):
            vecs[i, i % d] = 1.0
            vecs[i, (i * 7 + 1) % d] = 0.25 + (i % 13) / 64.0
        run(b.upsert([rec(0, i, emb=[float(x) for x in vecs[i]])
                      for i in range(n)]))
        keep = [3, 57, 123, 399]
        doomed = [i for i in range(n) if i not in keep]

        async def go():
            async def deleter():
                for lo in range(0, len(doomed), 16):
                    await b.delete(0, doomed[lo:lo + 16])
                    await asyncio.sleep(0)

            async def querier():
                for _ in range(40):
                    for i in keep:
                        hits = await b.knn(
                            0, [float(x) for x in vecs[i]], 1
                        )
                        assert hits and hits[0].record_id == i, \
                            f"query {i} mapped to {hits[0].record_id if hits else None}"
                    await asyncio.sleep(0)

            await asyncio.gather(deleter(), querier())

        run(go())
        b.close()

    def test_fingerprint_batch_rids_exact_under_racing_deletes(self, tmp_path):
        import asyncio

        b = EmbeddedBackend(str(tmp_path))
        n = 300
        fps = [bytes([(i >> 8) & 0xFF, i & 0xFF] * 4) for i in range(n)]
        run(b.upsert([rec(0, i, fp=fps[i]) for i in range(n)]))
        keep = [1, 111, 299]
        doomed = [i for i in range(n) if i not in keep]

        async def go():
            async def deleter():
                for lo in range(0, len(doomed), 24):
                    await b.delete(0, doomed[lo:lo + 24])
                    await asyncio.sleep(0)

            async def querier():
                for _ in range(30):
                    res = await b.knn_fingerprint_batch(
                        0, "test-v1", [fps[i] for i in keep], 1
                    )
                    for want, row in zip(keep, res):
                        assert row and row[0].record_id == want
                    await asyncio.sleep(0)

            await asyncio.gather(deleter(), querier())

        run(go())
        b.close()

    def test_all_invalid_fingerprint_batch_short_circuits(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([rec(0, 1, fp=b"\x01" * 8)]))
        res = run(b.knn_fingerprint_batch(
            0, "test-v1", [b"", b"\x01" * 3], 5))
        assert res == [[], []]
        b.close()


class TestMarkerKkInvariance:
    def test_marker_gates_on_effective_k(self, tmp_path, monkeypatch):
        """knn_is_approximate must depend on kk = min(k, n) exactly like
        the dispatch: after deletes shrink n below the request k, a
        request with huge k must get the SAME marker as k = n (the
        dispatch serves the same path for both)."""
        monkeypatch.setenv("UCFP_SHARD", "off")
        for quant in ("int4", "int2", "sketch"):
            b = EmbeddedBackend(str(tmp_path) + quant, knn_quant=quant)
            rng = np.random.default_rng(7)
            run(b.upsert([
                rec(0, i, emb=[float(x) for x in rng.normal(size=16)])
                for i in range(600)
            ]))
            n = b._vec[(0, 16)].n
            for k in (n + 1, 5 * n, 10):
                assert b.knn_is_approximate(0, 16, k) == \
                    b.knn_is_approximate(0, 16, min(k, n)), (quant, k)
            b.close()


class TestColumnarFpBatch:
    """upsert_fingerprint_batch (columnar fast path) must be
    indistinguishable from upsert() of the corresponding Records:
    identical catalog rows, query results, WAL replay — and identical
    fallback semantics for every non-qualifying batch."""

    def _fps(self, n, flen=8, seed=3):
        rng = np.random.default_rng(seed)
        return [rng.integers(0, 256, flen, np.uint8).tobytes()
                for _ in range(n)]

    def test_equivalent_state_and_replay(self, tmp_path):
        fps = self._fps(32)
        rids = list(range(100, 132))
        a = EmbeddedBackend(str(tmp_path / "columnar"))
        run(a.upsert_fingerprint_batch(
            0, "img-v1", rids, fps, modality=Modality.IMAGE,
            config_hash=77))
        b = EmbeddedBackend(str(tmp_path / "records"))
        run(b.upsert([
            Record(tenant_id=0, record_id=rid, modality=Modality.IMAGE,
                   algorithm="img-v1", fingerprint=fp, config_hash=77)
            for rid, fp in zip(rids, fps)
        ]))
        for be in (a, b):
            m = run(be.get_record_metadata(0, 100))
            assert m.algorithm == "img-v1" and m.config_hash == 77
            assert m.modality == Modality.IMAGE
            hits = run(be.knn_fingerprint(0, "img-v1", fps[5], 1))
            assert hits[0].record_id == 105
        a.close(), b.close()
        # replay: reopen the columnar store, verify identical state
        a2 = EmbeddedBackend(str(tmp_path / "columnar"))
        hits = run(a2.knn_fingerprint(0, "img-v1", fps[31], 1))
        assert hits[0].record_id == 131
        assert run(a2.get_record_metadata(0, 117)).fingerprint_bytes == 8
        a2.close()

    def test_update_of_existing_rid_falls_back(self, tmp_path):
        """A batch containing an already-present rid must UPDATE it
        (Record-path semantics), not dup or error."""
        be = EmbeddedBackend(str(tmp_path))
        fps = self._fps(4)
        run(be.upsert_fingerprint_batch(0, "img-v1", [1, 2, 3, 4], fps))
        new = self._fps(2, seed=9)
        run(be.upsert_fingerprint_batch(0, "img-v1", [2, 99], new))
        hits = run(be.knn_fingerprint(0, "img-v1", new[0], 1))
        assert hits[0].record_id == 2 and hits[0].score == 1.0
        # old fingerprint for rid 2 no longer matches exactly
        cache = be._ham[(0, "img-v1")]
        assert cache.n == 5
        be.close()

    def test_dup_rid_in_batch_falls_back(self, tmp_path):
        be = EmbeddedBackend(str(tmp_path))
        fps = self._fps(3)
        run(be.upsert_fingerprint_batch(0, "img-v1", [7, 7, 8], fps))
        # last-write-wins like sequential Record upserts
        hits = run(be.knn_fingerprint(0, "img-v1", fps[1], 1))
        assert hits[0].record_id == 7 and hits[0].score == 1.0
        assert be._ham[(0, "img-v1")].n == 2
        be.close()

    def test_mixed_width_falls_back_to_record_errors(self, tmp_path):
        be = EmbeddedBackend(str(tmp_path))
        # widths differ -> per-record path, which accepts both widths
        run(be.upsert_fingerprint_batch(
            0, "img-v1", [1, 2], [b"\x01" * 8, b"\x02" * 16]))
        assert run(be.get_record_metadata(0, 2)).fingerprint_bytes == 16
        be.close()

    def test_validation_mirrors_record_path(self, tmp_path):
        be = EmbeddedBackend(str(tmp_path))
        with pytest.raises(ValueError):
            run(be.upsert_fingerprint_batch(
                2**32, "img-v1", [1], [b"\x01" * 4]))  # tenant out of u32
        with pytest.raises(ValueError):
            run(be.upsert_fingerprint_batch(
                0, "img-v1", [2**64, 5], [b"\x01" * 4, b"\x02" * 4]))
        with pytest.raises(ValueError):
            run(be.upsert_fingerprint_batch(
                0, "img-v1", [1], [b"\x01" * 4], config_hash=-1))
        be.close()

    def test_trait_default_matches_override(self, tmp_path):
        """The IndexBackend default implementation (Record expansion)
        must produce the same observable state as the columnar
        override."""
        from ucfp_tpu.index.backend import IndexBackend

        be = EmbeddedBackend(str(tmp_path))
        fps = self._fps(6)
        run(IndexBackend.upsert_fingerprint_batch(
            be, 1, "img-v1", [10, 11, 12], fps[:3],
            modality=Modality.IMAGE, config_hash=5))
        run(be.upsert_fingerprint_batch(
            1, "img-v1", [13, 14, 15], fps[3:],
            modality=Modality.IMAGE, config_hash=5))
        for rid, fp in zip(range(10, 16), fps):
            hits = run(be.knn_fingerprint(1, "img-v1", fp, 1))
            assert hits[0].record_id == rid and hits[0].score == 1.0
            assert run(be.get_record_metadata(1, rid)).config_hash == 5
        be.close()


class TestColumnarEmbBatch:
    """upsert_embedding_batch (array-direct bulk vector load) must be
    indistinguishable from upsert() of the corresponding Records:
    identical WAL bytes, catalog rows, query results, filter tags, and
    restart state — and identical fallback semantics for every
    non-qualifying batch."""

    def _mat(self, n, d=6, seed=11):
        rng = np.random.default_rng(seed)
        return rng.normal(size=(n, d)).astype(np.float32)

    def test_equivalent_state_wal_bytes_and_replay(self, tmp_path):
        import os

        mat = self._mat(24)
        rids = list(range(200, 224))
        fps = [bytes([i] * 8) for i in range(24)]
        a = EmbeddedBackend(str(tmp_path / "bulk"))
        run(a.upsert_embedding_batch(
            0, "emb-v1", rids, mat, fingerprints=fps,
            modality=Modality.TEXT, model_id="mm", config_hash=9))
        b = EmbeddedBackend(str(tmp_path / "records"))
        run(b.upsert([
            Record(tenant_id=0, record_id=rid, modality=Modality.TEXT,
                   algorithm="emb-v1", fingerprint=fp, config_hash=9,
                   embedding=mat[i].tolist(), model_id="mm")
            for i, (rid, fp) in enumerate(zip(rids, fps))
        ]))
        # the WAL bytes are identical: the run encoder is a constructor
        # for the same wire format, not a new one
        wa = open(os.path.join(str(tmp_path / "bulk"), "ucfp.wal"), "rb").read()
        wb = open(os.path.join(str(tmp_path / "records"), "ucfp.wal"), "rb").read()
        assert wa == wb
        for be in (a, b):
            m = run(be.get_record_metadata(0, 205))
            assert m.has_embedding and m.model_id == "mm"
            hits = run(be.knn(0, mat[5].tolist(), 1))
            assert hits[0].record_id == 205
            hits = run(be.knn(0, mat[5].tolist(), 1,
                              filter={"algorithm": "emb-v1",
                                      "model_id": "mm"}))
            assert hits[0].record_id == 205
            assert run(be.knn(0, mat[5].tolist(), 1,
                              filter={"algorithm": "emb-v1",
                                      "model_id": "nope"})) == []
            hf = run(be.knn_fingerprint(0, "emb-v1", fps[3], 1))
            assert hf[0].record_id == 203 and hf[0].score == 1.0
        a.close(), b.close()
        # reopen rides the columnar emb-run replay; state must match
        a2 = EmbeddedBackend(str(tmp_path / "bulk"))
        assert run(a2.knn(0, mat[17].tolist(), 1))[0].record_id == 217
        assert run(a2.knn(0, mat[17].tolist(), 1,
                          filter={"algorithm": "emb-v1",
                                  "model_id": "mm"}))[0].record_id == 217
        got = a2.get_record(0, 212)
        assert np.asarray(got["embedding"], np.float32).tolist() == \
            mat[12].tolist()
        assert got["model_id"] == "mm" and bytes(got["fingerprint"]) == fps[12]
        a2.close()

    def test_derived_fingerprints_are_f32_rows(self, tmp_path):
        """fingerprints=None derives each row's f32-LE bytes — the
        representation fingerprint_semantic() records carry."""
        mat = self._mat(8, d=4)
        be = EmbeddedBackend(str(tmp_path))
        run(be.upsert_embedding_batch(1, "emb-v1", list(range(8)), mat))
        row = be.get_record(1, 3)
        assert bytes(row["fingerprint"]) == mat[3].tobytes()
        be.close()

    def test_update_of_existing_rid_falls_back(self, tmp_path):
        be = EmbeddedBackend(str(tmp_path))
        mat = self._mat(4)
        run(be.upsert_embedding_batch(0, "emb-v1", [1, 2, 3, 4], mat))
        new = self._mat(2, seed=5)
        run(be.upsert_embedding_batch(0, "emb-v1", [2, 99], new))
        hits = run(be.knn(0, new[0].tolist(), 1))
        assert hits[0].record_id == 2
        assert be._vec[(0, 6)].n == 5
        be.close()

    def test_special_algorithm_falls_back(self, tmp_path):
        from ucfp_tpu.index.embedded import HAITSMA_ALGORITHM

        be = EmbeddedBackend(str(tmp_path))
        mat = self._mat(3, d=2)
        fps = [bytes(range(4))] * 3  # 4-byte streams: haitsma-cacheable
        run(be.upsert_embedding_batch(
            0, HAITSMA_ALGORITHM, [1, 2, 3], mat, fingerprints=fps))
        # per-record semantics: the haitsma stream cache is populated
        assert be._haitsma[0].n == 3
        assert run(be.knn(0, mat[1].tolist(), 1))[0].record_id == 2
        be.close()

    def test_nonfinite_raises_and_applies_nothing(self, tmp_path):
        be = EmbeddedBackend(str(tmp_path))
        mat = self._mat(3)
        mat[1, 2] = np.nan
        with pytest.raises(ValueError):
            run(be.upsert_embedding_batch(0, "emb-v1", [1, 2, 3], mat))
        for rid in (1, 2, 3):
            with pytest.raises(RecordNotFound):
                be.get_record(0, rid)
        be.close()

    def test_generic_upsert_batch_equals_per_record(self, tmp_path,
                                                    monkeypatch):
        """upsert() of a uniform embedding batch (vectorized validate +
        apply) must produce exactly the per-record path's state."""
        fast = EmbeddedBackend(str(tmp_path / "fast"))
        slow = EmbeddedBackend(str(tmp_path / "slow"))
        monkeypatch.setattr(
            type(slow), "_apply_upsert_batch",
            lambda self, recs, emb_mat=None: False)
        mat = self._mat(16, d=5)
        recs = [
            Record(tenant_id=2, record_id=i, modality=Modality.TEXT,
                   algorithm="emb-v1", fingerprint=b"\x05" * 4,
                   embedding=mat[i].tolist(), model_id="m")
            for i in range(16)
        ]
        run(fast.upsert(list(recs)))
        run(slow.upsert(list(recs)))
        for rid in (0, 7, 15):
            ra, rb = fast.get_record(2, rid), slow.get_record(2, rid)
            assert np.array_equal(ra["embedding"], rb["embedding"])
            assert {k: v for k, v in ra.items() if k != "embedding"} == \
                {k: v for k, v in rb.items() if k != "embedding"}
        ha = run(fast.knn(2, mat[7].tolist(), 3,
                          filter={"algorithm": "emb-v1", "model_id": "m"}))
        hb = run(slow.knn(2, mat[7].tolist(), 3,
                          filter={"algorithm": "emb-v1", "model_id": "m"}))
        assert [(h.record_id, h.score) for h in ha] == \
            [(h.record_id, h.score) for h in hb]
        fast.close(), slow.close()
