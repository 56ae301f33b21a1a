"""int8-quantized cosine kernel + embedding reranker tests."""

import asyncio

import numpy as np
import pytest

from ucfp_tpu.core import Modality, Query, Record
from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.matcher import Matcher
from ucfp_tpu.ops import knn as knn_ops
from ucfp_tpu.rerank.embedding import EmbeddingReranker


def run(coro):
    return asyncio.run(coro)


class TestInt8Cosine:
    def test_recall_vs_f32(self):
        rng = np.random.default_rng(0)
        c, d, k = 4096, 64, 10
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        valid = np.ones(c, bool)
        q = rng.normal(size=(4, d)).astype(np.float32)
        q8, row_norm = knn_ops.quantize_rows_int8(matrix)
        vals_q, idx_q = knn_ops.cosine_topk_int8(q, q8, row_norm, valid, k)
        vals_f, idx_f = knn_ops.cosine_topk(q, matrix, valid, k)
        # top-10 recall vs the exact kernel should be near-perfect
        for row in range(4):
            inter = len(set(np.asarray(idx_q[row]).tolist())
                        & set(np.asarray(idx_f[row]).tolist()))
            assert inter >= 9
        # scores are cosines (bounded, close to exact)
        np.testing.assert_allclose(
            np.asarray(vals_q), np.asarray(vals_f), atol=0.02
        )

    def test_exact_match_found(self):
        rng = np.random.default_rng(1)
        matrix = rng.normal(size=(512, 32)).astype(np.float32)
        q8, rn = knn_ops.quantize_rows_int8(matrix)
        valid = np.ones(512, bool)
        q = matrix[77:78]
        _, idx = knn_ops.cosine_topk_int8(q, q8, rn, valid, 1)
        assert int(idx[0, 0]) == 77

    def test_zero_row_skipped(self):
        matrix = np.eye(4, dtype=np.float32)
        matrix[2] = 0.0
        q8, rn = knn_ops.quantize_rows_int8(matrix)
        valid = np.ones(4, bool)
        scores, _ = knn_ops.cosine_topk_int8(
            np.array([[1.0, 0, 0, 0]], np.float32), q8, rn, valid, 4
        )
        assert np.isfinite(np.asarray(scores[0])).sum() == 3


class TestKnnBatch:
    def test_matches_single_queries(self, tmp_path):
        import math

        b = EmbeddedBackend(str(tmp_path))
        vec = lambda i: [math.cos(i * 0.05), math.sin(i * 0.05)]
        run(b.upsert([Record(0, i, Modality.TEXT, "e", b"x", embedding=vec(i))
                      for i in range(40)]))
        queries = [vec(3), vec(17), [0.0, 0.0], vec(39)]
        batched = run(b.knn_batch(0, queries, 3))
        assert batched[2] == []  # zero-norm query
        for qi in (0, 1, 3):
            single = run(b.knn(0, queries[qi], 3))
            assert [(h.record_id, round(h.score, 6)) for h in batched[qi]] == [
                (h.record_id, round(h.score, 6)) for h in single
            ]

    def test_int8_fused_batch_path(self, tmp_path):
        """With quantization on and tile-aligned capacity, knn_batch takes
        the GEMM + batched-pallas-reduce path; results must still rank the
        exact match first and respect validity (padding rows)."""
        from ucfp_tpu.ops import pallas_scan

        tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
        b = EmbeddedBackend(str(tmp_path), knn_quant="int8")
        # 32-d random unit vectors: distinct directions survive int8
        # quantization (2-d would collapse to ~256 distinguishable angles)
        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(40_000, 32)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vec = lambda i: [float(x) for x in vecs[i]]
        # capacity doubles in powers of 2 from 1024: inserting 40k rows
        # lands capacity at 65536 = 2 * tile (aligned)
        n = 40_000
        run(b.upsert([Record(0, i, Modality.TEXT, "e", b"x", embedding=vec(i))
                      for i in range(n)]))
        cache = b._vec[(0, 32)]
        assert cache.data.shape[0] % tile == 0  # fused path active
        res = run(b.knn_batch(0, [vec(123), vec(39_000)], 3))
        assert res[0][0].record_id == 123
        assert res[1][0].record_id == 39_000
        # padding rows (invalid) never surface
        for hits in res:
            assert all(h.record_id < n for h in hits)
        # single-query knn takes the same fused GEMV+reduce path here
        single = run(b.knn(0, vec(123), 3))
        assert single[0].record_id == 123
        assert all(h.record_id < n for h in single)
        np.testing.assert_allclose(
            [h.score for h in single], [h.score for h in res[0]], rtol=1e-5
        )

    def test_mixed_dims_rejected(self, tmp_path):
        from ucfp_tpu.core import ModalityError

        b = EmbeddedBackend(str(tmp_path))
        with pytest.raises(ModalityError):
            run(b.knn_batch(0, [[1.0, 0.0], [1.0, 0.0, 0.0]], 3))

    def test_http_batched_query(self, tmp_path):
        import json

        from test_server import call, jbody, make_app

        app, _ = make_app(tmp_path)
        for rid, emb in ((1, [1.0, 0.0]), (2, [0.0, 1.0])):
            call(app, "PUT", "/v1/records", json.dumps(
                {"tenant_id": 0, "record_id": rid, "modality": "text",
                 "algorithm": "e", "fingerprint": [0], "embedding": emb}
            ).encode())
        body = jbody(call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "text", "k": 1,
             "vectors": [[1.0, 0.0], [0.0, 1.0]]}
        ).encode()))
        got = [r["hits"][0]["record_id"] for r in body["results"]]
        assert got == [1, 2]


class TestEmbeddingReranker:
    def test_rescores_by_embedding(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([
            Record(0, 1, Modality.TEXT, "a", b"x", embedding=[1.0, 0.0],
                   text="apple apple apple"),
            Record(0, 2, Modality.TEXT, "a", b"x", embedding=[0.0, 1.0],
                   text="apple"),
        ]))
        m = Matcher(b, EmbeddingReranker(b))
        # BM25 ranks doc 1 first (tf), but the query vector points at doc 2
        q = Query(0, Modality.TEXT, k=2, vector=[0.0, 1.0], terms=["apple"])
        hits = run(m.search(q))
        assert hits[0].record_id == 2
        assert hits[0].score == pytest.approx(1.0)

    def test_missing_embedding_sorts_last(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([
            Record(0, 1, Modality.TEXT, "a", b"x", text="apple"),
            Record(0, 2, Modality.TEXT, "a", b"x", embedding=[0.0, 1.0],
                   text="apple"),
        ]))
        m = Matcher(b, EmbeddingReranker(b))
        q = Query(0, Modality.TEXT, k=2, vector=[0.0, 1.0], terms=["apple"])
        hits = run(m.search(q))
        assert [h.record_id for h in hits] == [2, 1]

    def test_no_vector_noop(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        run(b.upsert([Record(0, 1, Modality.TEXT, "a", b"x", text="apple")]))
        m = Matcher(b, EmbeddingReranker(b))
        hits = run(m.search(Query(0, Modality.TEXT, k=2, terms=["apple"])))
        assert [h.record_id for h in hits] == [1]

    def test_http_rerank_param(self, tmp_path):
        import json

        from test_server import call, jbody, make_app

        app, _ = make_app(tmp_path)
        for rid, emb in ((1, [1.0, 0.0]), (2, [0.0, 1.0])):
            rec = {"tenant_id": 0, "record_id": rid, "modality": "text",
                   "algorithm": "e", "fingerprint": [0], "embedding": emb}
            call(app, "PUT", "/v1/records", json.dumps(rec).encode())
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 2, "vector": [0.0, 1.0]}).encode(),
                          query="rerank=embedding"))
        assert body["hits"][0]["record_id"] == 2


class TestBatchedFingerprintQuery:
    def test_batch_matches_single_and_handles_bad_rows(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        rng = np.random.default_rng(0)
        fps = [rng.integers(0, 256, size=8, dtype=np.uint8).tobytes()
               for _ in range(50)]
        run(b.upsert([Record(0, i, Modality.IMAGE, "phash-64", fps[i])
                      for i in range(50)]))
        batch = run(b.knn_fingerprint_batch(
            0, "phash-64", [fps[7], fps[31], b"", b"\x01\x02"], 3))
        assert batch[0][0].record_id == 7 and batch[0][0].score == 1.0
        assert batch[1][0].record_id == 31
        assert batch[2] == []   # empty fingerprint
        assert batch[3] == []   # width mismatch
        for qi, fp in ((0, fps[7]), (1, fps[31])):
            single = run(b.knn_fingerprint(0, "phash-64", fp, 3))
            assert [(h.record_id, h.score) for h in batch[qi]] == [
                (h.record_id, h.score) for h in single]

    def test_http_batched_fingerprints(self, tmp_path):
        import json

        from test_server import call, jbody, make_app

        app, _ = make_app(tmp_path)
        fp = bytes(range(8))
        call(app, "PUT", "/v1/records", json.dumps(
            {"tenant_id": 0, "record_id": 9, "modality": "image",
             "algorithm": "phash-64", "fingerprint": list(fp)}).encode())
        res = jbody(call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "image", "k": 2,
             "algorithm": "phash-64",
             "fingerprints_hex": [fp.hex(), "ff" * 8]}).encode()))
        assert res["results"][0]["hits"][0]["record_id"] == 9
        assert len(res["results"]) == 2
        # malformed entries -> 400
        r = call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "image", "k": 2,
             "algorithm": "phash-64", "fingerprints_hex": ["zz"]}).encode())
        assert r.status == 400
        r = call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "image", "k": 2,
             "fingerprints_hex": [fp.hex()]}).encode())
        assert r.status == 400  # algorithm required

    def test_batch_size_capped(self, tmp_path):
        import json

        from test_server import call, make_app

        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "image", "k": 1,
             "algorithm": "phash-64",
             "fingerprints_hex": ["00" * 8] * 257}).encode())
        assert r.status == 400
        r = call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "text", "k": 1,
             "vectors": [[1.0, 0.0]] * 257}).encode())
        assert r.status == 400


class TestSketchPrefilter:
    """UCFP_KNN_QUANT=sketch: asymmetric SimHash prefilter + segmented
    candidates + exact int8 rescore (ops/knn.py sketch section)."""

    def test_kernel_matches_int8_when_pool_covers(self):
        # cand >= C: every row is rescored, so results == exact int8
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        C, D = 512, 48
        m = rng.normal(size=(C, D)).astype(np.float32)
        q8, rn = knn_ops.quantize_rows_int8(m)
        planes = jnp.asarray(knn_ops.sketch_planes(D))
        sk = knn_ops.build_sketch_chunked(jnp.asarray(q8), planes)
        valid = jnp.ones(C, bool)
        q = rng.normal(size=D).astype(np.float32)
        se, ie = knn_ops.cosine_topk_int8(
            jnp.asarray(q[None]), jnp.asarray(q8), jnp.asarray(rn), valid, 5)
        ss, isk = knn_ops.cosine_sketch_topk(
            jnp.asarray(q), planes, jnp.asarray(q8), jnp.asarray(rn),
            sk, valid, 5, knn_ops.sketch_candidates(C, 5))
        assert np.asarray(ie[0]).tolist() == np.asarray(isk).tolist()
        np.testing.assert_allclose(np.asarray(se[0]), np.asarray(ss), rtol=1e-6)

    def test_kernel_near_duplicate_recall(self):
        # pool < catalog: planted near-duplicates must surface
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        C, D = 8192, 32
        m = rng.normal(size=(C, D)).astype(np.float32)
        q8, rn = knn_ops.quantize_rows_int8(m)
        planes = jnp.asarray(knn_ops.sketch_planes(D))
        sk = knn_ops.build_sketch_chunked(jnp.asarray(q8), planes)
        valid = jnp.ones(C, bool)
        cand = knn_ops.sketch_candidates(C, 10)
        assert cand < C
        hits = 0
        for row in (7, 999, 5000):
            q = m[row] + 0.05 * rng.normal(size=D).astype(np.float32)
            _, idx = knn_ops.cosine_sketch_topk(
                jnp.asarray(q), planes, jnp.asarray(q8), jnp.asarray(rn),
                sk, valid, 10, cand)
            hits += int(row in np.asarray(idx).tolist())
        assert hits == 3

    def test_backend_sketch_mode(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_SHARD", "off")
        # force the sketch kernel: at this scale the cost model would
        # (correctly) route to the exact scan, but this test exercises
        # the sketch path itself
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(300, 24)).astype(np.float32)
        vec = lambda i: [float(x) for x in vecs[i]]

        bs = EmbeddedBackend(str(tmp_path / "s"), knn_quant="sketch")
        b8 = EmbeddedBackend(str(tmp_path / "i"), knn_quant="int8")
        recs = [Record(0, i, Modality.TEXT, "e", b"x", embedding=vec(i))
                for i in range(300)]
        run(bs.upsert(recs))
        run(b8.upsert(recs))
        # small catalog: pool covers everything -> identical to int8
        hs = run(bs.knn(0, vec(42), 5))
        h8 = run(b8.knn(0, vec(42), 5))
        assert [(h.record_id, round(h.score, 6)) for h in hs] == \
               [(h.record_id, round(h.score, 6)) for h in h8]
        assert hs[0].record_id == 42
        # not approximate while the pool covers the catalog
        assert not bs.knn_is_approximate(0, 24, 5)

        # incremental update rides the scatter path (sketch rows too)
        new = rng.normal(size=24).astype(np.float32)
        run(bs.upsert([Record(0, 7777, Modality.TEXT, "e", b"x",
                              embedding=[float(x) for x in new])]))
        got = run(bs.knn(0, [float(x) for x in new], 1))
        assert got[0].record_id == 7777

    def test_backend_sketch_large_is_marked_approximate(self, tmp_path,
                                                        monkeypatch):
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(4)
        # capacity 8192 -> pool 2048, pool*2 < capacity: the kernel
        # thresholds instead of rescoring exhaustively -> approximate.
        # (At capacity 4096 the pool covers half the rows and the kernel
        # rescores everything exactly — correctly NOT marked.)
        n = 5000
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="sketch")
        run(b.upsert([Record(0, i, Modality.TEXT, "e", b"x",
                             embedding=[float(x) for x in vecs[i]])
                      for i in range(n)]))
        assert b.knn_is_approximate(0, 16, 10)
        # half-full capacity-4096 cache: exhaustive rescore, exact
        b2 = EmbeddedBackend(str(tmp_path / "b2"), knn_quant="sketch")
        run(b2.upsert([Record(0, i, Modality.TEXT, "e", b"x",
                              embedding=[float(x) for x in vecs[i]])
                       for i in range(3000)]))
        assert not b2.knn_is_approximate(0, 16, 10)
        b2.close()
        q = vecs[1234] + 0.03 * rng.normal(size=16).astype(np.float32)
        hits = run(b.knn(0, [float(x) for x in q], 10))
        assert hits[0].record_id == 1234
        # batch path still answers (int8 GEMM fallback under sketch mode)
        res = run(b.knn_batch(0, [[float(x) for x in vecs[50]]], 3))
        assert res[0][0].record_id == 50
        # the batch marker mirrors knn_batch's dispatch: with k > 16 the
        # batch runs the EXACT int8 scan, so it must not be labeled
        # approximate just because the sketch pool is smaller than n
        assert not b.knn_is_approximate(0, 16, 20, batch=True)


class TestTiledSketchScorer:
    def test_tiled_pallas_matches_packed_xla(self):
        """The lane-tiled pallas scan and the whole-array XLA scorer are
        the same function: identical scores for identical inputs (the
        serving caches use the tiled layout; the packed path is the
        small-cache/CPU fallback)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        n, d = 512, 48
        g = rng.normal(size=(n, d)).astype(np.float32)
        q8 = np.clip(np.round(g * 127 / np.abs(g).max(axis=1, keepdims=True)),
                     -127, 127).astype(np.int8)
        planes = jnp.asarray(knn_ops.sketch_planes(d))
        packed = knn_ops.build_sketch_chunked(jnp.asarray(q8), planes)
        tiled = knn_ops.tile_sketch(packed)
        qv = jnp.asarray(rng.normal(size=d).astype(np.float32))
        qsign, masks, wts, cnt, _ = knn_ops.sketch_query_plan(qv, planes)
        s_xla = np.asarray(
            knn_ops.asym_sketch_scores(packed, qsign, masks, wts, cnt))
        s_tiled = np.asarray(
            knn_ops.asym_sketch_scores_tiled(tiled, qsign, masks, wts, cnt))
        np.testing.assert_allclose(s_tiled, s_xla, rtol=1e-5, atol=1e-3)

    def test_tile_roundtrip_layout(self):
        """flat row r*128+lane mapping."""
        import jax.numpy as jnp

        w = knn_ops.SKETCH_WORDS
        packed = jnp.arange(256 * w, dtype=jnp.uint32).reshape(256, w)
        tiled = knn_ops.tile_sketch(packed)
        assert tiled.shape == (2, knn_ops.SKETCH_WORDS, 128)
        # row 130 = tile 1, lane 2
        np.testing.assert_array_equal(
            np.asarray(tiled)[1, :, 2], np.asarray(packed)[130].astype(np.int32)
        )


class TestRecallTier:
    def test_tier_ladder_and_validation(self, tmp_path, monkeypatch):
        import json

        from test_server import call, jbody, make_app

        monkeypatch.setenv("UCFP_KNN_QUANT", "sketch")
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        app, state = make_app(tmp_path)
        rng = np.random.default_rng(2)
        vecs = rng.normal(size=(5000, 16)).astype(np.float32)
        run(state.index.upsert([
            Record(0, i, Modality.TEXT, "e", b"x",
                   embedding=[float(x) for x in vecs[i]])
            for i in range(5000)
        ]))
        q = [float(x) for x in vecs[777]]
        for tier in ("fast", "balanced", "high"):
            body = jbody(call(app, "POST", "/v1/query", json.dumps(
                {"tenant_id": 0, "modality": "text", "k": 3, "vector": q,
                 "recall_tier": tier}).encode()))
            assert body["hits"][0]["record_id"] == 777, tier
        resp = call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "text", "k": 3, "vector": q,
             "recall_tier": "0.5"}).encode())
        assert resp.status == 400

    def test_exact_tier_skips_every_approximate_path(self, tmp_path,
                                                     monkeypatch):
        """recall_tier="exact" must serve the exhaustive kernel — no
        sketch prefilter, no fused partial-reduce — and never carry the
        approximate marker, even at capacities where the default sketch
        dispatch is approximate."""
        import json

        from test_server import call, jbody, make_app

        monkeypatch.setenv("UCFP_KNN_QUANT", "sketch")
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        app, state = make_app(tmp_path)
        rng = np.random.default_rng(3)
        # capacity 8192 -> pool*2 < capacity: default dispatch is the
        # approximate sketch prefilter (marked)
        vecs = rng.normal(size=(5000, 16)).astype(np.float32)
        run(state.index.upsert([
            Record(0, i, Modality.TEXT, "e", b"x",
                   embedding=[float(x) for x in vecs[i]])
            for i in range(5000)
        ]))
        q = [float(x) for x in vecs[777]]
        base = jbody(call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "text", "k": 3, "vector": q}
        ).encode()))
        assert base.get("approximate") is True  # sketch default: marked
        # the sketch kernel must not run at all under the exact tier
        import ucfp_tpu.ops.knn as knn_mod

        def boom(*a, **kw):  # pragma: no cover - failure path
            raise AssertionError("sketch kernel ran under recall_tier=exact")

        monkeypatch.setattr(knn_mod, "cosine_sketch_topk", boom)
        body = jbody(call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "text", "k": 3, "vector": q,
             "recall_tier": "exact"}).encode()))
        assert "approximate" not in body
        assert body["hits"][0]["record_id"] == 777
        # batched vectors under the exact tier: exact int8 GEMM, unmarked
        bb = jbody(call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 0, "modality": "text", "k": 3, "vectors": [q],
             "recall_tier": "exact"}).encode()))
        assert "approximate" not in bb
        assert bb["results"][0]["hits"][0]["record_id"] == 777

    def test_backend_exact_flag_dispatch(self, tmp_path, monkeypatch):
        """EmbeddedBackend.knn(exact=True): marker False, sketch kernel
        skipped, results identical to the exhaustive int8 scan."""
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(12)
        n = 5000
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="sketch")
        run(b.upsert([Record(0, i, Modality.TEXT, "e", b"x",
                             embedding=[float(x) for x in vecs[i]])
                      for i in range(n)]))
        assert b.knn_is_approximate(0, 16, 10)
        assert not b.knn_is_approximate(0, 16, 10, exact=True)
        q = [float(x) for x in vecs[1234]]
        import ucfp_tpu.ops.knn as knn_mod

        def boom(*a, **kw):  # pragma: no cover - failure path
            raise AssertionError("sketch kernel ran under exact=True")

        monkeypatch.setattr(knn_mod, "cosine_sketch_topk", boom)
        hits = run(b.knn(0, q, 5, exact=True))
        assert hits[0].record_id == 1234
        # identical to the exhaustive kernel called directly
        ref = run(b.knn_batch(0, [q], 5, exact=True))[0]
        assert [h.record_id for h in hits] == [h.record_id for h in ref]
        b.close()


class TestSketchFilter:
    def test_filtered_sketch_query_honors_filter(self, tmp_path, monkeypatch):
        """Round-3 review repro: device-side filters fold into `valid`,
        making validity non-prefix — the sketch rescore must derive
        per-candidate validity from the masked scores, not an index
        compare (which returned 5/5 filter-VIOLATING hits)."""
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(9)
        n = 200
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="sketch")
        recs = []
        for i in range(n):
            algo = "special" if i >= 190 else "common"
            recs.append(Record(0, i, Modality.TEXT, algo, b"x",
                               embedding=[float(x) for x in vecs[i]]))
        run(b.upsert(recs))
        hits = run(b.knn(0, [float(x) for x in vecs[5]], 5,
                         filter={"algorithm": "special"}))
        assert hits, "filtered query returned nothing"
        meta = {h.record_id for h in hits}
        assert all(rid >= 190 for rid in meta), meta

    def test_filtered_sketch_query_large_segmented(self, tmp_path,
                                                   monkeypatch):
        """Same contract through the SEGMENTED branch (pool*2 < cap)."""
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(10)
        n = 5000  # cap 8192, pool 2048 -> segmented path
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="sketch")
        recs = []
        for i in range(n):
            algo = "special" if i % 7 == 0 else "common"
            recs.append(Record(0, i, Modality.TEXT, algo, b"x",
                               embedding=[float(x) for x in vecs[i]]))
        run(b.upsert(recs))
        # query AT a special record: must come back top-1 and every hit
        # must carry the filtered algorithm
        target = 7 * 33
        hits = run(b.knn(0, [float(x) for x in vecs[target]], 5,
                         filter={"algorithm": "special"}))
        assert hits and hits[0].record_id == target
        assert all(h.record_id % 7 == 0 for h in hits)


class TestSketchCostModel:
    """Round-4 directive: sketch serving must never be worse than exact.
    The dispatch models sketch-pipeline vs exhaustive-int8-scan cost at
    the current (capacity, pool) and serves the exact path when it wins
    (ops/knn.py sketch_beats_exact; reference latency-graduation bar:
    docs/ARCHITECTURE.md:44-53)."""

    def test_model_prefers_sketch_only_at_scale(self):
        pool = knn_ops.sketch_pool(10_000_000, 10)
        # 10M x 768: exact streams 7.7 GB (~9.5 ms), sketch ~6.5 ms
        assert knn_ops.sketch_beats_exact(10_000_000, 768, pool)
        # 1M x 768: exact is ~1.1 ms — sketch overhead cannot win
        assert not knn_ops.sketch_beats_exact(
            1_000_000, 768, knn_ops.sketch_pool(1_000_000, 10))
        # small catalogs: pool covers the catalog, exact strictly cheaper
        assert not knn_ops.sketch_beats_exact(
            8192, 768, knn_ops.sketch_pool(8192, 10))
        # narrow rows: the sketch (96 B) is WIDER than a 64-d int8 row
        assert not knn_ops.sketch_beats_exact(
            10_000_000, 64, knn_ops.sketch_pool(10_000_000, 10))

    def test_model_constants_env_overridable(self, monkeypatch):
        pool = knn_ops.sketch_pool(10_000_000, 10)
        assert knn_ops.sketch_beats_exact(10_000_000, 768, pool)
        # an operator measuring a slow gather (contended runtime) can
        # recalibrate without a code change
        monkeypatch.setenv("UCFP_COST_GATHER_NS", "50")
        assert not knn_ops.sketch_beats_exact(10_000_000, 768, pool)

    def test_dispatch_serves_exact_when_model_says_so(self, tmp_path,
                                                      monkeypatch):
        """At a scale where the model prefers exact, sketch mode must
        (a) not invoke the sketch kernel, (b) return the exact int8
        ranking, (c) not mark the response approximate."""
        monkeypatch.setenv("UCFP_SHARD", "off")
        calls = {"sketch": 0}
        orig = knn_ops.cosine_sketch_topk

        def spy(*a, **kw):
            calls["sketch"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(knn_ops, "cosine_sketch_topk", spy)
        rng = np.random.default_rng(6)
        n = 5000
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        recs = [Record(0, i, Modality.TEXT, "e", b"x",
                       embedding=[float(x) for x in vecs[i]])
                for i in range(n)]
        bs = EmbeddedBackend(str(tmp_path / "s"), knn_quant="sketch")
        b8 = EmbeddedBackend(str(tmp_path / "i"), knn_quant="int8")
        run(bs.upsert(recs))
        run(b8.upsert(recs))
        q = [float(x) for x in vecs[777]]
        hs = run(bs.knn(0, q, 5))
        assert calls["sketch"] == 0, "sketch kernel ran despite cost model"
        h8 = run(b8.knn(0, q, 5))
        assert [(h.record_id, round(h.score, 6)) for h in hs] == \
               [(h.record_id, round(h.score, 6)) for h in h8]
        assert not bs.knn_is_approximate(0, 16, 5)
        # the same query with the model disabled rides the sketch kernel
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        hs2 = run(bs.knn(0, q, 5))
        assert calls["sketch"] == 1
        assert hs2[0].record_id == 777
        bs.close()
        b8.close()


class TestQuantizeRowsIdentity:
    """quantize_rows_int8 was rewritten from the textbook five-pass
    chain to a one-temporary form (4x on the bulk-embedding ingest
    path); this pins value-identity against the textbook reference,
    including round-half-to-even boundaries and zero rows."""

    @staticmethod
    def _ref(matrix):
        m = np.asarray(matrix, np.float32)
        absmax = np.abs(m).max(axis=1, keepdims=True)
        scale = np.where(absmax == 0.0, 1.0, absmax / 127.0)
        q8 = np.clip(np.round(m / scale), -127, 127).astype(np.int8)
        row_norm = np.linalg.norm(q8.astype(np.float32), axis=1)
        return q8, row_norm.astype(np.float32)

    def test_matches_reference(self):
        from ucfp_tpu.ops.knn import quantize_rows_int8

        rng = np.random.default_rng(7)
        cases = [
            rng.standard_normal((257, 96)).astype(np.float32),
            np.zeros((4, 8), np.float32),
            rng.uniform(-1e-9, 1e-9, (16, 32)).astype(np.float32),
            np.array([[0.5, 1.5, 2.5, -0.5, -1.5, 126.5, -126.5, 127.0]],
                     np.float32),
            rng.standard_normal((5, 1)).astype(np.float32),
        ]
        for c in cases:
            a8, an = quantize_rows_int8(c)
            b8, bn = self._ref(c)
            assert np.array_equal(a8, b8)
            assert np.array_equal(an, bn)
