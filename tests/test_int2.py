"""Packed-int2 prefilter: pack algebra, kernel exactness, pipeline
recall, serving dispatch.

The int2 path (ops/pallas_int2.py + ops/knn.py cosine_int2_topk) is the
lowest-byte approximate tier: QUARTER the exact scan's HBM bytes with a
quantization-bounded ordering error (measured worst pool ~1k at both
500k and 2M x 768), rescored exactly from a fixed 8k pool. These tests
pin (a) the 2-bit pack/unpack algebra bit-exactly against a numpy
reference, (b) pipeline recall vs the exact int8 scan, (c) masking on
both the fused-prefix and filtered paths, and (d) the backend dispatch
+ markers under UCFP_KNN_QUANT=int2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucfp_tpu.ops import knn as knn_ops
from ucfp_tpu.ops import pallas_int2


def _rows(rng, n, d):
    return rng.normal(size=(n, d)).astype(np.float32)


def _quant8(rows):
    q8, norm = knn_ops.quantize_rows_int8(rows)
    return jnp.asarray(q8), jnp.asarray(norm)


def _ref_int2(q8):
    """Independent numpy reference of the pack's quantization: v in
    [-2, 1], effective level v + 0.5, Lloyd-style scale."""
    f = np.asarray(q8, np.float32)
    s = 0.9957 * f.std(axis=1, keepdims=True)
    s = np.where(s == 0.0, 1.0, s)
    v = np.clip(np.round(f / s - 0.5), -2, 1).astype(np.int32)
    deq = v.astype(np.float32) + 0.5
    n2 = np.linalg.norm(deq, axis=1)
    nz = np.abs(f).max(axis=1) > 0
    inv = np.where(nz, 1.0 / np.maximum(n2, 1e-9), 0.0)
    return v, deq, inv


class TestPackAndKernel:
    def test_pack_unpack_bit_exact(self):
        """The four packed fields recover the exact stored values: the
        top field via in-place AND (-64 keeps 64*a in two's complement),
        the lower three via AND minus the +2 bias."""
        rng = np.random.default_rng(0)
        q8, _ = _quant8(_rows(rng, 256, 32))
        packed_t, inv_n2 = knn_ops.pack_int2_cols(q8)
        v, _deq, ref_inv = _ref_int2(q8)
        p = np.asarray(packed_t).T.astype(np.int8)  # [C, D/4]
        dq = 8  # 32 // 4
        a = (p.astype(np.int8) >> 6).astype(np.int32)  # arithmetic shift
        b = ((p >> 4) & 3).astype(np.int32) - 2
        c = ((p >> 2) & 3).astype(np.int32) - 2
        d = (p & 3).astype(np.int32) - 2
        np.testing.assert_array_equal(a, v[:, :dq])
        np.testing.assert_array_equal(b, v[:, dq:2 * dq])
        np.testing.assert_array_equal(c, v[:, 2 * dq:3 * dq])
        np.testing.assert_array_equal(d, v[:, 3 * dq:])
        np.testing.assert_allclose(np.asarray(inv_n2), ref_inv, rtol=1e-6)

    def test_zero_row_inv_is_zero(self):
        """An all-zero int8 row dequantizes to the all-+0.5 direction —
        the pack must force inv to 0 so the kernels mask it out (the
        int4 path's norm-is-zero rule does not hold for int2)."""
        q8 = jnp.zeros((8, 16), jnp.int8)
        _, inv = knn_ops.pack_int2_cols(q8)
        assert np.all(np.asarray(inv) == 0.0)

    def test_kernel_scores_match_reference(self):
        """int2_masked_scores == numpy dequantized dot * inv, exactly
        (integer dots + one f32 correction — no accumulation
        reordering)."""
        rng = np.random.default_rng(1)
        c, d = 512, 64
        q8, _ = _quant8(_rows(rng, c, d))
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        _v, deq, ref_inv = _ref_int2(q8)
        q = rng.normal(size=(d,)).astype(np.float32)
        qq = np.asarray(knn_ops._quantize_query(jnp.asarray(q)))
        wa, wb, wc, wd, corr = knn_ops._int2_query_parts(
            jnp.asarray(qq), d // 4)
        got = np.asarray(pallas_int2.int2_masked_scores(
            packed_t, wa, wb, wc, wd, pallas_int2.pick_rpt(c), corr,
            inv, jnp.asarray(c, jnp.int32)))
        ref = (deq @ qq.astype(np.float32)) * ref_inv
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_prefix_mask(self):
        rng = np.random.default_rng(2)
        c, d = 256, 16
        q8, _ = _quant8(_rows(rng, c, d))
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        q = rng.normal(size=(d,)).astype(np.float32)
        qq = np.asarray(knn_ops._quantize_query(jnp.asarray(q)))
        wa, wb, wc, wd, corr = knn_ops._int2_query_parts(
            jnp.asarray(qq), d // 4)
        got = np.asarray(pallas_int2.int2_masked_scores(
            packed_t, wa, wb, wc, wd, pallas_int2.pick_rpt(c), corr,
            inv, jnp.asarray(100, jnp.int32)))
        assert np.all(np.isfinite(got[:100]))
        assert np.all(got[100:] == -np.inf)

    def test_batched_scores_match_single(self):
        rng = np.random.default_rng(3)
        c, d, qb = 384, 32, 8
        q8, _ = _quant8(_rows(rng, c, d))
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        qs = rng.normal(size=(qb, d)).astype(np.float32)
        qqs = np.asarray(knn_ops._quantize_query_rows(jnp.asarray(qs)))
        dq = d // 4
        wa = jnp.asarray(qqs[:, :dq])
        wb = jnp.asarray(qqs[:, dq:2 * dq])
        wc = jnp.asarray(qqs[:, 2 * dq:3 * dq])
        wd = jnp.asarray(qqs[:, 3 * dq:])
        qi = qqs.astype(np.int64)
        corrs = jnp.asarray(
            2.0 * qi[:, dq:].sum(1) - 0.5 * qi.sum(1), jnp.float32)
        got = np.asarray(pallas_int2.int2_masked_scores_batched(
            packed_t, wa, wb, wc, wd, corrs, inv,
            pallas_int2.pick_rpt(c), jnp.asarray(c, jnp.int32)))
        for m in range(qb):
            wa1, wb1, wc1, wd1, corr1 = knn_ops._int2_query_parts(
                jnp.asarray(qqs[m]), dq)
            one = np.asarray(pallas_int2.int2_masked_scores(
                packed_t, wa1, wb1, wc1, wd1, pallas_int2.pick_rpt(c),
                corr1, inv, jnp.asarray(c, jnp.int32)))
            np.testing.assert_allclose(got[m], one, rtol=1e-6)

    def test_chunked_pack_bit_identical(self):
        rng = np.random.default_rng(4)
        q8, _ = _quant8(_rows(rng, 1024 + 200, 16))
        p1, i1 = knn_ops.pack_int2_cols(q8)
        p2, i2 = knn_ops.pack_int2_cols_chunked(q8, chunk=256)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestPipeline:
    def test_topk_matches_exact_int8(self):
        """End-to-end recall 1.0 vs the exact int8 scan at a capacity
        where the pool (8k) is well below the catalog."""
        rng = np.random.default_rng(5)
        c, d, k = 65536, 64, 10
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        q = rng.normal(size=(d,)).astype(np.float32)
        valid = jnp.ones((c,), bool)
        sc, idx = knn_ops.cosine_int2_topk(
            jnp.asarray(q), q8, norm, packed_t, inv, valid, k,
            knn_ops.int2_pool(c, k), n_valid=jnp.asarray(c, jnp.int32))
        qq = np.asarray(knn_ops._quantize_query(jnp.asarray(q)))
        exact = (np.asarray(q8, np.float32) @ qq.astype(np.float32)) \
            / np.asarray(norm)
        top = set(np.argsort(-exact)[:k].tolist())
        assert len(top & set(np.asarray(idx).tolist())) == k

    def test_planted_near_duplicate_found(self):
        rng = np.random.default_rng(6)
        c, d = 32768, 32
        rows = _rows(rng, c, d)
        target = rng.normal(size=(d,)).astype(np.float32)
        rows[1234] = target + 0.01 * rng.normal(size=d).astype(np.float32)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        sc, idx = knn_ops.cosine_int2_topk(
            jnp.asarray(target), q8, norm, packed_t, inv,
            jnp.ones((c,), bool), 1, knn_ops.int2_pool(c, 1),
            n_valid=jnp.asarray(c, jnp.int32))
        assert int(np.asarray(idx)[0]) == 1234

    def test_validity_and_filter_mask(self):
        """Filtered path (n_valid=None): masked rows never surface even
        when they dominate the int2 ordering."""
        rng = np.random.default_rng(7)
        c, d, k = 32768, 32, 5
        rows = _rows(rng, c, d)
        q = rng.normal(size=(d,)).astype(np.float32)
        rows[:64] = q  # perfect matches, all masked below
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        valid = jnp.asarray(np.arange(c) >= 64)
        sc, idx = knn_ops.cosine_int2_topk(
            jnp.asarray(q), q8, norm, packed_t, inv, valid, k,
            knn_ops.int2_pool(c, k))
        assert np.all(np.asarray(idx) >= 64)

    def test_small_cap_exhaustive_fallback(self):
        """pool*2 >= cap short-circuits into the exhaustive exact
        rescore — identical to the int8 scan, no pallas kernel."""
        rng = np.random.default_rng(8)
        c, d, k = 2048, 16, 5
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        q = rng.normal(size=(d,)).astype(np.float32)
        sc, idx = knn_ops.cosine_int2_topk(
            jnp.asarray(q), q8, norm, packed_t, inv,
            jnp.ones((c,), bool), k, knn_ops.int2_pool(c, k),
            n_valid=jnp.asarray(c, jnp.int32))
        s8, i8 = knn_ops.cosine_topk_int8(
            jnp.asarray(q)[None], q8, norm, jnp.ones((c,), bool), k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i8[0]))


class TestCostModel:
    def test_beats_exact_at_scale_not_small(self):
        assert knn_ops.int2_beats_exact(
            1 << 23, 768, knn_ops.int2_pool(1 << 23, 10))
        assert not knn_ops.int2_beats_exact(
            16384, 768, knn_ops.int2_pool(16384, 10))

    def test_supported_shapes(self):
        assert knn_ops.int2_supported(1024, 768)
        assert not knn_ops.int2_supported(1024, 766)  # dim % 4 != 0
        assert not knn_ops.int2_supported(100, 768)   # cap % 128


class TestBackendInt2Mode:
    """UCFP_KNN_QUANT=int2 through EmbeddedBackend."""

    def _recs(self, vecs):
        from ucfp_tpu.core import Modality, Record

        return [
            Record(0, i, Modality.TEXT, "e", b"x",
                   embedding=[float(x) for x in vecs[i]])
            for i in range(len(vecs))
        ]

    def test_backend_matches_int8_and_scatter(self, tmp_path, monkeypatch):
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(300, 24)).astype(np.float32)
        b2 = EmbeddedBackend(str(tmp_path / "q2"), knn_quant="int2")
        b8 = EmbeddedBackend(str(tmp_path / "q8"), knn_quant="int8")
        run(b2.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        q = [float(x) for x in vecs[42]]
        h2 = run(b2.knn(0, q, 5))
        h8 = run(b8.knn(0, q, 5))
        assert [(h.record_id, round(h.score, 6)) for h in h2] == \
               [(h.record_id, round(h.score, 6)) for h in h8]
        # pool covers the catalog here -> NOT approximate
        assert not b2.knn_is_approximate(0, 24, 5)
        # zero-width placeholder packed cache below 2*INT2_MIN_POOL
        assert b2._vec[(0, 24)].device[2].shape[1] == 0
        new = rng.normal(size=24).astype(np.float32)
        run(b2.upsert([Record(0, 7777, Modality.TEXT, "e", b"x",
                              embedding=[float(x) for x in new])]))
        got = run(b2.knn(0, [float(x) for x in new], 1))
        assert got[0].record_id == 7777
        # batch path rides the exact int8 GEMM here (placeholder packed
        # cache below 2*INT2_MIN_POOL gates the batched int2 tier off)
        res = run(b2.knn_batch(0, [q], 3))
        assert res[0][0].record_id == 42
        b2.close()
        b8.close()

    def test_backend_real_packed_cache_dispatch(self, tmp_path,
                                                monkeypatch):
        """Above 2*INT2_MIN_POOL the packed cache is real; force the
        dispatch (cost model off) and verify results + marker."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(10)
        n, d = 2 * knn_ops.INT2_MIN_POOL + 100, 16
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        b2 = EmbeddedBackend(str(tmp_path / "big2"), knn_quant="int2")
        run(b2.upsert(self._recs(vecs)))
        cache = b2._vec[(0, d)]
        assert cache.device is None or True  # built lazily on query
        q = [float(x) for x in vecs[777]]
        h2 = run(b2.knn(0, q, 3))
        assert h2[0].record_id == 777
        # real packed columns now resident: [D/4, cap]
        assert b2._vec[(0, d)].device[2].shape == (d // 4,
                                                   cache.data.shape[0])
        # cap 32768: pool 8192*2 < 32768 -> marked approximate
        assert b2.knn_is_approximate(0, d, 3)
        # filtered query rides the unfused mask path, still correct
        hf = run(b2.knn(0, q, 3, filter={"algorithm": "e"}))
        assert hf[0].record_id == 777
        # exact=True is never approximate and matches
        he = run(b2.knn(0, q, 3, exact=True))
        assert he[0].record_id == 777
        b2.close()

    def test_backend_odd_dim_serves_exact(self, tmp_path, monkeypatch):
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(200, 18)).astype(np.float32)  # 18 % 4 != 0
        b2 = EmbeddedBackend(str(tmp_path / "odd"), knn_quant="int2")
        run(b2.upsert(self._recs(vecs)))
        q = [float(x) for x in vecs[5]]
        assert run(b2.knn(0, q, 1))[0].record_id == 5
        # cache omits the packed parts entirely (3-tuple: q8, norm, valid)
        assert len(b2._vec[(0, 18)].device) == 3
        assert not b2.knn_is_approximate(0, 18, 1)
        b2.close()

    def test_backend_sharded_int2_matches_int8(self, tmp_path,
                                               monkeypatch):
        """8-virtual-device mesh: the sharded int2 path returns the
        exact int8 answer (pool per shard covers these small shards ->
        per-shard exhaustive, merged exactly)."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(12)
        vecs = rng.normal(size=(1024, 16)).astype(np.float32)
        b2 = EmbeddedBackend(str(tmp_path / "mesh2"), knn_quant="int2")
        b8 = EmbeddedBackend(str(tmp_path / "mesh8"), knn_quant="int8")
        run(b2.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        q = [float(x) for x in vecs[100]]
        h2 = run(b2.knn(0, q, 5))
        h8 = run(b8.knn(0, q, 5))
        assert [(h.record_id, round(h.score, 5)) for h in h2] == \
               [(h.record_id, round(h.score, 5)) for h in h8]
        b2.close()
        b8.close()


class TestBatched:
    """cosine_int2_topk_batched — ONE quarter-byte packed scan per
    64-query block, segmented-quota selection + per-row stage-2 shrink
    + batched exact rescore (the int4 batched contract at half its
    scan bytes)."""

    def test_batched_topk_matches_exact_int8(self):
        """Matches the exact batched GEMM per row where the pool
        genuinely thresholds, including the prefix boundary and a
        planted near-duplicate."""
        rng = np.random.default_rng(31)
        c, d, k, nq = 65536, 64, 10, 6
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        n = 60000
        qm = _rows(rng, nq, d)
        qm[2] = rows[123] + 0.02 * rng.normal(size=d).astype(np.float32)
        pool = knn_ops.int2_batch_pool(c, k)
        assert pool * 2 < c  # genuinely thresholds
        s2, i2 = knn_ops.cosine_int2_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv, n, k, pool
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(qm), q8, norm, jnp.arange(c) < n, k
        )
        for m in range(nq):
            assert set(np.asarray(i2)[m].tolist()) == \
                set(np.asarray(i_ref)[m].tolist()), f"row {m}"
        np.testing.assert_allclose(
            np.sort(np.asarray(s2), axis=1),
            np.sort(np.asarray(s_ref), axis=1), rtol=1e-5,
        )
        assert int(np.asarray(i2)[2, 0]) == 123
        assert (np.asarray(i2) < n).all()

    def test_batched_chunking_over_64_queries(self):
        """Blocks above 64 queries split into multiple packed scans;
        rows across the chunk boundary must match the exact ranking."""
        rng = np.random.default_rng(32)
        c, d, k, nq = 16384, 32, 5, 70
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        qm = np.stack([
            rows[i * 200] + 0.02 * rng.normal(size=d).astype(np.float32)
            for i in range(nq)
        ])
        pool = knn_ops.int2_batch_pool(c, k)
        assert pool * 2 < c
        s2, i2 = knn_ops.cosine_int2_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv, c, k, pool
        )
        for m in range(nq):
            assert int(np.asarray(i2)[m, 0]) == m * 200, f"row {m}"

    def test_batched_exhaustive_fallback(self):
        """pool*2 >= cap short-circuits into the exact batched GEMM."""
        rng = np.random.default_rng(33)
        c, d, k = 2048, 16, 5
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        qm = _rows(rng, 3, d)
        s2, i2 = knn_ops.cosine_int2_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv, c, k,
            knn_ops.int2_batch_pool(c, k)
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(qm), q8, norm, jnp.ones((c,), bool), k
        )
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))

    def test_backend_batched_int2_dispatch(self, tmp_path, monkeypatch):
        """UCFP_KNN_QUANT=int2 with a real packed cache: knn_batch rides
        the batched packed scan (marked approximate), matches the int8
        backend's exact batched ranking, and filtered / exact batches
        stay on the exact GEMM."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(34)
        n, d = 2 * knn_ops.INT2_MIN_POOL + 100, 16  # capacity 32768
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        b2 = EmbeddedBackend(str(tmp_path / "q2"), knn_quant="int2")
        b8 = EmbeddedBackend(str(tmp_path / "q8"), knn_quant="int8")
        run(b2.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        cap = b2._vec[(0, d)].data.shape[0]
        assert b2._int2_batch_worth_it(cap, d, 5, 3)
        qs = [[float(x) for x in vecs[i] + 0.02 * rng.normal(size=d)]
              for i in (7, 9321, 16222)]
        h2 = run(b2.knn_batch(0, qs, 5))
        h8 = run(b8.knn_batch(0, qs, 5))
        for row2, row8, want in zip(h2, h8, (7, 9321, 16222)):
            assert [(h.record_id, round(h.score, 6)) for h in row2] == \
                   [(h.record_id, round(h.score, 6)) for h in row8]
            assert row2[0].record_id == want
        assert b2.knn_is_approximate(0, d, 5, batch=True, batch_q=3)
        hf = run(b2.knn_batch(0, qs, 5, filter={"algorithm": "e"}))
        assert hf[0][0].record_id == 7
        he = run(b2.knn_batch(0, qs, 5, exact=True))
        assert he[0][0].record_id == 7
        assert not b2.knn_is_approximate(0, d, 5, batch=True, batch_q=3,
                                         exact=True)
        b2.close()
        b8.close()

    _recs = TestBackendInt2Mode._recs

    def test_backend_sharded_batched_int2(self, tmp_path, monkeypatch):
        """8-virtual-device mesh + forced dispatch: the sharded batched
        int2 path returns the exact answer (per-shard pools cover these
        small shards -> per-shard exhaustive, merged exactly)."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(35)
        n, d = 2 * knn_ops.INT2_MIN_POOL + 100, 16
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        b2 = EmbeddedBackend(str(tmp_path / "mesh2"), knn_quant="int2")
        b8 = EmbeddedBackend(str(tmp_path / "mesh8"), knn_quant="int8")
        run(b2.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        qs = [[float(x) for x in vecs[i]] for i in (100, 9000)]
        h2 = run(b2.knn_batch(0, qs, 5))
        h8 = run(b8.knn_batch(0, qs, 5))
        for row2, row8 in zip(h2, h8):
            assert [(h.record_id, round(h.score, 5)) for h in row2] == \
                   [(h.record_id, round(h.score, 5)) for h in row8]
        b2.close()
        b8.close()


class TestStage2Shrink:
    """The stage-2 pool shrink (active when the per-segment quota floor
    inflates candidates past 2x the pool — every big-catalog serving
    shape) reindexes gidx/slot_ok; these tests force it at test scale
    with a small explicit pool and planted near-duplicates."""

    def test_single_query_shrink_recovers_planted(self):
        rng = np.random.default_rng(41)
        c, d, k, pool = 65536, 32, 5, 256
        nseg = c // 512
        assert nseg * 8 > 2 * pool  # the shrink branch is ACTIVE
        rows = _rows(rng, c, d)
        targets = [123, 40000, 65535]
        q = rng.normal(size=(d,)).astype(np.float32)
        for t in targets:
            rows[t] = q + 0.01 * rng.normal(size=d).astype(np.float32)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        sc, idx = knn_ops.cosine_int2_topk(
            jnp.asarray(q), q8, norm, packed_t, inv,
            jnp.ones((c,), bool), k, pool,
            n_valid=jnp.asarray(c, jnp.int32))
        got = set(np.asarray(idx)[:3].tolist())
        assert got == set(targets), got

    def test_batched_shrink_recovers_planted(self):
        rng = np.random.default_rng(42)
        c, d, k, pool, nq = 65536, 32, 3, 256, 4
        assert (c // 512) * 8 > 2 * pool
        rows = _rows(rng, c, d)
        qm = _rows(rng, nq, d)
        want = [77, 30000, 50000, 65000]
        for m, t in enumerate(want):
            rows[t] = qm[m] + 0.01 * rng.normal(size=d).astype(np.float32)
        q8, norm = _quant8(rows)
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        s2, i2 = knn_ops.cosine_int2_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv, c, k, pool)
        for m, t in enumerate(want):
            assert int(np.asarray(i2)[m, 0]) == t, m

    def test_backend_sharded_batched_int2_thresholds(self, tmp_path,
                                                     monkeypatch):
        """Shrunk batch-pool floor: per-shard pools genuinely threshold
        (pool*2 < rows/shard), so the batched pallas kernel runs under
        shard_map instead of the exhaustive short-circuit."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        monkeypatch.setattr(knn_ops, "INT2_BATCH_MIN_POOL", 128)
        rng = np.random.default_rng(43)
        n, d = 2 * knn_ops.INT2_MIN_POOL + 100, 32
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        b2 = EmbeddedBackend(str(tmp_path / "mesh2t"), knn_quant="int2")
        run(b2.upsert(self._recs(vecs)))
        cap = b2._vec[(0, d)].data.shape[0]
        cap_l = cap // 8
        assert knn_ops.int2_batch_pool(cap_l, 3) * 2 < cap_l
        qs = [[float(x) for x in vecs[i] + 0.01 * rng.normal(size=d)]
              for i in (11, 9000, 16000)]
        h2 = run(b2.knn_batch(0, qs, 3))
        for row, want in zip(h2, (11, 9000, 16000)):
            assert row[0].record_id == want
        assert b2.knn_is_approximate(0, d, 3, batch=True, batch_q=3)
        b2.close()

    _recs = TestBackendInt2Mode._recs


class TestQAwareBatchDispatch:
    """The batched int2 cost model is Q-aware by measurement: the
    segmented selection scales ~linearly with Q (fitted
    UCFP_COST_INT2B_SELECT_US), so the packed scan wins only at small
    Q. Chip captures at 10M x 768: Q=2 3.67 ms/query vs ~5.3 exact;
    Q=32 1.36 vs 0.57 (exact wins). These pin the model's boundary so
    a constants regression can't silently flip the dispatch."""

    def test_small_q_dispatches_large_q_does_not(self):
        n = 10_010_624
        pool = knn_ops.int2_batch_pool(n, 10)
        assert knn_ops.int2_batch_beats_exact(n, 768, 2, pool)
        assert not knn_ops.int2_batch_beats_exact(n, 768, 32, pool)

    def test_model_tracks_chip_captures(self):
        """The fitted model must stay within 2x of both captures — a
        loose leash, but it catches order-of-magnitude drift."""
        n = 10_010_624
        pool = knn_ops.int2_batch_pool(n, 10)
        m32 = knn_ops.int2_batch_model_ms(n, 768, 32, pool)
        assert 0.5 * 43.5 <= m32 <= 2 * 43.5, m32  # measured 43.3-43.7
        m2 = knn_ops.int2_batch_model_ms(n, 768, 2, pool)
        assert 0.5 * 7.35 <= m2 <= 2 * 7.35, m2  # measured 7.33-7.43


class TestTopqKernel:
    """In-kernel per-tile top-8 selection (pallas_int2.int2_topq_scores
    + the big-catalog gate in cosine_int2_topk)."""

    def _setup(self, c=32768, d=64, seed=3):
        rng = np.random.default_rng(seed)
        q8, rn = _quant8(_rows(rng, c, d))
        packed_t, inv = knn_ops.pack_int2_cols(q8)
        q = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 40)
        return q8, rn, packed_t, inv, q

    def test_per_segment_top8_matches_masked_scores(self):
        q8, _rn, packed_t, inv, q = self._setup()
        c, d = q8.shape
        qq = knn_ops._quantize_query(q)
        wa, wb, wc, wd, corr = knn_ops._int2_query_parts(qq, d // 4)
        rpt = pallas_int2.pick_rpt(c)
        seg = pallas_int2.TOPQ_SEG
        s2 = np.asarray(pallas_int2.int2_masked_scores(
            packed_t, wa, wb, wc, wd, rpt, corr, inv,
            jnp.asarray(c, jnp.int32))).reshape(-1, seg)
        tv, tg = pallas_int2.int2_topq_scores(
            packed_t, wa, wb, wc, wd, rpt, corr, inv,
            jnp.asarray(c, jnp.int32))
        tvn = np.asarray(tv).reshape(-1, pallas_int2.TOPQ)
        tgn = np.asarray(tg).reshape(-1, pallas_int2.TOPQ)
        assert tvn.shape[0] == s2.shape[0] == c // seg
        for t in range(s2.shape[0]):
            want = np.sort(s2[t])[::-1][: pallas_int2.TOPQ]
            np.testing.assert_array_equal(tvn[t], want)
            # indices map back to exactly those values (ties may order
            # differently only among equal scores)
            np.testing.assert_array_equal(s2[t][tgn[t] - t * seg], tvn[t])

    def test_gated_path_equals_rescored_tile_survivors(self, monkeypatch):
        """Pipeline equality: the gated path (no shrink: survivors ==
        2*pool) must equal rescoring the topq kernel's own candidates —
        pins the plumbing; kernel semantics are pinned above. The path
        is opt-in (UCFP_INT2_TOPQ=1): measured slower than the XLA
        segmented selection on v5e, kept as the documented record."""
        monkeypatch.setenv("UCFP_INT2_TOPQ", "1")
        q8, rn, packed_t, inv, q = self._setup(c=65536)
        c, d = q8.shape
        valid = jnp.ones(c, bool)
        # nseg = c/512 = 128 -> survivors 1024; pool 512: gate on
        # (1024 >= 666), no shrink (1024 == 2*pool), pool*2 < c
        pool = 512
        v_t, i_t = knn_ops.cosine_int2_topk(
            q, q8, rn, packed_t, inv, valid, 10, pool,
            n_valid=jnp.int32(c))
        qq = knn_ops._quantize_query(q)
        wa, wb, wc, wd, corr = knn_ops._int2_query_parts(qq, d // 4)
        tv, tg = pallas_int2.int2_topq_scores(
            packed_t, wa, wb, wc, wd, pallas_int2.pick_rpt(c), corr,
            inv, jnp.asarray(c, jnp.int32))
        v_r, i_r = knn_ops._rescore_exact(
            q8, tg, tv > knn_ops.NEG_INF, q, 10, sorted_unique=False)
        assert np.asarray(i_t).tolist() == np.asarray(i_r).tolist()
        np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_r))

    def test_gated_path_prefix_mask(self, monkeypatch):
        monkeypatch.setenv("UCFP_INT2_TOPQ", "1")
        q8, rn, packed_t, inv, q = self._setup()
        c = q8.shape[0]
        valid = jnp.ones(c, bool)
        nv = jnp.int32(c - 4096)
        _v, idx = knn_ops.cosine_int2_topk(
            q, q8, rn, packed_t, inv, valid, 10, 32, n_valid=nv)
        assert int(np.asarray(idx).max()) < c - 4096

    def test_empty_tile_slots_masked(self, monkeypatch):
        """A tiny prefix leaves whole tiles invalid: every FINITE-scored
        slot must sit inside the prefix (the serving layer drops -inf
        hits — embedded.py filters non-finite scores — so -inf slots
        carrying clamped indices are the existing contract, same as the
        segmented path)."""
        q8, rn, packed_t, inv, q = self._setup()
        c = q8.shape[0]
        valid = jnp.ones(c, bool)
        nv = jnp.int32(64)
        v, idx = knn_ops.cosine_int2_topk(
            q, q8, rn, packed_t, inv, valid, 10, 32, n_valid=nv)
        vn, idxn = np.asarray(v), np.asarray(idx)
        assert np.isfinite(vn).any()
        assert int(idxn[np.isfinite(vn)].max()) < 64
