"""Packed-int4 prefilter: kernel exactness, pipeline recall, dispatch.

The int4 path (ops/pallas_int4.py + ops/knn.py cosine_int4_topk) is the
round-4 approximate serving tier: half the exact scan's HBM bytes with
a near-exact ordering. These tests pin (a) the nibble pack/unpack
algebra bit-exactly against a numpy reference, (b) pipeline recall vs
the exact int8 scan, (c) validity/filter masking, and (d) the serving
cost-model dispatch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucfp_tpu.ops import knn as knn_ops
from ucfp_tpu.ops import pallas_int4


def _rows(rng, n, d):
    return rng.normal(size=(n, d)).astype(np.float32)


def _quant8(rows):
    q8, norm = knn_ops.quantize_rows_int8(rows)
    return jnp.asarray(q8), jnp.asarray(norm)


class TestPackAndKernel:
    def test_pack_unpack_bit_exact(self):
        """packed nibbles recover the exact int4 values: hi via the
        in-place AND (-16 = 0xF0 keeps 16*hi, no borrow because the low
        nibble is biased non-negative), lo via AND 15 minus the bias."""
        rng = np.random.default_rng(0)
        q8, _ = _quant8(_rows(rng, 256, 32))
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        packed = np.asarray(packed_t).T  # [C, D/2]
        hi = np.asarray(packed).astype(np.int8) >> 4  # arithmetic in np
        lo = (np.asarray(packed) & 15).astype(np.int32) - 8
        # independent reference quantization
        f = np.asarray(q8, np.float32)
        absmax = np.abs(f).max(axis=1, keepdims=True)
        scale = np.where(absmax == 0, 1.0, absmax / 7.0)
        q4 = np.clip(np.round(f / scale), -7, 7).astype(np.int32)
        np.testing.assert_array_equal(hi, q4[:, :16])
        np.testing.assert_array_equal(lo, q4[:, 16:])
        n4 = np.sqrt((q4.astype(np.float32) ** 2).sum(1))
        np.testing.assert_allclose(
            np.asarray(inv_n4), np.where(n4 > 0, 1.0 / n4, 0.0), rtol=1e-6
        )

    def test_kernel_dots_match_reference(self):
        """int4_dots == numpy unpacked-int4 dot, bit-exact, for every
        weight row of the batch-8 block."""
        rng = np.random.default_rng(1)
        c, d = 512, 64
        dp = d // 2
        q8, _ = _quant8(_rows(rng, c, d))
        packed_t, _ = knn_ops.pack_int4_cols(q8)
        qs = rng.integers(-127, 128, size=(pallas_int4.SUB, d)).astype(np.int8)
        wh = jnp.asarray(qs[:, :dp])
        wl = jnp.asarray(qs[:, dp:])
        out = np.asarray(
            pallas_int4.int4_dots(packed_t, wh, wl, 128, pallas_int4.SUB)
        )
        packed = np.asarray(packed_t).T.astype(np.int8)
        hi = (packed >> 4).astype(np.int32)
        lo_b = (packed & 15).astype(np.int32)  # biased
        for m in range(pallas_int4.SUB):
            ref = hi @ qs[m, :dp].astype(np.int32) + lo_b @ qs[m, dp:].astype(
                np.int32
            )
            np.testing.assert_array_equal(out[m], ref)
        # single-query extraction matches row 0
        one = np.asarray(pallas_int4.int4_dots(packed_t, wh, wl, 128, 1))
        np.testing.assert_array_equal(one, out[0])

    def test_chunked_pack_bit_identical(self):
        """pack_int4_cols_chunked == pack_int4_cols, including a
        non-chunk-multiple tail."""
        rng = np.random.default_rng(11)
        q8, _ = _quant8(_rows(rng, 640, 32))
        ref_p, ref_i = knn_ops.pack_int4_cols(q8)
        got_p, got_i = knn_ops.pack_int4_cols_chunked(q8, chunk=256)
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))

    def test_rpt_divisor_required(self):
        rng = np.random.default_rng(2)
        q8, _ = _quant8(_rows(rng, 256, 32))
        packed_t, _ = knn_ops.pack_int4_cols(q8)
        wh = jnp.zeros((pallas_int4.SUB, 16), jnp.int8)
        with pytest.raises(ValueError):
            pallas_int4.int4_dots(packed_t, wh, wh, 192)


class TestPipeline:
    def test_topk_matches_exact_int8(self):
        """At these sizes the pool covers enough that int4-prefiltered
        top-10 should equal the exact int8 top-10 on random data."""
        rng = np.random.default_rng(3)
        c, d, k = 4096, 64, 10
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        valid = jnp.ones((c,), bool)
        q = rng.normal(size=d).astype(np.float32)
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(q)[None], q8, norm, valid, k
        )
        s4, i4 = knn_ops.cosine_int4_topk(
            jnp.asarray(q), q8, norm, packed_t, inv_n4, valid, k, 512
        )
        assert set(np.asarray(i4).tolist()) == set(np.asarray(i_ref)[0].tolist())
        np.testing.assert_allclose(
            np.sort(np.asarray(s4)), np.sort(np.asarray(s_ref)[0]), rtol=1e-5
        )

    def test_planted_near_duplicate_found(self):
        rng = np.random.default_rng(4)
        c, d = 8192, 32
        rows = _rows(rng, c, d)
        q = rows[777] + 0.02 * rng.normal(size=d).astype(np.float32)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        s, i = knn_ops.cosine_int4_topk(
            jnp.asarray(q), q8, norm, packed_t, inv_n4,
            jnp.ones((c,), bool), 5, knn_ops.int4_pool(c, 5),
        )
        assert int(np.asarray(i)[0]) == 777

    def test_validity_and_filter_mask(self):
        """Masked rows must never surface, even when they dominate the
        int4 ordering — the mask rides `valid` through the -inf encoding
        like the sketch path."""
        rng = np.random.default_rng(5)
        c, d = 2048, 32
        rows = _rows(rng, c, d)
        q = rows[100].copy()
        rows[101] = rows[100]  # a masked twin that would win unmasked
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        valid = np.ones(c, bool)
        valid[101] = False
        valid[c // 2:] = False  # non-prefix masking too
        s, i = knn_ops.cosine_int4_topk(
            jnp.asarray(q), q8, norm, packed_t, inv_n4,
            jnp.asarray(valid), 10, 256,
        )
        got = np.asarray(i)[np.isfinite(np.asarray(s))]
        assert 101 not in got.tolist()
        assert all(g < c // 2 for g in got.tolist())
        assert int(got[0]) == 100

    def test_fused_masked_scores_matches_unfused(self):
        """int4_masked_scores (fused dots+mask kernel, prefix validity)
        must equal the unfused dots + XLA mask composition bit-for-bit,
        including the prefix boundary and zero rows."""
        rng = np.random.default_rng(13)
        c, d = 1024, 64
        rows = _rows(rng, c, d)
        rows[7] = 0.0  # zero row -> inv == 0 -> -inf either way
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        n = 900  # prefix validity boundary
        q = rng.normal(size=d).astype(np.float32)
        qq = knn_ops._quantize_query(jnp.asarray(q))
        dp = d // 2
        wh = jnp.zeros((pallas_int4.SUB, dp), jnp.int8).at[0].set(qq[:dp])
        wl = jnp.zeros((pallas_int4.SUB, dp), jnp.int8).at[0].set(qq[dp:])
        corr = 8 * jnp.sum(qq[dp:].astype(jnp.int32))
        fused = np.asarray(pallas_int4.int4_masked_scores(
            packed_t, wh, wl, inv_n4, pallas_int4.pick_rpt(c), corr,
            jnp.int32(n),
        ))
        dots = knn_ops.jnp.asarray(
            pallas_int4.int4_dots(packed_t, wh, wl, pallas_int4.pick_rpt(c))
        )
        ok = (np.arange(c) < n) & (np.asarray(inv_n4) > 0.0)
        ref = np.where(
            ok,
            (np.asarray(dots) - int(corr)).astype(np.float32)
            * np.asarray(inv_n4),
            -np.inf,
        )
        np.testing.assert_array_equal(fused, ref)

    def test_topk_fused_path_matches_unfused(self):
        """cosine_int4_topk with n_valid (fused kernel) returns the
        same results as the valid-array path when valid is the prefix."""
        rng = np.random.default_rng(14)
        c, d, k = 8192, 32, 10
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        n = 8000
        valid = jnp.arange(c) < n
        q = jnp.asarray(rows[123] + 0.05 * rng.normal(size=d).astype(np.float32))
        pool = 512
        s_ref, i_ref = knn_ops.cosine_int4_topk(
            q, q8, norm, packed_t, inv_n4, valid, k, pool
        )
        s_f, i_f = knn_ops.cosine_int4_topk(
            q, q8, norm, packed_t, inv_n4, valid, k, pool,
            n_valid=jnp.int32(n),
        )
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                                   rtol=1e-6)
        assert int(np.asarray(i_f)[0]) == 123

    def test_batched_masked_scores_match_single(self):
        """int4_masked_scores_batched row m == int4_masked_scores for
        query m, bit-for-bit, including padding weight rows and the
        prefix boundary."""
        rng = np.random.default_rng(20)
        c, d, nq = 1024, 64, 5  # nq pads to the 8-row sublane floor
        rows = _rows(rng, c, d)
        rows[3] = 0.0  # zero row -> inv == 0 -> -inf
        q8, _ = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        n = 900
        dp = d // 2
        qs = rng.integers(-127, 128, size=(nq, d)).astype(np.int8)
        qb = 8
        wh = jnp.zeros((qb, dp), jnp.int8).at[:nq].set(qs[:, :dp])
        wl = jnp.zeros((qb, dp), jnp.int8).at[:nq].set(qs[:, dp:])
        corrs = 8 * jnp.sum(wl.astype(jnp.int32), axis=1)
        rpt = pallas_int4.pick_rpt(c)
        got = np.asarray(pallas_int4.int4_masked_scores_batched(
            packed_t, wh, wl, corrs, inv_n4, rpt, jnp.int32(n)
        ))
        for m in range(nq):
            wh1 = jnp.zeros((pallas_int4.SUB, dp), jnp.int8).at[0].set(
                qs[m, :dp])
            wl1 = jnp.zeros((pallas_int4.SUB, dp), jnp.int8).at[0].set(
                qs[m, dp:])
            ref = np.asarray(pallas_int4.int4_masked_scores(
                packed_t, wh1, wl1, inv_n4, rpt,
                8 * jnp.sum(wl1[0].astype(jnp.int32)), jnp.int32(n),
            ))
            np.testing.assert_array_equal(got[m], ref)

    def test_batched_topk_matches_exact_int8(self):
        """cosine_int4_topk_batched == the exact batched GEMM per row at
        sizes where the pool thresholds, including the prefix boundary
        and a planted near-duplicate."""
        rng = np.random.default_rng(21)
        c, d, k, nq = 4096, 64, 10, 6
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        n = 3500
        qm = _rows(rng, nq, d)
        qm[2] = rows[123] + 0.02 * rng.normal(size=d).astype(np.float32)
        pool = 512  # pool*2 < c: the prefilter genuinely thresholds
        s4, i4 = knn_ops.cosine_int4_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv_n4, n, k, pool
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(qm), q8, norm, jnp.arange(c) < n, k
        )
        for m in range(nq):
            assert set(np.asarray(i4)[m].tolist()) == \
                set(np.asarray(i_ref)[m].tolist()), f"row {m}"
        np.testing.assert_allclose(
            np.sort(np.asarray(s4), axis=1),
            np.sort(np.asarray(s_ref), axis=1), rtol=1e-5,
        )
        assert int(np.asarray(i4)[2, 0]) == 123
        assert (np.asarray(i4) < n).all()

    def test_batched_bf16_scores_and_fused_selection(self):
        """The production batched composition at a tile-aligned
        capacity: bf16 masked scores + the fused batched partial-reduce
        + approx pool selection still recovers the exact top-k (pool
        margin absorbs bf16 rounding and the ~5% approx boundary
        loss)."""
        rng = np.random.default_rng(24)
        # c large enough that n_cand = (c // 32768) * 128 >= 2 * pool
        # (pool = 640 -> c >= 327680): anything smaller silently falls
        # back to _exact_topk_rows and the production approx+bf16
        # selection branch goes untested
        c, d, k, nq = 524288, 16, 5, 4
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        qm = _rows(rng, nq, d)
        qm[1] = rows[31000] + 0.02 * rng.normal(size=d).astype(np.float32)
        pool = knn_ops.int4_batch_pool(c, k)
        assert pool * 2 < c  # genuinely thresholds
        s4, i4 = knn_ops.cosine_int4_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv_n4, c, k, pool
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(qm), q8, norm, jnp.ones((c,), bool), k
        )
        for m in range(nq):
            assert set(np.asarray(i4)[m].tolist()) == \
                set(np.asarray(i_ref)[m].tolist()), f"row {m}"
        assert int(np.asarray(i4)[1, 0]) == 31000
        # bf16 emit is a faithful rounding of the f32 masked scores
        qq = knn_ops._quantize_query_rows(jnp.asarray(qm))
        dp = d // 2
        wh = jnp.zeros((8, dp), jnp.int8).at[:nq].set(qq[:, :dp])
        wl = jnp.zeros((8, dp), jnp.int8).at[:nq].set(qq[:, dp:])
        corrs = 8 * jnp.sum(wl.astype(jnp.int32), axis=1)
        rpt = pallas_int4.pick_rpt(c)
        sb = np.asarray(pallas_int4.int4_masked_scores_batched(
            packed_t, wh, wl, corrs, inv_n4, rpt, jnp.int32(c),
            out_dtype=jnp.bfloat16,
        ))
        sf = np.asarray(pallas_int4.int4_masked_scores_batched(
            packed_t, wh, wl, corrs, inv_n4, rpt, jnp.int32(c),
        ))
        assert sb.dtype == jnp.bfloat16
        assert np.isneginf(sb[:nq]).sum() == 0  # full prefix: all finite
        np.testing.assert_array_equal(
            sb[:nq], sf[:nq].astype(jnp.bfloat16))

    def test_batched_chunking_over_64_queries(self):
        """Query blocks above INT4_BATCH_QB split into multiple packed
        scans; results must be identical per row across the chunk
        boundary (row 63 vs 64) and match the exact ranking."""
        rng = np.random.default_rng(25)
        c, d, k, nq = 2048, 32, 5, 70
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        qm = _rows(rng, nq, d)
        qm[63] = rows[100] + 0.02 * rng.normal(size=d).astype(np.float32)
        qm[64] = rows[200] + 0.02 * rng.normal(size=d).astype(np.float32)
        s, i = knn_ops.cosine_int4_topk_batched(
            jnp.asarray(qm), q8, norm, packed_t, inv_n4, c, k, 256
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(qm), q8, norm, jnp.ones((c,), bool), k
        )
        assert int(np.asarray(i)[63, 0]) == 100
        assert int(np.asarray(i)[64, 0]) == 200
        for m in range(nq):
            assert set(np.asarray(i)[m].tolist()) == \
                set(np.asarray(i_ref)[m].tolist()), f"row {m}"

    def test_batched_exhaustive_fallback(self):
        """pool*2 >= capacity: the batched path degrades to the exact
        GEMM (identical results, placeholder packed cache untouched)."""
        rng = np.random.default_rng(22)
        c, d, k = 256, 32, 5
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        qm = jnp.asarray(_rows(rng, 3, d))
        placeholder = jnp.zeros((d // 2, 0), jnp.int8)
        s, i = knn_ops.cosine_int4_topk_batched(
            qm, q8, norm, placeholder, jnp.zeros((0,), jnp.float32),
            c, k, knn_ops.int4_pool(c, k),
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            qm, q8, norm, jnp.ones((c,), bool), k
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_small_cap_exhaustive_fallback(self):
        """pool*2 >= capacity degrades to the exhaustive exact rescore
        (identical to the exact kernel)."""
        rng = np.random.default_rng(6)
        c, d, k = 256, 32, 5
        rows = _rows(rng, c, d)
        q8, norm = _quant8(rows)
        packed_t, inv_n4 = knn_ops.pack_int4_cols(q8)
        valid = jnp.ones((c,), bool)
        q = rng.normal(size=d).astype(np.float32)
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(q)[None], q8, norm, valid, k
        )
        s, i = knn_ops.cosine_int4_topk(
            jnp.asarray(q), q8, norm, packed_t, inv_n4, valid, k,
            knn_ops.int4_pool(c, k),
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref)[0])


class TestBackendInt4Mode:
    """UCFP_KNN_QUANT=int4 through EmbeddedBackend: cache build,
    incremental scatter, dispatch, markers, and shape fallbacks."""

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
        # force the prefilter kernel (the cost model would correctly
        # route these tiny catalogs to exact)
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(300, 24)).astype(np.float32)
        b4 = EmbeddedBackend(str(tmp_path / "q4"), knn_quant="int4")
        b8 = EmbeddedBackend(str(tmp_path / "q8"), knn_quant="int8")
        run(b4.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        q = [float(x) for x in vecs[42]]
        h4 = run(b4.knn(0, q, 5))
        h8 = run(b8.knn(0, q, 5))
        assert [(h.record_id, round(h.score, 6)) for h in h4] == \
               [(h.record_id, round(h.score, 6)) for h in h8]
        assert h4[0].record_id == 42
        # pool covers the catalog here -> NOT approximate
        assert not b4.knn_is_approximate(0, 24, 5)
        # at cap 1024 the packed cache is the zero-width placeholder
        # (every pool covers the catalog, the kernel's exhaustive
        # branch never reads it — no pack compute or +50% HBM)
        assert b4._vec[(0, 24)].device[2].shape[1] == 0
        # incremental update rides the placeholder-skip scatter path
        new = rng.normal(size=24).astype(np.float32)
        run(b4.upsert([Record(0, 7777, Modality.TEXT, "e", b"x",
                              embedding=[float(x) for x in new])]))
        got = run(b4.knn(0, [float(x) for x in new], 1))
        assert got[0].record_id == 7777
        # batch path rides the exact int8 GEMM (marker stays False)
        res = run(b4.knn_batch(0, [q], 3))
        assert res[0][0].record_id == 42
        assert not b4.knn_is_approximate(0, 24, 3, batch=True)
        b4.close()
        b8.close()

    def test_backend_large_marker_and_exact_tier(self, tmp_path,
                                                 monkeypatch):
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(8)
        # capacity 8192 (power-of-two growth) -> pool 2048,
        # pool*2 < cap: thresholded selection -> marked approximate
        n = 5000
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int4")
        run(b.upsert(self._recs(vecs)))
        assert b.knn_is_approximate(0, 16, 10)
        q = vecs[1234] + 0.03 * rng.normal(size=16).astype(np.float32)
        hits = run(b.knn(0, [float(x) for x in q], 10))
        assert hits[0].record_id == 1234
        # above 2*INT4_MIN_POOL the packed cache is real (synced by
        # the query above)
        cap = b._vec[(0, 16)].data.shape[0]
        assert b._vec[(0, 16)].device[2].shape == (8, cap)
        # incremental update rides the REAL packed column-scatter path
        from ucfp_tpu.core import Modality, Record

        nv = rng.normal(size=16).astype(np.float32)
        run(b.upsert([Record(0, 77777, Modality.TEXT, "e", b"x",
                             embedding=[float(x) for x in nv])]))
        got = run(b.knn(0, [float(x) for x in nv], 1))
        assert got[0].record_id == 77777
        # per-request exact tier opts out of the prefilter entirely
        ex = run(b.knn(0, [float(x) for x in q], 10, exact=True))
        assert ex[0].record_id == 1234
        assert not b.knn_is_approximate(0, 16, 10, exact=True)
        b.close()

    def test_backend_batched_int4_dispatch(self, tmp_path, monkeypatch):
        """UCFP_KNN_QUANT=int4 + forced cost model at a thresholding
        capacity: knn_batch rides the batched packed scan (marked
        approximate), matches the int8 backend's exact batched ranking
        on random data, and a FILTERED batch stays on the exact GEMM."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(23)
        n = 5000  # capacity 8192 -> pool 2048 genuinely thresholds
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b4 = EmbeddedBackend(str(tmp_path / "q4"), knn_quant="int4")
        b8 = EmbeddedBackend(str(tmp_path / "q8"), knn_quant="int8")
        run(b4.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        cap = b4._vec[(0, 16)].data.shape[0]
        assert b4._int4_batch_worth_it(cap, 16, 5, 3)
        qs = [[float(x) for x in vecs[i] + 0.02 * rng.normal(size=16)]
              for i in (7, 4321, 2222)]
        h4 = run(b4.knn_batch(0, qs, 5))
        h8 = run(b8.knn_batch(0, qs, 5))
        for row4, row8, want in zip(h4, h8, (7, 4321, 2222)):
            assert [(h.record_id, round(h.score, 6)) for h in row4] == \
                   [(h.record_id, round(h.score, 6)) for h in row8]
            assert row4[0].record_id == want
        assert b4.knn_is_approximate(0, 16, 5, batch=True, batch_q=3)
        # filtered batches ride the exact GEMM (the fused prefix kernel
        # can't encode a non-prefix mask)
        assert not b4.knn_is_approximate(0, 16, 5, batch=True, batch_q=3,
                                         filtered=True) or \
            b4._fused_pool_ok(cap, n, 5)
        hf = run(b4.knn_batch(0, qs, 5, filter={"algorithm": "e"}))
        assert hf[0][0].record_id == 7
        # per-request exact tier opts out entirely
        he = run(b4.knn_batch(0, qs, 5, exact=True))
        assert he[0][0].record_id == 7
        assert not b4.knn_is_approximate(0, 16, 5, batch=True, batch_q=3,
                                         exact=True)
        b4.close()
        b8.close()

    def test_backend_odd_dim_serves_exact(self, tmp_path, monkeypatch):
        """Odd dims can't nibble-pair: the cache omits the packed parts
        and queries ride the exact int8 scan without crashing."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(200, 17)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int4")
        run(b.upsert(self._recs(vecs)))
        hits = run(b.knn(0, [float(x) for x in vecs[33]], 3))
        assert hits[0].record_id == 33
        assert not b.knn_is_approximate(0, 17, 3)
        # incremental path too
        run(b.upsert(self._recs(vecs[:10])))
        hits = run(b.knn(0, [float(x) for x in vecs[5]], 3))
        assert hits[0].record_id == 5
        b.close()

    def test_backend_mesh_cost_model_falls_back_to_exact_sharded(
            self, tmp_path, monkeypatch):
        """With the real cost model, a tiny catalog routes to the exact
        sharded int8 scan (prefilter never serves slower than exact)
        and the marker must agree (never claim approximate for an
        exact answer)."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.delenv("UCFP_SKETCH_COST_MODEL", raising=False)
        rng = np.random.default_rng(10)
        vecs = rng.normal(size=(400, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int4")
        run(b.upsert(self._recs(vecs)))
        assert b._mesh is not None
        cap = b._vec[(0, 16)].data.shape[0]
        # the fixed pool covers each 128-row shard -> exact wins
        assert not b._int4_worth_it(cap, 16, 5)
        hits = run(b.knn(0, [float(x) for x in vecs[77]], 5))
        assert hits[0].record_id == 77
        assert not b.knn_is_approximate(0, 16, 5)
        b.close()

    def test_backend_mesh_exhaustive_shards_not_marked_approximate(
            self, tmp_path, monkeypatch):
        """Mesh + cost model off + capacity where every shard's pool
        covers its whole shard: the sharded kernel rescores each shard
        exhaustively (the merged answer is exact), so the marker must
        be False — it mirrors the PER-SHARD pool math, not the global
        capacity (round-4 review finding)."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(12)
        n = 5000  # capacity 8192 -> 1024/shard on 8 devices
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int4")
        run(b.upsert(self._recs(vecs)))
        assert b._mesh is not None
        cap = b._vec[(0, 16)].data.shape[0]
        assert b._int4_worth_it(cap, 16, 10)  # the int4 path serves...
        # ...but every shard's fixed pool covers its local rows
        from ucfp_tpu.ops import knn as ko

        cap_l = cap // b._n_shards()
        assert ko.int4_pool(cap_l, 10) * 2 >= cap_l
        assert not b.knn_is_approximate(0, 16, 10)
        # and the served answer is indeed exact
        b8 = EmbeddedBackend(str(tmp_path / "b8"), knn_quant="int8")
        run(b8.upsert(self._recs(vecs)))
        q = [float(x) for x in vecs[2222]]
        h4 = run(b.knn(0, q, 10))
        h8 = run(b8.knn(0, q, 10))
        assert [(h.record_id, round(h.score, 6)) for h in h4] == \
               [(h.record_id, round(h.score, 6)) for h in h8]
        b.close()
        b8.close()

    def test_backend_sharded_int4_matches_int8(self, tmp_path,
                                               monkeypatch):
        """Per-shard capacity >= 128: the SHARDED int4 path serves
        (placeholder packed cache at this sub-threshold capacity, so
        each shard's exhaustive rescore runs under the shard_map + the
        two-stage merge) and matches the exact int8 ranking
        bit-for-bit. The real packed scan at thresholding scale is
        covered by dryrun_multichip and the kernel tests."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(11)
        n = 1100  # capacity 2048 -> >= 128 rows/shard on <= 16 devices
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b4 = EmbeddedBackend(str(tmp_path / "q4"), knn_quant="int4")
        b8 = EmbeddedBackend(str(tmp_path / "q8"), knn_quant="int8")
        run(b4.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        assert b4._mesh is not None
        cap = b4._vec[(0, 16)].data.shape[0]
        assert b4._int4_worth_it(cap, 16, 5)
        q = [float(x) for x in vecs[321]]
        h4 = run(b4.knn(0, q, 5))
        h8 = run(b8.knn(0, q, 5))
        assert [(h.record_id, round(h.score, 6)) for h in h4] == \
               [(h.record_id, round(h.score, 6)) for h in h8]
        assert h4[0].record_id == 321
        # incremental scatter through the column-sharded packed cache
        new = rng.normal(size=16).astype(np.float32)
        from ucfp_tpu.core import Modality, Record

        run(b4.upsert([Record(0, 9999, Modality.TEXT, "e", b"x",
                              embedding=[float(x) for x in new])]))
        got = run(b4.knn(0, [float(x) for x in new], 1))
        assert got[0].record_id == 9999
        b4.close()
        b8.close()


class TestShardedFusedPrefix:
    def test_sharded_n_valid_matches_valid_array(self):
        """The per-shard prefix clip (n_local = clip(n - shard*cap_l))
        at THRESHOLDING scale: every shard runs the fused kernel with a
        genuinely sub-capacity pool, including a shard the prefix ends
        inside and fully-invalid shards, and must match the valid-array
        path and the exact int8 ranking."""
        import jax
        import jax.numpy as jnp

        from ucfp_tpu.parallel import sharded_knn

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-virtual-device mesh")
        from jax.sharding import Mesh

        mesh = Mesh(np.array(devs[:8]), ("d",))
        rng = np.random.default_rng(15)
        c, d, k = 65536, 16, 10  # 8192 rows/shard > 2 * INT4_MIN_POOL
        rows = rng.normal(size=(c, d)).astype(np.float32)
        q8, norm = knn_ops.quantize_rows_int8(rows)
        q8 = jnp.asarray(q8)
        norm = jnp.asarray(norm)
        packed_t, inv_n4 = knn_ops.pack_int4_cols_chunked(q8, chunk=8192)
        n = 5 * 8192 + 1234  # prefix ends INSIDE shard 5; shards 6-7 empty
        valid = jnp.arange(c) < n
        q = jnp.asarray(rows[777] + 0.03 * rng.normal(size=d).astype(np.float32))
        s_v, i_v = sharded_knn.sharded_cosine_int4_topk(
            q, q8, norm, packed_t, inv_n4, valid, k, mesh, ("d",)
        )
        s_n, i_n = sharded_knn.sharded_cosine_int4_topk(
            q, q8, norm, packed_t, inv_n4, valid, k, mesh, ("d",),
            n_valid=n,
        )
        np.testing.assert_array_equal(np.asarray(i_n), np.asarray(i_v))
        np.testing.assert_allclose(np.asarray(s_n), np.asarray(s_v),
                                   rtol=1e-6)
        assert int(np.asarray(i_n)[0]) == 777
        # nothing beyond the prefix ever surfaces
        assert all(int(i) < n for i in np.asarray(i_n))


class TestQueryMicroBatching:
    def _recs(self, vecs):
        from ucfp_tpu.core import Modality, Record

        return [
            Record(0, i, Modality.TEXT, "e", b"x",
                   embedding=[float(x) for x in vecs[i]])
            for i in range(len(vecs))
        ]

    def test_coalesces_and_matches_unbatched(self, tmp_path, monkeypatch):
        """UCFP_QUERY_BATCH_MS > 0: concurrent plain knn() calls share
        one knn_batch dispatch per (tenant, dim, k) bucket, with
        results identical to the unbatched backend; filtered / exact /
        pool_frac queries bypass the batcher; zero-norm queries still
        return []."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_QUERY_BATCH_MS", "25")
        rng = np.random.default_rng(50)
        vecs = rng.normal(size=(300, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path / "b"), knn_quant="int8")
        monkeypatch.delenv("UCFP_QUERY_BATCH_MS")
        ref = EmbeddedBackend(str(tmp_path / "ref"), knn_quant="int8")
        asyncio.run(b.upsert(self._recs(vecs)))
        asyncio.run(ref.upsert(self._recs(vecs)))
        assert b._qbatch_ms == 25.0 and ref._qbatch_ms == 0.0

        batch_sizes = []
        orig = b.knn_batch

        async def counting(tenant_id, queries, k, **kw):
            batch_sizes.append(len(queries))
            return await orig(tenant_id, queries, k, **kw)

        b.knn_batch = counting

        qs = [[float(x) for x in vecs[i] + 0.02 * rng.normal(size=16)]
              for i in (3, 77, 150, 299, 8, 42)]
        qs.append([0.0] * 16)  # zero-norm -> []

        async def go():
            return await asyncio.gather(
                *[b.knn(0, q, 5) for q in qs]
            )

        got = asyncio.run(go())
        assert got[-1] == []
        for q, hits in zip(qs[:-1], got[:-1]):
            ref_hits = asyncio.run(ref.knn(0, q, 5))
            assert [(h.record_id, round(h.score, 6)) for h in hits] == \
                   [(h.record_id, round(h.score, 6)) for h in ref_hits]
        # all 7 queries shared ONE bucket flush (same tenant/dim/k),
        # padded to the power-of-two size bucket (recompile bound:
        # 7 size buckets per (dim, k), not 64)
        assert batch_sizes == [8]
        # coalescing stats count pre-padding items (6, not 7: the
        # zero-norm query early-outs on the host before the batcher)
        assert b._qbatch_flushes == 1 and b._qbatch_items == 6
        # ineligible queries bypass the batcher entirely
        batch_sizes.clear()
        ex = asyncio.run(b.knn(0, qs[0], 5, exact=True))
        assert ex[0].record_id == 3 and batch_sizes == []
        flt = asyncio.run(b.knn(0, qs[0], 5, filter={"algorithm": "e"}))
        assert flt[0].record_id == 3 and batch_sizes == []
        # a later loop (fresh asyncio.run) rebuilds the loop-bound
        # batcher instead of tripping over dead-loop primitives
        again = asyncio.run(b.knn(0, qs[1], 5))
        assert again[0].record_id == 77
        b.close()
        ref.close()

    def test_multithreaded_direct_callers(self, tmp_path, monkeypatch):
        """Direct backend callers may run their own event loops on
        separate threads: each loop gets its own DeadlineBatcher from
        the registry (a shared instance would await a Lock bound to a
        foreign loop / set futures cross-thread)."""
        import asyncio
        import threading

        from ucfp_tpu.index.embedded import EmbeddedBackend

        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_QUERY_BATCH_MS", "10")
        rng = np.random.default_rng(52)
        vecs = rng.normal(size=(200, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int8")
        asyncio.run(b.upsert(self._recs(vecs)))
        errs: list = []

        def worker(rows):
            try:
                async def go():
                    return await asyncio.gather(*[
                        b.knn(0, [float(x) for x in vecs[r]], 3)
                        for r in rows
                    ])

                for r, hits in zip(rows, asyncio.run(go())):
                    assert hits[0].record_id == r, (r, hits[:1])
            except Exception as e:  # pragma: no cover - failure detail
                errs.append(e)

        threads = [
            threading.Thread(target=worker,
                             args=([i, i + 50, i + 100],))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        b.close()

    def test_marker_conservative_under_batching(self, tmp_path,
                                                monkeypatch):
        """With micro-batching on, a single query may be served by the
        batched packed scan even when the SINGLE-path cost model says
        exact — the marker must stay conservative and flag it."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        monkeypatch.setenv("UCFP_QUERY_BATCH_MS", "5")
        rng = np.random.default_rng(53)
        vecs = rng.normal(size=(5000, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int4")
        asyncio.run(b.upsert(self._recs(vecs)))
        # force the SINGLE-path dispatch model to exact; the batch path
        # (forced on by the cost-model override) can still serve the
        # coalesced query approximately
        monkeypatch.setattr(EmbeddedBackend, "_int4_worth_it",
                            lambda self, *a, **kw: False)
        assert b.knn_is_approximate(0, 16, 5)
        b._qbatch_ms = 0.0  # batching off: single path rules again
        assert not b.knn_is_approximate(0, 16, 5)
        b.close()

    def test_fingerprint_queries_coalesce(self, tmp_path, monkeypatch):
        """knn_fingerprint shares the same micro-batching machinery:
        concurrent single Hamming queries coalesce per
        (tenant, algorithm, k) with pow2-padded dispatches and results
        identical to the unbatched path."""
        import asyncio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_QUERY_BATCH_MS", "25")
        rng = np.random.default_rng(51)
        fps = [rng.bytes(8) for _ in range(50)]
        b = EmbeddedBackend(str(tmp_path / "b"))
        recs = [Record(0, i, Modality.IMAGE, "imgfprint-phash-v1", fps[i])
                for i in range(50)]
        asyncio.run(b.upsert(recs))

        sizes = []
        orig = b.knn_fingerprint_batch

        async def counting(tenant_id, algorithm, fps_, k, **kw):
            sizes.append(len(fps_))
            return await orig(tenant_id, algorithm, fps_, k, **kw)

        b.knn_fingerprint_batch = counting

        async def go():
            return await asyncio.gather(*[
                b.knn_fingerprint(0, "imgfprint-phash-v1", fps[i], 3)
                for i in (4, 17, 33)
            ])

        got = asyncio.run(go())
        for want, hits in zip((4, 17, 33), got):
            assert hits[0].record_id == want
            assert hits[0].score == 1.0
        assert sizes == [4]  # 3 queries padded to the pow2 bucket
        b.close()


class TestConcurrentDeletes:
    def test_batched_int4_never_surfaces_prior_deletes(self, tmp_path,
                                                       monkeypatch):
        """The prefix-validity contract on the BATCH path: n is
        snapshotted under the cache lock with the device arrays, so a
        record whose delete COMPLETED before a batched query began must
        never surface (swap-with-last keeps rows dense; a stale n would
        mask a live row or surface a deleted one)."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        monkeypatch.setenv("UCFP_SHARD", "off")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(40)
        n = 5000  # capacity 8192: real packed cache, pools threshold
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b = EmbeddedBackend(str(tmp_path), knn_quant="int4")

        from ucfp_tpu.core import Modality, Record

        recs = [Record(0, i, Modality.TEXT, "e", b"x",
                       embedding=[float(x) for x in vecs[i]])
                for i in range(n)]
        asyncio.run(b.upsert(recs))
        cap = b._vec[(0, 16)].data.shape[0]
        assert b._int4_batch_worth_it(cap, 16, 10, 4)
        doomed = rng.permutation(n)[:1500].tolist()
        qs = [[float(x) for x in vecs[i] + 0.05 * rng.normal(size=16)]
              for i in (10, 2000, 4999, 777)]
        deleted: set[int] = set()

        async def go():
            async def deleter():
                for lo in range(0, len(doomed), 50):
                    chunk = doomed[lo:lo + 50]
                    await b.delete(0, chunk)
                    deleted.update(chunk)
                    await asyncio.sleep(0)

            async def querier():
                for _ in range(25):
                    pre = set(deleted)  # completed before this query
                    res = await b.knn_batch(0, qs, 10)
                    for row in res:
                        for h in row:
                            assert h.record_id not in pre, \
                                f"deleted record {h.record_id} surfaced"
                    await asyncio.sleep(0)

            await asyncio.gather(deleter(), querier())

        asyncio.run(go())
        # end state: the survivors still answer correctly
        alive = next(i for i in (10, 2000, 4999, 777) if i not in deleted)
        res = asyncio.run(b.knn_batch(
            0, [[float(x) for x in vecs[alive]]], 3))
        assert res[0][0].record_id == alive
        b.close()


class TestShardedBatched:
    def test_sharded_batched_matches_exact(self):
        """sharded_cosine_int4_batch_topk at thresholding per-shard
        scale: every shard runs the batched fused kernel with a
        genuinely sub-capacity pool (incl. a shard the prefix ends
        inside and fully-invalid shards) and the merged top-k matches
        the exact int8 ranking per query."""
        import jax
        import jax.numpy as jnp

        from ucfp_tpu.parallel import sharded_knn

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-virtual-device mesh")
        from jax.sharding import Mesh

        mesh = Mesh(np.array(devs[:8]), ("d",))
        rng = np.random.default_rng(30)
        c, d, k, nq = 65536, 16, 10, 3  # 8192 rows/shard >> 2 * pool
        rows = rng.normal(size=(c, d)).astype(np.float32)
        q8, norm = knn_ops.quantize_rows_int8(rows)
        q8 = jnp.asarray(q8)
        norm = jnp.asarray(norm)
        packed_t, inv_n4 = knn_ops.pack_int4_cols_chunked(q8, chunk=8192)
        n = 5 * 8192 + 1234  # prefix ends INSIDE shard 5; shards 6-7 empty
        qm = rng.normal(size=(nq, d)).astype(np.float32)
        qm[1] = rows[777] + 0.03 * rng.normal(size=d).astype(np.float32)
        s_b, i_b = sharded_knn.sharded_cosine_int4_batch_topk(
            jnp.asarray(qm), q8, norm, packed_t, inv_n4, n, k, mesh,
            ("d",),
        )
        s_ref, i_ref = knn_ops.cosine_topk_int8(
            jnp.asarray(qm), q8, norm, jnp.arange(c) < n, k
        )
        for m in range(nq):
            assert set(np.asarray(i_b)[m].tolist()) == \
                set(np.asarray(i_ref)[m].tolist()), f"row {m}"
        assert int(np.asarray(i_b)[1, 0]) == 777
        assert (np.asarray(i_b) < n).all()

    def test_backend_mesh_batched_dispatch(self, tmp_path, monkeypatch):
        """Mesh + forced cost model at a capacity above the placeholder
        threshold: knn_batch rides the sharded batched packed scan and
        matches the int8 backend; the marker mirrors the per-shard
        batch-pool math."""
        import asyncio

        from ucfp_tpu.index.embedded import EmbeddedBackend

        run = asyncio.run
        monkeypatch.setenv("UCFP_SHARD", "auto")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        rng = np.random.default_rng(31)
        n = 5000  # capacity 8192: real packed cache, 1024 rows/shard
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        b4 = EmbeddedBackend(str(tmp_path / "q4"), knn_quant="int4")
        b8 = EmbeddedBackend(str(tmp_path / "q8"), knn_quant="int8")
        run(b4.upsert(self._recs(vecs)))
        run(b8.upsert(self._recs(vecs)))
        assert b4._mesh is not None
        cap = b4._vec[(0, 16)].data.shape[0]
        assert b4._int4_batch_worth_it(cap, 16, 5, 2)
        qs = [[float(x) for x in vecs[i] + 0.02 * rng.normal(size=16)]
              for i in (7, 4321)]
        h4 = run(b4.knn_batch(0, qs, 5))
        h8 = run(b8.knn_batch(0, qs, 5))
        for row4, row8, want in zip(h4, h8, (7, 4321)):
            assert [(h.record_id, round(h.score, 6)) for h in row4] == \
                   [(h.record_id, round(h.score, 6)) for h in row8]
            assert row4[0].record_id == want
        # per-shard pool (512) covers each 1024-row shard? 512*2 >= 1024
        # -> every shard rescores exhaustively -> NOT approximate
        cap_l = cap // b4._n_shards()
        expect = knn_ops.int4_batch_pool(cap_l, 5) * 2 < cap_l
        assert b4.knn_is_approximate(0, 16, 5, batch=True,
                                     batch_q=2) == expect
        b4.close()
        b8.close()

    def _recs(self, vecs):
        from ucfp_tpu.core import Modality, Record

        return [
            Record(0, i, Modality.TEXT, "e", b"x",
                   embedding=[float(x) for x in vecs[i]])
            for i in range(len(vecs))
        ]


class TestDispatchModel:
    def test_supported_shapes(self):
        assert knn_ops.int4_supported(1 << 20, 768)
        assert not knn_ops.int4_supported(1 << 20, 767)  # odd dim
        assert not knn_ops.int4_supported(100, 768)  # not 128-multiple

    def test_beats_exact_at_scale_not_small(self, monkeypatch):
        monkeypatch.delenv("UCFP_SKETCH_COST_MODEL", raising=False)
        pool = knn_ops.int4_pool(10_000_000, 10)
        assert knn_ops.int4_beats_exact(1 << 23, 768, pool)
        # tiny cap: pool covers it; exact wins
        assert not knn_ops.int4_beats_exact(2048, 768,
                                            knn_ops.int4_pool(2048, 10))

    def test_model_orders_sane(self):
        # int4 models strictly below exact at 10M x 768
        assert (knn_ops.int4_model_ms(1 << 23, 768, 2048)
                < knn_ops.exact_scan_model_ms(1 << 23, 768))

    def test_batch_model_orders_sane(self, monkeypatch):
        monkeypatch.delenv("UCFP_SKETCH_COST_MODEL", raising=False)
        # 10M x 768, batch 32: one packed scan + bounce beats GEMM+bounce
        pool = knn_ops.int4_pool(1 << 23, 10)
        assert knn_ops.int4_batch_beats_exact(1 << 23, 768, 32, pool)
        assert (knn_ops.int4_batch_model_ms(1 << 23, 768, 32, pool)
                < knn_ops.exact_batch_model_ms(1 << 23, 768, 32))
        # tiny cap: pool covers it; exact wins
        assert not knn_ops.int4_batch_beats_exact(
            2048, 768, 32, knn_ops.int4_pool(2048, 10))
        # odd dim unsupported
        assert not knn_ops.int4_batch_beats_exact(1 << 23, 767, 32, pool)
        # recalibration knob flips the dispatch
        monkeypatch.setenv("UCFP_COST_INT4B_FLAT_MS", "1e6")
        assert not knn_ops.int4_batch_beats_exact(1 << 23, 768, 32, pool)

    def test_model_honors_recalibration_env(self, monkeypatch):
        """UCFP_COST_INT4_GBPS / UCFP_COST_INT4_FLAT_MS recalibrate the
        int4 model like the other UCFP_COST_* knobs (operators on
        non-v5e chips must be able to keep the never-slower-than-exact
        contract without a code change)."""
        base = knn_ops.int4_model_ms(1 << 23, 768, 2048)
        monkeypatch.setenv("UCFP_COST_INT4_GBPS", "64.0")  # 10x slower
        slow = knn_ops.int4_model_ms(1 << 23, 768, 2048)
        assert slow > 5 * base
        monkeypatch.delenv("UCFP_COST_INT4_GBPS")
        monkeypatch.setenv("UCFP_COST_INT4_FLAT_MS", "50.0")
        assert knn_ops.int4_model_ms(1 << 23, 768, 2048) > base + 40
        # a slow enough chip flips the dispatch to exact
        monkeypatch.setenv("UCFP_COST_INT4_FLAT_MS", "1e6")
        assert not knn_ops.int4_beats_exact(1 << 23, 768, 2048)
