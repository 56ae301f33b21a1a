"""Pallas fused scan kernels vs the XLA reference kernels (CPU interpret).

The fused kernels keep one candidate per (tile, lane) cell, so they are
exact for top-1 and near-exact for small k (collision bound documented
in the module header) — tests assert exact top-1 and high top-k recall.
"""

import numpy as np
import pytest

from ucfp_tpu.ops import knn as knn_ops
from ucfp_tpu.ops import pallas_scan

TILE = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES  # rows per tile


class TestHammingFused:
    def test_exact_match_and_recall(self):
        rng = np.random.default_rng(0)
        c, w, k = TILE * 2, 2, 8
        db = rng.integers(0, 2**32, size=(c, w), dtype=np.uint32)
        q = db[40_000].copy()
        dist, idx = pallas_scan.hamming_topk_fused(q, db, k)
        assert int(np.asarray(dist)[0]) == 0
        assert int(np.asarray(idx)[0]) == 40_000
        ref_d, ref_i = knn_ops.hamming_topk(q[None], db, np.ones(c, bool), k)
        inter = len(set(np.asarray(idx).tolist())
                    & set(np.asarray(ref_i[0]).tolist()))
        assert inter >= k - 1  # per-lane collisions are rare

    def test_batched_padding_regimes(self):
        """The 8-query-block batched Hamming scan across every q
        regime (q < QSEL, q == QSEL, q % QSEL != 0): per-row results
        must match the exact XLA kernel's top-1 and mask invalid
        rows."""
        rng = np.random.default_rng(3)
        c, w, k = TILE, 2, 4
        db = rng.integers(0, 2**32, size=(c, w), dtype=np.uint32)
        valid = np.ones(c, bool)
        valid[c // 2:] = False
        for q in (1, 3, 8, 11):
            planted = [rng.integers(0, c // 2) for _ in range(q)]
            qs = np.stack([db[p] for p in planted])
            d, i = pallas_scan.hamming_topk_fused_batched(
                qs, db, valid, k)
            assert d.shape == (q, k)
            for row in range(q):
                assert int(np.asarray(d)[row, 0]) == 0
                assert int(np.asarray(i)[row, 0]) == planted[row]
                # nothing from the invalid half ever surfaces
                assert all(int(x) < c // 2 for x in np.asarray(i)[row])

    def test_single_tile(self):
        rng = np.random.default_rng(1)
        c, w = TILE, 2
        db = rng.integers(0, 2**32, size=(c, w), dtype=np.uint32)
        q = db[7].copy()
        dist, idx = pallas_scan.hamming_topk_fused(q, db, 4)
        assert int(np.asarray(idx)[0]) == 7
        assert int(np.asarray(dist)[0]) == 0


class TestScoresTopkFused:
    def test_matches_lax_topk(self):
        rng = np.random.default_rng(5)
        c, k = TILE, 16
        scores = rng.normal(size=c).astype(np.float32)
        vals, idx = pallas_scan.scores_topk_fused(scores, k, largest=True)
        order = np.argsort(-scores)
        # top-1 exact; top-k high recall (per-lane collisions possible)
        assert int(np.asarray(idx)[0]) == int(order[0])
        inter = len(set(np.asarray(idx).tolist()) & set(order[:k].tolist()))
        assert inter >= k - 2

    def test_smallest_mode(self):
        rng = np.random.default_rng(6)
        scores = rng.normal(size=TILE).astype(np.float32)
        vals, idx = pallas_scan.scores_topk_fused(scores, 4, largest=False)
        assert int(np.asarray(idx)[0]) == int(np.argmin(scores))

    def test_batched_matches_single(self):
        rng = np.random.default_rng(9)
        q, c, k = 4, TILE, 8
        scores = rng.normal(size=(q, c)).astype(np.float32)
        bv, bi = pallas_scan.scores_topk_fused_batched(scores, k, largest=True)
        for row in range(q):
            sv, si = pallas_scan.scores_topk_fused(scores[row], k, largest=True)
            np.testing.assert_array_equal(np.asarray(bi[row]), np.asarray(si))
            np.testing.assert_array_equal(np.asarray(bv[row]), np.asarray(sv))

    def test_batched_padding_and_blocks(self):
        """Every q regime of the 8-query-block selection: q < QSEL (no
        padding, block height q), q == QSEL, and q % QSEL != 0 (padded
        with fill rows that must never leak into real rows), in both
        largest/smallest modes."""
        rng = np.random.default_rng(12)
        c, k = TILE, 6
        for q, largest in ((1, True), (3, False), (8, True), (11, True),
                           (11, False)):
            scores = rng.normal(size=(q, c)).astype(np.float32)
            bv, bi = pallas_scan.scores_topk_fused_batched(
                scores, k, largest=largest)
            assert bv.shape == (q, k)
            for row in range(q):
                sv, si = pallas_scan.scores_topk_fused(
                    scores[row], k, largest=largest)
                np.testing.assert_array_equal(np.asarray(bi[row]),
                                              np.asarray(si))
                np.testing.assert_array_equal(np.asarray(bv[row]),
                                              np.asarray(sv))

    def test_dots_norm_batched_matches_single(self):
        """dots_norm_topk_fused_batched row m == dots_norm_topk_fused
        for query m, bit-for-bit, incl. per-query 1/|q| scales, the
        prefix boundary, zero-norm rows, and q-padding."""
        import jax.numpy as jnp

        rng = np.random.default_rng(13)
        c, k = TILE, 8
        rn = np.abs(rng.normal(size=c)).astype(np.float32) * 100.0
        rn[5] = 0.0
        n = c - 333
        for q in (1, 5, 8, 9):
            dots = rng.integers(-(2**20), 2**20, size=(q, c)).astype(
                np.int32)
            inv_q = (1.0 / np.abs(rng.normal(size=q) * 50.0 + 10.0)
                     ).astype(np.float32)
            bv, bi = pallas_scan.dots_norm_topk_fused_batched(
                jnp.asarray(dots), jnp.asarray(rn), jnp.int32(n),
                jnp.asarray(inv_q), k,
            )
            for m in range(q):
                sv, si = pallas_scan.dots_norm_topk_fused(
                    jnp.asarray(dots[m]), jnp.asarray(rn), jnp.int32(n),
                    jnp.float32(inv_q[m]), k,
                )
                np.testing.assert_array_equal(np.asarray(bi[m]),
                                              np.asarray(si))
                np.testing.assert_array_equal(np.asarray(bv[m]),
                                              np.asarray(sv))

    def test_dots_norm_fused_matches_composition(self):
        """dots_norm_topk_fused == f32 convert + prefix mask + divide +
        scores_topk_fused, bit-for-bit, incl. the prefix boundary, the
        1/|q| scale, and zero-norm rows."""
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        c, k = TILE * 2, 8
        dots = rng.integers(-(2**20), 2**20, size=c).astype(np.int32)
        rn = np.abs(rng.normal(size=c)).astype(np.float32) * 100.0
        rn[17] = 0.0  # zero-norm row masks itself
        n = c - 777
        inv_q = np.float32(1.0 / 53.0)
        fv, fi = pallas_scan.dots_norm_topk_fused(
            jnp.asarray(dots), jnp.asarray(rn), jnp.int32(n),
            jnp.float32(inv_q), k,
        )
        ok = (np.arange(c) < n) & (rn > 0.0)
        sc = np.where(ok, dots.astype(np.float32) / np.maximum(rn, 1e-9)
                      * inv_q, -np.inf)
        rv, ri = pallas_scan.scores_topk_fused(jnp.asarray(sc), k)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(fv), np.asarray(rv))

    def test_hybrid_cosine(self):
        rng = np.random.default_rng(7)
        c, d, k = TILE, 64, 8
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        q8m, row_norm = knn_ops.quantize_rows_int8(matrix)
        q = matrix[1234]
        qq = np.clip(np.round(q / (np.abs(q).max() / 127.0)), -127, 127).astype(
            np.int8
        )
        vals, idx = pallas_scan.cosine_int8_topk_hybrid(qq, q8m, row_norm, k)
        assert int(np.asarray(idx)[0]) == 1234


class TestCosineInt8Fused:
    def test_exact_match_and_recall(self):
        rng = np.random.default_rng(2)
        c, d, k = TILE, 64, 8
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        q8m, row_norm = knn_ops.quantize_rows_int8(matrix)
        q = matrix[9_999]
        qa = np.abs(q).max()
        qq = np.clip(np.round(q / (qa / 127.0)), -127, 127).astype(np.int8)
        vals, idx = pallas_scan.cosine_int8_topk_fused(qq, q8m, row_norm, k)
        assert int(np.asarray(idx)[0]) == 9_999
        qn = np.linalg.norm(qq.astype(np.float32))
        np.testing.assert_allclose(np.asarray(vals)[0] / qn, 1.0, atol=0.02)
        ref_v, ref_i = knn_ops.cosine_topk_int8(
            q[None], q8m, row_norm, np.ones(c, bool), k
        )
        inter = len(set(np.asarray(idx).tolist())
                    & set(np.asarray(ref_i[0]).tolist()))
        assert inter >= k - 2


class TestCosineInt8Mxu:
    def test_exact_match_and_recall(self):
        rng = np.random.default_rng(3)
        c, d, k = 64 * 128, 64, 8
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        q8m, row_norm = knn_ops.quantize_rows_int8(matrix)
        q = matrix[4_321]
        qa = np.abs(q).max()
        qq = np.clip(np.round(q / (qa / 127.0)), -127, 127).astype(np.int8)
        vals, idx = pallas_scan.cosine_int8_topk_mxu(qq, q8m, row_norm, k)
        assert int(np.asarray(idx)[0]) == 4_321
        qn = np.linalg.norm(qq.astype(np.float32))
        np.testing.assert_allclose(np.asarray(vals)[0] / qn, 1.0, atol=0.02)
        ref_v, ref_i = knn_ops.cosine_topk_int8(
            q[None], q8m, row_norm, np.ones(c, bool), k
        )
        inter = len(set(np.asarray(idx).tolist())
                    & set(np.asarray(ref_i[0]).tolist()))
        assert inter >= k - 2

    def test_dots_bit_exact_vs_int_gemv(self):
        """bf16 inputs + f32 MXU accumulation must reproduce the int32
        GEMV dots exactly (|dot| < 2^24)."""
        rng = np.random.default_rng(4)
        c, d = 32 * 128, 128  # per = 1 packing path
        db8 = rng.integers(-127, 128, size=(c, d)).astype(np.int8)
        rn = np.linalg.norm(db8.astype(np.float32), axis=1).astype(np.float32)
        qq = rng.integers(-127, 128, size=d).astype(np.int8)
        vals, idx = pallas_scan.cosine_int8_topk_mxu(qq, db8, rn, 5)
        exact_dots = db8.astype(np.int64) @ qq.astype(np.int64)
        got = np.asarray(vals) * rn[np.asarray(idx)]
        np.testing.assert_allclose(
            got, exact_dots[np.asarray(idx)].astype(np.float32), rtol=0, atol=0.5
        )

    def test_d32_packing_and_guards(self):
        rng = np.random.default_rng(5)
        c, d = 32 * 512, 32  # per = 4
        db8 = rng.integers(-127, 128, size=(c, d)).astype(np.int8)
        rn = np.linalg.norm(db8.astype(np.float32), axis=1).astype(np.float32)
        qq = db8[777].copy()
        vals, idx = pallas_scan.cosine_int8_topk_mxu(qq, db8, rn, 3)
        assert int(np.asarray(idx)[0]) == 777
        with pytest.raises(ValueError):
            pallas_scan.cosine_int8_topk_mxu(
                np.zeros(48, np.int8), np.zeros((1024, 48), np.int8),
                np.ones(1024, np.float32), 3)
