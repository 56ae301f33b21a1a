"""Pallas fused scan kernels vs the XLA reference kernels (CPU interpret)."""

import numpy as np
import pytest

from ucfp_tpu.ops import knn as knn_ops
from ucfp_tpu.ops import pallas_scan


class TestHammingFused:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        c, w, k = pallas_scan.TILE_ROWS * 2, 2, 8
        db = rng.integers(0, 2**32, size=(c, w), dtype=np.uint32)
        q = db[1234].copy()
        dist, idx = pallas_scan.hamming_topk_fused(q, db, k)
        ref_d, ref_i = knn_ops.hamming_topk(
            q[None], db, np.ones(c, bool), k
        )
        np.testing.assert_array_equal(np.sort(np.asarray(dist)),
                                      np.sort(np.asarray(ref_d[0])))
        assert int(np.asarray(dist)[0]) == 0
        assert 1234 in np.asarray(idx).tolist()

    def test_single_tile(self):
        rng = np.random.default_rng(1)
        c, w, k = pallas_scan.TILE_ROWS, 2, 4
        db = rng.integers(0, 2**32, size=(c, w), dtype=np.uint32)
        q = db[7].copy()
        dist, idx = pallas_scan.hamming_topk_fused(q, db, k)
        assert int(np.asarray(idx)[0]) == 7
        assert int(np.asarray(dist)[0]) == 0


class TestCosineInt8Fused:
    def test_matches_reference(self):
        rng = np.random.default_rng(2)
        c, d, k = pallas_scan.TILE_ROWS * 2, 64, 8
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        q8m, row_norm = knn_ops.quantize_rows_int8(matrix)
        q = matrix[99]
        qa = np.abs(q).max()
        qq = np.clip(np.round(q / (qa / 127.0)), -127, 127).astype(np.int8)
        vals, idx = pallas_scan.cosine_int8_topk_fused(qq, q8m, row_norm, k)
        # reference scores: divide by |qq| to get cosine
        qn = np.linalg.norm(qq.astype(np.float32))
        cos = np.asarray(vals) / qn
        ref_v, ref_i = knn_ops.cosine_topk_int8(
            q[None], q8m, row_norm, np.ones(c, bool), k
        )
        inter = len(set(np.asarray(idx).tolist())
                    & set(np.asarray(ref_i[0]).tolist()))
        assert inter >= k - 1
        assert int(np.asarray(idx)[0]) == 99
        np.testing.assert_allclose(cos[0], 1.0, atol=0.02)
