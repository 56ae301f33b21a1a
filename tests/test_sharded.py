"""Sharded query kernel tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from ucfp_tpu.ops import knn as knn_ops
from ucfp_tpu.parallel.mesh import data_mesh
from ucfp_tpu.parallel.sharded_knn import (
    shard_matrix,
    sharded_cosine_topk,
    sharded_hamming_topk,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return data_mesh(8)


class TestShardedCosine:
    def test_matches_single_chip(self, mesh):
        rng = np.random.default_rng(0)
        c, d, q, k = 1024, 32, 3, 7
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        valid = np.ones(c, bool)
        valid[100:200] = False
        query = rng.normal(size=(q, d)).astype(np.float32)

        sm, sv = shard_matrix(mesh, matrix, valid)
        vals, idx = sharded_cosine_topk(query, sm, sv, k, mesh)
        ref_vals, ref_idx = knn_ops.cosine_topk(query, matrix, valid, k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5
        )

    def test_top1_is_true_argmax(self, mesh):
        rng = np.random.default_rng(1)
        c, d = 2048, 16
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        valid = np.ones(c, bool)
        query = rng.normal(size=(1, d)).astype(np.float32)
        sm, sv = shard_matrix(mesh, matrix, valid)
        _, idx = sharded_cosine_topk(query, sm, sv, 1, mesh)
        cos = (query @ matrix.T) / (
            np.linalg.norm(query) * np.linalg.norm(matrix, axis=1)
        )
        assert int(idx[0, 0]) == int(np.argmax(cos))


class TestShardedHammingFused:
    def test_matches_reference_top1(self, mesh):
        from ucfp_tpu.ops import pallas_scan

        tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
        rng = np.random.default_rng(5)
        c, k = tile * 8, 5  # one tile per device
        matrix = rng.integers(0, 2**32, size=(c, 2), dtype=np.uint32)
        q = matrix[123_456].copy()
        sm = jax.device_put(
            matrix,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d", None)),
        )
        from ucfp_tpu.parallel.sharded_knn import sharded_hamming_topk_fused

        dist, idx = sharded_hamming_topk_fused(q, sm, k, mesh)
        assert int(np.asarray(idx)[0]) == 123_456
        assert int(np.asarray(dist)[0]) == 0
        ref_d, ref_i = knn_ops.hamming_topk(q[None], matrix, np.ones(c, bool), k)
        inter = len(set(np.asarray(idx).tolist())
                    & set(np.asarray(ref_i[0]).tolist()))
        assert inter >= k - 1


class TestShardedHamming:
    def test_matches_single_chip(self, mesh):
        rng = np.random.default_rng(2)
        c, w, k = 512, 2, 5
        matrix = rng.integers(0, 2**32, size=(c, w), dtype=np.uint32)
        valid = np.ones(c, bool)
        query = matrix[37:38].copy()
        sm, sv = shard_matrix(mesh, matrix, valid)
        dist, idx = sharded_hamming_topk(query, sm, sv, k, mesh)
        ref_dist, ref_idx = knn_ops.hamming_topk(query, matrix, valid, k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_array_equal(np.asarray(dist), np.asarray(ref_dist))
        assert int(idx[0, 0]) == 37 and int(dist[0, 0]) == 0


class TestShardedCosineInt8:
    def test_matches_single_chip(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ucfp_tpu.parallel.sharded_knn import AXIS, sharded_cosine_int8_topk

        rng = np.random.default_rng(4)
        c, d, k = 2048, 32, 7
        matrix = rng.normal(size=(c, d)).astype(np.float32)
        q8m, row_norm = knn_ops.quantize_rows_int8(matrix)
        valid = np.ones(c, bool)
        valid[300:400] = False
        q = matrix[777]
        qa = np.abs(q).max()
        qq = np.clip(np.round(q / (qa / 127.0)), -127, 127).astype(np.int8)

        ms = NamedSharding(mesh, P(AXIS, None))
        vs = NamedSharding(mesh, P(AXIS))
        db_s = jax.device_put(q8m, ms)
        rn_s = jax.device_put(row_norm, vs)
        v_s = jax.device_put(valid, vs)
        vals, idx = sharded_cosine_int8_topk(qq, db_s, rn_s, v_s, k, mesh)

        # reference: single-chip exact int8 scoring
        dots = q8m.astype(np.float32) @ qq.astype(np.float32)
        scores = np.where(valid, dots / np.maximum(row_norm, 1e-9), -np.inf)
        ref_idx = np.argsort(-scores)[:k]
        assert int(np.asarray(idx)[0]) == 777
        assert set(np.asarray(idx).tolist()) == set(ref_idx.tolist())
        np.testing.assert_allclose(
            np.asarray(vals), np.sort(scores)[::-1][:k], rtol=1e-5
        )
