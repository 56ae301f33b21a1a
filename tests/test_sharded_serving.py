"""Sharded serving integration: EmbeddedBackend row-shards its ANN
caches over the device mesh (SURVEY §7 step 7 — the north-star kernel
wired into /v1/query, not just the raw kernels). conftest forces 8
virtual CPU devices, so UCFP_SHARD=auto activates the mesh here."""

import asyncio

import numpy as np
import pytest

from ucfp_tpu.core import Modality, Record
from ucfp_tpu.index.embedded import EmbeddedBackend


def _rec(rid, emb=None, fp=b"\x00" * 8, tenant=1, algo="imgfprint-phash-v1"):
    return Record(
        tenant_id=tenant, record_id=rid, modality=Modality.IMAGE,
        algorithm=algo, fingerprint=fp,
        embedding=list(emb) if emb is not None else None,
    )


@pytest.fixture(autouse=True)
def _mesh_on(monkeypatch):
    # these tests EXERCISE the mesh: a UCFP_SHARD=off sweep must not
    # turn them into contradiction failures
    monkeypatch.setenv("UCFP_SHARD", "auto")


def _mk(tmp_path, name, **kw):
    return EmbeddedBackend(str(tmp_path / name), **kw)


def _ingest_vectors(be, n=40, d=16, seed=0):
    rng = np.random.default_rng(seed)
    embs = rng.normal(size=(n, d)).astype(np.float32)
    recs = [_rec(i, embs[i]) for i in range(n)]
    asyncio.run(be.upsert(recs))
    return embs


def _ingest_prints_at(be, base, n=40, words=2, seed=0):
    """Fingerprint records at rid base+i (separate id space so they don't
    evict same-id vector records' embeddings)."""
    rng = np.random.default_rng(seed)
    fps = rng.integers(0, 256, size=(n, words * 4), dtype=np.uint8)
    recs = [_rec(base + i, fp=bytes(fps[i])) for i in range(n)]
    asyncio.run(be.upsert(recs))
    return fps


def _ingest_prints(be, n=40, words=2, seed=0):
    rng = np.random.default_rng(seed)
    fps = rng.integers(0, 256, size=(n, words * 4), dtype=np.uint8)
    recs = [_rec(i, fp=bytes(fps[i])) for i in range(n)]
    asyncio.run(be.upsert(recs))
    return fps


class TestMeshActivation:
    def test_mesh_on_by_default_with_8_devices(self, tmp_path):
        be = _mk(tmp_path, "a")
        assert be._mesh is not None
        assert be._mesh.devices.size == 8
        be.close()

    def test_shard_off_knob(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_SHARD", "off")
        be = _mk(tmp_path, "b")
        assert be._mesh is None
        be.close()

    def test_caches_actually_sharded(self, tmp_path):
        from jax.sharding import NamedSharding

        be = _mk(tmp_path, "c")
        _ingest_vectors(be)
        hits = asyncio.run(be.knn(1, [1.0] * 16, 3))
        assert len(hits) == 3
        cache = be._vec[(1, 16)]
        sh = cache.device[0].sharding
        assert isinstance(sh, NamedSharding)
        assert sh.spec[0] == "d"  # rows sharded over the mesh axis
        # the packed fingerprint cache too
        asyncio.run(be.knn_fingerprint(1, "imgfprint-phash-v1", b"\x01" * 8, 2))
        hsh = be._ham[(1, "imgfprint-phash-v1")].device[0].sharding
        assert isinstance(hsh, NamedSharding)
        assert hsh.spec[0] == "d"
        be.close()

    def test_scatter_update_preserves_sharding(self, tmp_path):
        be = _mk(tmp_path, "d")
        embs = _ingest_vectors(be)
        asyncio.run(be.knn(1, [1.0] * 16, 3))  # build the device cache
        before = be._vec[(1, 16)].device[0].sharding
        # incremental write -> pending-row scatter on next query
        asyncio.run(be.upsert([_rec(7, np.ones(16, np.float32))]))
        hits = asyncio.run(be.knn(1, list(np.ones(16) / 4.0), 1))
        assert hits[0].record_id == 7  # updated row wins
        after = be._vec[(1, 16)].device[0].sharding
        assert after == before
        be.close()


class TestShardedMatchesSingleDevice:
    def test_knn_parity(self, tmp_path, monkeypatch):
        be_s = _mk(tmp_path, "s")
        embs = _ingest_vectors(be_s, n=50, d=24)
        monkeypatch.setenv("UCFP_SHARD", "off")
        be_1 = _mk(tmp_path, "one")
        _ingest_vectors(be_1, n=50, d=24)
        q = list(np.asarray(embs[13], float))
        hs = asyncio.run(be_s.knn(1, q, 7))
        h1 = asyncio.run(be_1.knn(1, q, 7))
        assert [h.record_id for h in hs] == [h.record_id for h in h1]
        np.testing.assert_allclose(
            [h.score for h in hs], [h.score for h in h1], rtol=1e-5
        )
        assert hs[0].record_id == 13
        be_s.close()
        be_1.close()

    def test_knn_batch_parity(self, tmp_path, monkeypatch):
        be_s = _mk(tmp_path, "s")
        embs = _ingest_vectors(be_s, n=64, d=8, seed=3)
        monkeypatch.setenv("UCFP_SHARD", "off")
        be_1 = _mk(tmp_path, "one")
        _ingest_vectors(be_1, n=64, d=8, seed=3)
        queries = [list(map(float, embs[i])) for i in (0, 9, 33)]
        rs = asyncio.run(be_s.knn_batch(1, queries, 5))
        r1 = asyncio.run(be_1.knn_batch(1, queries, 5))
        for hs, h1 in zip(rs, r1):
            assert [h.record_id for h in hs] == [h.record_id for h in h1]
        be_s.close()
        be_1.close()

    def test_knn_int8_sharded(self, tmp_path):
        be = _mk(tmp_path, "q", knn_quant="int8")
        assert be._mesh is not None
        embs = _ingest_vectors(be, n=30, d=32, seed=5)
        hits = asyncio.run(be.knn(1, list(map(float, embs[11])), 3))
        assert hits[0].record_id == 11
        assert hits[0].score == pytest.approx(1.0, abs=2e-2)
        be.close()

    def test_fingerprint_parity(self, tmp_path, monkeypatch):
        be_s = _mk(tmp_path, "s")
        fps = _ingest_prints(be_s, n=60, seed=7)
        monkeypatch.setenv("UCFP_SHARD", "off")
        be_1 = _mk(tmp_path, "one")
        _ingest_prints(be_1, n=60, seed=7)
        q = bytes(fps[21])
        hs = asyncio.run(be_s.knn_fingerprint(1, "imgfprint-phash-v1", q, 5))
        h1 = asyncio.run(be_1.knn_fingerprint(1, "imgfprint-phash-v1", q, 5))
        assert hs[0].record_id == 21 and hs[0].score == 1.0
        assert [h.record_id for h in hs] == [h.record_id for h in h1]
        assert [h.score for h in hs] == [h.score for h in h1]
        be_s.close()
        be_1.close()

    def test_k_larger_than_shard_height(self, tmp_path, monkeypatch):
        """k > cap/n_devices exercises the local-k clamp: each shard can
        contribute at most all of its rows, so results stay exact."""
        be_s = _mk(tmp_path, "s")
        _ingest_vectors(be_s, n=40, d=4, seed=9)
        monkeypatch.setenv("UCFP_SHARD", "off")
        be_1 = _mk(tmp_path, "one")
        _ingest_vectors(be_1, n=40, d=4, seed=9)
        q = [1.0, 0.5, -0.25, 2.0]
        # cap = 1024, 8 devices -> shard height 128; k=40 covers every
        # live record and must return all of them in identical order
        hs = asyncio.run(be_s.knn(1, q, 40))
        h1 = asyncio.run(be_1.knn(1, q, 40))
        assert len(hs) == 40
        assert [h.record_id for h in hs] == [h.record_id for h in h1]
        be_s.close()
        be_1.close()


class TestFusedBatchedHamming:
    def test_matches_exact_on_tile_aligned_db(self):
        import jax.numpy as jnp

        from ucfp_tpu.ops import knn as knn_ops
        from ucfp_tpu.ops import pallas_scan

        rng = np.random.default_rng(2)
        c = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES  # one tile
        db = rng.integers(0, 2**32, size=(c, 2), dtype=np.uint32)
        valid = np.ones(c, bool)
        valid[c - 500:] = False  # padding tail
        qm = db[[5, 77, c - 400]]  # the last one targets an INVALID row
        fd, fi = pallas_scan.hamming_topk_fused_batched(
            jnp.asarray(qm), jnp.asarray(db), jnp.asarray(valid), 1
        )
        ed, ei = knn_ops.hamming_topk(
            jnp.asarray(qm), jnp.asarray(db), jnp.asarray(valid), 1
        )
        # top-1 is exact in the partial reduce
        assert int(fi[0, 0]) == 5 and int(fd[0, 0]) == 0
        assert int(fi[1, 0]) == 77
        assert int(fd[2, 0]) == int(ed[2, 0])  # masked row never wins
        assert int(fd[2, 0]) > 0


class TestBatchedHaitsma:
    """One padded-stream device dispatch per query (was a per-record
    kernel-launch loop); results match the single-pair kernel."""

    def _frames(self, rng, t):
        return rng.integers(0, 2**32, size=t, dtype=np.uint32)

    def test_batch_matches_single_pair(self, tmp_path):
        from ucfp_tpu.ops.audio import haitsma as hops

        rng = np.random.default_rng(4)
        streams = {i: self._frames(rng, 50 + 13 * i) for i in range(9)}
        q = streams[4][10:34].copy()
        be = _mk(tmp_path, "h")
        recs = [
            Record(tenant_id=2, record_id=i, modality=Modality.AUDIO,
                   algorithm="audiofp-haitsma-v1",
                   fingerprint=streams[i].tobytes())
            for i in streams
        ]
        asyncio.run(be.upsert(recs))
        hits = asyncio.run(be.knn_haitsma(2, q.tobytes(), 3))
        assert hits[0].record_id == 4 and hits[0].score == 1.0
        # every returned score agrees with the reference single-pair kernel
        for h in hits:
            ber, _ = hops.min_ber(streams[h.record_id], q)
            assert h.score == pytest.approx(1.0 - ber, abs=1e-6)
        # the device cache is one padded matrix covering the catalog
        sc = be._haitsma[2]
        assert sc.n == 9 and sc.data.shape[1] >= max(len(s) for s in streams.values())
        be.close()

    def test_delete_and_replay(self, tmp_path):
        rng = np.random.default_rng(5)
        s1, s2 = self._frames(rng, 80), self._frames(rng, 96)
        be = _mk(tmp_path, "h2")
        asyncio.run(be.upsert([
            Record(tenant_id=1, record_id=1, modality=Modality.AUDIO,
                   algorithm="audiofp-haitsma-v1", fingerprint=s1.tobytes()),
            Record(tenant_id=1, record_id=2, modality=Modality.AUDIO,
                   algorithm="audiofp-haitsma-v1", fingerprint=s2.tobytes()),
        ]))
        asyncio.run(be.delete(1, [1]))
        hits = asyncio.run(be.knn_haitsma(1, s1[:32].tobytes(), 2))
        assert all(h.record_id != 1 for h in hits)
        be.close()
        # replay rebuilds the stream cache
        be2 = EmbeddedBackend(str(tmp_path / "h2"))
        hits2 = asyncio.run(be2.knn_haitsma(1, s2[20:52].tobytes(), 1))
        assert hits2 and hits2[0].record_id == 2 and hits2[0].score == 1.0
        be2.close()


class TestMultiSliceMesh:
    """UCFP_MESH_SHAPE=2x4: rows sharded over slices x ICI with the
    hierarchical two-stage merge (innermost axis first)."""

    def test_2d_mesh_parity(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_MESH_SHAPE", "2x4")
        be2 = _mk(tmp_path, "m2")
        assert be2._mesh is not None and be2._mesh_axes == ("s", "d")
        assert be2._mesh.devices.shape == (2, 4)
        embs = _ingest_vectors(be2, n=48, d=16, seed=12)
        fps = _ingest_prints_at(be2, base=1000, n=48, seed=13)
        monkeypatch.delenv("UCFP_MESH_SHAPE")
        monkeypatch.setenv("UCFP_SHARD", "off")
        be1 = _mk(tmp_path, "m1")
        _ingest_vectors(be1, n=48, d=16, seed=12)
        _ingest_prints_at(be1, base=1000, n=48, seed=13)
        q = list(map(float, embs[17]))
        h2 = asyncio.run(be2.knn(1, q, 6))
        h1 = asyncio.run(be1.knn(1, q, 6))
        assert [h.record_id for h in h2] == [h.record_id for h in h1]
        assert h2[0].record_id == 17
        f2 = asyncio.run(be2.knn_fingerprint(1, "imgfprint-phash-v1",
                                             bytes(fps[9]), 4))
        f1 = asyncio.run(be1.knn_fingerprint(1, "imgfprint-phash-v1",
                                             bytes(fps[9]), 4))
        assert f2 and [h.record_id for h in f2] == [h.record_id for h in f1]
        assert f2[0].record_id == 1009
        # the cache really spans both mesh axes
        sh = be2._vec[(1, 16)].device[0].sharding
        assert sh.spec[0] == ("s", "d")
        be2.close()
        be1.close()

    def test_2d_int8(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_MESH_SHAPE", "4x2")
        be = _mk(tmp_path, "mq", knn_quant="int8")
        embs = _ingest_vectors(be, n=40, d=32, seed=14)
        hits = asyncio.run(be.knn(1, list(map(float, embs[23])), 3))
        assert hits[0].record_id == 23
        be.close()


class TestShardedSketch:
    """UCFP_KNN_QUANT=sketch under the mesh: each shard runs the sketch
    prefilter + exact int8 rescore over its rows, two-stage merge."""

    def test_sharded_sketch_single_query(self, tmp_path, monkeypatch):
        # force the sketch kernel: at test scale the serving cost model
        # would (correctly) route to the exact sharded scan
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        be = _mk(tmp_path, "sk", knn_quant="sketch")
        assert be._mesh is not None
        embs = _ingest_vectors(be, n=64, d=16, seed=7)
        hits = asyncio.run(be.knn(1, [float(x) for x in embs[33]], 5))
        assert hits[0].record_id == 33
        assert hits[0].score > 0.99
        # sharded sketch cache is the 4-tuple (q8, rn, sketch, valid)
        dev = be._vec[(1, 16)].device
        assert len(dev) == 4
        from ucfp_tpu.ops import knn as knn_ops

        assert dev[2].shape[1] == knn_ops.SKETCH_WORDS
        be.close()

    def test_sharded_sketch_matches_int8_small(self, tmp_path, monkeypatch):
        # pool covers every shard's rows -> results identical to the
        # sharded int8 scan
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        bs = _mk(tmp_path, "s2", knn_quant="sketch")
        b8 = _mk(tmp_path, "i2", knn_quant="int8")
        embs = _ingest_vectors(bs, n=48, d=12, seed=3)
        rng = np.random.default_rng(3)
        recs = [_rec(i, embs[i]) for i in range(48)]
        asyncio.run(b8.upsert(recs))
        q = [float(x) for x in rng.normal(size=12).astype(np.float32)]
        hs = asyncio.run(bs.knn(1, q, 5))
        h8 = asyncio.run(b8.knn(1, q, 5))
        assert [(h.record_id, round(h.score, 5)) for h in hs] == \
               [(h.record_id, round(h.score, 5)) for h in h8]
        bs.close(); b8.close()

    def test_sharded_sketch_batch_and_update(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        be = _mk(tmp_path, "s3", knn_quant="sketch")
        embs = _ingest_vectors(be, n=40, d=16, seed=9)
        res = asyncio.run(be.knn_batch(
            1, [[float(x) for x in embs[5]], [float(x) for x in embs[29]]], 3))
        assert res[0][0].record_id == 5
        assert res[1][0].record_id == 29
        # scatter update flows into the sharded sketch too
        rng = np.random.default_rng(10)
        new = rng.normal(size=16).astype(np.float32)
        asyncio.run(be.upsert([_rec(901, new)]))
        got = asyncio.run(be.knn(1, [float(x) for x in new], 1))
        assert got[0].record_id == 901
        be.close()


class TestMultiSliceSketch:
    def test_2d_mesh_sketch_serving(self, tmp_path, monkeypatch):
        """Sketch prefilter over the (slice, ICI) 2-D mesh: per-shard
        pools + hierarchical two-stage merge."""
        monkeypatch.setenv("UCFP_MESH_SHAPE", "2x4")
        monkeypatch.setenv("UCFP_SKETCH_COST_MODEL", "0")
        be = _mk(tmp_path, "sk2d", knn_quant="sketch")
        assert be._mesh_axes == ("s", "d")
        embs = _ingest_vectors(be, n=64, d=16, seed=13)
        hits = asyncio.run(be.knn(1, [float(x) for x in embs[29]], 5))
        assert hits[0].record_id == 29 and hits[0].score > 0.99
        dev = be._vec[(1, 16)].device
        assert len(dev) == 4  # (q8, rn, sketch, valid)
        be.close()
