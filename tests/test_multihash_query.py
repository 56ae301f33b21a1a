"""Weighted multi-hash comparison (reference MultiHashConfigDto,
dto.rs:465-480): component-wise scoring of 536-byte bundles with
phash .4 / dhash .3 / ahash .1 / global .1 / block .1 defaults."""

import asyncio
import io
import json

import numpy as np
import pytest

from ucfp_tpu.core import Modality, Record
from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.ops import imagehash as ih

from test_server import TOKEN, call, jbody, make_app


def _bundle(phash, dhash, ahash, hist, block):
    """Serialize one synthetic 536-byte bundle."""
    out = {
        "phash": np.asarray(phash, np.uint8)[None],
        "dhash": np.asarray(dhash, np.uint8)[None],
        "ahash": np.asarray(ahash, np.uint8)[None],
        "hist": np.asarray(hist, np.float32)[None],
        "block": np.asarray(block, np.uint8)[None],
    }
    return ih.serialize_multihash(out, 0)


def _uniform_hist():
    return np.full(64, 1.0 / 64.0, np.float32)


class TestKernel:
    def test_identical_bundle_scores_one(self):
        import jax.numpy as jnp

        from ucfp_tpu.ops import knn as knn_ops

        fp = _bundle([0xAA] * 8, [0x55] * 8, [0xF0] * 8,
                     _uniform_hist(), np.arange(256) % 256)
        q = np.asarray(knn_ops.pack_bits_to_u32(fp), np.uint32)[None]
        db = np.vstack([q, q])
        valid = np.array([True, True])
        params = ih.multihash_params(None)
        s, i = ih.multihash_weighted_topk(
            jnp.asarray(q), jnp.asarray(db), jnp.asarray(valid),
            jnp.asarray(params), 2
        )
        assert float(s[0, 0]) == pytest.approx(1.0, abs=1e-6)

    def test_component_weights_drive_ranking(self):
        """A phash-match/others-differ row must outrank a
        block-match/others-differ row under default weights (phash .4
        vs block .1) and flip when the weights flip."""
        import jax.numpy as jnp

        from ucfp_tpu.ops import knn as knn_ops

        hist_a = _uniform_hist()
        hist_b = np.zeros(64, np.float32)
        hist_b[0] = 1.0
        blocks_a = np.zeros(256, np.uint8)
        blocks_b = np.full(256, 200, np.uint8)
        q = _bundle([0xAA] * 8, [0x55] * 8, [0xF0] * 8, hist_a, blocks_a)
        # row 0: phash identical, everything else maximally different
        r0 = _bundle([0xAA] * 8, [~0x55 & 0xFF] * 8, [~0xF0 & 0xFF] * 8,
                     hist_b, blocks_b)
        # row 1: block identical, everything else maximally different
        r1 = _bundle([~0xAA & 0xFF] * 8, [~0x55 & 0xFF] * 8,
                     [~0xF0 & 0xFF] * 8, hist_b, blocks_a)
        qp = np.asarray(knn_ops.pack_bits_to_u32(q), np.uint32)[None]
        db = np.vstack([
            np.asarray(knn_ops.pack_bits_to_u32(r0), np.uint32),
            np.asarray(knn_ops.pack_bits_to_u32(r1), np.uint32),
        ])
        valid = np.array([True, True])
        s, i = ih.multihash_weighted_topk(
            jnp.asarray(qp), jnp.asarray(db), jnp.asarray(valid),
            jnp.asarray(ih.multihash_params(None)), 2
        )
        assert int(i[0, 0]) == 0  # phash weight dominates
        flipped = ih.multihash_params(
            {"phash_weight": 0.05, "block_weight": 0.9}
        )
        s2, i2 = ih.multihash_weighted_topk(
            jnp.asarray(qp), jnp.asarray(db), jnp.asarray(valid),
            jnp.asarray(flipped), 2
        )
        assert int(i2[0, 0]) == 1  # block weight dominates now

    def test_block_threshold(self):
        """Blocks within the threshold count as matches."""
        import jax.numpy as jnp

        from ucfp_tpu.ops import knn as knn_ops

        base = np.full(256, 100, np.uint8)
        near = base + 10  # within default threshold 12
        far = base + 40
        q = _bundle([0] * 8, [0] * 8, [0] * 8, _uniform_hist(), base)
        rows = [
            _bundle([0] * 8, [0] * 8, [0] * 8, _uniform_hist(), near),
            _bundle([0] * 8, [0] * 8, [0] * 8, _uniform_hist(), far),
        ]
        qp = np.asarray(knn_ops.pack_bits_to_u32(q), np.uint32)[None]
        db = np.vstack([
            np.asarray(knn_ops.pack_bits_to_u32(r), np.uint32) for r in rows
        ])
        params = ih.multihash_params(None)
        s, i = ih.multihash_weighted_topk(
            jnp.asarray(qp), jnp.asarray(db), jnp.asarray(np.ones(2, bool)),
            jnp.asarray(params), 2
        )
        assert int(i[0, 0]) == 0
        assert float(s[0, 0]) == pytest.approx(1.0, abs=1e-6)  # all within 12
        assert float(s[0, 1]) == pytest.approx(0.9, abs=1e-6)  # block term lost


def _png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg(arr, quality=35):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


class TestEndToEnd:
    def test_near_duplicate_ranks_above_unrelated(self, tmp_path):
        """VERDICT done-condition: a recompressed JPEG of an ingested
        image outranks unrelated images on an imgfprint-multi-v1 query."""
        app, _ = make_app(tmp_path)
        rng = np.random.default_rng(11)
        # a structured photo-like image (smooth gradients + shapes)
        y, x = np.mgrid[0:128, 0:128]
        img = np.stack([
            (x * 2) % 256, (y * 2) % 256, ((x + y)) % 256
        ], axis=-1).astype(np.uint8)
        img[30:70, 40:90] = (200, 40, 40)
        unrelated = rng.integers(0, 256, size=(128, 128, 3), dtype=np.uint8)
        r = call(app, "POST", "/v1/ingest/image/1/1", _png(img),
                 query="algorithm=multi")
        assert r.status == 201
        r = call(app, "POST", "/v1/ingest/image/1/2", _png(unrelated),
                 query="algorithm=multi")
        assert r.status == 201
        # fingerprint the JPEG-recompressed original via inspect-free path:
        # ingest it under a scratch record to obtain the bundle hex
        r = call(app, "POST", "/v1/ingest/image/1/99", _jpeg(img),
                 query="algorithm=multi")
        fp_hex = jbody(r)["fingerprint_hex"]
        q = json.dumps({
            "tenant_id": 1, "modality": "image", "k": 3,
            "algorithm": "imgfprint-multi-v1", "fingerprint_hex": fp_hex,
        }).encode()
        resp = call(app, "POST", "/v1/query", q)
        hits = jbody(resp)["hits"]
        ids = [h["record_id"] for h in hits]
        # scratch self-match first, original above unrelated
        assert ids.index(1) < ids.index(2)
        by_id = {h["record_id"]: h["score"] for h in hits}
        assert by_id[1] > by_id[2]
        assert by_id[99] == pytest.approx(1.0, abs=1e-6)

    def test_custom_weights_and_validation(self, tmp_path):
        app, _ = make_app(tmp_path)
        y, x = np.mgrid[0:64, 0:64]
        img = np.stack([x * 4 % 256, y * 4 % 256, (x + y) * 2 % 256],
                       axis=-1).astype(np.uint8)
        r = call(app, "POST", "/v1/ingest/image/1/1", _png(img),
                 query="algorithm=multi")
        fp_hex = jbody(r)["fingerprint_hex"]
        ok = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 1, "modality": "image", "k": 1,
            "algorithm": "imgfprint-multi-v1", "fingerprint_hex": fp_hex,
            "multihash": {"phash_weight": 1.0, "dhash_weight": 0.0,
                          "ahash_weight": 0.0, "global_weight": 0.0,
                          "block_weight": 0.0},
        }).encode())
        assert jbody(ok)["hits"][0]["score"] == pytest.approx(1.0, abs=1e-6)
        bad = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 1, "modality": "image", "k": 1,
            "algorithm": "imgfprint-multi-v1", "fingerprint_hex": fp_hex,
            "multihash": {"nope": 1.0},
        }).encode())
        assert bad.status == 400
