"""Native whole-batch image decode (native/imgbatch.cpp).

The batch ingest route's fast path parses the [u64 rid][u32 len][bytes]*
framing and computes the BT.601 luma planes in one C call; these tests
pin its output byte-identical to the per-image Python decode
(modality/image.py:decode_gray) and its fallback/error codes to the
handler's contract. Reference analog: the reference decodes one image
per request (/root/reference/src/modality/image.rs:62-88); the batch
route is this build's TPU ingest seam.
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from ucfp_tpu.modality import image as img_mod
from ucfp_tpu import native


def rand_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def bmp_bytes(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="BMP")
    return buf.getvalue()


def top_down(bmp: bytes) -> bytes:
    """Rewrite a bottom-up BMP as top-down (negative height)."""
    data = bytearray(bmp)
    h = struct.unpack_from("<i", data, 22)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    struct.pack_into("<i", data, 22, -h)
    off = struct.unpack_from("<I", data, 10)[0]
    stride = (w * 3 + 3) // 4 * 4
    rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
            for i in range(h)]
    data[off:off + stride * h] = b"".join(reversed(rows))
    return bytes(data)


def frames(pairs) -> bytes:
    out = bytearray()
    for rid, img in pairs:
        out += struct.pack("<QI", rid, len(img))
        out += img
    return bytes(out)


PRE = img_mod.PreprocessConfig()


@pytest.fixture(scope="module", autouse=True)
def _native_available():
    if native.load_imgbatch() is None:  # pragma: no cover
        pytest.skip("native toolchain unavailable")


class TestFastPath:
    @pytest.mark.parametrize("h,w", [(64, 64), (33, 47), (32, 33), (40, 41)])
    def test_bit_identical_to_decode_gray(self, h, w):
        """Odd widths exercise the 4-byte row-stride padding."""
        imgs = [(i + 7, bmp_bytes(rand_rgb(h, w, seed=i))) for i in range(5)]
        code, rids, gray = img_mod.decode_gray_batch(frames(imgs), 1024, PRE)
        assert code == 0
        assert rids == [i + 7 for i in range(5)]
        assert gray.shape == (5, h, w) and gray.dtype == np.uint8
        for (rid, data), g in zip(imgs, gray):
            assert np.array_equal(g, img_mod.decode_gray(data, PRE)), rid

    def test_top_down_rows(self):
        data = top_down(bmp_bytes(rand_rgb(40, 40, seed=9)))
        code, rids, gray = img_mod.decode_gray_batch(
            frames([(1, data)]), 1024, PRE)
        assert code == 0
        assert np.array_equal(gray[0], img_mod.decode_gray(data, PRE))

    def test_mixed_orientation_same_shape(self):
        """Bottom-up and top-down frames of the same (h, w) batch fine —
        orientation is per-frame, only dimensions must be uniform."""
        up = bmp_bytes(rand_rgb(40, 40, seed=1))
        down = top_down(bmp_bytes(rand_rgb(40, 40, seed=2)))
        code, _, gray = img_mod.decode_gray_batch(
            frames([(1, up), (2, down)]), 1024, PRE)
        assert code == 0
        assert np.array_equal(gray[0], img_mod.decode_gray(up, PRE))
        assert np.array_equal(gray[1], img_mod.decode_gray(down, PRE))


class TestFallbacks:
    def test_mixed_shapes(self):
        body = frames([(1, bmp_bytes(rand_rgb(64, 64))),
                       (2, bmp_bytes(rand_rgb(32, 32)))])
        assert img_mod.decode_gray_batch(body, 1024, PRE)[0] == 1

    def test_png_frame(self):
        from tests.test_imagehash import synthetic_png

        body = frames([(1, synthetic_png(64, 64))])
        assert img_mod.decode_gray_batch(body, 1024, PRE)[0] == 1

    def test_limits_defer_to_python(self):
        small = bmp_bytes(rand_rgb(40, 40))
        strict = img_mod.PreprocessConfig(min_dimension=64)
        assert img_mod.decode_gray_batch(
            frames([(1, small)]), 1024, strict)[0] == 1
        tiny_cap = img_mod.PreprocessConfig(max_input_bytes=10)
        assert img_mod.decode_gray_batch(
            frames([(1, small)]), 1024, tiny_cap)[0] == 1

    def test_empty_body(self):
        assert img_mod.decode_gray_batch(b"", 1024, PRE)[0] == 1


class TestFramingErrors:
    def test_truncated_header(self):
        body = frames([(1, bmp_bytes(rand_rgb(32, 32)))])
        assert img_mod.decode_gray_batch(body + b"\x00" * 5, 1024, PRE)[0] == -1

    def test_truncated_body(self):
        body = frames([(1, bmp_bytes(rand_rgb(32, 32)))])
        assert img_mod.decode_gray_batch(body[:-3], 1024, PRE)[0] == -2

    def test_too_many_frames(self):
        one = bmp_bytes(rand_rgb(32, 32))
        body = frames([(i, one) for i in range(5)])
        assert img_mod.decode_gray_batch(body, 4, PRE)[0] == -3


class TestRouteIntegration:
    """The batch route over BMP frames rides the native path end to end
    and must produce the same fingerprints as the single-image route."""

    def test_batch_matches_single_route(self, tmp_path):
        from tests.test_server import call, jbody, make_app

        app, _ = make_app(tmp_path)
        imgs = [(10, bmp_bytes(rand_rgb(64, 64, seed=5))),
                (11, bmp_bytes(rand_rgb(64, 64, seed=6)))]
        body = jbody(call(app, "POST", "/v1/ingest/image/batch/0",
                          frames(imgs), query="algorithm=phash"))
        assert body["count"] == 2
        by_rid = {r["record_id"]: r for r in body["records"]}
        for rid, img in imgs:
            single = jbody(call(app, "POST", f"/v1/ingest/image/0/{100 + rid}",
                                img, query="algorithm=phash"))
            assert by_rid[rid]["fingerprint_hex"] == single["fingerprint_hex"]

    def test_batch_multi_bundle(self, tmp_path):
        from tests.test_server import call, jbody, make_app

        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/image/batch/0",
                          frames([(1, bmp_bytes(rand_rgb(64, 64)))])))
        assert body["records"][0]["fingerprint_bytes"] == 536


class TestHostResize:
    """Host-side exact tent resize (ucfp_imgbatch_resize +
    resize_gray_batch): the ingest hot path ships the ALREADY-RESIZED
    plane, so these pin (a) native == numpy == per-image oracle and
    (b) hashing the pre-resized plane == hashing the full plane (the
    device kernel's resize is the identity at the target shape)."""

    SHAPES = [((64, 64), (32, 32)), ((64, 64), (8, 9)),
              ((100, 77), (32, 32)), ((32, 32), (32, 32)),
              ((16, 24), (32, 32)), ((256, 199), (8, 8))]

    @pytest.mark.parametrize("inshape,outshape", SHAPES)
    def test_exact_vs_oracle(self, inshape, outshape):
        from ucfp_tpu.ops import imagehash as ih

        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, (4, *inshape), dtype=np.uint8)
        got = img_mod.resize_gray_batch(g, *outshape)
        assert got.dtype == np.uint8 and got.shape == (4, *outshape)
        for i in range(4):
            want = ih.np_resize(g[i].astype(np.int64), *outshape)
            np.testing.assert_array_equal(got[i], want.astype(np.uint8))

    @pytest.mark.parametrize("algo", ["phash", "dhash", "ahash"])
    def test_preresized_hash_identical(self, algo):
        import jax.numpy as jnp

        from ucfp_tpu.ops import imagehash as ih

        rng = np.random.default_rng(12)
        g = rng.integers(0, 256, (3, 64, 64), dtype=np.uint8)
        full = np.asarray(ih.single_hash_kernel_gray(
            jnp.asarray(g), 64, 64, algo))
        th, tw = img_mod.SINGLE_HASH_INPUT[algo]
        pre = img_mod.resize_gray_batch(g, th, tw)
        small = np.asarray(ih.single_hash_kernel_gray(
            jnp.asarray(pre), th, tw, algo))
        np.testing.assert_array_equal(full, small)

    def test_noncontiguous_input(self):
        from ucfp_tpu.ops import imagehash as ih

        rng = np.random.default_rng(13)
        g = rng.integers(0, 256, (4, 64, 128), dtype=np.uint8)[:, :, ::2]
        got = img_mod.resize_gray_batch(g, 32, 32)
        want = ih.np_resize(np.ascontiguousarray(g[0]).astype(np.int64),
                            32, 32)
        np.testing.assert_array_equal(got[0], want.astype(np.uint8))


class TestMultiPrePlanes:
    """Camera-size multi bundles ship four host-resized planes
    (multihash_kernel_pre) instead of the full luma; the bundle must be
    byte-identical to the single-plane kernel."""

    @pytest.mark.parametrize("shape", [(256, 199), (128, 128), (104, 104)])
    def test_pre_kernel_identical(self, shape):
        import jax.numpy as jnp

        from ucfp_tpu.ops import imagehash as ih

        rng = np.random.default_rng(21)
        g = rng.integers(0, 256, (3, *shape), dtype=np.uint8)
        assert shape[0] * shape[1] > img_mod.MULTI_PRE_THRESHOLD
        full = ih.multihash_kernel_gray(jnp.asarray(g), *shape)
        pre = ih.multihash_kernel_pre(
            *(jnp.asarray(p) for p in img_mod.multi_pre_planes(g)))
        for i in range(3):
            assert ih.serialize_multihash(
                {k: np.asarray(v) for k, v in full.items()}, i
            ) == ih.serialize_multihash(
                {k: np.asarray(v) for k, v in pre.items()}, i
            ), shape

    def test_small_inputs_stay_on_full_plane(self):
        # 64x64 full plane (4096 B) is smaller than the packed planes
        # (5256 B): the dispatch threshold must keep it on the old entry
        assert 64 * 64 <= img_mod.MULTI_PRE_THRESHOLD

    def test_route_multi_large_image(self, tmp_path):
        from tests.test_server import call, jbody, make_app

        app, _ = make_app(tmp_path)
        big = bmp_bytes(rand_rgb(128, 128, seed=9))
        body = jbody(call(app, "POST", "/v1/ingest/image/0/1", big))
        assert body["fingerprint_bytes"] == 536
        # same bytes as the library-level record (shared exact pipeline)
        rec = img_mod.fingerprint_multi(big, 0, 1)
        assert body["fingerprint_hex"] == rec.fingerprint.hex()
