"""Image hash kernels: device vs numpy-oracle bit-exactness + invariances.

The numpy oracle (ucfp_tpu.ops.imagehash np_*) is the conformance-corpus
generator; the device kernels must agree bit-for-bit since both run the
same exact integer math.
"""

import io

import numpy as np
import pytest

from ucfp_tpu.core import ModalityError
from ucfp_tpu.modality import image as img_mod
from ucfp_tpu.ops import imagehash as ih


def synthetic_png(w: int, h: int) -> bytes:
    """Colour-ramp PNG, same spirit as the reference's synthetic_png
    (src/server/tests.rs:227-235)."""
    from PIL import Image

    x = np.arange(w, dtype=np.uint32)
    y = np.arange(h, dtype=np.uint32)
    r = np.broadcast_to((x * 255 // max(w - 1, 1)).astype(np.uint8), (h, w))
    g = np.broadcast_to(
        ((y * 255 // max(h - 1, 1)).astype(np.uint8))[:, None], (h, w)
    )
    b = ((r.astype(np.uint32) + g.astype(np.uint32)) // 2).astype(np.uint8)
    arr = np.stack([r, g, b], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    return buf.getvalue()


def rand_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestOracleParity:
    """Device kernel output == numpy oracle, bit for bit."""

    @pytest.mark.parametrize("shape", [(64, 64), (100, 37), (256, 256), (33, 500)])
    def test_multihash_matches_oracle(self, shape):
        h, w = shape
        rgb = rand_rgb(h, w, seed=h * 1000 + w)
        out = img_mod._multi_outputs(rgb[None])

        gray = ih.np_luma(rgb)
        g32 = ih.np_resize(gray, 32, 32)
        g8 = ih.np_resize(gray, 8, 8)
        g9x8 = ih.np_resize(gray, 8, 9)
        g64 = ih.np_resize(gray, 64, 64)

        assert int.from_bytes(bytes(out["phash"][0]), "little") == ih.np_phash(g32)
        assert int.from_bytes(bytes(out["dhash"][0]), "little") == ih.np_dhash(g9x8)
        assert int.from_bytes(bytes(out["ahash"][0]), "little") == ih.np_ahash(g8)
        # histogram: counts/1024 over g32 >> 2
        counts = np.bincount((g32.reshape(-1) >> 2), minlength=64)[:64]
        np.testing.assert_array_equal(
            np.asarray(out["hist"][0]), counts.astype(np.float32) / 1024.0
        )
        blocks = g64.reshape(16, 4, 16, 4).sum(axis=(1, 3)) >> 4
        np.testing.assert_array_equal(
            np.asarray(out["block"][0]).reshape(16, 16), blocks
        )

    def test_batch_consistency(self):
        """Batched result == per-image result (batching must not change bytes)."""
        rgbs = np.stack([rand_rgb(64, 64, s) for s in range(4)])
        out_b = img_mod._multi_outputs(rgbs)
        for i in range(4):
            out_1 = img_mod._multi_outputs(rgbs[i : i + 1])
            assert ih.serialize_multihash(out_b, i) == ih.serialize_multihash(out_1, 0)


class TestWireContract:
    def test_multihash_is_536_bytes(self):
        rec = img_mod.fingerprint_multi(synthetic_png(64, 64), 0, 1)
        assert len(rec.fingerprint) == ih.MULTIHASH_BYTES == 536
        assert rec.algorithm == img_mod.ALGORITHM_MULTI

    def test_single_hashes_are_8_bytes(self):
        png = synthetic_png(64, 64)
        for algo in ("phash", "dhash", "ahash"):
            rec = img_mod.fingerprint_single(png, algo, 0, 1)
            assert len(rec.fingerprint) == 8

    def test_multi_embeds_singles(self):
        """Bundle bytes [0:8)=phash, [8:16)=dhash, [16:24)=ahash."""
        png = synthetic_png(96, 64)
        multi = img_mod.fingerprint_multi(png, 0, 1).fingerprint
        ph = img_mod.fingerprint_single(png, "phash", 0, 1).fingerprint
        dh = img_mod.fingerprint_single(png, "dhash", 0, 1).fingerprint
        ah = img_mod.fingerprint_single(png, "ahash", 0, 1).fingerprint
        assert multi[0:8] == ph and multi[8:16] == dh and multi[16:24] == ah


class TestGolden:
    """Golden regression: fixed input -> exact bytes. Catches any drift in
    luma/resize/DCT constants (the analog of the reference's golden test
    src/server/tests.rs:1121-1163)."""

    def test_golden_ramp_64(self):
        rec = img_mod.fingerprint_multi(synthetic_png(64, 64), 0, 1)
        # Captured from the initial exact-int implementation. If this
        # drifts, the wire format changed — bump intentionally.
        import json
        import pathlib

        golden_path = pathlib.Path(__file__).parent / "goldens" / "image_ramp64.json"
        got = {
            "phash": rec.fingerprint[0:8].hex(),
            "dhash": rec.fingerprint[8:16].hex(),
            "ahash": rec.fingerprint[16:24].hex(),
            "full_xxh3": __import__("xxhash").xxh3_64_hexdigest(rec.fingerprint),
        }
        if not golden_path.exists():
            golden_path.parent.mkdir(exist_ok=True)
            golden_path.write_text(json.dumps(got, indent=1))
        want = json.loads(golden_path.read_text())
        assert got == want


class TestRobustness:
    """Perceptual sanity: hashes should survive mild transforms."""

    @staticmethod
    def hamming(a: bytes, b: bytes) -> int:
        return bin(int.from_bytes(a, "little") ^ int.from_bytes(b, "little")).count("1")

    def test_phash_survives_rescale(self):
        from PIL import Image

        rgb = rand_rgb(128, 128, seed=7)
        # smooth it so downscale is meaningful
        base = Image.fromarray(rgb).resize((32, 32)).resize((128, 128))
        buf1 = io.BytesIO()
        base.save(buf1, format="PNG")
        small = base.resize((96, 96))
        buf2 = io.BytesIO()
        small.save(buf2, format="PNG")
        h1 = img_mod.fingerprint_single(buf1.getvalue(), "phash", 0, 1).fingerprint
        h2 = img_mod.fingerprint_single(buf2.getvalue(), "phash", 0, 2).fingerprint
        assert self.hamming(h1, h2) <= 10

    def test_phash_separates_distinct(self):
        h1 = img_mod.fingerprint_single(synthetic_png(64, 64), "phash", 0, 1).fingerprint
        rgb = rand_rgb(64, 64, seed=99)
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        h2 = img_mod.fingerprint_single(buf.getvalue(), "phash", 0, 2).fingerprint
        assert self.hamming(h1, h2) >= 16


class TestGrayKernelParity:
    """The host-luma (*_kernel_gray) entries must emit byte-identical
    hashes to the RGB kernels: same integer formula, different side of
    the transfer (the ingest path ships 1 byte/pixel through them)."""

    def test_gray_matches_rgb_kernels(self):
        from ucfp_tpu.ops import imagehash as ih

        rgb = np.stack([rand_rgb(64, 64, seed=s) for s in range(4)])
        gray = ih.np_luma_u8(rgb)
        # host luma == device luma (exact integer contract)
        import jax

        dev_gray = jax.device_get(ih.luma_u8(rgb))
        assert np.array_equal(gray.astype(np.int64), dev_gray.astype(np.int64))
        for algo in ("phash", "dhash", "ahash"):
            a = jax.device_get(ih.single_hash_kernel(rgb, 64, 64, algo))
            b = jax.device_get(ih.single_hash_kernel_gray(gray, 64, 64, algo))
            assert np.array_equal(a, b), algo
        ma = jax.device_get(ih.multihash_kernel(rgb, 64, 64))
        mb = jax.device_get(ih.multihash_kernel_gray(gray, 64, 64))
        for i in range(rgb.shape[0]):
            assert ih.serialize_multihash(ma, i) == ih.serialize_multihash(mb, i)


class TestFastBmpDecode:
    """The numpy 24bpp-BMP fast path must be BYTE-IDENTICAL to PIL's
    decode (the exact-int hash contract starts at the pixels) and fall
    back to PIL for every other flavor."""

    @pytest.mark.parametrize("h,w", [(64, 64), (33, 47), (37, 128), (32, 33)])
    def test_matches_pil_bytes(self, h, w):
        from PIL import Image

        rgb = rand_rgb(h, w, seed=h * 100 + w)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="BMP")
        data = buf.getvalue()
        fast = img_mod._fast_bmp_rgb(data)
        assert fast is not None  # PIL writes BI_RGB 24bpp: fast path taken
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(fast, ref)
        # and the public decode returns the same array
        assert np.array_equal(
            img_mod.decode_rgb(data, img_mod.PreprocessConfig()), ref
        )

    def test_top_down_bmp(self):
        """Negative height = top-down row order; flip handling must
        still match PIL."""
        import struct

        from PIL import Image

        rgb = rand_rgb(40, 40, seed=3)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="BMP")
        data = bytearray(buf.getvalue())
        h = struct.unpack_from("<i", data, 22)[0]
        struct.pack_into("<i", data, 22, -h)
        off = struct.unpack_from("<I", data, 10)[0]
        stride = (40 * 3 + 3) // 4 * 4
        rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
                for i in range(h)]
        data[off:] = b"".join(reversed(rows))
        ref = np.asarray(Image.open(io.BytesIO(bytes(data))).convert("RGB"))
        assert np.array_equal(img_mod._fast_bmp_rgb(bytes(data)), ref)

    @pytest.mark.parametrize("h,w", [(64, 64), (33, 47), (32, 33)])
    def test_decode_gray_bit_identical(self, h, w):
        """decode_gray == np_luma_u8(decode_rgb(...)) byte-for-byte on
        the fast-BMP path (luma computed straight off the strided BGR
        view) AND on the PIL fallback (PNG)."""
        from PIL import Image

        from ucfp_tpu.ops import imagehash as ih

        pre = img_mod.PreprocessConfig()
        rgb = rand_rgb(h, w, seed=h * 7 + w)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="BMP")
        bmp = buf.getvalue()
        ref = ih.np_luma_u8(img_mod.decode_rgb(bmp, pre))
        got = img_mod.decode_gray(bmp, pre)
        assert got.dtype == np.uint8 and got.shape == (h, w)
        assert np.array_equal(got, ref)
        # PIL fallback path (PNG) — exact same composition
        png = synthetic_png(max(h, 64), max(w, 64))
        assert np.array_equal(
            img_mod.decode_gray(png, pre),
            ih.np_luma_u8(img_mod.decode_rgb(png, pre)),
        )

    def test_decode_gray_top_down_bmp(self):
        import struct

        from PIL import Image

        from ucfp_tpu.ops import imagehash as ih

        rgb = rand_rgb(40, 40, seed=9)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="BMP")
        data = bytearray(buf.getvalue())
        h = struct.unpack_from("<i", data, 22)[0]
        struct.pack_into("<i", data, 22, -h)
        off = struct.unpack_from("<I", data, 10)[0]
        stride = (40 * 3 + 3) // 4 * 4
        rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
                for i in range(h)]
        data[off:] = b"".join(reversed(rows))
        pre = img_mod.PreprocessConfig()
        assert np.array_equal(
            img_mod.decode_gray(bytes(data), pre),
            ih.np_luma_u8(img_mod.decode_rgb(bytes(data), pre)),
        )

    def test_decode_gray_enforces_limits(self):
        """Out-of-bounds dims fall through to decode_rgb's error/shrink
        handling, identical to the RGB path."""
        from PIL import Image

        pre = img_mod.PreprocessConfig(min_dimension=64)
        rgb = rand_rgb(40, 40, seed=4)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="BMP")
        with pytest.raises(Exception):
            img_mod.decode_gray(buf.getvalue(), pre)

    def test_non_24bpp_falls_back(self):
        # PNG obviously isn't a BMP; a 32bpp/paletted BMP also declines
        assert img_mod._fast_bmp_rgb(synthetic_png(64, 64)) is None
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(rand_rgb(40, 40)).convert("P").save(buf, format="BMP")
        assert img_mod._fast_bmp_rgb(buf.getvalue()) is None
        # but decode_rgb still decodes it via PIL
        assert img_mod.decode_rgb(
            buf.getvalue(), img_mod.PreprocessConfig()
        ).shape == (40, 40, 3)

    def test_preprocess_limits_still_enforced(self):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(rand_rgb(16, 16)).save(buf, format="BMP")
        with pytest.raises(ModalityError):
            img_mod.decode_rgb(buf.getvalue(), img_mod.PreprocessConfig())
        # oversize dims take the PIL pre-shrink path (identical output)
        big = io.BytesIO()
        Image.fromarray(rand_rgb(128, 96)).save(big, format="BMP")
        pre = img_mod.PreprocessConfig(max_dimension=64)
        out = img_mod.decode_rgb(big.getvalue(), pre)
        assert max(out.shape[:2]) == 64


class TestPreprocess:
    def test_too_small_rejected(self):
        with pytest.raises(ModalityError):
            img_mod.fingerprint_multi(synthetic_png(16, 16), 0, 1)

    def test_oversize_bytes_rejected(self):
        pre = img_mod.PreprocessConfig(max_input_bytes=10)
        with pytest.raises(ModalityError):
            img_mod.fingerprint_multi(synthetic_png(64, 64), 0, 1, pre)

    def test_big_image_downscaled(self):
        pre = img_mod.PreprocessConfig(max_dimension=64)
        rec = img_mod.fingerprint_multi(synthetic_png(128, 96), 0, 1, pre)
        assert len(rec.fingerprint) == 536

    def test_config_hash_differs_by_preprocess(self):
        png = synthetic_png(64, 64)
        a = img_mod.fingerprint_multi(png, 0, 1)
        b = img_mod.fingerprint_multi(
            png, 0, 1, img_mod.PreprocessConfig(max_dimension=4096)
        )
        assert a.config_hash != b.config_hash


class TestInspect:
    def test_inspect_stages(self):
        res = img_mod.inspect_image(synthetic_png(64, 48))
        assert res["width"] == 64 and res["height"] == 48
        assert res["fingerprint_bytes"] == 536
        assert 0 <= res["ahash_mean"] <= 255
        for k in ("original_png_b64", "gray32_png_b64", "gray8_png_b64"):
            assert len(res[k]) > 0
