"""Boot-time kernel warmup: pre-compile the hot device kernels.

First jit compiles take seconds (tens of seconds through a remote
runtime) — without warmup the first production request of each shape
class eats the compile and times out at the default 10 s request
budget (the documented 408 case). This runs tiny synthetic payloads
through each modality's fingerprint path and the ANN kernels in a
background thread right after boot, so the compile cache is hot before
traffic arrives. Enabled by default in the launcher; UCFP_WARMUP=0
disables (tests construct servers directly and never run it).
"""

from __future__ import annotations

import threading
import time

from .logging import logger


def _work() -> None:
    t0 = time.monotonic()
    done = []
    try:
        import numpy as np

        # text: minhash device signature path
        from ..modality import text as tmod

        tmod.fingerprint_minhash("warmup quick brown fox sample text", 0, 0)
        done.append("text")

        # image: the batched multihash + single-hash kernels at the
        # playground's canonical small shape
        from ..ops import imagehash

        gray = np.zeros((1, 64, 64), np.uint8)
        imagehash.multihash_kernel_gray(gray, 64, 64)
        imagehash.single_hash_kernel_gray(gray, 64, 64, "phash")
        done.append("image")

        # the coalesced bulk-ingest launch shape (opt-in
        # UCFP_INGEST_COALESCE_MS): compile it at boot so the first
        # saturation burst doesn't eat a ~60 s (minutes when congested)
        # remote compile mid-request
        import os

        if float(os.environ.get("UCFP_INGEST_COALESCE_MS", "0")) > 0:
            rows = int(os.environ.get("UCFP_INGEST_COALESCE_ROWS", "8192"))
            big = np.zeros((rows, 32, 32), np.uint8)
            imagehash.single_hash_kernel_gray(big, 32, 32, "phash")
            done.append("image-coalesced")

        # audio: the integer STFT + peak + pairing pipeline at two
        # durations — the padded-length buckets compile per shape class,
        # so covering 1 s and 4 s clips warms the common buckets
        from ..modality import audio as amod

        for secs in (1, 4):
            t = np.arange(8000 * secs, dtype=np.float32) / 8000.0
            x = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
            amod.fingerprint_wang(x, 8000, 0, 0)
        done.append("audio")

        # ANN at SERVING shapes: the jit cache keys on (dim, k), so
        # warming toy shapes would leave the first real /v1/query cold.
        # k=10 is the request default (serving uses kk = min(k, n), so
        # catalogs of >= 10 rows hit this exact compile); dims cover the
        # built-in encoders (audio 128, text 384, image 512) plus 64
        # and the 768 BASELINE shape. UCFP_WARMUP_DIMS overrides.
        import os

        import jax.numpy as jnp

        from ..ops import knn as knn_ops

        dims = [
            int(d) for d in os.environ.get(
                "UCFP_WARMUP_DIMS", "64,128,384,512,768"
            ).split(",") if d.strip()
        ]
        k = 10
        valid = jnp.arange(1024) < 16
        quant = os.environ.get("UCFP_KNN_QUANT", "none").lower()
        for d in dims:
            m = np.zeros((1024, d), np.float32)
            m[:16, 0] = 1.0
            if quant in ("int8", "sketch", "int4", "int2"):
                q8, rn = knn_ops.quantize_rows_int8(m)
                knn_ops.cosine_topk_int8(
                    jnp.asarray(m[:1]), jnp.asarray(q8), jnp.asarray(rn),
                    valid, k,
                )
                if quant == "int4" and d % 2 == 0:
                    # cap 8192, NOT the 1024 above: at 1024 the pool
                    # covers the catalog and cosine_int4_topk
                    # short-circuits into the exhaustive branch — the
                    # pallas prefilter kernel would never compile, and
                    # the first cost-model-routed int4 query (cap 8192
                    # is the smallest servable capacity) would eat the
                    # full first-jit wall the warmup exists to hide
                    c4 = 4 * knn_ops.INT4_MIN_POOL
                    m4 = np.zeros((c4, d), np.float32)
                    m4[:16, 0] = 1.0
                    q84, rn4 = knn_ops.quantize_rows_int8(m4)
                    packed_t, inv_n4 = knn_ops.pack_int4_cols(
                        jnp.asarray(q84)
                    )
                    v4 = jnp.zeros((c4,), bool).at[:16].set(True)
                    # BOTH serving variants: fused (unfiltered queries,
                    # n_valid prefix) AND unfused (filtered queries fold
                    # the filter into `valid` — a separate jit entry and
                    # pallas kernel that would otherwise eat its first
                    # compile at request time)
                    knn_ops.cosine_int4_topk(
                        jnp.asarray(m4[0]), jnp.asarray(q84),
                        jnp.asarray(rn4), packed_t, inv_n4, v4, k,
                        knn_ops.int4_pool(c4, k),
                        n_valid=jnp.int32(16),
                    )
                    knn_ops.cosine_int4_topk(
                        jnp.asarray(m4[0]), jnp.asarray(q84),
                        jnp.asarray(rn4), packed_t, inv_n4, v4, k,
                        knn_ops.int4_pool(c4, k),
                    )
                    # batched packed scan (unfiltered vector batches):
                    # the pallas kernel compiles per 8-row weight
                    # bucket — warming one small batch covers the
                    # qb=8 bucket; other batch sizes trace the outer
                    # jit on demand exactly like the exact GEMM path
                    knn_ops.cosine_int4_topk_batched(
                        jnp.asarray(m4[:2]), jnp.asarray(q84),
                        jnp.asarray(rn4), packed_t, inv_n4, 16, k,
                        knn_ops.int4_batch_pool(c4, k),
                    )
                if quant == "int2" and d % 4 == 0:
                    # same pre-compile story as int4: the smallest
                    # servable int2 capacity is 2*INT2_MIN_POOL, and
                    # both the fused (prefix) and filtered variants are
                    # separate jit entries
                    c2 = 4 * knn_ops.INT2_MIN_POOL
                    m2 = np.zeros((c2, d), np.float32)
                    m2[:16, 0] = 1.0
                    q82, rn2 = knn_ops.quantize_rows_int8(m2)
                    packed2, inv_n2 = knn_ops.pack_int2_cols(
                        jnp.asarray(q82)
                    )
                    v2 = jnp.zeros((c2,), bool).at[:16].set(True)
                    knn_ops.cosine_int2_topk(
                        jnp.asarray(m2[0]), jnp.asarray(q82),
                        jnp.asarray(rn2), packed2, inv_n2, v2, k,
                        knn_ops.int2_pool(c2, k),
                        n_valid=jnp.int32(16),
                    )
                    knn_ops.cosine_int2_topk(
                        jnp.asarray(m2[0]), jnp.asarray(q82),
                        jnp.asarray(rn2), packed2, inv_n2, v2, k,
                        knn_ops.int2_pool(c2, k),
                    )
                    # batched packed scan, qb=8 bucket (like int4's)
                    knn_ops.cosine_int2_topk_batched(
                        jnp.asarray(m2[:2]), jnp.asarray(q82),
                        jnp.asarray(rn2), packed2, inv_n2, 16, k,
                        knn_ops.int2_batch_pool(c2, k),
                    )
                if quant == "sketch":
                    planes = jnp.asarray(knn_ops.sketch_planes(d))
                    sk = knn_ops.tile_sketch(
                        knn_ops.build_sketch_chunked(jnp.asarray(q8), planes)
                    )
                    knn_ops.cosine_sketch_topk(
                        jnp.asarray(m[0]), planes, jnp.asarray(q8),
                        jnp.asarray(rn), sk, valid, k,
                        knn_ops.sketch_pool(1024, k),
                    )
            else:
                knn_ops.cosine_topk(
                    jnp.asarray(m[:1]), jnp.asarray(m), valid, k
                )
        h = jnp.zeros((1024, 2), jnp.uint32)
        knn_ops.hamming_topk(h[:1], h, valid, k)
        done.append("ann" if quant == "none" else f"ann-{quant}")
    except Exception as e:  # warmup must never take the server down
        logger().warn("warmup error", err=f"{type(e).__name__}: {e}",
                      completed=",".join(done))
        return
    logger().info("warmup complete", secs=round(time.monotonic() - t0, 1),
                  kernels=",".join(done))


def start_background_warmup() -> threading.Thread:
    """Fire-and-forget warmup thread (daemon: never blocks shutdown)."""
    t = threading.Thread(target=_work, name="ucfp-warmup", daemon=True)
    t.start()
    return t
