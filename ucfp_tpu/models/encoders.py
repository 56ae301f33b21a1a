"""Deterministic encoder models (seeded fixed weights, device-resident).

All three encoders run on device under jit with HIGHEST-precision
matmuls; weights are derived from fixed PRNG keys so the embeddings are
part of the conformance contract (tests/goldens/conformance.json).

  * image_encode        512-d, 2-layer MLP over the exact-int 32x32 RGB
  * audio_logmel_encode 128-d per log-mel window (96 frames x 64 mels)
  * text_hash_embed     384-d signed feature hashing (words + bigrams)
"""

from __future__ import annotations

import functools
import math

import numpy as np

# The "standin-" prefix is a contract: these are seeded random-weight
# encoders, deterministic and device-batched but NOT semantically
# meaningful. Every record/response carries the prefix so a
# default-config user cannot mistake random projections for a real
# embedding model (mount one via UCFP_MODEL_DIR — models/hf_local.py —
# and the prefix disappears with it). model_id does not feed
# config_hash, so the stamp costs nothing in fingerprint compatibility.
IMAGE_MODEL_ID = "standin-ucfp-image-embed-512-v2"  # v2: jitted forward (fused f32 order)
AUDIO_MODEL_ID = "standin-ucfp-audio-logmel-mlp-v2"  # v2: jitted forward (fused f32 order)
TEXT_MODEL_ID = "standin-ucfp-hash-embed-384-v1"

IMAGE_DIM = 512
AUDIO_DIM = 128
TEXT_DIM = 384

AUDIO_MELS = 64
AUDIO_WIN = 96  # frames per window
AUDIO_HOP = 48


@functools.lru_cache(maxsize=1)
def _image_params():
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(jax.random.PRNGKey(0x1A6E), 2)
    d_in = 32 * 32 * 3
    w1 = jax.random.normal(k1, (d_in, 1024), jnp.float32) * (1.0 / d_in**0.5)
    w2 = jax.random.normal(k2, (1024, IMAGE_DIM), jnp.float32) * (1.0 / 32.0)
    return w1, w2


@functools.lru_cache(maxsize=1)
def _image_forward():
    """Jitted MLP forward (the module contract: encoders run under jit —
    unfused eager dispatch on the batcher hot path costs 5+ launches)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(x):
        w1, w2 = _image_params()
        h = jnp.tanh(
            jnp.dot(x, w1, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        )
        e = jnp.dot(h, w2, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=1, keepdims=True), 1e-9
        )

    return fwd


def image_encode(x_flat: np.ndarray) -> np.ndarray:
    """[B, 3072] f32 in [0,1] -> [B, 512] L2-normalized f32."""
    import jax.numpy as jnp

    return np.asarray(_image_forward()(jnp.asarray(x_flat)), dtype=np.float32)


@functools.lru_cache(maxsize=1)
def _audio_params():
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(jax.random.PRNGKey(0xA0D10), 2)
    d_in = AUDIO_WIN * AUDIO_MELS
    w1 = jax.random.normal(k1, (d_in, 512), jnp.float32) * (1.0 / math.sqrt(d_in))
    w2 = jax.random.normal(k2, (512, AUDIO_DIM), jnp.float32) * (1.0 / math.sqrt(512))
    return w1, w2


@functools.lru_cache(maxsize=1)
def _audio_forward():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(x):
        w1, w2 = _audio_params()
        h = jnp.tanh(
            jnp.dot(x, w1, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        )
        e = jnp.dot(h, w2, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=1, keepdims=True), 1e-9
        )

    return fwd


def audio_logmel_encode(windows: "object") -> np.ndarray:
    """[n_win, 96*64] log-mel windows (jax or numpy) -> [n_win, 128]
    L2-normalized f32."""
    import jax.numpy as jnp

    return np.asarray(
        _audio_forward()(jnp.asarray(windows)), dtype=np.float32
    )


def text_hash_embed(tokens: list[str]) -> np.ndarray:
    """Signed feature hashing over words + word-bigrams -> [384] unit f32.

    Raises ValueError on empty/degenerate input (the modality layer maps
    it to a 400).
    """
    import xxhash

    if not tokens:
        raise ValueError("no tokens for semantic embedding")
    feats = tokens + [f"{a}\x1f{b}" for a, b in zip(tokens, tokens[1:])]
    v = np.zeros(TEXT_DIM, np.float64)
    for f in feats:
        h = xxhash.xxh3_64_intdigest(f.encode("utf-8"))
        idx = h % TEXT_DIM
        sign = 1.0 if (h >> 63) else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    if n == 0:
        raise ValueError("degenerate semantic embedding")
    return (v / n).astype(np.float32)
