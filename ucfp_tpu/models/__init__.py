"""Model families: the semantic/neural encoders behind the embedding
algorithms (reference: CLIP ONNX LocalProvider image.rs:210-241, text
semantic providers text.rs:500-606, audio log-mel embedder
audio.rs:268-321).

Round-1 models are deterministic fixed-weight networks (seeded PRNG) so
embeddings are reproducible with zero downloads; each carries a stable
model_id, and trained checkpoints slot in behind the same seam by
swapping the parameter source.
"""

from .encoders import (
    AUDIO_MODEL_ID,
    IMAGE_MODEL_ID,
    TEXT_MODEL_ID,
    audio_logmel_encode,
    image_encode,
    text_hash_embed,
)

__all__ = [
    "IMAGE_MODEL_ID",
    "AUDIO_MODEL_ID",
    "TEXT_MODEL_ID",
    "image_encode",
    "audio_logmel_encode",
    "text_hash_embed",
]
