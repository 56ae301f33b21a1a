"""Local-weights semantic encoders (ucfp_tpu/models/hf_local.py).

The zero-egress build can't download real MiniLM/CLIP weights, so these
tests exercise the full loading + pooling + record plumbing with TINY
randomly-initialized transformers models saved to disk — the same code
path a production deployment with real weights takes."""

import numpy as np
import pytest

from ucfp_tpu.models import hf_local


@pytest.fixture()
def tiny_text_model(tmp_path):
    from transformers import BertConfig, BertModel, BertTokenizerFast

    d = tmp_path / "models" / "text"
    d.mkdir(parents=True)
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    import torch

    torch.manual_seed(0)
    BertModel(cfg).save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(d)
    return tmp_path / "models"


@pytest.fixture()
def tiny_image_model(tmp_path):
    from transformers import ViTConfig, ViTImageProcessor, ViTModel

    d = tmp_path / "models" / "image"
    d.mkdir(parents=True)
    import torch

    torch.manual_seed(0)
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    image_size=32, patch_size=16)
    ViTModel(cfg).save_pretrained(d)
    ViTImageProcessor(size={"height": 32, "width": 32}).save_pretrained(d)
    return tmp_path / "models"


@pytest.fixture(autouse=True)
def _fresh_cache():
    hf_local.reset_cache()
    yield
    hf_local.reset_cache()


class TestTextLocalModel:
    def test_fingerprint_semantic_uses_local_weights(
        self, tiny_text_model, monkeypatch
    ):
        monkeypatch.setenv("UCFP_MODEL_DIR", str(tiny_text_model))
        from ucfp_tpu.modality import text as tmod

        rec = tmod.fingerprint_semantic("the quick brown fox", 0, 1)
        assert rec.model_id.startswith("local:") or "/" in rec.model_id
        assert rec.model_id != "ucfp-hash-embed-384-v1"
        emb = np.asarray(rec.embedding, np.float32)
        assert emb.shape == (32,)  # the tiny model's hidden size
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)
        # deterministic: same input -> same embedding bytes
        rec2 = tmod.fingerprint_semantic("the quick brown fox", 0, 2)
        assert rec.fingerprint == rec2.fingerprint
        # different input -> different embedding
        rec3 = tmod.fingerprint_semantic("lazy dog over the fox", 0, 3)
        assert rec.fingerprint != rec3.fingerprint

    def test_standin_without_model_dir(self, monkeypatch):
        monkeypatch.delenv("UCFP_MODEL_DIR", raising=False)
        from ucfp_tpu.modality import text as tmod

        rec = tmod.fingerprint_semantic("the quick brown fox", 0, 1)
        assert rec.model_id == "ucfp-hash-embed-384-v1"
        assert len(rec.embedding) == 384


class TestImageLocalModel:
    def test_fingerprint_semantic_uses_local_weights(
        self, tiny_image_model, monkeypatch
    ):
        monkeypatch.setenv("UCFP_MODEL_DIR", str(tiny_image_model))
        from ucfp_tpu.modality import image as imod

        from test_imagehash import synthetic_png

        rec = imod.fingerprint_semantic(synthetic_png(64, 64), 0, 1)
        emb = np.asarray(rec.embedding, np.float32)
        assert emb.shape == (32,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)
        assert rec.model_id != "ucfp-image-embed-512-v2"
        # config_hash binds the model id: stand-in and local-weights
        # records refuse to compare
        rec_stand = None
        monkeypatch.delenv("UCFP_MODEL_DIR")
        rec_stand = imod.fingerprint_semantic(synthetic_png(64, 64), 0, 2)
        assert rec.config_hash != rec_stand.config_hash


class TestAvailability:
    def test_missing_dir_not_available(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_MODEL_DIR", str(tmp_path / "nope"))
        assert not hf_local.available("text")
        assert not hf_local.available("image")

    def test_model_id_fallback_is_dir_name(self, tmp_path, monkeypatch):
        d = tmp_path / "m" / "text"
        d.mkdir(parents=True)
        (d / "config.json").write_text("{}")
        monkeypatch.setenv("UCFP_MODEL_DIR", str(tmp_path / "m"))
        assert hf_local.available("text")
        assert hf_local._model_id(str(d)) == "local:text"


class TestModelIdGuardWithLocalWeights:
    def test_mismatched_model_id_rejected_on_hf_path(
        self, tiny_image_model, monkeypatch
    ):
        from ucfp_tpu.core import UnsupportedError
        from ucfp_tpu.modality import image as imod

        from test_imagehash import synthetic_png

        monkeypatch.setenv("UCFP_MODEL_DIR", str(tiny_image_model))
        with pytest.raises(UnsupportedError):
            imod.fingerprint_semantic(
                synthetic_png(64, 64), 0, 1, model_id="clip-vit-b32"
            )
