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
        assert rec.model_id != "standin-ucfp-hash-embed-384-v1"
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
        assert rec.model_id == "standin-ucfp-hash-embed-384-v1"
        assert len(rec.embedding) == 384

    def test_standin_marking_contract(self, monkeypatch):
        """Round-4 verdict #8: every default-config semantic/neural
        record must carry a model_id that SAYS it is a stand-in, so no
        user mistakes seeded random projections for real semantics."""
        monkeypatch.delenv("UCFP_MODEL_DIR", raising=False)
        from ucfp_tpu.modality import audio as amod
        from ucfp_tpu.modality import image as imod
        from ucfp_tpu.modality import text as tmod

        from test_imagehash import synthetic_png

        t = np.arange(2 * 8000) / 8000.0
        x = (0.4 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
        recs = [
            tmod.fingerprint_semantic("the quick brown fox", 0, 1),
            imod.fingerprint_semantic(synthetic_png(64, 64), 0, 1),
            amod.fingerprint_neural(x, 8000, 0, 1),
        ]
        for rec in recs:
            assert rec.model_id.startswith("standin-"), rec.model_id


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
        assert rec.model_id != "standin-ucfp-image-embed-512-v2"
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


@pytest.fixture()
def tiny_audio_model(tmp_path):
    from transformers import Wav2Vec2Config, Wav2Vec2FeatureExtractor, Wav2Vec2Model

    d = tmp_path / "models" / "audio"
    d.mkdir(parents=True)
    import torch

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    Wav2Vec2Model(cfg).save_pretrained(d)
    Wav2Vec2FeatureExtractor(sampling_rate=16000).save_pretrained(d)
    return tmp_path / "models"


class TestAudioLocalModel:
    def test_fingerprint_neural_uses_local_weights(
        self, tiny_audio_model, monkeypatch
    ):
        import numpy as np

        monkeypatch.setenv("UCFP_MODEL_DIR", str(tiny_audio_model))
        from ucfp_tpu.modality import audio as amod

        t = np.arange(3 * 8000) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        rec = amod.fingerprint_neural(x, 8000, 0, 1)
        # real model id, not the stand-in tag
        assert rec.model_id != amod.NEURAL_MODEL_ID
        emb = np.asarray(rec.embedding, np.float32)
        assert emb.shape == (32,)  # the tiny model's hidden size
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-4)
        # multiple windows packed into the fingerprint (3 s at 2 s win /
        # 1 s hop after resample to 16 kHz -> 2 windows)
        assert len(rec.fingerprint) == 2 * 32 * 4
        # config_hash must differ from the stand-in's (refuses compares)
        rec_sa = None
        monkeypatch.delenv("UCFP_MODEL_DIR")
        hf_local.reset_cache()
        rec_sa = amod.fingerprint_neural(x, 8000, 0, 2)
        assert rec_sa.config_hash != rec.config_hash
        assert rec_sa.model_id == amod.NEURAL_MODEL_ID

    def test_deterministic(self, tiny_audio_model, monkeypatch):
        import numpy as np

        monkeypatch.setenv("UCFP_MODEL_DIR", str(tiny_audio_model))
        from ucfp_tpu.modality import audio as amod

        t = np.arange(2 * 8000) / 8000.0
        x = (0.4 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
        r1 = amod.fingerprint_neural(x, 8000, 0, 1)
        r2 = amod.fingerprint_neural(x, 8000, 0, 2)
        assert r1.fingerprint == r2.fingerprint


class TestInfoAdvertisesEncoders:
    def test_info_standin_and_local(self, tiny_text_model, monkeypatch):
        import asyncio

        from test_server import call, jbody, make_app

        def info(tmpdir):
            app, _ = make_app(tmpdir)
            return jbody(call(app, "GET", "/v1/info", token=None))

        import tempfile, pathlib
        body = info(pathlib.Path(tempfile.mkdtemp()))
        assert body["encoders"]["text"]["mode"] == "stand-in"
        assert body["encoders"]["audio"]["mode"] == "stand-in"
        monkeypatch.setenv("UCFP_MODEL_DIR", str(tiny_text_model))
        body = info(pathlib.Path(tempfile.mkdtemp()))
        assert body["encoders"]["text"]["mode"] == "local-weights"
        assert body["encoders"]["image"]["mode"] == "stand-in"
