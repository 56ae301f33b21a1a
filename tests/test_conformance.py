"""Conformance corpus: fixed inputs -> exact fingerprint bytes, all
modalities and variants.

The analog of the reference's golden regression test
(src/server/tests.rs:1121-1163), widened into a corpus: every algorithm
family is locked by digest so ANY drift in constants, stage order,
tokenization, resize taps, DCT basis, peak picking, or wire layout
fails here. Regenerate intentionally by deleting
tests/goldens/conformance.json (never casually).
"""

import io
import json
import math
import pathlib

import numpy as np
import xxhash

from ucfp_tpu.modality import audio as amod
from ucfp_tpu.modality import image as imod
from ucfp_tpu.modality import text as tmod

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "conformance.json"

PANGRAM = "the quick brown fox jumps over the lazy dog"
LONG_TEXT = (
    "Pack my box with five dozen liquor jugs. How vexingly quick daft "
    "zebras jump! The five boxing wizards jump quickly. Sphinx of black "
    "quartz, judge my vow. " * 3
)
UNICODE_TEXT = "Ｈｅｌｌｏ Ｗorld — Grüße aus München! Καλημέρα κόσμε 你好"


def fixed_png(seed: int, w: int, h: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    return buf.getvalue()


def fixed_audio(secs: float = 3.0, sr: int = 8000) -> np.ndarray:
    t = np.arange(int(secs * sr)) / sr
    x = (
        0.4 * np.sin(2 * math.pi * 440 * t)
        + 0.25 * np.sin(2 * math.pi * 1200 * t) * (np.sin(2 * math.pi * 0.7 * t) > 0)
        + 0.1 * np.sin(2 * math.pi * 2500 * t) * (t > 1.0)
    )
    return x.astype(np.float32)


def d(fp: bytes) -> str:
    return xxhash.xxh3_64_hexdigest(fp)


FLOAT_KEYS = ("text/semantic/", "image/semantic/", "audio/neural/")


def build_corpus(skip_float: bool = False) -> dict:
    """skip_float: omit the float-encoder families (semantic/neural) —
    they are NOT part of the CPU<->TPU bit-identity contract (the exact
    integer paths are; PARITY.md). bench.py uses this to prove on-chip
    parity against the goldens committed from the CPU run."""
    out = {}
    # -- text ----------------------------------------------------------------
    out["text/minhash/pangram"] = d(
        tmod.fingerprint_minhash(PANGRAM, 0, 1).fingerprint
    )
    out["text/minhash/long"] = d(
        tmod.fingerprint_minhash(LONG_TEXT, 0, 1).fingerprint
    )
    out["text/minhash/unicode"] = d(
        tmod.fingerprint_minhash(UNICODE_TEXT, 0, 1).fingerprint
    )
    out["text/minhash/h64-k3"] = d(
        tmod.fingerprint_minhash(
            LONG_TEXT, 0, 1, tmod.TextOpts(h=64, k=3)
        ).fingerprint
    )
    out["text/minhash/grapheme"] = d(
        tmod.fingerprint_minhash(
            PANGRAM, 0, 1, tmod.TextOpts(tokenizer="grapheme")
        ).fingerprint
    )
    out["text/simhash-tf/long"] = d(
        tmod.fingerprint_simhash(LONG_TEXT, 0, 1).fingerprint
    )
    out["text/simhash-idf/long"] = d(
        tmod.fingerprint_simhash(
            LONG_TEXT, 0, 1, idf={"quick": 2.0, "jump": 3.0}
        ).fingerprint
    )
    out["text/tlsh/long"] = d(tmod.fingerprint_tlsh(LONG_TEXT, 0, 1).fingerprint)
    out["text/lsh/pangram"] = d(tmod.fingerprint_lsh(PANGRAM, 0, 1).fingerprint)
    if not skip_float:
        out["text/semantic/long"] = d(
            tmod.fingerprint_semantic(LONG_TEXT, 0, 1).fingerprint
        )
    # -- image ---------------------------------------------------------------
    for seed, w, h in ((10, 64, 64), (11, 100, 37), (12, 256, 256)):
        png = fixed_png(seed, w, h)
        out[f"image/multi/{w}x{h}"] = d(
            imod.fingerprint_multi(png, 0, 1).fingerprint
        )
        for algo in ("phash", "dhash", "ahash"):
            out[f"image/{algo}/{w}x{h}"] = d(
                imod.fingerprint_single(png, algo, 0, 1).fingerprint
            )
    if not skip_float:
        out["image/semantic/64x64"] = d(
            imod.fingerprint_semantic(fixed_png(10, 64, 64), 0, 1).fingerprint
        )
    # -- audio ---------------------------------------------------------------
    x = fixed_audio()
    out["audio/wang/8k"] = d(amod.fingerprint_wang(x, 8000, 0, 1).fingerprint)
    out["audio/wang/16k-resampled"] = d(
        amod.fingerprint_wang(
            np.repeat(x, 2), 16000, 0, 1
        ).fingerprint
    )
    out["audio/panako/8k"] = d(amod.fingerprint_panako(x, 8000, 0, 1).fingerprint)
    out["audio/haitsma/8k"] = d(
        amod.fingerprint_haitsma(x, 8000, 0, 1).fingerprint
    )
    if not skip_float:
        out["audio/neural/8k"] = d(
            amod.fingerprint_neural(x, 8000, 0, 1).fingerprint
        )
    # -- variant sweeps (strengthen the lock) ---------------------------------
    out["text/minhash/nfc-nofold"] = d(
        tmod.fingerprint_minhash(
            UNICODE_TEXT, 0, 1,
            tmod.TextOpts(normalization="nfc", case_fold=False),
        ).fingerprint
    )
    out["text/minhash/confusables"] = d(
        tmod.fingerprint_minhash(
            "сар fits like a cap", 0, 1, tmod.TextOpts(apply_confusable=True)
        ).fingerprint
    )
    out["text/minhash/cjk"] = d(
        tmod.fingerprint_minhash(
            "北京大学的计算机科学课程非常好", 0, 1,
            tmod.TextOpts(tokenizer="cjk", k=3),
        ).fingerprint
    )
    out["text/minhash/char-tok"] = d(
        tmod.fingerprint_minhash(
            PANGRAM, 0, 1, tmod.TextOpts(tokenizer="char")
        ).fingerprint
    )
    out["text/tlsh/pangram-x4"] = d(
        tmod.fingerprint_tlsh(PANGRAM * 4, 0, 1).fingerprint
    )
    # UAX#29 word-boundary lock: apostrophes stay inside words, numeric
    # grouping holds, hyphens break (round-3 tokenizer upgrade)
    out["text/minhash/uax29"] = d(
        tmod.fingerprint_minhash(
            "don't e-mail rock 'n' roll 1,234.56 items can't-do "
            "naïve café-au-lait O'Brien's 3.14159", 0, 1,
            tmod.TextOpts(k=2),
        ).fingerprint
    )
    out["text/minhash/grapheme-emoji"] = d(
        tmod.fingerprint_minhash(
            "family \U0001F468‍\U0001F469‍\U0001F467 flag "
            "\U0001F1FA\U0001F1F8 thumbs \U0001F44D\U0001F3FD done",
            0, 1, tmod.TextOpts(tokenizer="grapheme", k=3),
        ).fingerprint
    )
    out["text/minhash/html-preprocess"] = d(
        tmod.fingerprint_minhash(
            f"<html><body><p>{LONG_TEXT}</p></body></html>", 0, 1,
            tmod.TextOpts(preprocess="html"),
        ).fingerprint
    )
    short = fixed_audio(secs=1.0)
    out["audio/wang/1s"] = d(amod.fingerprint_wang(short, 8000, 0, 1).fingerprint)
    out["audio/haitsma/44k1-resampled"] = d(
        amod.fingerprint_haitsma(
            fixed_audio(secs=2.0, sr=44100), 44100, 0, 1
        ).fingerprint
    )
    wcfg = amod.WangConfig(fan_out=4, target_zone_t=32, target_zone_f=32,
                           peaks_per_sec=15, min_anchor_mag_db=-40.0)
    out["audio/wang/tuned"] = d(
        amod.fingerprint_wang(x, 8000, 0, 1, wcfg).fingerprint
    )
    hcfg = amod.HaitsmaConfig(fmin=200.0, fmax=1800.0)
    out["audio/haitsma/tuned"] = d(
        amod.fingerprint_haitsma(x, 8000, 0, 1, hcfg).fingerprint
    )
    for seed, w, h in ((20, 31, 4097),):
        pass  # extreme shapes covered by preprocess tests, not goldens
    png = fixed_png(13, 48, 640)  # tall-thin within limits
    out["image/multi/48x640"] = d(imod.fingerprint_multi(png, 0, 1).fingerprint)
    return out


class TestConformance:
    def test_corpus(self):
        got = build_corpus()
        if not GOLDEN.exists():
            GOLDEN.parent.mkdir(exist_ok=True)
            GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True))
        want = json.loads(GOLDEN.read_text())
        mismatches = {
            k: (want.get(k), got.get(k))
            for k in set(want) | set(got)
            if want.get(k) != got.get(k)
        }
        assert not mismatches, f"conformance drift: {mismatches}"
