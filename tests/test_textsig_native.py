"""Native text-signature hot path (native/textsig.cpp): the ASCII
UAX#29 tokenizer, the fused shingle-XXH3-minhash kernel, and the
mix+min reduction must be byte-identical to the regex/numpy pipeline
they replace. Reference workload: benches/end_to_end.rs:24-42 (5.6 KiB
doc); reference claims sub-ms text fingerprints (REPORT.md:41)."""

import random

import numpy as np
import pytest
import regex

from ucfp_tpu.modality import text as T
from ucfp_tpu.modality.text import TextOpts, fingerprint_minhash
from ucfp_tpu.native import load_textsig
from ucfp_tpu.ops import textsig

pytestmark = pytest.mark.skipif(
    load_textsig() is None, reason="native textsig unavailable"
)

_SPLIT = regex.compile(r"(?w)\b")
_HAS_W = regex.compile(r"\w", regex.UNICODE)


def tokenize_slow(s: str) -> list[str]:
    """The regex-engine ground truth (tokenize_words minus the native
    shortcut)."""
    return [x for x in _SPLIT.split(s) if x and _HAS_W.search(x)]


def minhash_sig_slow(shingles, h=128) -> np.ndarray:
    import xxhash

    if not shingles:
        return np.full(h, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array(
        [xxhash.xxh3_64_intdigest(s.encode()) for s in shingles],
        dtype=np.uint64,
    )
    return textsig._mix_min_numpy(base, h)


# alphabet weighted toward the interesting boundary machinery: letters,
# digits, the four mid-joiners, quotes, underscore, whitespace/newlines,
# plus arbitrary punctuation and control bytes
_ALPHA = (
    "abcdefghij" * 4 + "aeiou" * 3 + "XYZ" + "0123456789" * 3
    + "'''" + "...,,;;::__" + "  \t\r\n" + '"-!#$%&()*+/<=>?@[\\]^`{|}~'
    + "\x00\x01\x07\x0b\x0c\x7f"
)


def _random_ascii(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(_ALPHA) for _ in range(n))


class TestTokenizerEquality:
    DIRECTED = [
        "", " ", "...", "''", "'", "_", "_._", "_'a", "'a", "'z", "'1",
        "''a", "d''a", "can''t", "don't", "a'b'c", "l'objectif", "'e'e",
        "'quoted'", "x 'a", "1'a", "1'2", "a'1", "a'", "'a1", "'_",
        "1,234.56", "a.b.c", "a..b", "a.:b", "x:y", "x;y", "3;4",
        "1;2;3", "a;b;c", "a.1", "1.a", "a,b", "1,a", "x-y", "a_.b",
        "_1_", "a__b", "abc123def", "1a2", "0xff", "e.g. i.e.",
        "3.", ".3", "a:", ":a", "a\r\nb", "a\tb", "a\nb", "a\rb",
        "tab\there", "a . b", "CRLF\r\n\r\nend", "A.B", "A'E", "'E",
        "the quick brown fox jumps over the lazy dog",
    ]

    def test_directed_cases(self):
        for c in self.DIRECTED:
            assert textsig.tokenize_ascii_fast(c) == tokenize_slow(c), repr(c)

    def test_fuzz_token_streams(self):
        rng = random.Random(0xC0FFEE)
        for trial in range(3000):
            s = _random_ascii(rng, rng.randrange(0, 64))
            fast = textsig.tokenize_ascii_fast(s)
            slow = tokenize_slow(s)
            assert fast == slow, f"trial {trial}: {s!r} {fast} != {slow}"

    def test_fuzz_longer_documents(self):
        rng = random.Random(1234)
        for trial in range(100):
            s = _random_ascii(rng, rng.randrange(200, 2000))
            assert textsig.tokenize_ascii_fast(s) == tokenize_slow(s), (
                f"trial {trial}"
            )

    def test_all_single_and_pair_bytes(self):
        """Exhaustive 1- and 2-byte printable+control coverage."""
        chars = [chr(i) for i in range(0x00, 0x80)]
        for a in chars:
            assert textsig.tokenize_ascii_fast(a) == tokenize_slow(a), repr(a)
        rng = random.Random(7)
        sample = rng.sample([a + b for a in chars for b in chars], 4000)
        for s in sample:
            assert textsig.tokenize_ascii_fast(s) == tokenize_slow(s), repr(s)

    def test_non_ascii_returns_none(self):
        assert textsig.tokenize_ascii_fast("héllo") is None
        # tokenize_words still answers through the regex path
        assert T.tokenize_words("héllo wörld") == tokenize_slow("héllo wörld")


class TestFusedSignatureEquality:
    def test_fuzz_signatures(self):
        rng = random.Random(99)
        for trial in range(300):
            s = _random_ascii(rng, rng.randrange(1, 400))
            toks = tokenize_slow(s)
            k = rng.choice([2, 3, 5, 8])
            h = rng.choice([16, 64, 128])
            fast = textsig.text_minhash_fast(s, k, h)
            assert fast is not None
            sig, nsh = fast
            if not toks:
                assert nsh == 0
                continue
            sh = T.shingles_of(toks, k)
            assert nsh == len(sh), f"trial {trial}: {s!r}"
            assert np.array_equal(sig, minhash_sig_slow(sh, h)), (
                f"trial {trial}: {s!r}"
            )

    def test_record_identical_to_forced_fallback(self, monkeypatch):
        docs = [
            "The quick brown fox jumps over the lazy dog. " * 30,
            "pack my box with five dozen liquor jugs",
            "short",
            "numbers 1,234.56 and can't-stop hyphen-ation _under_score_",
        ]
        fast = [fingerprint_minhash(d, 1, i) for i, d in enumerate(docs)]
        monkeypatch.setattr(textsig, "text_minhash_fast", lambda *a: None)
        monkeypatch.setattr(textsig, "tokenize_ascii_fast", lambda *a: None)
        slow = [fingerprint_minhash(d, 1, i) for i, d in enumerate(docs)]
        for f, s in zip(fast, slow):
            assert f.fingerprint == s.fingerprint
            assert f.config_hash == s.config_hash
            assert f.text == s.text

    def test_no_tokens_error_matches(self):
        from ucfp_tpu.core import ModalityError

        with pytest.raises(ModalityError, match="no tokens"):
            fingerprint_minhash("... !!! ...", 1, 1)

    def test_non_word_tokenizer_unaffected(self):
        a = fingerprint_minhash("abc def ghi jkl", 1, 1,
                                TextOpts(tokenizer="char"))
        assert a.fingerprint  # char tokenizer keeps the slow path


class TestMixMinEquality:
    def test_fuzz_mix_min(self):
        rng = np.random.default_rng(5)
        for _ in range(50):
            s = int(rng.integers(1, 3000))
            h = int(rng.choice([16, 120, 128, 1024]))
            base = rng.integers(0, 2**64, size=s, dtype=np.uint64)
            lib = load_textsig()
            import ctypes

            out = np.empty(h, dtype=np.uint64)
            u64p = ctypes.POINTER(ctypes.c_uint64)
            lib.ucfp_minhash_mix_min(
                base.ctypes.data_as(u64p), s,
                textsig.slot_keys(h).ctypes.data_as(u64p), h,
                out.ctypes.data_as(u64p),
            )
            assert np.array_equal(out, textsig._mix_min_numpy(base, h))

    def test_xxh3_matches_python_module(self):
        """The vendored xxhash header and the Python module must agree —
        covered indirectly by the signature fuzz, pinned directly here
        via a 1-shingle document whose hash IS the signature input."""
        import xxhash

        sig, nsh = textsig.text_minhash_fast("lonely", 5, 8)
        assert nsh == 1
        base = np.uint64(xxhash.xxh3_64_intdigest(b"lonely"))
        assert np.array_equal(
            sig, textsig._mix_min_numpy(np.array([base]), 8)
        )


class TestCanonicalizeAsciiFastPath:
    def test_ascii_equals_slow_canonicalization(self):
        """The ASCII shortcut must equal the full pipeline (NFKC is the
        identity on ASCII; no bidi/Cf/confusable chars below U+0080)."""
        import unicodedata

        rng = random.Random(3)
        for _ in range(500):
            s = _random_ascii(rng, rng.randrange(0, 80))
            for fold in (True, False):
                for norm in ("nfc", "nfkc", "nfd", "nfkd", "none"):
                    opts = TextOpts(case_fold=fold, normalization=norm,
                                    apply_confusable=True)
                    got = T.canonicalize(s, opts)
                    want = s
                    if norm != "none":
                        want = unicodedata.normalize(norm.upper(), want)
                    if fold:
                        want = want.casefold()
                    want = "".join(
                        ch for ch in want
                        if unicodedata.category(ch) != "Cf"
                    ).translate(T._CONFUSABLES)
                    assert got == want, repr(s)

    def test_non_ascii_still_normalized(self):
        opts = TextOpts()
        # NFKC folds the ligature and width forms; strip removes Cf
        assert T.canonicalize("ﬁn​Ａ", opts) == "fina"
        got = T.canonicalize("Straße", opts)
        assert got == "strasse"


class TestTlshNative:
    def test_fuzz_vs_python(self, monkeypatch):
        """Native TLSH must be byte-identical to the REAL Python
        fallback (tlsh_128_1 with the native module disabled — not a
        copy that could go stale) over random inputs, including
        low-variation and boundary-length cases (the l_capturing base
        switches at 656 and 3199)."""
        rng = random.Random(11)

        def py_tlsh(data: bytes) -> str:
            orig = textsig._native_textsig
            monkeypatch.setattr(textsig, "_native_textsig", lambda: None)
            try:
                return textsig.tlsh_128_1(data)
            finally:
                monkeypatch.setattr(textsig, "_native_textsig", orig)

        lengths = ([50, 51, 100, 655, 656, 657, 3198, 3199, 3200, 5000]
                   + [rng.randrange(50, 4000) for _ in range(60)])
        for n in lengths:
            data = bytes(rng.randrange(256) for _ in range(n))
            native = textsig.tlsh_128_1(data)
            assert len(native) == 70
            assert native == py_tlsh(data), n
        # embedded NULs must not truncate the ctypes pass-through: the
        # same bytes with the NULs replaced must give a DIFFERENT digest
        rng2 = random.Random(13)
        data = bytes(rng2.randrange(256) for _ in range(300))
        data = data[:50] + b"\x00\x00\x00" + data[53:]
        assert data.count(0) >= 3
        assert textsig.tlsh_128_1(data) == py_tlsh(data)
        swapped = data.replace(b"\x00", b"A")
        assert textsig.tlsh_128_1(swapped) != textsig.tlsh_128_1(data)

    def test_error_contract(self):
        with pytest.raises(ValueError, match="requires >= 50"):
            textsig.tlsh_128_1(b"short")
        with pytest.raises(ValueError, match="variation"):
            textsig.tlsh_128_1(b"\x00" * 200)


class TestSimhashNative:
    def test_fuzz_vs_python(self):
        from collections import Counter

        rng = random.Random(21)
        for trial in range(400):
            s = _random_ascii(rng, rng.randrange(1, 300))
            toks = tokenize_slow(s)
            fast = textsig.text_simhash_tf_fast(s)
            assert fast is not None
            h, has = fast
            assert has == bool(toks), repr(s)
            if not toks:
                continue
            tf = Counter(toks)
            terms = list(tf.keys())
            want = textsig.simhash64(terms, [float(tf[t]) for t in terms])
            assert h == want, f"trial {trial}: {s!r}"

    def test_record_identical_to_forced_fallback(self, monkeypatch):
        from ucfp_tpu.modality.text import fingerprint_simhash

        docs = ["the the the quick fox fox", "a b a b a", "don't stop 1,234"]
        fast = [fingerprint_simhash(d, 1, i) for i, d in enumerate(docs)]
        monkeypatch.setattr(textsig, "text_simhash_tf_fast", lambda *a: None)
        slow = [fingerprint_simhash(d, 1, i) for i, d in enumerate(docs)]
        for f, s in zip(fast, slow):
            assert f.fingerprint == s.fingerprint
            assert f.algorithm == s.algorithm

    def test_idf_paths_unchanged(self):
        from ucfp_tpu.modality.text import fingerprint_simhash

        doc = "alpha beta beta gamma"
        # weighted IDF must NOT ride the TF fast path
        r_idf = fingerprint_simhash(doc, 1, 1, idf={"beta": 9.0})
        assert r_idf.algorithm == "simhash-b64-idf"
        r_tf = fingerprint_simhash(doc, 1, 2)
        assert r_tf.algorithm == "simhash-b64-tf"
        # empty-corpus IDF fallback: TF weights, IDF tag (first-document
        # behavior) — rides the fast path with the same tag
        r_fb = fingerprint_simhash(doc, 1, 3, idf={})
        assert r_fb.algorithm == "simhash-b64-idf"
        assert r_fb.fingerprint == r_tf.fingerprint


class TestStripTableEquality:
    def test_translate_matches_per_char_loop(self):
        """The memoizing Cf-delete table must equal the old per-char
        unicodedata loop for every strip_bidi/strip_format combination,
        across a plane-spanning sample (incl. every bidi control, Cf
        chars like SOFT HYPHEN/ZWJ/ZWNJ, and non-Cf lookalikes)."""
        import unicodedata

        sample = (
            "plain ascii"
            + "".join(sorted(T._BIDI_CONTROLS))
            + "­​‌‍﻿⁠۝\U000e0001"
            + " 　  "  # spaces/separators: NOT Cf
            + "héllo wörld Straße ﬁn ① 中文テキスト한국어"
            + "".join(chr(c) for c in range(0x2000, 0x2070))
        )
        rng = random.Random(9)
        docs = ["".join(rng.choice(sample) for _ in range(120))
                for _ in range(200)] + [sample]
        for s in docs:
            for bidi in (True, False):
                for fmt in (True, False):
                    opts = TextOpts(strip_bidi=bidi, strip_format=fmt,
                                    normalization="none", case_fold=False)
                    got = T.canonicalize(s, opts)
                    want = "".join(
                        ch for ch in s
                        if not (bidi and ch in T._BIDI_CONTROLS)
                        and not (fmt and unicodedata.category(ch) == "Cf")
                    )
                    assert got == want, (bidi, fmt, repr(s[:40]))

    def test_bidi_controls_are_all_cf(self):
        """The table reduction (strip_format subsumes strip_bidi) relies
        on every bidi control being category Cf — pin it."""
        import unicodedata

        for c in T._BIDI_CONTROLS:
            assert unicodedata.category(c) == "Cf", hex(ord(c))


class TestUnicodeTokenizerEquality:
    """The full-Unicode native scanner (ucfp_text_tokens_u8 over the
    wb_table.h generated from the regex engine) must match (?w)\\b on
    EVERY script. The probes that pinned the engine's rule variant —
    raw WB6/12 lookahead, raw WB7/11 left element, sot-leading
    Extend/Format attachment, odd-RI break suppression, the 41-vowel
    apostrophe bind set — live here as directed cases."""

    DIRECTED = [
        "can't stop", "l'objectif", "l’objectif", "l'zebra",
        "l'école", "'a", "'z", "'1", "'é", "'İstanbul",
        "’a", "’é", "1'a", "1'2", "1’2", "a'",
        "'''", "a''b", "a'’b", "'́a", "́a", "‌c",
        "̈!gcd", "1,234.5", "中文abc",
        "日本語テスト",
        "カタカナ", "ひらがな",
        "한국어 텍스트",
        "עברית א'ב א\"א",
        "א׳א", "а'б", "'а",
        "a‍\U0001f600", "\U0001f1eb\U0001f1f7\U0001f1e9\U0001f1ea",
        "\U0001f1eba", "a\U0001f1eb", "\U0001f1eb1",
        "\U0001f1eb\U0001f1f7a", "\U0001f1eb́\U0001f1f7a",
        "\U0001f1eb'a", "\U0001f1eb\r", "\U0001f1eb中",
        "\U0001f600a", "a\U0001f600", "\U0001f1eb\U0001f600",
        "a­b", "áb", "áb", "  　 ", "a\rb\nc\r\nd",
        "ห​น", "กขค thai",
        "क्‍ष", "ﬁnancial ﷺ",
        "Ωμέγα",
        "العربية نص",
        "bf‌:Z", "ëf’­X", "a한Бj'́c",
        "üôéeöë’­X",
        "עç한‌'ë",
        "êאûî국́́ù\U0001f3fd:ßÆ",
        "", "x", "\U0001f1eb", "中",
    ]

    POOLS = [
        "abcdefghijXYZ0123456789_'’.,:;-!? \t\n\r",
        "àâçéèêëîïô"
        "öùûüÿÆŒß",
        "中文漢字日本語ひらが"
        "なカタカナ한국어",
        "עבריתא׳\"'",
        "\U0001f1eb\U0001f1f7\U0001f1e9\U0001f1ea\U0001f600"
        "\U0001f44d\U0001f3fd‍",
        "́̈‌‍​­‪",
        "αβγδωΑΩ "
        "абвгд АБВ",
        "'\"’",
    ]

    def test_directed_cases(self):
        for c in self.DIRECTED:
            assert textsig.tokenize_u8_fast(c) == tokenize_slow(c), repr(c)

    def test_fuzz_mixed_scripts(self):
        rng = random.Random(0xBEEF)
        for trial in range(4000):
            npool = rng.randint(1, 5)
            s = "".join(
                rng.choice(
                    self.POOLS[rng.randrange(npool)]
                    if rng.random() < 0.7
                    else rng.choice(self.POOLS)
                )
                for _ in range(rng.randrange(0, 40))
            )
            fast = textsig.tokenize_u8_fast(s)
            slow = tokenize_slow(s)
            assert fast == slow, f"trial {trial}: {s!r} {fast} != {slow}"

    # one representative per Word_Break class + the tailoring specials
    SPECIAL = [
        "'", "’", '"', "×", "\U0001f1eb", "\U0001f1f7", "a",
        "e", "z", "1", "ـ", "א", "カ", "_", ",", ".",
        ":", " ", "\r", "\n", " ", "‍", "́", "­",
        "中", "\U0001f600", "É", "é",
    ]

    def test_exhaustive_class_pairs(self):
        for a in self.SPECIAL:
            for b in self.SPECIAL:
                s = a + b
                assert textsig.tokenize_u8_fast(s) == tokenize_slow(s), repr(s)

    def test_class_triples_sampled(self):
        rng = random.Random(31337)
        for _ in range(4000):
            s = "".join(rng.choice(self.SPECIAL) for _ in range(3))
            assert textsig.tokenize_u8_fast(s) == tokenize_slow(s), repr(s)

    def test_lone_surrogate_falls_back(self):
        s = "a\ud800b"
        assert textsig.tokenize_u8_fast(s) is None  # cannot UTF-8 encode
        # tokenize_words still answers through the regex path
        assert T.tokenize_words(s) == tokenize_slow(s)

    def test_wb_table_matches_engine_version(self):
        """A `regex` upgrade must regenerate wb_table.h (the table IS
        the engine's property data). scripts/gen_wb_table.py rebuilds
        it; the differential fuzz above would catch semantic drift, this
        catches it at the source."""
        import os

        import ucfp_tpu.native as native

        hdr = os.path.join(os.path.dirname(native.__file__), "wb_table.h")
        with open(hdr) as f:
            head = f.read(512)
        assert f"regex {regex.__version__}" in head, (
            "wb_table.h generated from a different regex version — "
            "re-run scripts/gen_wb_table.py"
        )


class TestUnicodeFusedSignatures:
    def test_fuzz_minhash_u8(self):
        rng = random.Random(4242)
        pools = TestUnicodeTokenizerEquality.POOLS
        for trial in range(600):
            s = "".join(
                rng.choice(rng.choice(pools))
                for _ in range(rng.randrange(0, 60))
            )
            k = rng.choice([2, 3, 5])
            fast = textsig.text_minhash_u8_fast(s, k, 32)
            assert fast is not None
            sig, nsh = fast
            toks = tokenize_slow(s)
            sh = T.shingles_of(toks, k)
            assert nsh == len(sh), repr(s)
            if sh:
                assert np.array_equal(sig, minhash_sig_slow(sh, 32)), repr(s)

    def test_fuzz_simhash_u8(self):
        rng = random.Random(777)
        pools = TestUnicodeTokenizerEquality.POOLS
        for trial in range(600):
            s = "".join(
                rng.choice(rng.choice(pools))
                for _ in range(rng.randrange(0, 50))
            )
            got = textsig.text_simhash_tf_u8_fast(s)
            assert got is not None
            hv, has = got
            toks = tokenize_slow(s)
            assert has == bool(toks), repr(s)
            if toks:
                terms = sorted(set(toks))
                want = textsig.simhash64(
                    terms, [float(toks.count(t)) for t in terms]
                )
                assert hv == want, repr(s)

    def test_record_identical_to_forced_fallback(self, monkeypatch):
        doc = (
            "Voilà l'objectif qu'il préférait — "
            "déjà vu, café, naïve, "
            "中文混入 textes français. "
        ) * 8
        fast = fingerprint_minhash(doc, 1, 1)
        monkeypatch.setattr(textsig, "text_minhash_u8_fast", lambda *a: None)
        monkeypatch.setattr(textsig, "tokenize_u8_fast", lambda *a: None)
        slow = fingerprint_minhash(doc, 1, 1)
        assert fast.fingerprint == slow.fingerprint
        assert fast.config_hash == slow.config_hash

    def test_simhash_record_identical_to_forced_fallback(self, monkeypatch):
        from ucfp_tpu.modality.text import fingerprint_simhash

        doc = "café résumé naïve 中文 " * 20
        fast = fingerprint_simhash(doc, 1, 1)
        monkeypatch.setattr(
            textsig, "text_simhash_tf_u8_fast", lambda *a: None
        )
        monkeypatch.setattr(textsig, "tokenize_u8_fast", lambda *a: None)
        slow = fingerprint_simhash(doc, 1, 1)
        assert fast.fingerprint == slow.fingerprint


class TestCfPrefilterEquality:
    def test_regex_cf_set_identical_to_unicodedata(self):
        """canonicalize skips the Cf-delete translate when a compiled
        \\p{Cf} search finds nothing — sound only if the regex engine's
        Cf set equals unicodedata's. Pin equality BOTH ways (a missing
        char would silently survive stripping; an extra would force a
        harmless but wasteful translate)."""
        import unicodedata

        cps = [cp for cp in range(0x110000) if not 0xD800 <= cp <= 0xDFFF]
        s = "".join(map(chr, cps))
        re_cf = set()
        for m in regex.finditer(r"\p{Cf}+", s):
            re_cf.update(cps[p] for p in range(m.start(), m.end()))
        ud_cf = {
            cp for cp in cps if unicodedata.category(chr(cp)) == "Cf"
        }
        assert re_cf == ud_cf

    def test_strip_format_with_cf_present(self):
        from ucfp_tpu.modality.text import TextOpts, canonicalize

        s = "abc​def­ghi‎中"  # ZWSP is Cf? no — 200b is Zs-ish
        out = canonicalize(s, TextOpts())
        import unicodedata

        # every Cf char is gone, everything else survives (casefolded)
        assert all(unicodedata.category(c) != "Cf" for c in out)
        assert "abc" in out and "中" in out

    def test_strip_bidi_only(self):
        from ucfp_tpu.modality.text import TextOpts, canonicalize

        opts = TextOpts(strip_format=False, strip_bidi=True)
        s = "a‪b‬c é"
        out = canonicalize(s, opts)
        assert "‪" not in out and "‬" not in out
        assert out == "abc é"


class TestGraphemeScanner:
    """Native GB-rule scanner vs the regex engine's \\X (no engine
    quirks observed — probed: hangul jamo composition, RI pairs,
    GB11 ZWJ-emoji sequences, tag-sequence flags, prepend)."""

    DIRECTED = [
        "áb", "\r\n", "a\rb", "각", "각ᆨ", "각ᅡ",
        "\U0001f1eb\U0001f1f7\U0001f1e9\U0001f1ea",
        "\U0001f1eb\U0001f1f7\U0001f1e9",
        "\U0001f469‍\U0001f469‍\U0001f467",
        "\U0001f600́‍\U0001f600", "a‍\U0001f600",
        "\U0001f600‍a", "ःa", "aः", "؀a", "؀\r",
        "́a", "‍a", "\x0ba", "é́",
        "\U0001f3f4\U000e0067\U000e0062\U000e007f",
        "؀؀a", "\U0001f1eb́\U0001f1f7",
        "", "x", " ", "  　 ",
    ]

    def test_directed_cases(self):
        for c in self.DIRECTED:
            assert textsig.tokenize_graphemes_fast(c) == regex.findall(
                r"\X", c
            ), repr(c)

    def test_fuzz_mixed_scripts(self):
        rng = random.Random(0x6CB)
        pools = TestUnicodeTokenizerEquality.POOLS + [
            "각각ᆨᅡ؀ः\x0b",
            "\U0001f3f4\U000e0067\U000e0062\U000e007f",
        ]
        for trial in range(4000):
            s = "".join(
                rng.choice(rng.choice(pools))
                for _ in range(rng.randrange(0, 30))
            )
            assert textsig.tokenize_graphemes_fast(s) == regex.findall(
                r"\X", s
            ), repr(s)

    def test_skip_spaces_matches_isspace_filter(self):
        rng = random.Random(42)
        pools = TestUnicodeTokenizerEquality.POOLS
        for trial in range(800):
            s = "".join(
                rng.choice(rng.choice(pools))
                for _ in range(rng.randrange(0, 30))
            )
            got = textsig.tokenize_graphemes_fast(s, skip_spaces=True)
            want = [g for g in regex.findall(r"\X", s) if not g.isspace()]
            assert got == want, repr(s)

    def test_fused_grapheme_minhash(self):
        rng = random.Random(17)
        pools = TestUnicodeTokenizerEquality.POOLS
        for trial in range(400):
            s = "".join(
                rng.choice(rng.choice(pools))
                for _ in range(rng.randrange(0, 40))
            )
            k = rng.choice([2, 3, 5])
            sig, nsh = textsig.text_minhash_gr_fast(s, k, 32)
            toks = [g for g in regex.findall(r"\X", s) if not g.isspace()]
            sh = T.shingles_of(toks, k)
            assert nsh == len(sh), repr(s)
            if sh:
                assert np.array_equal(sig, minhash_sig_slow(sh, 32)), repr(s)

    def test_grapheme_record_identical_to_forced_fallback(self, monkeypatch):
        opts = TextOpts(tokenizer="grapheme")
        doc = "café 中文 👩‍👩‍👧 déjà vu naïve " * 10
        fast = fingerprint_minhash(doc, 1, 1, opts)
        monkeypatch.setattr(textsig, "text_minhash_gr_fast", lambda *a: None)
        slow = fingerprint_minhash(doc, 1, 1, opts)
        assert fast.fingerprint == slow.fingerprint
        assert fast.config_hash == slow.config_hash
