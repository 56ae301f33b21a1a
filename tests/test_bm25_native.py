"""Native C++ BM25 engine: bit-identical rankings/scores vs the Python
engine across randomized corpora, plus engine selection."""

import random

import pytest

from ucfp_tpu.index.bm25 import Bm25Engine, NativeBm25Engine, make_engine
from ucfp_tpu.native import load_bm25

WORDS = ("apple banana cherry date elderberry fig grape honeydew kiwi lemon "
         "mango nectarine orange peach quince raspberry strawberry tomato").split()


@pytest.fixture
def engines():
    lib = load_bm25()
    assert lib is not None, "g++ toolchain should be present"
    return NativeBm25Engine(lib), Bm25Engine()


def fill(engines, seed=0, docs=60):
    rng = random.Random(seed)
    for rid in range(docs):
        text = " ".join(rng.choices(WORDS, k=rng.randint(3, 40)))
        for e in engines:
            e.upsert_one(0, rid, text)


class TestNativeParity:
    def test_search_identical(self, engines):
        nat, py = engines
        fill(engines)
        rng = random.Random(1)
        for _ in range(20):
            q = rng.choices(WORDS, k=rng.randint(1, 4))
            a = nat.search(0, q, 10)
            b = py.search(0, q, 10)
            assert [d for d, _ in a] == [d for d, _ in b]
            for (d1, s1), (d2, s2) in zip(a, b):
                assert s1 == pytest.approx(s2, rel=1e-12)

    def test_explain_identical(self, engines):
        nat, py = engines
        fill(engines, seed=2)
        a = nat.search_explain(0, ["apple banana"], 5)
        b = py.search_explain(0, ["apple banana"], 5)
        assert [d for d, _, _ in a] == [d for d, _, _ in b]
        for (_, _, ta), (_, _, tb) in zip(a, b):
            assert [(t.term, t.tf) for t in ta] == [(t.term, t.tf) for t in tb]
            for x, y in zip(ta, tb):
                assert x.contribution == pytest.approx(y.contribution, rel=1e-12)

    def test_delete_and_reupsert(self, engines):
        nat, py = engines
        for e in engines:
            e.upsert_one(0, 1, "apple apple")
            e.upsert_one(0, 2, "apple banana")
            e.clear_one(0, 1)
            e.upsert_one(0, 2, "banana only now")
        assert nat.search(0, ["apple"], 5) == py.search(0, ["apple"], 5) == []
        assert [d for d, _ in nat.search(0, ["banana"], 5)] == [2]

    def test_idf_map_and_stats(self, engines):
        nat, py = engines
        fill(engines, seed=3, docs=30)
        terms = ["apple", "fig", "nonexistent"]
        a, b = nat.idf_map(0, terms), py.idf_map(0, terms)
        assert set(a) == set(b)
        for t in a:
            assert a[t] == pytest.approx(b[t], rel=1e-12)
        assert nat.stats(0) == py.stats(0)

    def test_tenant_isolation(self, engines):
        nat, _ = engines
        nat.upsert_one(0, 1, "secret")
        nat.upsert_one(1, 2, "other")
        assert nat.search(1, ["secret"], 5) == []

    def test_make_engine_prefers_native(self):
        e = make_engine(prefer_native=True)
        assert isinstance(e, NativeBm25Engine)
        assert isinstance(make_engine(prefer_native=False), Bm25Engine)


class TestNativeTokenizePath:
    """ucfp_bm25_upsert_text (ASCII tokenize in C++) vs the blob path."""

    def test_unicode_falls_back_and_matches(self, engines):
        nat, py = engines
        docs = {
            0: "Cafe au lait plain ascii",
            1: "Café au lait, naïve façade — İstanbul!",  # blob fallback
            2: "MIXED case And   punct!!! x2 plus y3",
            3: "same same same SAME tokens Tokens",  # tf counting
            4: "____ --- !!!",  # tokenless -> behaves like delete
        }
        for rid, text in docs.items():
            nat.upsert_one(0, rid, text)
            py.upsert_one(0, rid, text)
        assert nat.stats(0) == py.stats(0)
        for q in (["cafe"], ["café"], ["same tokens"], ["istanbul au"]):
            assert nat.search(0, q, 10) == py.search(0, q, 10)

    def test_ascii_reupsert_churn(self, engines):
        nat, py = engines
        fill(engines, seed=7, docs=40)
        rng = random.Random(8)
        for rid in range(0, 40, 3):
            text = " ".join(rng.choices(WORDS, k=rng.randint(1, 25)))
            nat.upsert_one(0, rid, text)
            py.upsert_one(0, rid, text)
        for rid in range(0, 40, 5):
            nat.clear_one(0, rid)
            py.clear_one(0, rid)
        assert nat.stats(0) == py.stats(0)
        for _ in range(10):
            q = rng.choices(WORDS, k=2)
            assert nat.search(0, q, 10) == py.search(0, q, 10)
