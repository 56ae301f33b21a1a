"""Core types + error taxonomy tests (mirrors reference contract)."""

import pytest

from ucfp_tpu.core import (
    ALL_ERRORS,
    ForbiddenError,
    Hit,
    HitSource,
    IncompatibleError,
    Modality,
    ModalityError,
    Query,
    Record,
    RecordNotFound,
    UnsupportedError,
)


def test_modality_parse():
    assert Modality.parse("text") is Modality.TEXT
    assert Modality.parse("IMAGE") is Modality.IMAGE
    with pytest.raises(ModalityError):
        Modality.parse("video")


def test_record_identity_ranges():
    r = Record(1, 2, Modality.TEXT, "minhash-h128", b"\x00" * 8)
    assert r.tenant_id == 1 and r.record_id == 2
    with pytest.raises(ValueError):
        Record(-1, 0, Modality.TEXT, "a", b"")
    with pytest.raises(ValueError):
        Record(0, 2**64, Modality.TEXT, "a", b"")


def test_record_compatibility_gate():
    a = Record(0, 1, Modality.IMAGE, "phash", b"x", config_hash=7)
    b = Record(0, 2, Modality.IMAGE, "phash", b"y", config_hash=7)
    c = Record(0, 3, Modality.IMAGE, "phash", b"z", config_hash=8)
    assert a.compatible_with(b)
    assert not a.compatible_with(c)


def test_query_k_clamped_to_one():
    q = Query(0, Modality.TEXT, k=0)
    assert q.k == 1


def test_query_pool_frac_quantized_to_tier_ladder():
    """pool_frac snaps to POOL_FRAC_TIERS at the CORE type: each
    distinct pool size compiles its own kernel, so the recompile bound
    must hold for embedded/SDK callers, not just the HTTP handler
    (advisor r3 finding)."""
    import pytest

    from ucfp_tpu.core import POOL_FRAC_TIERS

    assert Query(0, Modality.TEXT).pool_frac is None
    for t in POOL_FRAC_TIERS:
        assert Query(0, Modality.TEXT, pool_frac=t).pool_frac == t
    # arbitrary values snap to the nearest tier
    assert Query(0, Modality.TEXT, pool_frac=0.01).pool_frac == POOL_FRAC_TIERS[0]
    assert Query(0, Modality.TEXT, pool_frac=0.9).pool_frac == POOL_FRAC_TIERS[-1]
    for bad in (0.0, -0.1, float("nan")):
        with pytest.raises(ValueError):
            Query(0, Modality.TEXT, pool_frac=bad)


def test_query_exact_flag():
    """exact=True opts out of every approximate path; combining it with
    a pool override (which tunes the approximate prefilter) is a
    contradiction and must fail loudly, not pick a winner silently."""
    import pytest

    assert Query(0, Modality.TEXT, exact=True).exact is True
    assert Query(0, Modality.TEXT).exact is False
    with pytest.raises(ValueError):
        Query(0, Modality.TEXT, exact=True, pool_frac=0.02)


def test_error_http_mapping():
    # Same taxonomy as reference src/error.rs:9-61.
    want = {
        "modality": 400,
        "incompatible": 409,
        "index": 500,
        "ingest": 503,
        "rerank": 500,
        "io": 500,
        "record_not_found": 404,
        "unsupported": 501,
        "forbidden": 403,
        # extension variant: remote embedding provider failure (the
        # reference folds these into Modality/400; see errors.py)
        "provider": 502,
    }
    got = {e.code: e.http_status for e in ALL_ERRORS}
    assert got == want
    assert RecordNotFound("x").http_status == 404
    assert UnsupportedError("x").http_status == 501
    assert ForbiddenError("x").http_status == 403
    assert IncompatibleError("x").http_status == 409


def test_hit_defaults():
    h = Hit(record_id=5, score=0.5)
    assert h.source is HitSource.VECTOR
    assert h.term_hits is None
