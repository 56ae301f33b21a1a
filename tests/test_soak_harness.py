"""Contracts of the ingest-soak harness (scripts/soak_ingest.py).

bench.py's driver-facing ingest_http_imgs_per_sec metric is exactly
run_soak(); these tests pin the harness behavior the published numbers
depend on:

* the measured window really ingests (rates > 0, zero errors on a
  healthy backend), and
* the warmup wall-clock deadline trips the warmup_degraded marker
  instead of letting a stuck first compile starve the whole bench
  (observed through a congested tunnel window: one remote compile took
  480+ s against the server's 120 s request timeout x 20 warmup
  attempts).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))


def test_run_soak_measures_and_reports_clean_warmup():
    from soak_ingest import run_soak

    r = run_soak(seconds=0.5, conns=2, algorithm="phash", batch=32,
                 quiet=True)
    assert r["errors"] == 0
    assert r["requests"] > 0
    assert r["req_per_sec"] > 0
    assert r["warmup_degraded"] is False


def test_run_soak_warmup_deadline_sets_degraded_marker(monkeypatch):
    from soak_ingest import run_soak

    # A zero-second deadline is already expired when the warmup loop
    # starts: the loop must bail immediately (not run 20 x 120 s) and
    # the capture must carry the degraded marker. The measured window
    # still runs and still ingests.
    monkeypatch.setenv("UCFP_SOAK_WARMUP_S", "0")
    r = run_soak(seconds=0.5, conns=2, algorithm="phash", batch=32,
                 quiet=True)
    assert r["warmup_degraded"] is True
    assert r["requests"] > 0


def test_run_query_soak_measures_micro_batched_queries():
    """bench.py's query_http_qps_64k_x768 is exactly run_query_soak():
    the measured window must serve real micro-batched queries (qps > 0,
    zero errors, batching engaged) and a preloaded catalog."""
    from soak_query import run_query_soak

    r = run_query_soak(seconds=0.8, conns=4, n=512, d=32, k=5,
                       quant="int8")
    assert r["errors"] == 0
    assert r["queries"] > 0 and r["qps"] > 0
    assert r["p50_ms"] > 0
    assert r["batch_flushes"] > 0 and r["batch_items"] == r["queries"]
    assert r["warmup_degraded"] is False


def test_run_query_soak_exact_mode_disables_batching():
    from soak_query import run_query_soak

    r = run_query_soak(seconds=0.6, conns=2, n=256, d=16, k=3,
                       exact=True)
    assert r["errors"] == 0 and r["queries"] > 0
    assert r["batch_flushes"] == 0 and r["batch_items"] == 0


def test_run_query_soak_warmup_deadline_sets_degraded_marker(monkeypatch):
    from soak_query import run_query_soak

    monkeypatch.setenv("UCFP_SOAK_WARMUP_S", "0")
    r = run_query_soak(seconds=0.5, conns=2, n=128, d=8, k=3)
    assert r["warmup_degraded"] is True
    assert r["queries"] > 0  # the measured window still ran


def test_qbatch_pad_max_compiles_one_shape(tmp_path, monkeypatch):
    """UCFP_QBATCH_PAD=max pads every coalesced flush to
    UCFP_QBATCH_MAX — the single-compiled-shape mode the soak runs
    (through a tunneled runtime each distinct pow2 shape compiles for
    minutes)."""
    from ucfp_tpu.index.embedded import EmbeddedBackend

    monkeypatch.setenv("UCFP_QBATCH_PAD", "max")
    monkeypatch.setenv("UCFP_QBATCH_MAX", "16")
    be = EmbeddedBackend(str(tmp_path / "a"))
    assert len(be._pad_pow2_list([[1.0]] * 3)) == 16
    assert len(be._pad_pow2_list([[1.0]] * 16)) == 16
    be.close()
    monkeypatch.setenv("UCFP_QBATCH_PAD", "pow2")
    be = EmbeddedBackend(str(tmp_path / "b"))
    assert len(be._pad_pow2_list([[1.0]] * 3)) == 4
    be.close()


def test_run_soak_text_modality_ingests_docs():
    """bench.py's ingest_text_http_docs_per_sec is run_soak(modality=
    'text'): NDJSON rows through the text batch route, durable minhash
    records, zero errors on a healthy backend."""
    from soak_ingest import run_soak

    r = run_soak(seconds=0.5, conns=2, algorithm="minhash", batch=16,
                 quiet=True, modality="text")
    assert r["errors"] == 0
    assert r["requests"] > 0 and r["req_per_sec"] > 0


def test_run_soak_audio_modality_ingests_clips():
    """bench.py's ingest_audio_http_clips_per_sec is run_soak(modality=
    'audio'): binary clip frames through the audio batch route, device
    wang pipeline, zero errors on a healthy backend."""
    from soak_ingest import run_soak

    r = run_soak(seconds=0.5, conns=2, algorithm="wang", batch=4,
                 quiet=True, modality="audio")
    assert r["errors"] == 0
    assert r["requests"] > 0 and r["req_per_sec"] > 0


def test_soak_text_rows_are_valid_ndjson_after_patch():
    """The in-place rid patch must keep every row valid JSON (a leading
    zero in the fixed-width rid field broke every request in the first
    capture); rids stay distinct across the patched range."""
    import json

    from soak_ingest import _ndjson_template, _text_doc_bytes

    doc = _text_doc_bytes()
    body, offs = _ndjson_template(
        doc, list(range(100_000_000, 100_000_000 + 8)))
    # simulate the client patch at a warmup-range base rid
    for j, off in enumerate(offs):
        body[off:off + 9] = b"%09d" % (100_000_000 + 10_000_000 + j)
    rids = set()
    for line in bytes(body).split(b"\n"):
        if not line.strip():
            continue
        row = json.loads(line)
        rids.add(row["record_id"])
        assert row["text"] == doc.decode()
    assert len(rids) == 8
