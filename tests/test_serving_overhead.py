"""Contract of the knn serving-overhead harness
(scripts/knn_serving_overhead.py), bench.py's
knn_serving_overhead_ms_10m source: it must measure the served
EmbeddedBackend.knn envelope against the in-call kernel time and
restore the wrapped kernel op afterwards."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

SCRIPT = pathlib.Path(__file__).resolve().parent.parent / "scripts" / \
    "knn_serving_overhead.py"


def test_harness_reports_envelope_and_rid_copy():
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--cpu", "--n", "50000",
         "--iters", "6"],
        capture_output=True, text=True, timeout=300, check=True,
        cwd=str(SCRIPT.parent.parent),
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["n"] == 50000
    # the envelope is real host work: positive, and small against the
    # O(catalog) rid copy the deferred design removed at 10M scale
    assert 0 < r["serving_overhead_p50_ms"] < 50
    assert r["serving_overhead_p90_ms"] >= r["serving_overhead_p50_ms"]
    assert r["rid_copy_ms"] > 0
    # total = kernel + envelope must hold to within timer noise
    assert r["served_total_p50_ms"] >= r["kernel_p50_ms"]


def test_harness_restores_wrapped_kernel():
    """The in-process import path (if ever used) must not leave the
    kernel op wrapped — run main() in-process at tiny n and check."""
    sys.path.insert(0, str(SCRIPT.parent.parent))
    from ucfp_tpu.ops import knn as knn_ops

    orig = knn_ops.cosine_topk
    import runpy

    argv = sys.argv
    sys.argv = [str(SCRIPT), "--cpu", "--n", "4096", "--iters", "3"]
    try:
        runpy.run_path(str(SCRIPT), run_name="__main__")
    finally:
        sys.argv = argv
    assert knn_ops.cosine_topk is orig
