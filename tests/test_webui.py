"""Dashboard page: served at /, carries the reference chart component
set (web/src/lib/components/charts/), structurally sound JS."""

from ucfp_tpu.server.webui import PAGE

from test_server import call, make_app

# the reference's chart components (SURVEY §2.3), as page functions
COMPONENTS = [
    "slotHeatmap",      # MinHashSlotHeatmap
    "bitWheel",         # SimHashBitWheel
    "bitGrid",          # BitGrid8x8
    "bitDiffStrip",     # BitDiffStrip (side-by-side compare)
    "byteHistogram",    # ByteHistogram
    "embeddingBars",    # EmbeddingBars
    "tfidfBars",        # TfIdfBars
    "termChips",        # TermHitChips
    "rrfBreakdown",     # RrfBreakdown
    "donut",            # Donut
    "sparkline",        # Sparkline
    "lineChart",        # LineChart
    "chartCard",        # _primitives
]


def _script() -> str:
    return PAGE.split("<script>")[1].split("</script>")[0]


class TestPage:
    def test_served_at_root(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "GET", "/", token=None)
        assert resp.status == 200
        assert b"ucfp-tpu playground" in resp.body

    def test_all_chart_components_defined_and_used(self):
        s = _script()
        for c in COMPONENTS:
            assert f"function {c}" in s, f"missing chart component {c}"
            # defined once, invoked at least once
            assert s.count(c) >= 2, f"chart component {c} never used"

    def test_script_structurally_balanced(self):
        s = _script()
        for a, b in [("{", "}"), ("(", ")"), ("[", "]")]:
            assert s.count(a) == s.count(b), f"unbalanced {a}{b}"
        assert s.count("`") % 2 == 0

    def test_compare_inputs_exist(self):
        """Side-by-side diff of two inputs (VERDICT #5 done-condition)."""
        assert 'id="text-compare"' in PAGE
        assert 'id="img-compare"' in PAGE
        assert "bitDiffStrip(" in _script()

    def test_spectrogram_and_landmark_overlay(self):
        s = _script()
        assert "lin_spec_png_b64" in s and "mel_spec_png_b64" in s
        assert "landmarks" in s and "peaks" in s  # LandmarkScatter overlay


class TestManifestDrivenTunables:
    def test_tunable_controls_present(self):
        s = _script()
        assert "function renderTunables" in s
        assert "function tunableQuery" in s
        # every modality tab has a tunables container wired to its select
        for box in ("text-tunables", "img-tunables", "aud-tunables"):
            assert box in PAGE
        # controls cover all three tunable kinds
        for kind in ("enum", "bool"):
            assert f"t.kind==='{kind}'" in s
