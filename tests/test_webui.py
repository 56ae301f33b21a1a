"""Dashboard page: served at /, carries the reference chart component
set (web/src/lib/components/charts/), structurally sound JS."""

from hypothesis import given, settings
from hypothesis import strategies as st

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


class TestDocsSite:
    """/docs renders the repo's markdown doc set (reference web app's
    documentation pages, web/src/lib/docs)."""

    def test_index_lists_pages(self, tmp_path):
        from test_server import call, make_app

        app, _ = make_app(tmp_path)
        resp = call(app, "GET", "/docs", token=None)
        assert resp.status == 200
        body = resp.body.decode()
        for page in ("getting-started", "authentication", "error-codes",
                     "api-reference-audio", "sdk-python"):
            assert f"/docs/{page}" in body

    def test_page_renders_markdown(self, tmp_path):
        from test_server import call, make_app

        app, _ = make_app(tmp_path)
        resp = call(app, "GET", "/docs/error-codes", token=None)
        assert resp.status == 200
        body = resp.body.decode()
        assert "<table>" in body and "<h1>" in body
        assert "rate_limited" in body
        # internal .md links rewritten to /docs routes
        assert 'href="/docs/rate-limits"' in body

    def test_unknown_and_traversal_404(self, tmp_path):
        from test_server import call, make_app

        app, _ = make_app(tmp_path)
        assert call(app, "GET", "/docs/nope", token=None).status == 404
        assert call(app, "GET", "/docs/..%2fSURVEY", token=None).status == 404

    def test_renderer_escapes_html(self):
        from ucfp_tpu.server.docsite import render_markdown

        out = render_markdown("hello <script>alert(1)</script>\n\n"
                              "`code <b>` and **bold <i>**")
        assert "<script>" not in out
        assert "&lt;script&gt;" in out
        assert "<code>code &lt;b&gt;</code>" in out
        assert "<strong>bold &lt;i&gt;</strong>" in out

    def test_renderer_constructs(self):
        from ucfp_tpu.server.docsite import render_markdown

        md = "# Title\n\n- item one\n- item two\n\n1. first\n2. second\n\n"\
             "```\ncode **not bold**\n```\n\n| a | b |\n| --- | --- |\n"\
             "| 1 | 2 |\n\n> quoted\n\n---\n"
        out = render_markdown(md)
        assert "<h1>Title</h1>" in out
        assert out.count("<li>") == 4 and "<ol>" in out and "<ul>" in out
        assert "<pre><code>code **not bold**</code></pre>" in out
        assert "<th>a</th>" in out and "<td>2</td>" in out
        assert "<blockquote>quoted</blockquote>" in out and "<hr>" in out


class TestWebuiHardening:
    def test_esc_helper_and_no_inline_key_handlers(self):
        from ucfp_tpu.server.webui import PAGE

        # stored strings (key ids, usage fields, terms) render through
        # esc(); the revoke button binds via addEventListener, never an
        # inline onclick with an interpolated id
        assert "function esc(" in PAGE
        assert "${esc(e.key_id||'')}" in PAGE
        assert "${esc(e.algorithm||'')}" in PAGE
        assert "revokeKey('${k.key_id}')" not in PAGE
        assert "encodeURIComponent(id)" in PAGE
        # kv() — the generic renderer — escapes its values
        assert "esc(obj[k])" in PAGE

    def test_bulk_rides_batch_route_with_raw_text_field(self):
        from ucfp_tpu.server.webui import PAGE

        # the bulk tab posts NDJSON rows to the batch route (one WAL
        # commit per chunk); the server extracts the `text` field and
        # fingerprints ONLY it, so results stay byte-identical to the
        # Text tab (tests/test_server.py pins that server contract).
        # The line must ride the `text` field untransformed.
        assert "/v1/ingest/text/batch/" in PAGE
        assert "JSON.stringify({record_id: rid++, text: l})" in PAGE


class TestDocsRouteCoverage:
    def test_every_route_appears_in_docs(self):
        """Route/doc drift guard: every route registered in app.py must
        be mentioned somewhere in docs/ (the docs are served at /docs,
        so an undocumented route is a user-visible gap)."""
        import pathlib
        import re

        root = pathlib.Path(__file__).resolve().parent.parent
        app_src = (root / "ucfp_tpu" / "server" / "app.py").read_text()
        routes = set(re.findall(r'r\.add\("[A-Z]+", "([^"]+)"', app_src))
        def norm(text):
            text = re.sub(r"\{[a-z_]+\}", "*", text)
            return re.sub(r"/\*(/|$)", r"/*\1", text)

        docs = norm("\n".join(
            p.read_text() for p in (root / "docs").glob("*.md")
        ))
        missing = [r for r in routes if norm(r) not in docs]
        assert not missing, f"routes not documented: {missing}"


class TestDocsiteRendererFuzz:
    """Property fuzz of the markdown renderer: for ANY input it must
    not raise, must never emit a tag it did not generate itself (all
    input HTML escaped), and must never leak a \\x00 placeholder."""

    _OWN_TAGS = __import__("re").compile(
        r"</?(?:p|ul|ol|li|h[1-4]|pre|code|strong|em|table|thead|tbody"
        r"|tr|th|td|blockquote|hr)>|<a href=\"[^\"]*\">|</a>"
    )

    @given(st.text(alphabet="#*-|>`[]()\"'&<>\x00 .1abc\n", max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_arbitrary_input_safe(self, md):
        from ucfp_tpu.server.docsite import render_markdown

        out = render_markdown(md)
        assert "\x00" not in out
        stripped = self._OWN_TAGS.sub("", out)
        assert "<" not in stripped, stripped

    def test_nul_placeholder_input_no_crash(self):
        from ucfp_tpu.server.docsite import render_markdown

        # regression: \x0099\x00 used to hit spans[99] -> IndexError
        out = render_markdown("\x0099\x00 and `code` \x000\x00")
        assert "<code>code</code>" in out
        assert "\x00" not in out


class TestDocsRenderWrappedBullets:
    def test_wrapped_bullet_merges_into_li(self):
        from ucfp_tpu.server.docsite import render_markdown

        out = render_markdown(
            "- first line of a bullet\n  that wraps onto a second line\n"
            "- another bullet\n"
        )
        assert out.count("<li>") == 2
        assert "<p>" not in out  # continuation merged, never a stray <p>
        assert "that wraps onto a second line</li>" in out
