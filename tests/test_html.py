"""HTML → text extraction (stages/html.py): the north-rule
"byte-identical extracted text per url" invariant.

Reference role: Common-Crawl WET extraction semantics (public format);
the reference repo has no HTML driver — this is a training-pipeline
operator from the build brief.
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_ray.stages.html import (
    HtmlTextExtractor,
    extract_text,
    synthesize_html,
    synthesize_html_batch,
)


class TestRoundtrip:
    CASES = [
        "Report 7: rain near Tokyo at 35.6895,139.6917 today.",
        "a\n\nb",
        "x & y < z > w",
        "  leading/trailing kept  ",
        "",
        "\n\n",
        "héllo wörld ☂",
        "&amp; already-escaped-looking text",
        "line with <tag> inside",
        "\n".join(str(i) * i for i in range(9)),  # hits all 4 variants
    ]

    @pytest.mark.parametrize("text", CASES)
    def test_byte_identical(self, text):
        h = synthesize_html("https://site1.example/7", text, "en", 12345)
        assert extract_text(h) == text

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
                max_size=40,
            ),
            max_size=8,
        ).map("\n".join)
    )
    def test_property_roundtrip(self, text):
        assert extract_text(synthesize_html("u", text)) == text


class TestExtraction:
    def test_boilerplate_and_scripts_dropped(self):
        html = (
            b"<html><head><title>T</title><style>p{}</style></head><body>"
            b"<nav><ul><li>menu</li></ul></nav>"
            b"<p>keep</p>"
            b"<script>var s='<p>not text</p>';</script>"
            b"<aside>ad</aside><footer>foot</footer></body></html>"
        )
        assert extract_text(html) == "keep"

    def test_blocks_entities_inline(self):
        html = (
            b"<div>stray text\n<p>a <b>b</b> <a href=x>c</a></p>"
            b"<ul><li>i1</li><li>i2</li></ul>"
            b"<p>x&nbsp;y&#33;</p><pre>  v  </pre></div>"
        )
        assert extract_text(html) == "stray text\na b c\ni1\ni2\nx\xa0y!\n  v  "

    def test_br_inside_block(self):
        assert extract_text(b"<p>a<br>b</p>") == "a\nb"

    def test_empty_leaf_is_a_line(self):
        assert extract_text(b"<p>a</p><p></p><p>b</p>") == "a\n\nb"

    def test_bad_utf8_replaced(self):
        assert extract_text(b"<p>a\xffb</p>") == "a�b"


class TestStage:
    def test_batch_stage_and_synthesis(self, ray_session):
        import ray.data as rd

        rows = pa.table(
            {
                "url": ["u/1", "u/2"],
                "warc_ts": pa.array([1, 2], pa.timestamp("us")),
                "text": ["first page\nsecond line", "third & <final>"],
                "lang": ["en", "de"],
            }
        )
        ds = rd.from_arrow(rows)
        with_html = ds.map_batches(
            lambda t: synthesize_html_batch(t).drop_columns(["text"]),
            batch_format="pyarrow",
        )
        out = with_html.map_batches(HtmlTextExtractor(), batch_format="pyarrow")
        got = out.select_columns(["url", "text"]).to_pandas()
        assert list(got["text"]) == [
            "first page\nsecond line",
            "third & <final>",
        ]
        assert "html" not in got.columns
