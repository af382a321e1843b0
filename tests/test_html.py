"""HTML -> text extraction (operators/html.py): tricky-markup cases, the
wrap/extract byte-identity round trip (incl. through generate_pages and
the binary column path), and entity decode ordering."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.html import (
    escape_text,
    html_text,
    wrap_html,
)

CASES = [
    # (html, expected extracted text)
    ("<html><body><p>hello world</p></body></html>", "hello world"),
    # script with a "<" comparison and a quoted "&" must vanish whole
    (
        '<script>if (1 < 2) { var x = "a&b"; }</script><b>kept</b>',
        "kept",
    ),
    # style block, comment with markup inside, attribute-rich tags
    (
        "<style>p > em {color:red}</style><!-- <p>not text</p> -->"
        '<div class="a" data-x="1">inner</div>',
        "inner",
    ),
    # tags become word boundaries; whitespace runs collapse
    ("<p>one</p><p>two</p>\n\t <p>three</p>", "one two three"),
    # entity decode, &amp; last so &amp;lt; yields literal "&lt;"
    (
        "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt; &nbsp;end</p>",
        "a <tag> \"q\" 's' &lt; end",
    ),
    # multiline script/style (dotall)
    ("<script>\nvar a = 1;\nvar b = 2;\n</script>ok", "ok"),
    ("", ""),
]

TRICKY_TEXTS = [
    "plain words only",
    "amp & lt < gt > mixed",
    'quotes "double" and \'single\'',
    "pre-escaped &amp; &lt; stays literal",
    "unicode éü中文 ok",
]


@pytest.fixture(scope="module")
def extract(spark):
    def run(pairs, binary=False):
        df = spark.createDataFrame(pairs, "i long, html string")
        col = (
            html_text(F.encode("html", "UTF-8"), binary=True)
            if binary
            else html_text(F.col("html"))
        )
        return {
            r["i"]: r["t"]
            for r in df.select("i", col.alias("t")).collect()
        }

    return run


class TestHtmlText:
    def test_cases(self, extract):
        got = extract([(i, h) for i, (h, _) in enumerate(CASES)])
        for i, (_, want) in enumerate(CASES):
            assert got[i] == want, f"case {i}"

    def test_binary_path_identical(self, extract):
        s = extract([(i, h) for i, (h, _) in enumerate(CASES)])
        b = extract(
            [(i, h) for i, (h, _) in enumerate(CASES)], binary=True
        )
        assert s == b


class TestWrapRoundTrip:
    def test_tricky_texts_round_trip(self, spark):
        df = spark.createDataFrame(
            list(enumerate(TRICKY_TEXTS)), "i long, text string"
        )
        out = df.select(
            "i",
            "text",
            html_text(wrap_html(F.col("text"), salt_col=F.col("i"))).alias(
                "ext"
            ),
        ).collect()
        assert len(out) == len(TRICKY_TEXTS)
        for r in out:
            assert r["ext"] == r["text"]

    def test_escape_is_inverse_prefix(self, spark):
        # escape then full entity decode (via extraction of a bare wrap)
        # must return the original for any text, because & is escaped
        # first and decoded last
        df = spark.createDataFrame(
            list(enumerate(TRICKY_TEXTS)), "i long, text string"
        )
        ext = html_text(
            F.concat(F.lit("<p>"), escape_text(F.col("text")), F.lit("</p>"))
        )
        for r in df.select("text", ext.alias("e")).collect():
            assert r["e"] == r["text"]

    def test_generated_pages_extract_byte_identical(self, spark):
        from usgs_geomag_algorithms_spark.sources.pages import (
            generate_pages,
        )

        pages = generate_pages(spark, n_urls=4, hours=0.1)
        bad = (
            pages.select(
                html_text(F.col("html"), binary=True).alias("ext"), "text"
            )
            .where(F.col("ext") != F.col("text"))
            .count()
        )
        assert bad == 0
        assert pages.count() > 0
