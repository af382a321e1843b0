"""HTML → text extraction for the ``input_hint`` pages table — the WARC
step a Common-Crawl-scale pipeline runs before any text op, as a pure
Catalyst expression chain (JVM regex inside whole-stage codegen: no
Python, no UDF, scale-free).

The extractor is a FIXED, documented pipeline (trafilatura-lite):

1. drop ``<script>…</script>`` / ``<style>…</style>`` blocks (dotall,
   non-greedy — a ``<`` inside script text does not confuse it),
2. drop ``<!-- … -->`` comments,
3. every remaining tag becomes ONE space (word-boundary preservation),
4. decode the HTML core entity set (``&lt; &gt; &quot; &#39; &nbsp;``,
   then ``&amp;`` LAST so ``&amp;lt;`` decodes to the literal ``&lt;``),
5. collapse ``[ \\t\\r\\n\\f]+`` runs to one space and trim.

Contract: for whitespace-normalized body text (single-space separated,
no leading/trailing space — the pages/documents convention),
``html_text(wrap_html(text)) == text`` BYTE-IDENTICALLY — which turns
the graft's per-url text byte-identity invariant into a real
extract-after-wrap check rather than a trivial unwrap. Adversarial
HTML (e.g. ``</script`` inside a script string literal) is out of
contract, as it is for every regex-based extractor.

Every pattern is deliberately lookaround-free and backreference-free so
the SAME chain runs identically under Java regex (Spark) and RE2
(DuckDB oracle, ``'g'`` flag) — the engine-portability rule the PII
scrubber established.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: decode order matters: &amp; strictly last (see module doc)
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_BLOCK_PATTERNS = [
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]


#: page-shell constants shared by the Spark builder and the SQL twin —
#: deliberately free of single quotes so they embed verbatim in SQL.
#: The script body carries the classic regex traps (a "<" comparison,
#: a quoted "&"); the comment carries the per-row salt.
_HEAD = (
    "<html><head><title></title>"
    '<style type="text/css">body {margin:0; font: 12px "Arial"}</style>'
    '<script type="text/javascript">if (1 < 2) { var x = "a&b"; }'
    "</script></head>"
    '<body class="page" data-v="1"><!-- crawl '
)
_MID = ' --><p id="main">'
_TAIL = '</p><div class="footer"></div></body></html>'


def escape_text(col: Column) -> Column:
    """Entity-escape body text for embedding (``&`` first, inverse of
    the decode order)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def wrap_html(text_col: Column, salt_col: Column | None = None) -> Column:
    """Deterministic page shell around escaped body text: head with
    empty title, a style block, a trap-laden script, a salted comment,
    and attribute-rich body tags — everything the extractor must strip.
    Adds NO visible text of its own, so extraction returns exactly the
    input text (string column; callers ``encode(..., 'UTF-8')`` for the
    binary pages column)."""
    salt = (
        F.conv(F.substring(F.md5(salt_col.cast("string")), 1, 8), 16, 10)
        if salt_col is not None
        else F.lit("0")
    )
    return F.concat(
        F.lit(_HEAD),
        salt,
        F.lit(_MID),
        escape_text(text_col),
        F.lit(_TAIL),
    )


def html_text(col: Column, binary: bool = False) -> Column:
    """Extract visible text from an HTML string (or UTF-8 ``binary``
    with ``binary=True``) via the fixed chain in the module doc."""
    s = F.decode(col, "UTF-8") if binary else col
    for pat in _BLOCK_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"[ \t\r\n\f]+", " "))


def wrap_html_sql(text_expr: str, salt_expr: str = "'0'") -> str:
    """DuckDB twin of :func:`wrap_html` (oracle construction) — embeds
    the SAME shell constants, so both engines build byte-identical
    pages."""
    esc = (
        f"replace(replace(replace({text_expr},"
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    return (
        f"'{_HEAD}' || {salt_expr} || '{_MID}' || {esc} || '{_TAIL}'"
    )


def html_text_sql(html_expr: str) -> str:
    """DuckDB twin of :func:`html_text` — same patterns, RE2 ``'g'``."""
    s = html_expr
    for pat in _BLOCK_PATTERNS:
        s = f"regexp_replace({s}, '{pat}', '', 'g')"
    s = f"regexp_replace({s}, '<[^>]*>', ' ', 'g')"
    for ent, ch in ENTITIES:
        lit = "chr(39)" if ch == "'" else "'" + ch + "'"
        s = f"replace({s}, '{ent}', {lit})"
    return f"trim(regexp_replace({s}, '[ \\t\\r\\n\\f]+', ' ', 'g'))"
