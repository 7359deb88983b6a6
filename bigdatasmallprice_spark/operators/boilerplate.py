"""HTML boilerplate removal — the FIRST stage of a web-crawl training
corpus (the trafilatura/jusText/boilerpipe slot, after WARC framing
and before scrub -> dedup -> quality): split a page into blocks and
keep the content blocks, dropping chrome (nav, related-links, footer)
by the LINK-DENSITY rule that carries those extractors — boilerplate
blocks are mostly anchor text, content blocks are mostly free text
(Kohlschuetter et al. 2010's strongest single feature).

House pattern (the WAV/BMP/WARC synthesizers): the image libs of the
web aren't in the container, so the operator SYNTHESIZES a real HTML
page per document — head/nav chrome whose visible text is entirely
anchors, the document's text split across two <p> blocks, a
related-links block, and a link-farm footer, all md5-deterministic —
and the extractor then works for real on the markup: strip tags,
measure anchor-text share per line, keep lines where anchor text is
under half the visible text. Because synthesis embeds the document
text VERBATIM in the content blocks, correctness has a closed form:
the extracted text must reconstruct the original document EXACTLY
(md5-equal), for every document — a recall-and-precision oracle in
one bit. All decisions are integer/string ops (lengths, counts, the
2*link <= visible comparison); the regexes are the dialect-portable
subset both engines run identically (the pii_scrub precedent).

Scale shape: one projection — split to lines, per-line strip + anchor
share, filter, re-join. No shuffle, no UDF, whole-stage codegen; at
100 TB extraction cost is the scan itself."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# visible text = markup removed; anchor text = capture group 1
TAG_RE = "<[^>]*>"
ANCHOR_RE = "<a [^>]*>([^<]*)</a>"


def _h(key: str, spark: bool) -> str:
    """Deterministic 5-digit page ornament from the md5-slice device."""
    if spark:
        return f"CAST(conv(substr(md5({key}), 1, 8), 16, 10) AS BIGINT) % 100000"
    return f"('0x' || substr(md5({key}), 1, 8))::BIGINT % 100000"


def _page_sql(spark: bool) -> str:
    """The page template as engine SQL: 5 chr(10)-joined lines —
    header+nav (all-anchor), two content paragraphs holding the
    document text verbatim, related links, footer."""
    cast = "STRING" if spark else "VARCHAR"
    words = "split(text, ' ')" if spark else "string_split(text, ' ')"
    n = f"size({words})" if spark else f"len({words})"
    if spark:
        c1 = f"array_join(slice({words}, 1, {n} div 2), ' ')"
        c2 = f"array_join(slice({words}, {n} div 2 + 1, {n} - {n} div 2), ' ')"
    else:
        c1 = f"array_to_string(({words})[1:{n} // 2], ' ')"
        c2 = f"array_to_string(({words})[{n} // 2 + 1:{n}], ' ')"
    # A chunk whose tokens are all empty (leading/trailing/lone
    # whitespace in the document) would render an empty <p> that the
    # extractor's length > 0 filter drops, losing the whitespace and
    # breaking the reconstructs-exactly closed form. Fold the FULL
    # text into the first <p> in that case; the second <p> renders
    # empty and is dropped harmlessly (extracted == text verbatim).
    degenerate = f"(length({c1}) = 0 OR length({c2}) = 0)"
    p1 = f"CASE WHEN {degenerate} THEN text ELSE {c1} END"
    p2 = f"CASE WHEN {degenerate} THEN '' ELSE {c2} END"
    hs = [_h(f"'bp:' || CAST(doc_id AS {cast}) || ':{i}'", spark) for i in range(5)]
    return (
        "concat_ws(chr(10), "
        f"""'<head><title><a href="/">site ' || ({hs[0]}) || '</a></title></head>'"""
        """ || '<nav><a href="/h">home</a> <a href="/c">catalog</a>"""
        """ <a href="/a">about</a> <a href="/f">faq</a></nav>', """
        f"'<p>' || {p1} || '</p>', "
        f"'<p>' || {p2} || '</p>', "
        f"""'<div class="rel"><a href="/r1">more ' || ({hs[1]}) || '</a>"""
        f""" <a href="/r2">item ' || ({hs[2]}) || '</a>"""
        f""" <a href="/r3">also ' || ({hs[3]}) || '</a></div>', """
        f"""'<footer>(c) ' || ({hs[4]}) || ' <a href="/t">terms</a>"""
        """ <a href="/p">privacy</a> <a href="/i">imprint</a>"""
        """ <a href="/c">contact</a></footer>')"""
    )


def synthesize_html(docs: DataFrame) -> DataFrame:
    """(doc_id, text, html): the deterministic page per document."""
    return docs.selectExpr(
        "doc_id", "text", f"{_page_sql(spark=True)} AS html"
    )


def _line_exprs(spark: bool) -> tuple[str, str]:
    """(visible, link_chars) expressions over a line column ``ln``.
    DuckDB's regexp_replace substitutes only the FIRST match unless
    the 'g' flag is passed; Spark always substitutes all — the flag
    is the portability seam."""
    # no trim: content chunks may legitimately end in whitespace (a
    # document with a trailing separator must reconstruct EXACTLY);
    # the empty-chunk drop only needs length > 0, and chrome lines die
    # on anchor share, not on whitespace
    if spark:
        visible = f"regexp_replace(ln, '{TAG_RE}', '')"
    else:
        visible = f"regexp_replace(ln, '{TAG_RE}', '', 'g')"
    if spark:
        link = (
            f"aggregate(regexp_extract_all(ln, '{ANCHOR_RE}', 1), "
            "CAST(0 AS BIGINT), (a, x) -> a + length(x))"
        )
    else:
        link = (
            "CAST(coalesce(list_sum(list_transform("
            f"regexp_extract_all(ln, '{ANCHOR_RE}', 1), "
            "x -> length(x))), 0) AS BIGINT)"
        )
    return visible, link


def extract_main_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, n_lines, n_kept, extracted): line-block extraction —
    keep lines with visible text whose anchor share is under half
    (2 * link_chars <= visible_chars), re-join with single spaces.
    One codegen projection: explode-free via array transforms."""
    visible, link = _line_exprs(spark=True)
    lines = f"split({html_col}, chr(10))"
    # anchor-share filter needs BOTH the raw line (for link counting)
    # and its visible text: zip the two transforms, filter, project
    keep_pred = (
        f"filter(transform({lines}, ln -> "
        f"named_struct('v', {visible}, 'lc', CAST({link} AS BIGINT))), "
        "s -> length(s.v) > 0 AND 2 * s.lc <= length(s.v))"
    )
    return pages.selectExpr(
        "doc_id",
        f"CAST(size({lines}) AS BIGINT) AS n_lines",
        f"CAST(size({keep_pred}) AS BIGINT) AS n_kept",
        f"array_join(transform({keep_pred}, s -> s.v), ' ') AS extracted",
    )


def o_extract_sql() -> str:
    """DuckDB twin: synthesis + extraction over ``documents`` as CTE
    text ending in ``ext(doc_id, n_lines, n_kept, extracted)``."""
    visible, link = _line_exprs(spark=False)
    return f"""pages AS (
  SELECT doc_id, text, {_page_sql(spark=False)} AS html FROM documents
),
lined AS (
  SELECT doc_id, u.ln, u.i FROM (
    SELECT doc_id, unnest(string_split(html, chr(10))) AS ln,
           generate_subscripts(string_split(html, chr(10)), 1) AS i
    FROM pages
  ) u(doc_id, ln, i)
),
scored AS (
  SELECT doc_id, i, {visible} AS v, {link} AS lc FROM lined
),
ext AS (
  SELECT p.doc_id,
         CAST(len(string_split(p.html, chr(10))) AS BIGINT) AS n_lines,
         CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
         COALESCE(k.extracted, '') AS extracted
  FROM pages p
  LEFT JOIN (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(v, ' ' ORDER BY i) AS extracted
    FROM scored
    WHERE length(v) > 0 AND 2 * lc <= length(v)
    GROUP BY doc_id
  ) k ON k.doc_id = p.doc_id
)"""
