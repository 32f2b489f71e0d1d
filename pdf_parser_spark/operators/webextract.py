"""HTML main-content extraction: boilerplate strip + DOM heuristics.

The north rule's extraction tier names three surfaces: PDF/layout
parse (plans/extract.py, the reference-parity pipeline), HTML
boilerplate strip, and DOM heuristics — this module is the latter two,
built Spark-first: every step is a pure Catalyst expression
(regexp_replace / split / regexp_extract_all / higher-order array
functions), so extraction is a row-local linear scan — zero shuffles,
zero Python workers, whole-stage-codegen end to end. At 10^12
documents the plan is one FileScan → Project → Generate(explode) →
Filter per partition; nothing crosses the wire until the caller
aggregates.

Method (readability/trafilatura-style density heuristics, from the
public literature — not a port of any engine):

1. strip non-content REGIONS (script/style/noscript/head/nav/header/
   footer/aside/form + comments) — one fixed non-greedy pattern per
   tag because the SQL oracle dialect (RE2) has no backreferences;
2. segment the remainder into BLOCKS at block-level tag boundaries
   (p/div/h1-6/li/tr/td/section/article/blockquote/pre/br/ul/ol/
   table);
3. score each block: visible text length and LINK DENSITY (chars
   inside <a> elements / total chars) — boilerplate is short and
   link-heavy, main content is long and link-light;
4. keep blocks with text_len >= min_len and link_density <=
   max_link_density, re-densify ordinals, decode the 5 basic
   entities.

Known, documented limits (shared by the SQL oracle, so the gate is
exact): regions are matched non-greedily without nesting awareness
(a <div> inside <nav> is removed with the nav; a <nav> nested inside
another <nav> leaves a dangling close tag that block-splitting then
discards as markup-only), and entity decoding covers
&amp; &lt; &gt; &quot; &#39; only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tags whose entire element (content included) is never main content
REGION_TAGS = (
    "script", "style", "noscript", "head",
    "nav", "header", "footer", "aside", "form",
)

# tags that terminate a text block (openers and closers both split)
BLOCK_TAGS = (
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "td",
    "section", "article", "blockquote", "pre", "br", "ul", "ol", "table",
)

_BLOCK_SPLIT = r"(?i)</?(?:" + "|".join(BLOCK_TAGS) + r")(?:\s[^>]*)?/?>"
_ANCHOR_TEXT = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
_ANY_TAG = r"<[^>]*>"


def strip_boilerplate(html_col: str | Column) -> Column:
    """Remove comments and non-content regions (script/style/nav/...).

    One regexp_replace per region tag — RE2 (the oracle dialect) has
    no backreferences, so ``<(x)>.*?</\\1>`` is spelled out per tag;
    each pattern is non-greedy and DOTALL so a region spanning lines
    is removed whole.
    """
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    out = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    for tag in REGION_TAGS:
        out = F.regexp_replace(
            out, rf"(?is)<{tag}(?:\s[^>]*)?>.*?</{tag}\s*>", " "
        )
    return out


def decode_entities(col: Column) -> Column:
    """The 5 basic HTML entities, &amp; LAST so '&amp;lt;' decodes to
    the literal '&lt;' and not to '<' (standard single-pass order)."""
    out = F.replace(col, F.lit("&lt;"), F.lit("<"))
    out = F.replace(out, F.lit("&gt;"), F.lit(">"))
    out = F.replace(out, F.lit("&quot;"), F.lit('"'))
    out = F.replace(out, F.lit("&#39;"), F.lit("'"))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def _visible_len(block: Column) -> Column:
    """Length of the block's visible text: tags removed, whitespace
    runs collapsed, ends trimmed."""
    return F.length(_visible_text(block))


def _visible_text(block: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(block, _ANY_TAG, " "), r"\s+", " ")
    )


def _link_text_len(block: Column) -> Column:
    """Total visible-char count inside <a> elements of the block."""
    anchors = F.regexp_extract_all(block, F.lit(_ANCHOR_TEXT), 1)
    return F.aggregate(
        anchors,
        F.lit(0),
        lambda acc, a: acc + F.length(F.trim(F.regexp_replace(a, _ANY_TAG, " "))),
    )


def main_content(
    df: DataFrame,
    id_col: str,
    html_col: str,
    min_len: int = 25,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Main-content blocks per document: (id, block_idx, text,
    text_len, link_density), block_idx dense in reading order.

    Pure Catalyst — one scan, explode, filter, and a row_number window
    partitioned by the document id (the only exchange, and it carries
    only the SURVIVING content blocks, already boilerplate-free).
    """
    from pyspark.sql import Window

    clean = strip_boilerplate(html_col)
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(clean, _BLOCK_SPLIT)).alias("pos", "block"),
    )
    scored = blocks.select(
        id_col,
        "pos",
        _visible_text(F.col("block")).alias("raw_text"),
        _visible_len(F.col("block")).alias("text_len"),
        _link_text_len(F.col("block")).alias("link_len"),
    ).where(F.col("text_len") > 0)
    scored = scored.withColumn(
        "link_density",
        F.round(F.col("link_len") / F.col("text_len"), 6),
    )
    kept = scored.where(
        (F.col("text_len") >= min_len)
        & (F.col("link_density") <= max_link_density)
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    return kept.select(
        id_col,
        (F.row_number().over(w) - 1).alias("block_idx"),
        decode_entities(F.col("raw_text")).alias("text"),
        "text_len",
        "link_density",
    )


def main_content_from_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    kinds: tuple[str, ...] = ("html", "text"),
    **kw,
) -> DataFrame:
    """Adapter for the interleaved input table (doc_id,
    spans:array<struct<kind,text,media_ref,offset>>): assemble each
    document's markup by concatenating its html/text-kind spans in
    offset order (media spans pass through untouched — their bytes
    never enter the text path), then extract main content.

    Assembly is row-local higher-order array ops (filter →
    transform → array_sort → array_join) — no explode, no shuffle —
    so the adapter adds zero exchanges to main_content's plan.
    """
    spans = F.col(spans_col)
    picked = F.filter(spans, lambda s: s["kind"].isin(*kinds))
    ordered = F.array_sort(
        F.transform(
            picked, lambda s: F.struct(s["offset"].alias("o"), s["text"].alias("t"))
        )
    )
    html = F.array_join(F.transform(ordered, lambda s: s["t"]), "\n")
    page = docs.select(F.col(id_col), html.alias("_html"))
    return main_content(page, id_col, "_html", **kw)


# href in double OR single quotes via one char class (RE2-safe: no
# alternation groups, no backreferences); mismatched quotes match up to
# the first closing quote of either kind — documented, engine-identical
_LINK = r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a\s*>"""


def extract_links(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """The document's outgoing-link edge list: (id, link_idx, href,
    anchor) in document order — the crawl-frontier / link-graph input
    of a web pipeline. ALL anchors count (nav and footer links are
    signal for a link graph, unlike for main content), href trimmed,
    anchor text tag-stripped and entity-decoded.

    Row-local: two regexp_extract_all passes over the same pattern
    (one per capture group — identical match set, so the zipped arrays
    align), then one posexplode. Zero shuffles beyond the caller's
    ordering."""
    raw = F.col(html_col)
    hrefs = F.regexp_extract_all(raw, F.lit(_LINK), 1)
    anchors = F.regexp_extract_all(raw, F.lit(_LINK), 2)
    out = df.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip(hrefs.alias("h"), anchors.alias("a"))).alias(
            "link_idx", "z"
        ),
    )
    return out.select(
        id_col,
        "link_idx",
        F.trim(F.col("z.h")).alias("href"),
        decode_entities(_visible_text(F.col("z.a"))).alias("anchor"),
        F.col("z.h").rlike("(?i)^\\s*(https?:)?//").alias("is_absolute"),
    )


def dom_metadata(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Per-document DOM heuristics: title, first h1, link / paragraph /
    image counts, and total visible-text length AFTER boilerplate
    strip. Row-local (zero shuffles)."""
    raw = F.col(html_col)
    clean = strip_boilerplate(html_col)
    first_h1 = F.regexp_extract(raw, r"(?is)<h1(?:\s[^>]*)?>(.*?)</h1\s*>", 1)
    title = F.regexp_extract(raw, r"(?is)<title(?:\s[^>]*)?>(.*?)</title\s*>", 1)
    return df.select(
        id_col,
        decode_entities(_visible_text(title)).alias("title"),
        decode_entities(_visible_text(first_h1)).alias("h1"),
        F.size(F.regexp_extract_all(raw, F.lit(r"(?i)<a(?:\s[^>]*)?>"), 0)).alias("n_links"),
        F.size(F.regexp_extract_all(raw, F.lit(r"(?i)<p(?:\s[^>]*)?>"), 0)).alias("n_paragraphs"),
        F.size(F.regexp_extract_all(raw, F.lit(r"(?i)<img(?:\s[^>]*)?/?>"), 0)).alias("n_images"),
        _visible_len(clean).alias("content_len"),
    )


def url_host(url_col: str | Column) -> Column:
    """Lowercased host of an absolute http(s) URL ('' for relative
    URLs), port stripped — the crawl pipeline's per-site key
    (politeness buckets, per-domain caps, link-graph nodes)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    hp = F.regexp_extract(F.trim(col), r"^(?i)https?://([^/?#]+)", 1)
    return F.lower(F.regexp_replace(hp, r":\d+$", ""))


def canonicalize_url(url_col: str | Column) -> Column:
    """Deterministic URL canonical form for dedup/frontier keys:

    1. trim + strip the fragment;
    2. absolute http(s) URLs: lowercase scheme and host, drop the
       scheme's default port (80/443), keep any other port;
    3. drop ``utm_*`` tracking params (and empty params) from the
       query, dropping the '?' when nothing survives;
    4. relative URLs pass through steps 1 and 3 only.

    Path case, param ORDER, and percent-encoding are preserved —
    reordering or decoding can change meaning, so equality stays
    conservative (no false merges). Every regex is RE2-compatible;
    the SQL oracle applies the identical rules.
    """
    u = F.regexp_replace(F.trim(F.col(url_col) if isinstance(url_col, str) else url_col),
                         r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^(?i)(https?)://", 1))
    host_port = F.regexp_extract(u, r"^(?i)https?://([^/?#]+)", 1)
    host = F.lower(F.regexp_replace(host_port, r":\d+$", ""))
    port = F.regexp_extract(host_port, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    authority = F.concat(host, F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")))
    tail = F.regexp_replace(u, r"^(?i)https?://[^/?#]+", "")
    is_abs = scheme != ""
    base = F.when(is_abs, F.concat(scheme, F.lit("://"), authority)).otherwise(F.lit(""))
    rel = F.when(is_abs, tail).otherwise(u)
    path = F.regexp_replace(rel, r"\?.*$", "")
    query = F.regexp_extract(rel, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike("^utm_"),
    )
    q = F.array_join(params, "&")
    return F.concat(
        base, path, F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )


def canonicalize_url_sql(expr: str) -> str:
    """The identical canonicalization in DuckDB SQL (RE2)."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^(?i)(https?)://', 1))"
    host_port = f"regexp_extract({u}, '^(?i)https?://([^/?#]+)', 1)"
    host = f"lower(regexp_replace({host_port}, ':[0-9]+$', ''))"
    port = f"regexp_extract({host_port}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80')"
        f" AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    authority = f"({host} || CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END)"
    tail = f"regexp_replace({u}, '^(?i)https?://[^/?#]+', '')"
    is_abs = f"({scheme} <> '')"
    base = f"CASE WHEN {is_abs} THEN {scheme} || '://' || {authority} ELSE '' END"
    rel = f"CASE WHEN {is_abs} THEN {tail} ELSE {u} END"
    path = f"regexp_replace({rel}, '\\?.*$', '')"
    query = f"regexp_extract({rel}, '\\?(.*)$', 1)"
    q = (
        f"array_to_string(list_filter(string_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '^utm_')), '&')"
    )
    return (
        f"({base} || {path} || CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)"
    )
