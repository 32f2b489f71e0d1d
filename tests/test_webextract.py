"""HTML main-content extraction (operators/webextract.py): boilerplate
regions stripped whole, block segmentation at block-tag boundaries,
length/link-density gates, dense ordinals, entity decoding, and the
documented nesting limitation pinned explicitly."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.webextract import (
    dom_metadata,
    main_content,
    strip_boilerplate,
)

PAD = " the quick brown fox jumps over the lazy dog again and again"  # 61 chars


def _df(spark, html):
    return spark.createDataFrame([(1, html)], "id long, html string")


def _texts(spark, html, **kw):
    out = main_content(_df(spark, html), "id", "html", **kw)
    rows = out.orderBy("block_idx").collect()
    # ordinals are dense from 0 in reading order
    assert [r.block_idx for r in rows] == list(range(len(rows)))
    return [r.text for r in rows]


def test_regions_stripped_whole(spark):
    html = (
        "<html><head><title>t</title><style>p{}</style>"
        "<script>if (1 < 2) { var x = '</p>'; }</script></head>"
        f"<body><nav><a href='/'>home</a> more nav junk</nav><p>keep this{PAD}</p>"
        f"<footer>legal{PAD}</footer></body></html>"
    )
    texts = _texts(spark, html)
    assert texts == [f"keep this{PAD}"]


def test_link_density_drops_boilerplate(spark):
    html = (
        f"<body><p>content paragraph{PAD}</p>"
        "<div><a href='/1'>one long link text here</a> "
        "<a href='/2'>another long link text here</a></div></body>"
    )
    texts = _texts(spark, html)
    assert texts == [f"content paragraph{PAD}"]


def test_mixed_block_with_minor_link_survives(spark):
    html = f"<body><p>see <a href='/x'>ref</a>{PAD}{PAD}</p></body>"
    texts = _texts(spark, html)
    assert len(texts) == 1 and texts[0].startswith("see ref")


def test_min_len_gate(spark):
    html = f"<body><p>ok</p><p>long enough{PAD}</p></body>"
    assert _texts(spark, html) == [f"long enough{PAD}"]


def test_entities_decoded_in_output(spark):
    html = f"<body><p>Fish &amp; chips &lt;daily&gt; &#39;hot&#39; &quot;now&quot;{PAD}</p></body>"
    (text,) = _texts(spark, html)
    assert text == f"Fish & chips <daily> 'hot' \"now\"{PAD}"
    # &amp;lt; decodes to the literal '&lt;', not '<' (amp decoded last)
    html2 = f"<body><p>escaped &amp;lt;tag&amp;gt; stays literal{PAD}</p></body>"
    (text2,) = _texts(spark, html2)
    assert "&lt;tag&gt;" in text2


def test_inline_tags_do_not_split_blocks(spark):
    html = f"<body><p>one <b>bold</b> and <i>italic</i> span{PAD}</p></body>"
    (text,) = _texts(spark, html)
    assert text == f"one bold and italic span{PAD}"


def test_block_tags_with_attributes_split(spark):
    html = (
        f"<body><div class='a' id=x>first{PAD}</div>"
        f"<p style='x'>second{PAD}</p></body>"
    )
    assert _texts(spark, html) == [f"first{PAD}", f"second{PAD}"]


def test_empty_and_markup_only_blocks_vanish(spark):
    html = f"<body><div></div><div>   </div><p>real{PAD}</p><hr/></body>"
    assert _texts(spark, html) == [f"real{PAD}"]


def test_documented_nesting_limit(spark):
    """Non-greedy region match without nesting awareness: an inner
    </nav> ends the strip early and the leftover close tag is markup
    only, so content BETWEEN the navs leaks through — the documented
    limit, pinned so a change is visible."""
    html = f"<body><nav>outer <nav>inner</nav> leaked{PAD}</nav><p>main{PAD}</p></body>"
    texts = _texts(spark, html)
    assert f"main{PAD}" in texts
    assert any("leaked" in t for t in texts)


def test_strip_boilerplate_is_row_local_expression(spark):
    df = _df(spark, "<body><nav>x</nav>ok</body>").select(
        strip_boilerplate("html").alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_main_content_single_exchange(spark):
    out = main_content(_df(spark, "<p>x</p>"), "id", "html")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one window over id is the only thing that can shuffle
    assert plan.count("Window") == 1


def test_dom_metadata(spark):
    html = (
        "<html><head><title>My &amp; Title</title></head>"
        "<body><h1>The <b>Head</b>ing</h1>"
        "<p>a</p><p>b</p><a href='/1'>x</a><a href='/2'>y</a>"
        "<img src='i.png'/><nav>junk</nav></body></html>"
    )
    row = dom_metadata(_df(spark, html), "id", "html").collect()[0]
    assert row.title == "My & Title"
    assert row.h1 == "The Head ing"  # inner tags become spaces, then collapse
    assert row.n_links == 2
    assert row.n_paragraphs == 2
    assert row.n_images == 1
    assert row.content_len > 0


def test_dom_metadata_absent_fields_empty(spark):
    row = dom_metadata(_df(spark, "<body><p>x</p></body>"), "id", "html").collect()[0]
    assert row.title == "" and row.h1 == ""
    assert row.n_links == 0 and row.n_images == 0


def test_main_content_from_spans_interleaved(spark):
    """input_hint shape: html spans assembled in OFFSET order (not
    array order), media spans ignored, then extracted."""
    from pdf_parser_spark.operators.webextract import main_content_from_spans

    spans = [
        {"kind": "html", "text": f"<p>second part of the page{PAD}</p>",
         "media_ref": "", "offset": 2},
        {"kind": "pdf_page", "text": "", "media_ref": "media/1/p1", "offset": 1},
        {"kind": "html", "text": f"<nav><a href='/'>x</a></nav><p>first part{PAD}</p>",
         "media_ref": "", "offset": 0},
    ]
    df = spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    rows = main_content_from_spans(df).orderBy("block_idx").collect()
    assert [r.text for r in rows] == [f"first part{PAD}", f"second part of the page{PAD}"]
    # zero exchanges beyond main_content's own ordinal window
    plan = main_content_from_spans(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") == 1


def test_extract_links_edge_list(spark):
    from pdf_parser_spark.operators.webextract import extract_links

    html = (
        "<body><nav><a href='/'>Home</a></nav>"
        '<p>see <a class="x" href="https://ex.com/a">Ex &amp; Co</a> or '
        "<a href='//cdn.ex.com/b'>proto-relative</a> or "
        "<a href='/rel'>rel <b>bold</b></a></p>"
        "<a name='anchor-no-href'>not a link</a></body>"
    )
    rows = extract_links(_df(spark, html), "id", "html").orderBy("link_idx").collect()
    assert [(r.link_idx, r.href, r.anchor, r.is_absolute) for r in rows] == [
        (0, "/", "Home", False),
        (1, "https://ex.com/a", "Ex & Co", True),
        (2, "//cdn.ex.com/b", "proto-relative", True),
        (3, "/rel", "rel bold", False),
    ]


def test_extract_links_empty(spark):
    from pdf_parser_spark.operators.webextract import extract_links

    assert extract_links(_df(spark, "<p>no links</p>"), "id", "html").count() == 0


def test_null_html_yields_no_rows(spark):
    """NULL html: every array expression collapses to NULL and the
    explode emits nothing — same contract as the SQL oracles, where
    unnest(NULL) produces zero rows."""
    from pdf_parser_spark.operators.webextract import extract_links

    df = spark.createDataFrame([(1, None)], "id long, html string")
    assert main_content(df, "id", "html").count() == 0
    assert extract_links(df, "id", "html").count() == 0
    row = dom_metadata(df, "id", "html").collect()[0]
    assert row.title is None and row.n_links is None


URL_CASES = [
    # (input, canonical, host)
    ("HTTPS://Example.COM:443/Path/To?utm_source=x&id=7&utm_b=2#frag",
     "https://example.com/Path/To?id=7", "example.com"),
    ("http://EX.com:80/", "http://ex.com/", "ex.com"),
    ("http://ex.com:8080/a?b=1", "http://ex.com:8080/a?b=1", "ex.com"),  # non-default port kept
    ("  https://a.b/c?utm_x=1&utm_y=2  ", "https://a.b/c", "a.b"),       # all params tracking
    ("/relative/path?id=3&utm_z=9#top", "/relative/path?id=3", ""),
    ("https://host.com", "https://host.com", "host.com"),
    ("ftp://odd.scheme/x", "ftp://odd.scheme/x", ""),                    # non-http passes through
    ("https://h.com/p?", "https://h.com/p", "h.com"),                    # empty query dropped
    ("HTTP://H.COM/CaseKeptPath?A=B&utm_a=1&C=D",
     "http://h.com/CaseKeptPath?A=B&C=D", "h.com"),                      # path case + param order kept
]


def test_canonicalize_url_cases(spark):
    from pdf_parser_spark.operators.webextract import canonicalize_url, url_host

    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(URL_CASES)], "i long, u string"
    )
    rows = (
        df.select("i", canonicalize_url("u").alias("c"), url_host("u").alias("h"))
        .orderBy("i")
        .collect()
    )
    for r, (u, want_c, want_h) in zip(rows, URL_CASES):
        assert r.c == want_c, (u, r.c, want_c)
        assert r.h == want_h, (u, r.h, want_h)


def test_canonicalize_url_sql_parity(spark):
    """The DuckDB mirror produces byte-identical canon forms on the
    same tricky cases."""
    import duckdb

    from pdf_parser_spark.operators.webextract import (
        canonicalize_url,
        canonicalize_url_sql,
    )

    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(URL_CASES)], "i long, u string"
    )
    sdf = df.select("i", canonicalize_url("u").alias("c")).orderBy("i").toPandas()
    con = duckdb.connect()
    con.register("t", df.toPandas())
    odf = con.execute(
        f"SELECT i, {canonicalize_url_sql('u')} AS c FROM t ORDER BY i"
    ).fetchdf()
    assert sdf["c"].tolist() == odf["c"].tolist()
