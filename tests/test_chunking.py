"""Sliding-window chunking (textstats.chunk_text): window placement,
tail-stub suppression, short/empty docs, and cross-engine oracle
parity on hand-built inputs."""

import duckdb
import pytest

from pdf_parser_spark.operators.textstats import chunk_text, chunk_text_oracle_sql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # n=10
        (2, " ".join(f"u{i}" for i in range(8))),   # n == chunk: one window
        (3, "single"),                               # n=1
        (4, "   "),                                  # whitespace-only: dropped
        (5, " ".join(f"v{i}" for i in range(20))),  # n=20
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(docs, c, s):
    return (
        chunk_text(docs, "doc_id", "text", chunk_tokens=c, stride=s)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )


def test_window_placement_and_tail_suppression(docs):
    rows = _run(docs, 8, 4)
    d1 = [(r.chunk_idx, r.n_tokens) for r in rows if r.doc_id == 1]
    # n=10: starts 0 and 4; start 8 suppressed (window at 4 reached the end)
    assert d1 == [(0, 8), (1, 6)]
    d5 = [(r.chunk_idx, r.n_tokens) for r in rows if r.doc_id == 5]
    # n=20: starts 0,4,8,12; start 16 suppressed
    assert d5 == [(0, 8), (1, 8), (2, 8), (3, 8)]


def test_exact_fit_single_window(docs):
    rows = [r for r in _run(docs, 8, 4) if r.doc_id == 2]
    assert [(r.chunk_idx, r.n_tokens) for r in rows] == [(0, 8)]
    assert rows[0].chunk == " ".join(f"u{i}" for i in range(8))


def test_short_and_empty_docs(docs):
    rows = _run(docs, 8, 4)
    assert [(r.n_tokens, r.chunk) for r in rows if r.doc_id == 3] == [(1, "single")]
    assert not [r for r in rows if r.doc_id == 4]


def test_overlap_reconstructs_document(docs):
    rows = [r for r in _run(docs, 8, 4) if r.doc_id == 5]
    toks = rows[0].chunk.split()
    for r in rows[1:]:
        toks += r.chunk.split()[4:]  # drop the stride overlap
    assert toks == [f"v{i}" for i in range(20)]


def test_invalid_params(docs):
    with pytest.raises(ValueError):
        chunk_text(docs, "doc_id", "text", chunk_tokens=4, stride=8)
    with pytest.raises(ValueError):
        chunk_text(docs, "doc_id", "text", chunk_tokens=4, stride=0)


def test_oracle_parity(spark, docs):
    sdf = (
        chunk_text(docs, "doc_id", "text", chunk_tokens=8, stride=4)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs_pd", docs.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pd")
    odf = con.execute(
        chunk_text_oracle_sql("documents", "doc_id", "text", 8, 4)
    ).fetchdf()
    assert len(sdf) == len(odf)
    for col in ("doc_id", "chunk_idx", "chunk", "n_tokens"):
        assert sdf[col].tolist() == odf[col].tolist(), col


def test_narrow_map_plan(spark, docs):
    out = chunk_text(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # no window function, no aggregate — explode over a narrow map only
    assert "Window" not in plan and "Aggregate" not in plan


def test_null_text_dropped(spark):
    df = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    rows = chunk_text(df, "doc_id", "text", chunk_tokens=2, stride=1).collect()
    assert {r.doc_id for r in rows} == {2}
