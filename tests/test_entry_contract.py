"""Driver-contract guard: a representative subset of queries() must
match their oracle_sql() on DuckDB at sf0.001 (fast), exactly as the
driver's correctness gate compares them (sorted columns, sorted rows,
exact values). The full sweep lives in tools/selfcheck_entry.py."""

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# cheap-but-representative subset: one per operator family, plus every
# round-4 gate (x3 excluded: its streaming loop is pinned by
# test_rollup_maintenance and it costs ~15 s per run) and the round-5
# HTML-extraction gates
SUBSET = [
    "h1_main_content",
    "h2_dom_metadata",
    "h3_link_edges",
    "h4_url_canonicalize",
    "a1_pricing_summary",
    "a10_cube_agg",
    "q1_exact_quantiles",
    "w1_sessionize",
    "w11_stateful_sessions",
    "w12_windowed_counts",
    "w14_session_window",
    "j1_priority_dedupe",
    "j3_nearest_assign",
    "j10_salted_join",
    "e3_completeness",
    "f4_flex_match",
    "d1_exact_dedup",
    "d4_simhash",
    "s1_cosine_topk",
    "m1_media_metadata_sql",
    "r1_rollup",
    "k2_hll_distinct",
    "k3_cms_heavy_hitters",
    "k4_kmv_setops",
    "t8_pii_mask",
    "t9_shard_pack",
    "t10_bigram_lm",
    "t11_weighted_sample",
    "t12_quality_filter",
    "t13_chunk_text",
    "d9_passage_dedup",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _rows_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    sdf = E.queries()[name](spark, SF_DIR).toPandas()
    odf = con.execute(E.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            assert _rows_equal(x, y), f"{name}.{c}[{i}]: {x!r} != {y!r}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    names = [f.name for f in df.schema.fields]
    assert names == ["doc_id", "kind", "text", "media_ref", "order"]
    assert df.count() > 0


def test_every_query_has_callable():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is oracle-checked — including x1, whose oracle reads
    # the committed golden computed by the pure-Python reference oracle
    assert set(qs) == set(oracles)
