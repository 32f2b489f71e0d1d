"""Dedup/sketch/ANN operator edge cases (round-1 ADVICE + VERDICT).

The short-document crash: ``F.sequence(0, k-1)`` with k=0 produced a
descending array and slice() raised INVALID_PARAMETER_VALUE.START on
any doc with fewer words than the shingle width — ubiquitous in real
corpora. These tests pin the fix and the scale-fixed KMV/ANN rewrites.
"""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    word_shingles,
)
from pdf_parser_spark.operators.similarity import (
    banded_ann_topk,
    cosine_topk,
    random_hyperplane_keys,
)
from pdf_parser_spark.operators.sketches import kmv_distinct


@pytest.fixture()
def short_docs(spark):
    return spark.createDataFrame(
        [
            ("d0", ""),
            ("d1", "one"),
            ("d2", "one two"),
            ("d3", "one two three"),
            ("d4", "one two three four five six"),
            ("d5", "one two three four five six"),
        ],
        ["doc_id", "text"],
    )


def test_word_shingles_short_docs(short_docs):
    rows = {
        r["doc_id"]: r["shingles"]
        for r in word_shingles(short_docs, "text", 3).collect()
    }
    assert rows["d0"] == [] and rows["d1"] == [] and rows["d2"] == []
    assert rows["d3"] == ["one two three"]
    assert len(rows["d4"]) == 4


def test_jaccard_pairs_survive_short_docs(short_docs):
    sh = word_shingles(short_docs, "text", 3)
    pairs = jaccard_pairs(
        sh, "doc_id", "shingles", F.floor(F.size("shingles") / 16), 0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {("d4", "d5")}


def test_minhash_lsh_survives_short_docs(short_docs):
    sh = word_shingles(short_docs, "text", 3)
    pairs = minhash_lsh_pairs(sh, "doc_id", "shingles", 12, 4, 0.5).collect()
    # identical docs pair; the shingle-less docs neither crash nor pair
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {("d4", "d5")}
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_kmv_exact_below_k_and_partition_invariant(spark):
    rows = [("g1", f"v{i}") for i in range(5)] * 3 + [("g2", f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = {r["grp"]: r for r in kmv_distinct(df, "grp", "val", k=8).collect()}
    assert out["g1"]["distinct_est"] == 5.0 and out["g1"]["sketch_size"] == 5
    assert out["g2"]["sketch_size"] == 8
    assert out["g2"]["distinct_est"] > 8
    # two-phase bottom-k must be partitioning-invariant (algebraic merge)
    out1 = {
        r["grp"]: r["distinct_est"]
        for r in kmv_distinct(df.repartition(1), "grp", "val", k=8).collect()
    }
    out13 = {
        r["grp"]: r["distinct_est"]
        for r in kmv_distinct(df.repartition(13), "grp", "val", k=8).collect()
    }
    assert out1 == out13 == {g: r["distinct_est"] for g, r in out.items()}


def test_banded_ann_finds_exact_neighbors_of_clustered_data(spark):
    # clustered vectors: near-identical pairs share all sign bits, so
    # multi-probe banding must achieve exact top-1 recall here
    import random

    rnd = random.Random(11)
    base = [[rnd.uniform(-1, 1) for _ in range(64)] for _ in range(6)]
    rows = []
    for i, b in enumerate(base):
        rows.append((2 * i, [float(x) for x in b]))
        rows.append((2 * i + 1, [float(x + 0.001) for x in b]))  # near-dup twin
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    ann = banded_ann_topk(
        emb, queries, "vec_id", "embedding", "query_id", "qv", 1, bands=4, bits=8
    ).collect()
    brute = cosine_topk(
        emb, queries, "vec_id", "embedding", "query_id", "qv", 1
    ).collect()
    assert {(r["query_id"], r["vec_id"]) for r in ann} == {
        (r["query_id"], r["vec_id"]) for r in brute
    }
    assert all(r["vec_id"] == r["query_id"] + 1 for r in ann)  # twin wins


def test_random_hyperplane_keys_deterministic_and_locality(spark):
    """Seeded hyperplane bands: (a) reproducible across invocations,
    (b) near-identical vectors share every band key, (c) an
    anisotropic corpus (all first-dims positive — axis-aligned signs
    give ONE bucket) spreads across hyperplane buckets."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(3)
    # anisotropic: every dim in (0.5, 1.5) -> all raw signs positive
    base = [[rnd.uniform(0.5, 1.5) for _ in range(16)] for _ in range(8)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(100 + i, [float(x + 1e-6) for x in v]) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def keyed(seed):
        return {
            r["vec_id"]: r["k"]
            for r in df.select(
                "vec_id",
                random_hyperplane_keys(F.col("embedding"), 16, 3, 4, seed=seed).alias("k"),
            ).collect()
        }

    k1, k2 = keyed(7), keyed(7)
    assert k1 == k2  # deterministic
    for i in range(8):
        assert k1[i] == k1[100 + i]  # near-dup twins agree in every band
    # anisotropy spread: more than one distinct key per band
    per_band = {b: {k1[i][b] for i in range(8)} for b in range(3)}
    assert any(len(s) > 1 for s in per_band.values())


def test_jaccard_pairs_straddling_band_boundary(spark):
    """Near-identical docs whose shingle counts straddle a band edge
    (15 vs 16 -> floor(/16) = 0 vs 1) must still pair via the
    two-band [b, b+1] blocking (round-2 review finding)."""
    base = " ".join(f"w{i}" for i in range(17))  # 15 shingles
    plus = base + " extra"  # 16 shingles
    df = spark.createDataFrame([("a", base), ("b", plus)], ["doc_id", "text"])
    sh = word_shingles(df, "text", 3)
    band = F.floor(F.size("shingles") / 16)
    got = jaccard_pairs(sh, "doc_id", "shingles", [band, band + 1], 0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("a", "b")]
    # single-band blocking indeed misses it (the hole the fix closes)
    missed = jaccard_pairs(sh, "doc_id", "shingles", band, 0.5).collect()
    assert missed == []


def test_kmv_null_group_kept_null_values_excluded(spark):
    rows = [(None, "v1"), (None, "v2"), ("g", "v1"), ("g", None), ("g", "v1")]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {r["grp"]: r for r in kmv_distinct(df, "grp", "val", k=8).collect()}
    assert out[None]["distinct_est"] == 2.0  # NULL group is a group
    assert out["g"]["distinct_est"] == 1.0  # NULL value not counted


def test_banded_keys_reject_short_vectors(spark):
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    df = spark.createDataFrame([(1, [0.5] * 8)], ["vec_id", "embedding"])
    from pdf_parser_spark.operators.similarity import banded_sign_keys

    with pytest.raises(Exception, match="bands\\*bits"):
        df.select(banded_sign_keys(F.col("embedding"), 4, 8).alias("k")).collect()


def test_length_band_buckets_complete_for_threshold(spark):
    """The review's counterexample: sizes 64 vs 128 (ratio 2) sit 4
    fixed-width-16 bands apart, and a contained doc at ratio ~8 sits
    further — geometric banding with g+1 emissions must catch every
    pair with J >= threshold."""
    from pdf_parser_spark.operators.dedup import length_band_buckets

    big = " ".join(f"w{i}" for i in range(130))  # 128 shingles
    mid = " ".join(f"w{i}" for i in range(66))  # 64 shingles (contained)
    small = " ".join(f"w{i}" for i in range(18))  # 16 shingles (contained)
    df = spark.createDataFrame(
        [("big", big), ("mid", mid), ("small", small)], ["doc_id", "text"]
    )
    sh = word_shingles(df, "text", 3)
    buckets = length_band_buckets(F.size("shingles"), 0.12)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in jaccard_pairs(sh, "doc_id", "shingles", buckets, 0.12).collect()}
    # containment Jaccards: 64/128 = 0.5 and 16/128 = 0.125, both >= t
    assert ("big", "mid") in got and got[("big", "mid")] == 0.5
    assert ("big", "small") in got and got[("big", "small")] == 0.125
    assert ("mid", "small") in got  # 16/64 = 0.25


def test_banded_skips_null_vectors(spark):
    from pdf_parser_spark.operators.similarity import embedding_neardup_pairs

    rows = [(1, [0.5] * 32), (2, [0.5] * 32), (3, None)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = embedding_neardup_pairs(df, "vec_id", "embedding", 0.9, bands=4, bits=8).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]  # null row ignored, no crash


def test_kmv_numeric_group_keys_exact(spark):
    """Nullable BIGINT group keys above 2^53 must survive the pandas
    stage exactly (string transport; float64 would round them)."""
    g1 = (1 << 60) + 1
    g2 = (1 << 60) + 2  # adjacent -> identical under float64 rounding
    rows = [(g1, "a"), (g1, "b"), (g2, "c"), (None, "d")]
    df = spark.createDataFrame(rows, "grp bigint, val string")
    out = {r["grp"]: r["distinct_est"] for r in kmv_distinct(df, "grp", "val", 8).collect()}
    assert out == {g1: 2.0, g2: 1.0, None: 1.0}
    assert kmv_distinct(df, "grp", "val", 8).schema["grp"].dataType.simpleString() == "bigint"


def test_kmv_binary_and_signed_zero_group_keys(spark):
    """Transport must be grouping-faithful for awkward key types:
    binary keys with invalid-UTF8 bytes stay distinct (base64, not a
    lossy string cast), and -0.0/0.0 double keys merge (Spark groupBy
    semantics) instead of splitting into '-0.0'/'0.0' strings."""
    bdf = spark.createDataFrame(
        [(bytearray(b"\x80"), "a"), (bytearray(b"\x81"), "b"), (bytearray(b"\x80"), "c")],
        "grp binary, val string",
    )
    out = {bytes(r["grp"]): r["distinct_est"]
           for r in kmv_distinct(bdf, "grp", "val", 8).collect()}
    assert out == {b"\x80": 2.0, b"\x81": 1.0}

    zdf = spark.createDataFrame(
        [(0.0, "a"), (-0.0, "b"), (1.5, "c")], "grp double, val string"
    )
    rows = kmv_distinct(zdf, "grp", "val", 8).collect()
    assert {r["grp"]: r["distinct_est"] for r in rows} == {0.0: 2.0, 1.5: 1.0}
    assert len(rows) == 2  # -0.0 merged into 0.0, not a separate row


def test_hyperplane_udf_matches_expression_form(spark):
    """The Arrow-vectorized key UDF and the pure-expression builder are
    two implementations of the same fold — identical seeds must give
    identical keys for every vector (sign-exactness relies on the
    shared left-to-right addition order)."""
    import random

    from pdf_parser_spark.operators.similarity import (
        random_hyperplane_keys,
        random_hyperplane_keys_udf,
    )

    rnd = random.Random(5)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    expr = {
        r["vec_id"]: r["k"]
        for r in df.select(
            "vec_id",
            random_hyperplane_keys(F.col("embedding"), 16, 2, 5, seed=9).alias("k"),
        ).collect()
    }
    udf_keys = random_hyperplane_keys_udf(16, 2, 5, seed=9)
    got = {
        r["vec_id"]: r["k"]
        for r in df.select(
            "vec_id", udf_keys(F.col("embedding"), 2, 5).alias("k")
        ).collect()
    }
    assert got == expr


def test_connected_components_multi_hop_chain(spark):
    from pdf_parser_spark.operators.dedup import connected_components, dedup_clusters

    # two components: a 4-node chain (diameter 3) and a disjoint pair
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("c", "d"), ("x", "y")], ["id_a", "id_b"]
    )
    comps = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comps == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}

    clusters = {r["doc_id"]: (r["component"], r["cluster_size"])
                for r in dedup_clusters(pairs).collect()}
    assert clusters["d"] == ("a", 4) and clusters["y"] == ("x", 2)
    # canonical-selection rule: drop rows where doc_id != component
    canonical = {d for d, (c, _) in clusters.items() if d == c}
    assert canonical == {"a", "x"}


def test_connected_components_raises_without_convergence(spark):
    from pdf_parser_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=1)
    # and converges fine with the default budget
    comps = {r["id"]: r["comp"] for r in connected_components(chain).collect()}
    assert set(comps.values()) == {"n0"}


def test_shingle_cache_scope_owns_and_releases(spark, short_docs):
    """Caches created inside shingle_cache_scope() are scope-owned (not
    in the session-level list) and unpersisted on exit; the persisted
    projection is materialized EAGERLY (storage populated before the
    consuming action runs — the round-2 lazy-persist race fix)."""
    from pdf_parser_spark.operators.dedup import (
        _SHINGLE_CACHES,
        release_shingle_caches,
        shingle_cache_scope,
    )

    release_shingle_caches()
    sh = word_shingles(short_docs, "text", 3)
    with shingle_cache_scope() as owned:
        pairs = minhash_lsh_pairs(sh, "doc_id", "shingles", 12, 4, 0.5)
        assert len(owned) == 1 and not _SHINGLE_CACHES
        # eager materialization: blocks exist before any consuming action
        assert owned[0].storageLevel.useMemory
        assert owned[0].rdd.getNumPartitions() >= 0
        rows = pairs.collect()
        assert {(r["id_a"], r["id_b"]) for r in rows} == {("d4", "d5")}
    assert not owned[0].storageLevel.useMemory or not owned[0].is_cached
    # outside a scope, caches land in the session-level list
    pairs2 = minhash_lsh_pairs(sh, "doc_id", "shingles", 12, 4, 0.5)
    assert len(_SHINGLE_CACHES) == 1
    pairs2.count()
    assert release_shingle_caches() == 1


def test_star_cc_matches_label_on_random_graphs(spark):
    """large-star/small-star must produce IDENTICAL components to
    min-label propagation. Seeded random graphs mixing cliques, chains,
    and isolated pairs."""
    import random

    from pdf_parser_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    for trial in range(3):
        edges = []
        # a few cliques
        for c in range(3):
            nodes = [f"t{trial}c{c}n{i}" for i in range(rng.randint(2, 5))]
            edges += [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
        # a chain
        ch = [f"t{trial}ch{i:03d}" for i in range(rng.randint(5, 12))]
        edges += list(zip(ch, ch[1:]))
        # random extra edges
        all_nodes = sorted({n for e in edges for n in e})
        edges += [tuple(rng.sample(all_nodes, 2)) for _ in range(5)]
        rng.shuffle(edges)
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {(r["id"], r["comp"]) for r in connected_components_star(pairs).collect()}
        exp = {(r["id"], r["comp"]) for r in connected_components(pairs, max_iter=60).collect()}
        assert got == exp


def test_star_cc_deep_chain_converges_fast(spark):
    """A 120-hop chain: min-label needs ~120 rounds (blows its budget),
    the star variant converges in O(log n) — and still labels every
    node with the chain head."""
    from pdf_parser_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i+1:04d}") for i in range(120)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="connected_components_star"):
        # log2(120) ≈ 7 alternations needed; 2 is not enough
        connected_components_star(chain, max_iter=2)
    comps = {r["id"]: r["comp"] for r in connected_components_star(chain, max_iter=12).collect()}
    assert len(comps) == 121 and set(comps.values()) == {"n0000"}
    with pytest.raises(RuntimeError, match="use connected_components_star"):
        connected_components(chain, max_iter=25)


def test_dedup_clusters_star_algorithm(spark):
    from pdf_parser_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["id_a", "id_b"]
    )
    rows = {r["doc_id"]: (r["component"], r["cluster_size"])
            for r in dedup_clusters(pairs, algorithm="star").collect()}
    assert rows == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
                    "x": ("x", 2), "y": ("x", 2)}
    with pytest.raises(ValueError, match="unknown algorithm"):
        dedup_clusters(pairs, algorithm="bogus")


def test_ivf_topk_probes_cells_and_ranks(spark):
    """IVF: centroid selection is deterministic; every query's results
    come only from its nprobe probed cells; within probed lists the
    ranking equals brute force restricted to those lists."""
    import pyspark.sql.functions as F

    from pdf_parser_spark.operators.similarity import (
        cosine,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = ivf_topk(emb, queries, "vec_id", "embedding", "query_id", "qv",
                   k=3, n_centroids=4, nprobe=2).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    for r in out:
        assert 1 <= r["rk"] <= 3 and r["vec_id"] != r["query_id"]

    # determinism: identical output across invocations
    out2 = ivf_topk(emb, queries, "vec_id", "embedding", "query_id", "qv",
                    k=3, n_centroids=4, nprobe=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    # membership: every returned vec_id sits in one of the query's
    # probed cells
    cents = ivf_centroids(emb, "vec_id", "embedding", 4)
    lists = {r["vec_id"]: r["cell"]
             for r in ivf_assign(emb, cents, "vec_id", "embedding", 1).collect()}
    probed: dict[int, set] = {}
    probes = ivf_assign(queries, cents, "query_id", "qv", 2).collect()
    for r in probes:
        probed.setdefault(r["query_id"], set()).add(r["cell"])
    for r in out:
        assert lists[r["vec_id"]] in probed[r["query_id"]]


def test_jaccard_auto_guard_default_on(spark):
    """max_bucket_rows defaults to 'auto' (round-3 VERDICT task 5): a
    length-UNIFORM corpus above the floor trips the guard with NO
    caller opt-in — the naive caller no longer gets a silent N² bucket
    join — while max_bucket_rows=None remains the documented opt-out."""
    import pyspark.sql.functions as F

    from pdf_parser_spark.operators.dedup import (
        auto_bucket_bound,
        length_band_buckets,
        release_shingle_caches,
    )

    # the computed bound: 5000-row floor, 32·√N above it
    assert auto_bucket_bound(100) == 5000
    assert auto_bucket_bound(4_000_000) == 64_000
    assert auto_bucket_bound(0) == 5000

    n = 5200  # above the floor → the single uniform band exceeds it
    docs = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )
    sh = word_shingles(docs, "text", 3)
    buckets = length_band_buckets(F.size("shingles"), 0.5)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        jaccard_pairs(sh, "doc_id", "shingles", buckets, 0.5)
    release_shingle_caches()
    # explicit opt-out skips the guard entirely (asserted on a small
    # uniform corpus — the point is the None path, not the N² join)
    small = spark.createDataFrame(
        [(f"s{i}", "alpha beta gamma delta epsilon zeta") for i in range(20)],
        ["doc_id", "text"],
    )
    sh_small = word_shingles(small, "text", 3)
    pairs = jaccard_pairs(
        sh_small,
        "doc_id",
        "shingles",
        length_band_buckets(F.size("shingles"), 0.5),
        0.5,
        max_bucket_rows=None,
    )
    assert pairs.count() == 20 * 19 // 2
    release_shingle_caches()


def test_session_cache_registry_bounded(spark):
    """Outside a shingle_cache_scope the session registry is BOUNDED:
    registering beyond the cap auto-unpersists the oldest cache, so a
    long-lived session importing the pair builders directly can never
    accumulate pinned storage (round-3 VERDICT task 4 — the grow-only
    module-global default is gone)."""
    from pdf_parser_spark.operators import dedup as D

    D.release_shingle_caches()
    docs = spark.createDataFrame(
        [(f"b{i}", f"w{i} x{i} y{i} z{i} common words here {i}") for i in range(30)],
        ["doc_id", "text"],
    )
    sh = word_shingles(docs, "text", 3)
    for _ in range(4):
        minhash_lsh_pairs(sh, "doc_id", "shingles", 12, 4, 0.5).count()
    with D._SHINGLE_LOCK:
        n_live = len(D._SHINGLE_CACHES)
    assert n_live <= D._MAX_SESSION_CACHES
    assert D.release_shingle_caches() == n_live


def test_jaccard_pairs_bucket_guard(spark):
    """The explicit max_bucket_rows valve: a length-uniform corpus piles
    every doc into the same band — the guard names the bucket and
    recommends LSH instead of launching the quadratic join."""
    import pyspark.sql.functions as F

    from pdf_parser_spark.operators.dedup import (
        length_band_buckets,
        release_shingle_caches,
    )

    docs = spark.createDataFrame(
        [(f"u{i}", "alpha beta gamma delta epsilon zeta") for i in range(20)],
        ["doc_id", "text"],
    )
    sh = word_shingles(docs, "text", 3)
    buckets = length_band_buckets(F.size("shingles"), 0.5)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        jaccard_pairs(sh, "doc_id", "shingles", buckets, 0.5, max_bucket_rows=10)
    release_shingle_caches()
    # under the limit: runs normally (identical docs all pair up)
    pairs = jaccard_pairs(sh, "doc_id", "shingles", buckets, 0.5, max_bucket_rows=50)
    assert pairs.count() == 20 * 19 // 2
    release_shingle_caches()


def test_ivf_kmeans_matches_replica_bitexact(spark):
    """The distributed Lloyd trainer must reproduce the single-machine
    exact replica BIT-FOR-BIT: same seeded init, same rounded-cosine
    assignment with centroid-id tie-break, same order-insensitive
    decimal-exact mean, same empty-cell carry-over. Bit-exactness (not
    atol) is what lets the s5 gate embed the replica's centroids in
    its SQL oracle — and it's only possible because the Spark mean is
    an exact decimal sum, immune to partial-aggregation order
    (round-3 ADVICE on the former F.avg)."""
    import numpy as np

    from pdf_parser_spark.operators.similarity import (
        ivf_train_kmeans,
        ivf_train_kmeans_replica,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    K, ITERS = 4, 2
    got = {r["centroid_id"]: np.array(r["cvec"])
           for r in ivf_train_kmeans(emb, "vec_id", "embedding", K, ITERS).collect()}

    vectors = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    cents = ivf_train_kmeans_replica(vectors, K, ITERS)

    assert set(got) == set(cents)
    for cid in got:
        np.testing.assert_array_equal(got[cid], cents[cid])


def test_ivf_kmeans_partitioning_invariant(spark):
    """Order-insensitivity evidence: the trained centroids are
    bit-identical whether the corpus arrives in 1 partition or 13
    shuffled ones (the exact failure mode of an F.avg-based mean)."""
    import numpy as np
    import pyspark.sql.functions as F

    from pdf_parser_spark.operators.similarity import ivf_train_kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["centroid_id"]: r["cvec"]
         for r in ivf_train_kmeans(emb.coalesce(1), "vec_id", "embedding", 4, 2).collect()}
    scrambled = emb.repartition(13, F.col("vec_id"))
    b = {r["centroid_id"]: r["cvec"]
         for r in ivf_train_kmeans(scrambled, "vec_id", "embedding", 4, 2).collect()}
    assert set(a) == set(b)
    for cid in a:
        np.testing.assert_array_equal(np.array(a[cid]), np.array(b[cid]))
