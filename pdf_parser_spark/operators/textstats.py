"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate) — no Python in
the hot path; linear scans, no shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# function-word list for the n-gram/stopword language heuristic
EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "you",
    "that", "for", "on", "with", "as", "are", "this", "be", "or", "at",
]


def words_col(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count(text_col: str) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text_col))


def regex_token_count(text_col: str) -> Column:
    """BPE-ish token count: word pieces + standalone punctuation."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_ratio(text_col: str) -> Column:
    words = words_col(text_col)
    stops = F.filter(words, lambda w: F.lower(w).isin(EN_STOPWORDS))
    return F.round(F.size(stops) / F.greatest(F.size(words), F.lit(1)), 6)


def mean_word_len(text_col: str) -> Column:
    words = words_col(text_col)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.round(total / F.greatest(F.size(words), F.lit(1)), 6)


def quality_score(text_col: str) -> Column:
    """Heuristic quality in [0,1]: length band + stopword presence +
    word-length sanity (the usual pretraining-filter features)."""
    n = token_count(text_col)
    len_ok = F.when((n >= 10) & (n <= 5000), 1.0).otherwise(0.0)
    stop = stopword_ratio(text_col)
    stop_ok = F.when((stop >= 0.01) & (stop <= 0.7), 1.0).otherwise(0.0)
    mwl = mean_word_len(text_col)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    return F.round((len_ok + stop_ok + mwl_ok) / 3.0, 6)


def lang_id(text_col: str) -> Column:
    """Stopword-density language heuristic: 'en' when English function
    words exceed 2% of tokens, else 'unk'."""
    return F.when(stopword_ratio(text_col) > 0.02, F.lit("en")).otherwise(F.lit("unk"))


# Multi-language marker-word sets for the n-gram/function-word
# language-ID heuristic (the classic stopword-profile classifier:
# function words are the highest-frequency, most language-specific
# tokens, so raw marker hit-counts separate languages well at
# paragraph length). Deterministic and SQL-expressible — the DuckDB
# oracle reproduces the identical scores.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "zu", "den", "von"],
    "en": ["the", "a", "an", "of", "to", "in", "and", "is", "it",
           "that", "for", "on"],
    "es": ["el", "los", "las", "que", "y", "un", "una", "es", "por",
           "con", "del", "como"],
    "fr": ["le", "les", "et", "des", "est", "dans", "pour", "sur",
           "au", "ce", "qui", "pas"],
}


def language_scores(text_col: str) -> dict[str, Column]:
    """Per-language marker hit counts (occurrences, not distinct) over
    single-space tokenization (matches the oracle's string_split)."""
    tokens = F.split(F.lower(F.col(text_col)), " ")

    def member_of(words: list[str]):
        # single-arg lambda: a 2-arg lambda would receive the element
        # INDEX as its second argument from F.filter, not the closure
        return lambda t: t.isin(*words)

    return {
        lang: F.size(F.filter(tokens, member_of(words)))
        for lang, words in LANG_MARKERS.items()
    }


def language_id_multi(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, s_<lang>..., lang): argmax of the marker scores with a fixed
    priority order (dict order: de, en, es, fr) breaking ties, 'und'
    when no marker hits at all — deterministic in both engines."""
    scores = language_scores(text_col)
    langs = list(scores)
    out = df.select(
        F.col(id_col),
        *[scores[lang].cast("bigint").alias(f"s_{lang}") for lang in langs],
    )
    expr = None
    for i, lang in enumerate(langs):
        cond = F.col(f"s_{lang}") > 0
        for other in langs[i + 1 :]:
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        for prior in langs[:i]:
            cond = cond & (F.col(f"s_{lang}") > F.col(f"s_{prior}"))
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return out.withColumn("lang", expr.otherwise("und"))


def language_id_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """The identical classification in SQL for the DuckDB oracle —
    scores and CASE conditions generated from the SAME LANG_MARKERS
    and priority order (one source, no drift)."""
    langs = list(LANG_MARKERS)
    score_cols = ",\n       ".join(
        "len(list_filter(string_split(lower({t}), ' '), x -> x IN ({w}))) AS s_{l}".format(
            t=text_col,
            w=", ".join(f"'{w}'" for w in LANG_MARKERS[lang]),
            l=lang,
        )
        for lang in langs
    )
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        conds += [f"s_{lang} > s_{prior}" for prior in langs[:i]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
WITH s AS (
  SELECT {id_col},
       {score_cols}
  FROM {table})
SELECT {id_col}, {', '.join(f's_{l}' for l in langs)},
       CASE {' '.join(cases)} ELSE 'und' END AS lang
FROM s ORDER BY {id_col}
"""


def fingerprint(text_col: str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text (stable across engines)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        token_count(text_col).cast("bigint").alias("n_tokens"),
        regex_token_count(text_col).cast("bigint").alias("n_regex_tokens"),
        stopword_ratio(text_col).alias("stop_ratio"),
        mean_word_len(text_col).alias("mean_word_len"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a
    SORTED array = the count of the most frequent element. A pure
    expression fold in O(n) with O(1) state — no explode, no shuffle."""
    init = F.struct(
        F.lit(" __none__").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    step = lambda acc, w: F.struct(  # noqa: E731
        w.alias("prev"),
        F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition signals — the Gopher-style repetition
    filters that strip boilerplate/spam from a pretraining corpus:

    - ``top_token_ratio``: occurrences of the most frequent token over
      total tokens;
    - ``distinct_ratio``: distinct tokens over total tokens;
    - ``top_bigram_ratio``: occurrences of the most frequent word
      2-gram over total 2-grams (0.0 for docs with < 2 words).

    Scale posture: pure row-local Catalyst expressions — sort the
    token array once, then a single O(n) fold finds the max run (=
    max frequency). Zero shuffles, zero explodes: the corpus streams
    through a narrow projection, so the operator costs a scan at any
    scale. (The explode → groupBy(doc, token) alternative shuffles
    every corpus token; this form shuffles nothing.)
    """
    cols = _repetition_cols(text_col)
    return df.select(
        F.col(id_col),
        cols["top_token_ratio"].alias("top_token_ratio"),
        cols["distinct_ratio"].alias("distinct_ratio"),
        cols["top_bigram_ratio"].alias("top_bigram_ratio"),
    )


def _repetition_cols(text_col: str) -> dict[str, Column]:
    """The three repetition ratios as reusable row-local expressions
    (shared by repetition_profile and quality_filter so the gate and
    the cascade can never drift)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    nb = F.greatest(n - 1, F.lit(0))
    return {
        "top_token_ratio": F.round(
            _max_run(F.array_sort(words)) / F.greatest(n, F.lit(1)), 6
        ),
        "distinct_ratio": F.round(
            F.size(F.array_distinct(words)) / F.greatest(n, F.lit(1)), 6
        ),
        "top_bigram_ratio": F.round(
            F.when(nb > 0, _max_run(F.array_sort(bigrams)) / nb).otherwise(0.0), 6
        ),
    }


# C4/Gopher-style filter-cascade thresholds. One source of truth: the
# Spark cascade and the generated DuckDB oracle both read THESE values,
# so the two engines cannot drift on a threshold.
QUALITY_FILTER_DEFAULTS: dict[str, float] = {
    "min_tokens": 20,
    "max_tokens": 5000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "min_stopword_ratio": 0.015,
    "max_top_token_ratio": 0.25,
    "max_top_bigram_ratio": 0.18,
    "min_distinct_ratio": 0.3,
}

# fixed adjudication order: the FIRST failing rule names the reason,
# so downstream corpus accounting (why did we drop X% of domain D?) is
# stable under threshold tuning of later rules
QUALITY_FILTER_ORDER = [
    "too_short", "too_long", "word_len", "low_stopword",
    "repetitive_token", "repetitive_bigram", "low_diversity",
]


def quality_filter(
    df: DataFrame, id_col: str, text_col: str, **overrides: float
) -> DataFrame:
    """The pretraining keep/drop decision (C4 + Gopher rule cascade):
    ``(id, reason, keep)`` where ``reason`` is the first failing rule
    in QUALITY_FILTER_ORDER ('ok' when the document survives) and
    ``keep`` is 1/0. Composes the gate-proven signals — token count /
    mean word length / stopword ratio (t1 semantics, whitespace-regexp
    tokens) and the three repetition ratios (t6 semantics,
    single-space tokens) — into the decision a corpus build actually
    executes; everything upstream only *scores*.

    Scale posture: pure row-local Catalyst expressions, zero shuffles
    and zero explodes — the corpus streams through one narrow
    projection, so filtering costs a scan at any corpus size. All
    ratios round to 6 dp before comparison, so the classification is
    bit-identical across engines (the same convention the t1/t6 gates
    prove value-exact).
    """
    th = {**QUALITY_FILTER_DEFAULTS, **overrides}
    unknown = set(th) - set(QUALITY_FILTER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown quality_filter thresholds: {sorted(unknown)}")
    n = token_count(text_col)
    stop = stopword_ratio(text_col)
    mwl = mean_word_len(text_col)
    rep = _repetition_cols(text_col)
    reason = (
        F.when(n < th["min_tokens"], "too_short")
        .when(n > th["max_tokens"], "too_long")
        .when(
            (mwl < th["min_mean_word_len"]) | (mwl > th["max_mean_word_len"]),
            "word_len",
        )
        .when(stop < th["min_stopword_ratio"], "low_stopword")
        .when(rep["top_token_ratio"] > th["max_top_token_ratio"], "repetitive_token")
        .when(rep["top_bigram_ratio"] > th["max_top_bigram_ratio"], "repetitive_bigram")
        .when(rep["distinct_ratio"] < th["min_distinct_ratio"], "low_diversity")
        .otherwise("ok")
    )
    return df.select(F.col(id_col), reason.alias("reason")).withColumn(
        "keep", F.when(F.col("reason") == "ok", 1).otherwise(0).cast("bigint")
    )


def quality_filter_oracle_sql(
    table: str, id_col: str, text_col: str, **overrides: float
) -> str:
    """The identical cascade in DuckDB SQL, generated from the SAME
    QUALITY_FILTER_DEFAULTS and rule order (one source, no drift).
    Signal expressions are copied from the t1/t6 oracles, which the
    gates prove bit-equal to the Spark expressions."""
    th = {**QUALITY_FILTER_DEFAULTS, **overrides}
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return rf"""
WITH d AS (
  SELECT {id_col}, {text_col},
         regexp_split_to_array(trim({text_col}), '\s+') AS w
  FROM {table}),
m AS (
  SELECT {id_col},
         len(w) AS n,
         round(len(list_filter(w, x -> list_contains([{stops}], lower(x))))
               / greatest(len(w), 1), 6) AS stop,
         round(list_sum(list_transform(w, x -> length(x)))
               / greatest(len(w), 1), 6) AS mwl
  FROM d),
toks AS (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS tok FROM {table}),
tc AS (SELECT {id_col}, count(*) AS c FROM toks GROUP BY {id_col}, tok),
t AS (SELECT {id_col}, round(max(c)::DOUBLE / sum(c), 6) AS ttr,
             round(count(*)::DOUBLE / sum(c), 6) AS dr
      FROM tc GROUP BY {id_col}),
bg AS (SELECT {id_col}, array_to_string(w[i::BIGINT:(i+1)::BIGINT], ' ') AS big
       FROM (SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}) s,
            LATERAL (SELECT unnest(range(1, len(s.w))) AS i) r),
bc AS (SELECT {id_col}, count(*) AS c FROM bg GROUP BY {id_col}, big),
b AS (SELECT {id_col}, round(max(c)::DOUBLE / sum(c), 6) AS tbr FROM bc GROUP BY {id_col}),
j AS (SELECT m.{id_col}, n, stop, mwl, ttr, dr, coalesce(tbr, 0.0) AS tbr
      FROM m JOIN t USING ({id_col}) LEFT JOIN b USING ({id_col})),
r AS (SELECT {id_col},
  CASE WHEN n < {th['min_tokens']} THEN 'too_short'
       WHEN n > {th['max_tokens']} THEN 'too_long'
       WHEN mwl < {th['min_mean_word_len']} OR mwl > {th['max_mean_word_len']} THEN 'word_len'
       WHEN stop < {th['min_stopword_ratio']} THEN 'low_stopword'
       WHEN ttr > {th['max_top_token_ratio']} THEN 'repetitive_token'
       WHEN tbr > {th['max_top_bigram_ratio']} THEN 'repetitive_bigram'
       WHEN dr < {th['min_distinct_ratio']} THEN 'low_diversity'
       ELSE 'ok' END AS reason
  FROM j)
SELECT {id_col}, reason,
       CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM r ORDER BY {id_col}
"""


def stratified_cap(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep at most ``k`` rows
    per stratum, chosen by ascending ``md5(salt:id)`` — the standard
    head-domain cap in corpus mixing. The choice is a pure function of
    (salt, id): stable across runs, engines, cluster sizes and input
    order, and growing OTHER strata never changes which rows survive a
    given stratum (unlike ``sample``/``randomSplit``).

    Scale posture: one shuffle on the strata keys into a rank window.
    The sampling hash is uniform, so stratum size — not hash skew —
    bounds each task; a pathological hot stratum is the known window
    caveat (AQE skew handling, or pre-filter with a per-stratum hash
    threshold from a first aggregate pass, trades a second scan for
    bounded tasks).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= k)
        .drop("_cap_rn")
    )


def top_tokens(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Exact corpus-wide top-k token frequencies ``(token, cnt, rk)``
    — the vocabulary heavy-hitters report (tokenizer health checks,
    boilerplate detection).

    Scale posture: explode → hash aggregate with map-side partial
    combine → ONE shuffle keyed on token → global top-k via
    orderBy+limit (planned as TakeOrdered: each task ships only its
    local top-k to the driver). Head-token skew is absorbed by the
    partial aggregate — every task emits at most one row per distinct
    token, so the shuffle carries O(tasks × vocab), never O(corpus
    tokens). Ties on count break toward the lexicographically smaller
    token, so the ranking is deterministic. The rank window runs on
    the k surviving rows only, never on the full vocabulary.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cnt"), F.col("token"))
    return counts.withColumn("rk", F.row_number().over(w).cast("bigint"))


# rolling polynomial fingerprint over the word-hash stream (Rabin-Karp
# style): order-sensitive — unlike the md5-of-normalized-text
# fingerprint, two documents with the same words in different order get
# different fingerprints, and it streams in O(1) state per row.
ROLL_PRIME = 1_000_000_007
ROLL_BASE = 131


def rolling_fingerprint(text_col: str) -> Column:
    from pdf_parser_spark.operators.dedup import md5_long

    word_hashes = F.transform(
        words_col(text_col),
        lambda w: F.pmod(
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint"),
            F.lit(ROLL_PRIME),
        ),
    )
    return F.aggregate(
        word_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: F.pmod(acc * F.lit(ROLL_BASE) + h, F.lit(ROLL_PRIME)),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the reproducible-split
    primitive of a training-data pipeline. A document's split is a pure
    function of (salt, id): ``bucket = md5_long(salt:id) mod 10^6``
    compared against the cumulative fraction boundaries, so the
    assignment is stable across runs, engines, cluster sizes, and
    orderings (unlike ``randomSplit``, which depends on partitioning),
    and documents added later never move existing ones between splits.
    Fractions must sum to 1 (±1e-9); boundaries are exact integers of
    the 10^6 bucket space so an external oracle reproduces them.
    """
    from pdf_parser_spark.operators.dedup import md5_long

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError(f"every fraction must be > 0, got {fractions}")
    space = 1_000_000
    bucket = F.pmod(md5_long(F.col(id_col).cast("string"), salt), F.lit(space))
    # the LAST split absorbs the remainder of the bucket space: summing
    # rounded per-fraction boundaries can undershoot space (e.g. thirds
    # → 999,999), which would leave top-bucket docs with a NULL split —
    # silently in NO split at all
    names = list(fractions)
    expr = None
    acc = 0
    for name in names[:-1]:
        acc += round(fractions[name] * space)
        cond = bucket < F.lit(min(acc, space))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    classic perplexity-style quality filter (low-probability token
    sequences ⇒ boilerplate/garbled text): with add-one smoothing,

        score = avg over doc bigrams of  ln( (c(w1,w2)+1) / (c(w1)+V) )

    trained on the corpus itself (c = corpus counts, V = vocabulary
    size). Docs with fewer than 2 tokens get NULL (no bigrams).

    Cross-engine determinism: each bigram's log-probability is
    quantized to ``decimal(18,9)`` before the per-doc sum, so the
    average cannot drift with partial-aggregation order (a raw double
    sum would); a 1-ulp ``ln`` difference between engines moves the
    rounded score by ≤1e-9 per bigram — invisible at the 4-decimal
    output rounding.

    Scale posture: the exploded bigram stream is derived ONCE — its
    corpus count c(w1,w2) comes from a window count over the same
    partitioning rather than a groupBy + self-join (which would lazily
    re-derive the whole exploded stream: one extra corpus scan +
    explode, caught in the round-4 `.explain` audit). Unigram counts
    and vocabulary size are corpus-sublinear tables joined on their
    keys. No Python anywhere."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    bigrams_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    doc_bigrams = (
        df.filter(n >= 2)
        .select(F.col(id_col), F.explode(bigrams_arr).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )

    from pyspark.sql import Window

    unigrams = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = unigrams.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        doc_bigrams.withColumn(
            "c2", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
        )
        .join(unigrams.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(
            (F.sum("lp") / F.count(F.lit(1))).cast("double"), 4
        ).alias("lm_score"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def bigram_lm_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """The identical bigram LM scoring in DuckDB SQL: same single-space
    tokenization, same add-one smoothing, same decimal(18,9) per-bigram
    quantization before the per-doc average."""
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}),
doc_bg AS (
  SELECT {id_col}, w[i] AS w1, w[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
  WHERE len(w) >= 2),
uni AS (
  SELECT unnest(w) AS tok FROM toks),
c1 AS (SELECT tok AS w1, count(*) AS c1 FROM uni GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS v FROM uni),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM doc_bg GROUP BY 1, 2),
lp AS (
  SELECT {id_col},
         CAST(ln((c2 + 1) / CAST(c1 + v AS DOUBLE)) AS DECIMAL(18,9)) AS lp
  FROM doc_bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT {id_col},
       round(CAST(sum(lp) / count(*) AS DOUBLE), 4) AS lm_score,
       count(*) AS n_bigrams
FROM lp GROUP BY {id_col} ORDER BY {id_col}
"""


# PII redaction patterns, applied in ORDER (emails first so the later
# numeric patterns never fire inside an address; IPs before phones so a
# dotted quad is not half-consumed as a phone number). Kept to the
# regex subset with identical semantics in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, optional atoms —
# no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]\d{3,4}", "<PHONE>"),
]


def pii_mask(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails / IPv4s / phone-shaped numbers — the standard
    pretraining-corpus PII scrub. Pure Catalyst ``regexp_replace``
    chain: a narrow linear scan, no shuffle, no Python. Emits per-doc
    hit counts (counted BEFORE masking) so downstream can route
    high-PII documents to quarantine instead of just scrubbing them.

    Scale posture: zero-shuffle projection; at 100 TB this is scan-
    bound and pipelines with whatever scan feeds it. Patterns are
    RE2-safe (linear-time, no catastrophic backtracking) so a
    pathological document cannot stall an executor."""
    masked = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(masked, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        )
        masked = F.regexp_replace(masked, pat, repl)
    return df.select(F.col(id_col), *counts, masked.alias("masked_text"))


def pii_mask_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """The identical scrub in DuckDB SQL, generated from the SAME
    PII_PATTERNS list (one source, no drift). Counts use the pre-mask
    text at the same chain position, exactly as the operator does."""
    masked = text_col
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        count_cols.append(
            f"len(regexp_extract_all({masked}, '{pat}')) AS n_{name}"
        )
        masked = f"regexp_replace({masked}, '{pat}', '{repl}', 'g')"
    return f"""
SELECT {id_col},
       {', '.join(count_cols)},
       {masked} AS masked_text
FROM {table} ORDER BY {id_col}
"""


def shard_pack(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    budget: int,
    n_buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Deterministic token-budget shard packing (sequence-packing /
    shard-layout primitive): assign each document to a shard such that
    shards are filled in stable ``id`` order and every shard's START
    offset is a multiple of ``budget`` — i.e. ``shard = floor(
    exclusive-prefix-sum(weight) / budget)``. A shard's total weight
    can overshoot ``budget`` by at most one document (the standard
    contiguous-packing bound); assignment is a pure function of
    (salt, ids, weights): stable across runs, engines, and cluster
    sizes.

    Scale posture: a GLOBAL prefix sum would serialize on one task, so
    packing is bucketed — documents are hash-partitioned into
    ``n_buckets`` independent packing streams (shard ids are per
    bucket), and the prefix sum runs per bucket: one shuffle, tasks
    bounded by corpus/n_buckets. At 100 TB, n_buckets scales with the
    cluster and each bucket's shard sequence is written independently."""
    from pyspark.sql import Window

    from pdf_parser_spark.operators.dedup import md5_long

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    bucket = F.pmod(md5_long(F.col(id_col).cast("string"), salt), F.lit(n_buckets))
    win = Window.partitionBy("bucket").orderBy(id_col)
    out = df.select(
        F.col(id_col),
        bucket.cast("bigint").alias("bucket"),
        w.cast("bigint").alias("weight"),
    )
    prefix = F.coalesce(
        F.sum("weight").over(win.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return out.withColumn(
        "shard_id", F.floor(prefix / F.lit(budget)).cast("bigint")
    )


def shard_pack_oracle_sql(
    table: str,
    id_col: str,
    weight_sql: str,
    budget: int,
    n_buckets: int = 16,
    salt: str = "pack",
) -> str:
    """The identical packing in ANSI SQL for the DuckDB oracle.
    ``weight_sql`` is the weight expression over ``table``'s columns."""
    return f"""
WITH w AS (
  SELECT {id_col},
         CAST(concat('0x', substr(md5(concat('{salt}:', CAST({id_col} AS VARCHAR))), 1, 15))
              AS BIGINT) % {n_buckets} AS bucket,
         CAST({weight_sql} AS BIGINT) AS weight
  FROM {table}),
p AS (
  SELECT {id_col}, bucket, weight,
         coalesce(sum(weight) OVER (PARTITION BY bucket ORDER BY {id_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM w)
SELECT {id_col}, bucket, weight,
       CAST(floor(prefix / {budget}) AS BIGINT) AS shard_id
FROM p ORDER BY {id_col}
"""


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, A-ES): each row draws ``u = (md5_long(salt:id)+1)
    / 2^60 ∈ (0,1]`` and is ranked by ``ln(u)/w`` descending (the
    log-space form of ``u^(1/w)``); the top-k ranks are the sample.
    Inclusion probability is proportional to weight, and the draw is a
    pure function of (salt, id): reproducible across runs, engines and
    cluster sizes — change ``salt`` for a fresh sample. Rows with
    non-positive weight are excluded (they'd never be drawn).

    This is the quality-weighted corpus-mixing primitive (sample
    pretraining documents ∝ quality score) that ``sample()`` can't do
    reproducibly and :func:`stratified_cap` can't do proportionally.

    Scale posture: ``orderBy().limit(k)`` plans as TakeOrdered — each
    task ships only its local top-k to the driver; no global sort
    shuffle. One linear scan total."""
    from pdf_parser_spark.operators.dedup import md5_long

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (md5_long(F.col(id_col).cast("string"), salt) + 1) / F.lit(float(1 << 60))
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("_ws_key", key)
        .orderBy(F.col("_ws_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_ws_key")
    )


def weighted_sample_oracle_sql(
    table: str,
    id_col: str,
    weight_sql: str,
    k: int,
    salt: str = "ws",
    out_cols: str = "*",
) -> str:
    """The identical A-ES draw in ANSI SQL for the DuckDB oracle."""
    return f"""
SELECT {out_cols} FROM (
  SELECT *,
         ln((CAST(concat('0x', substr(md5(concat('{salt}:', CAST({id_col} AS VARCHAR))), 1, 15))
              AS BIGINT) + 1) / {float(1 << 60)!r}) / ({weight_sql}) AS _ws_key
  FROM {table} WHERE ({weight_sql}) > 0
  ORDER BY _ws_key DESC, {id_col} LIMIT {k})
ORDER BY {id_col}
"""


def hash_split_oracle_sql(table: str, id_col: str, fractions: dict[str, float],
                          salt: str = "split") -> str:
    """The identical assignment in ANSI SQL for the DuckDB oracle."""
    space = 1_000_000
    names = list(fractions)
    if len(names) == 1:
        return f"SELECT {id_col}, '{names[0]}' AS split FROM {table} ORDER BY {id_col}"
    cases = []
    acc = 0
    for name in names[:-1]:
        acc += round(fractions[name] * space)
        cases.append(f"WHEN bucket < {min(acc, space)} THEN '{name}'")
    cases.append(f"ELSE '{names[-1]}'")
    return f"""
WITH b AS (
  SELECT {id_col},
         CAST(concat('0x', substr(md5(concat('{salt}:', CAST({id_col} AS VARCHAR))), 1, 15))
              AS BIGINT) % {space} AS bucket
  FROM {table})
SELECT {id_col}, CASE {' '.join(cases)} END AS split
FROM b ORDER BY {id_col}
"""


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window chunking — the document → training-example step
    of an LLM data pipeline: whitespace-token windows of
    ``chunk_tokens`` starting every ``stride`` tokens (overlap =
    chunk_tokens − stride), stopping once a window reaches the
    document's end so no tail stub is emitted that a previous window
    already covers. A start s > 0 survives iff its PREDECESSOR window
    did not reach the end: s < n − chunk_tokens + stride.

    Pure Catalyst: split → sequence of starts → arithmetic filter →
    posexplode → slice/join. Row-local (the explode multiplies rows
    but never shuffles); chunk_idx = s / stride is dense by
    construction, so no window function is needed — at 10^12 docs the
    plan stays a narrow map. Docs with no tokens are dropped.
    """
    if stride <= 0 or chunk_tokens < stride:
        raise ValueError("need 0 < stride <= chunk_tokens")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), words.alias("_w"), F.size(words).alias("_n")
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)),
        lambda s: (s == 0) | (s < F.col("_n") - chunk_tokens + stride),
    )
    ex = base.select(id_col, "_w", F.explode(starts).alias("_s"))
    piece = F.slice(F.col("_w"), F.col("_s") + 1, chunk_tokens)
    return ex.select(
        id_col,
        (F.col("_s") / stride).cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def chunk_text_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> str:
    """The identical windowing in ANSI SQL for the DuckDB oracle."""
    return f"""
WITH w AS (
  SELECT {id_col}, string_split_regex(trim({text_col}), '\\s+') AS ws
  FROM {table} WHERE length(trim({text_col})) > 0),
st AS (
  SELECT {id_col}, ws,
         unnest(generate_series(0, len(ws) - 1, {stride})) AS s
  FROM w)
SELECT {id_col},
       CAST(s // {stride} AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(ws, s + 1, s + {chunk_tokens}), ' ') AS chunk,
       CAST(len(list_slice(ws, s + 1, s + {chunk_tokens})) AS BIGINT) AS n_tokens
FROM st
WHERE s = 0 OR s < len(ws) - {chunk_tokens} + {stride}
ORDER BY {id_col}, chunk_idx
"""
