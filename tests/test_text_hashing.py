"""Unit tests: text functions and cross-engine hashing primitives —
every Spark expression must agree with its DuckDB SQL twin on the same
inputs (the property the oracle queries depend on)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from whale_sightings_spark.functions import text as TX
from whale_sightings_spark.functions.hashing import (
    hash60,
    hash60_sql,
    minhash_signature,
    minhash_signature_sql,
    simhash,
    simhash_sql,
    hamming60,
    hamming60_sql,
)

SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "der schnelle braune fuchs und der hund",
    "le renard et le chien les amis",
    "el zorro y los perros que juegan",
    "one two three",
    "x",
    "",
    "  spaced   out   tokens  ",
    "punct, heavy!! text??? here...",
]


def _spark_vals(spark, expr_fn, col="t"):
    df = spark.createDataFrame([(s,) for s in SAMPLES], f"{col} string")
    return [r["v"] for r in df.select(expr_fn(F.col(col)).alias("v")).collect()]


def _duck_vals(sql_expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE s (t VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?)", [(s,) for s in SAMPLES])
    return [r[0] for r in con.execute(f"SELECT {sql_expr} FROM s").fetchall()]


@pytest.mark.parametrize(
    "spark_fn,sql",
    [
        (TX.token_count, TX.token_count_sql("t")),
        (TX.regex_token_count, TX.regex_token_count_sql("t")),
        (TX.lang_id, TX.lang_id_sql("t")),
        (TX.quality_score, TX.quality_score_sql("t")),
        (TX.normalize_text, TX.normalize_text_sql("t")),
        (TX.fingerprint_md5, TX.fingerprint_md5_sql("t")),
        (hash60, hash60_sql("t")),
    ],
    ids=["token_count", "regex_tokens", "lang_id", "quality", "normalize", "fp_md5", "hash60"],
)
def test_spark_matches_duckdb(spark, spark_fn, sql):
    s_vals = _spark_vals(spark, spark_fn)
    d_vals = _duck_vals(sql)
    norm = lambda v: round(v, 9) if isinstance(v, float) else v
    assert [norm(v) for v in s_vals] == [norm(v) for v in d_vals]


def test_word_shingles_cross_engine(spark):
    n = 3
    s_vals = _spark_vals(spark, lambda c: TX.word_shingles(c, n))
    d_vals = _duck_vals(TX.word_shingles_sql("t", n))
    assert [list(v) for v in s_vals] == [list(v) for v in d_vals]


def test_minhash_signature_cross_engine(spark):
    fn = lambda c: minhash_signature(TX.word_shingles(c, 3))
    s_vals = _spark_vals(spark, fn)
    sig_sql = minhash_signature_sql(TX.word_shingles_sql("t", 3))
    d_vals = _duck_vals("[" + ", ".join(sig_sql) + "]")
    # empty-shingle docs produce null slots in Spark / None in DuckDB
    assert [list(v) if v else v for v in s_vals] == [
        [x for x in v] if v else v for v in d_vals
    ]


def test_simhash_cross_engine(spark):
    fn = lambda c: simhash(F.transform(TX.tokens(c), hash60))
    s_vals = _spark_vals(spark, fn)
    th = f"list_transform({TX.tokens_sql('t')}, x -> {hash60_sql('x')})"
    d_vals = _duck_vals(simhash_sql(th))
    assert s_vals == d_vals


def test_hamming_cross_engine(spark):
    pairs = [(0b1010, 0b0110), (0, 0), ((1 << 60) - 1, 0), (12345678901234, 98765432109876)]
    df = spark.createDataFrame(pairs, "a long, b long")
    s = [r["h"] for r in df.select(hamming60(F.col("a"), F.col("b")).alias("h")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    d = [r[0] for r in con.execute(f"SELECT {hamming60_sql('a','b')} FROM p").fetchall()]
    assert s == d
    assert s == [bin(a ^ b).count("1") for a, b in pairs]


def test_lang_profiles_hit_real_stopwords(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of it",), ("der hund und die katze ist",)],
        "t string",
    )
    got = [r["l"] for r in df.select(TX.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de"]


def test_q133_utm_filter_underscore_is_literal(spark):
    """Regression pin for the r04 ADVICE divergence class: the oracle
    once used ``LIKE 'utm_%'`` whose ``_`` is a single-char WILDCARD —
    a param named ``utmXfoo`` (any char where the underscore sits)
    would be dropped by DuckDB but kept by Spark's startswith. Both
    engines must now treat the underscore literally: keep ``utmXfoo=1``,
    drop real ``utm_*`` params, in identical sorted order."""
    import duckdb

    query = "utmXfoo=1&utm_source=x&ref=abc&utm_campaign=y&utmz=2"
    # the exact filter fragment the q133 oracle uses
    got_duck = duckdb.sql(
        "SELECT array_to_string(list_sort(list_filter("
        f"string_split('{query}', '&'), "
        "x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS q"
    ).fetchone()[0]
    # the exact filter expression the q133 Spark plan uses
    got_spark = (
        spark.range(1)
        .select(
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split(F.lit(query), "&"),
                        lambda x: (x != "") & ~x.startswith("utm_"),
                    )
                ),
                "&",
            ).alias("q")
        )
        .collect()[0][0]
    )
    assert got_duck == got_spark == "ref=abc&utmXfoo=1&utmz=2"


def test_bloom_prescreen_has_no_false_negatives(spark, sf_dir):
    """Bloom contract: the prescreen only OVER-approximates — every
    exact dictionary hit is a Bloom candidate. Per source that means
    candidates - false_positives == exact_hits exactly."""
    from whale_sightings_spark.plans.queries import queries

    rows = queries()["q184_bloom_prescreen"](spark, sf_dir).collect()
    assert rows, "audit must cover at least one source"
    for r in rows:
        assert r.n_bloom_candidates - r.n_false_pos == r.n_exact_hits, r
        assert r.n_bloom_candidates <= r.n_grams_probed, r


def test_prefix_jaccard_join_equals_bruteforce(spark, sf_dir):
    """Prefix-filter theorem contract: q191's output equals the
    all-pairs exact Jaccard join — no false negatives (the guarantee
    the df-capped LSH family trades away) and no false positives
    (the verify stage is exact)."""
    from whale_sightings_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )
    from whale_sightings_spark.plans.queries import queries
    from whale_sightings_spark.schemas import load_table

    got = sorted(
        tuple(r)
        for r in queries()["q191_prefix_jaccard_join"](spark, sf_dir).collect()
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("t"), 3)).alias("shingle"),
        )
        .distinct()
    )
    rows = sh.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    ids = sorted(by_doc)
    want = []
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(by_doc[da] & by_doc[db])
            union = len(by_doc[da] | by_doc[db])
            if union and inter * 5 >= 2 * (union):
                want.append((da, db, round(inter / union, 6)))
    assert got == sorted(want)
    assert len(got) > 0, "threshold must catch at least one pair"


def test_ppjoin_positional_filter_is_pure_refinement(spark, sf_dir):
    """Round-10 positional filter (PPJoin): it must strictly shrink
    the verify-join input, and every candidate it drops must FAIL the
    Jaccard threshold on exact verification — zero false negatives
    (the end-to-end guarantee is also covered by
    test_prefix_jaccard_join_equals_bruteforce, which brute-forces
    q191's full output)."""
    from whale_sightings_spark.plans.queries_textops import (
        _PPJ_DEN,
        _PPJ_NUM,
        _ppjoin_candidates,
    )

    with_f, sh, sz = _ppjoin_candidates(spark, sf_dir, positional=True)
    without, _, _ = _ppjoin_candidates(spark, sf_dir, positional=False)
    n_with, n_without = with_f.count(), without.count()
    assert n_with < n_without, (n_with, n_without)
    dropped = without.join(with_f, ["doc_a", "doc_b"], "left_anti")
    inter = (
        dropped.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    za = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    offenders = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .filter(
            F.col("n_common") * _PPJ_DEN
            >= _PPJ_NUM * (F.col("na") + F.col("nb") - F.col("n_common"))
        )
        .count()
    )
    assert offenders == 0, f"{offenders} dropped candidates pass the threshold"
