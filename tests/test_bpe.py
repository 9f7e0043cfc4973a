"""Corpus-trained BPE: merge semantics + the compression guarantee.

The oracle suite (q176/q177) pins cross-engine equality; these tests
pin the PROPERTIES: the greedy left-to-right non-overlap rule on
crafted runs, and monotonically improving corpus compression over
merge rounds (each applied merge with a positive pair count must
strictly reduce total token count, i.e. bytes-per-token rises)."""

from __future__ import annotations

from pyspark.sql import functions as F

from whale_sightings_spark.operators import bpe as BPE
from whale_sightings_spark.schemas import load_table


def _toks(spark, word, a, b):
    wd = spark.createDataFrame([(word, 1)], "word string, wcount long")
    out = BPE._apply_merge(BPE._char_rows(wd), a, b)
    return [r["sym"] for r in out.orderBy("pos").collect()]


def test_apply_merge_greedy_nonoverlap(spark):
    # same-symbol runs: merge even offsets within each run
    assert _toks(spark, "aaa", "a", "a") == ["aa", "a"]
    assert _toks(spark, "aaaa", "a", "a") == ["aa", "aa"]
    assert _toks(spark, "aab", "a", "a") == ["aa", "b"]
    # distinct pairs: candidates can't overlap — merge all
    assert _toks(spark, "abab", "a", "b") == ["ab", "ab"]
    assert _toks(spark, "xaby", "a", "b") == ["x", "ab", "y"]
    # no occurrence: identity
    assert _toks(spark, "xyz", "a", "b") == ["x", "y", "z"]


def test_bpe_corpus_compression_is_monotone(spark, sf_dir):
    """Total corpus token count strictly decreases every round the
    argmax pair has a positive count, so bytes-per-token strictly
    increases — the 'training buys compression' property q158/q177
    measure."""
    docs = load_table(spark, sf_dir, "documents")
    merges, _final = BPE.bpe_train(docs, BPE.BPE_ROUNDS)
    assert len(merges) == BPE.BPE_ROUNDS
    assert all(m[4] > 0 for m in merges)

    syms = BPE._char_rows(BPE.word_dict(docs)).localCheckpoint()

    def corpus_tokens(s):
        return s.agg(F.sum("wcount")).collect()[0][0]

    totals = [corpus_tokens(syms)]
    for _r, a, b, _m, _c in merges:
        syms = BPE._apply_merge(syms, a, b).localCheckpoint()
        totals.append(corpus_tokens(syms))
    assert all(t1 > t2 for t1, t2 in zip(totals, totals[1:])), totals
    # the trained table's own pair counts are non-increasing? not
    # guaranteed in general BPE, but the argmax each round bounds the
    # next round's count for the SAME pair space; just pin positivity
    # and the end-to-end compression win
    assert totals[-1] < totals[0]


def test_bpe_sql_twin_survives_pair_exhaustion(spark):
    """ADVICE r6: when the pair supply exhausts before BPE_ROUNDS,
    Spark `bpe_train` breaks and keeps the last symbol frame; the SQL
    twin must NOT collapse to empty (an empty m{r} used to CROSS JOIN
    every later CTE to zero rows). Pin engine equality of both the
    merge table and the final symbol frame on a corpus that trains out
    after 2 merges."""
    import duckdb

    texts = ["ab ab", "ab", "c c c"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, syms = BPE.bpe_train(docs, BPE.BPE_ROUNDS)
    # 'ab' -> one merge; 'c' is a single char (no pair). Exhausts early.
    assert 0 < len(merges) < BPE.BPE_ROUNDS
    s_final = sorted(
        (r["word"], r["pos"], r["sym"])
        for r in syms.select("word", "pos", "sym").collect()
    )
    s_merges = [(m[0], m[1], m[2], m[3], m[4]) for m in merges]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT unnest(?) AS text", [texts])
    d_final = sorted(
        con.execute(
            f"WITH {BPE.bpe_ctes(BPE.BPE_ROUNDS)} "
            f"SELECT word, pos, sym FROM s{BPE.BPE_ROUNDS}"
        ).fetchall()
    )
    d_merges = sorted(con.execute(BPE.bpe_merge_table_sql()).fetchall())
    assert d_final == s_final
    assert d_merges == sorted(s_merges)
