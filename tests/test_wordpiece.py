"""WordPiece family invariants (operators/wordpiece.py): the greedy
fold must exactly cover each word, never emit UNK on its own training
corpus, and prefer the longest in-vocab piece at each position."""

from __future__ import annotations

from pyspark.sql import functions as F

from whale_sightings_spark.operators import wordpiece as WP
from whale_sightings_spark.schemas import load_table


def _seg(spark, docs):
    wd = WP._words(docs)
    return WP.wp_word_stats(wd, WP.wp_vocab(wd))


def test_greedy_covers_words_without_unk(spark, sf_dir):
    """Training-corpus segmentation: piece count is within
    [ceil(len/WP_MAXP), len], and UNK is impossible because every
    single character (both positional forms) is in the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    st = _seg(spark, docs).select(
        "word", F.length("word").alias("L"), "n_pieces", "n_unk"
    )
    bad = st.filter(
        (F.col("n_unk") != 0)
        | (F.col("n_pieces") > F.col("L"))
        | (F.col("n_pieces") * WP.WP_MAXP < F.col("L"))
        | (F.col("n_pieces") <= 0)
    )
    assert bad.count() == 0


def test_greedy_prefers_longest_match(spark):
    """Constructed vocab: word 'abcd' with vocab {abcd-initial and all
    singles} must segment as ONE piece; removing the 4-gram but
    keeping 'abc' yields 2 ('abc' + '##d'); singles only -> 4."""
    wd = spark.createDataFrame([("abcd", 1)], "word string, wcount long")

    def n_pieces(pieces):
        vocab = spark.createDataFrame(
            [(p, 1, 1 if p.startswith("##") else 0) for p in pieces],
            "piece string, cnt long, is_cont int",
        )
        return WP.wp_word_stats(wd, vocab).collect()[0]["n_pieces"]

    singles = ["a", "b", "c", "d", "##a", "##b", "##c", "##d"]
    assert n_pieces(singles + ["abcd"]) == 1
    assert n_pieces(singles + ["abc"]) == 2
    assert n_pieces(singles) == 4


def test_unknown_character_counts_as_unk(spark):
    """A word containing a character absent from the vocabulary
    consumes it one char at a time and reports it as UNK."""
    wd = spark.createDataFrame([("axb", 1)], "word string, wcount long")
    vocab = spark.createDataFrame(
        [("a", 1, 0), ("##b", 1, 1)],
        "piece string, cnt long, is_cont int",
    )
    row = WP.wp_word_stats(wd, vocab).collect()[0]
    assert row["n_pieces"] == 3 and row["n_unk"] == 1
