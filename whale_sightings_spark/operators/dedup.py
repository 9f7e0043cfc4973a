"""Deduplication operators for training-data pipelines (net-new scale
surface, BASELINE.json north star).

Five families, each a pure DataFrame op over ``documents(doc_id, text,
lang, source, n_chars)`` / ``embeddings(vec_id, embedding, label)``:

- **exact**: fingerprint group-by, min-doc_id survivor. One shuffle on
  the fingerprint; survives any scale.
- **MinHash + LSH**: shingle -> 8-slot signature -> 4x2 banding ->
  bucket self-join for candidates -> exact Jaccard verify. The join is
  on band keys (tiny), never all-pairs.
- **SimHash**: 60-bit signature, 15-bit band blocking, Hamming verify.
- **n-gram Jaccard**: inverted shingle index self-join with a
  document-frequency cap (hot shingles dropped — the classic scale
  guard against quadratic bucket blowup).
- **embedding cosine**: see operators/similarity (hyperplane-LSH
  blocked near-dup).

Every operator is arithmetic-identical in Spark and DuckDB (see
functions/hashing) so the driver's oracle verifies them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whale_sightings_spark.functions.hashing import (
    band_keys,
    minhash_signature,
    simhash,
    simhash_band,
    hamming60,
    hash60,
)
from whale_sightings_spark.functions.text import (
    fingerprint_md5,
    tokens,
    word_shingles,
)

#: shingle width for MinHash / Jaccard
SHINGLE_N = 3
#: drop shingles appearing in more than this many docs (hot-key guard)
MAX_SHINGLE_DF = 100
#: Jaccard threshold for near-dup pairs
JACCARD_THRESHOLD = 0.4
#: Hamming threshold for SimHash near-dup
HAMMING_THRESHOLD = 20


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: survivor =
    min(doc_id) per group; returns survivors with group size."""
    return (
        docs.select(F.col("doc_id"), fingerprint_md5(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("survivor_id"), F.count("*").alias("group_size"))
    )


def _shingle_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) pairs, distinct, with hot shingles dropped."""
    pairs = (
        docs.select(
            "doc_id", F.explode(word_shingles(F.col("text"), SHINGLE_N)).alias("shingle")
        )
        .distinct()
    )
    df_counts = pairs.groupBy("shingle").agg(F.count("*").alias("df"))
    return pairs.join(
        df_counts.filter(F.col("df") <= MAX_SHINGLE_DF).select("shingle"), "shingle"
    )


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Near-dup candidate pairs by exact n-gram Jaccard >= threshold.

    Inverted-index self-join on shingles: |A ∩ B| per pair from the
    index, |A| / |B| from per-doc distinct counts. The df cap bounds
    per-shingle fan-out, keeping the join linear-ish at scale.
    """
    pairs = _shingle_docs(docs)
    sizes = pairs.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))

    a = pairs.alias("a")
    b = pairs.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """MinHash-LSH candidate pairs with exact-Jaccard verification.

    shingle -> signature -> band keys -> bucket self-join (distinct
    pairs) -> verify with true Jaccard from the shingle index. At scale
    only the banding join runs over the corpus; verification touches
    candidate pairs only.
    """
    sigs = (
        docs.select(
            "doc_id", word_shingles(F.col("text"), SHINGLE_N).alias("shingles")
        )
        .filter(F.size("shingles") > 0)
        .select("doc_id", F.explode(band_keys(minhash_signature(F.col("shingles")))).alias("band"))
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    pairs = _shingle_docs(docs)
    sizes = pairs.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    pa = pairs.select(F.col("doc_id").alias("doc_a"), F.col("shingle"))
    pb = pairs.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    inter = (
        cands.join(pa, "doc_a")
        .join(pb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) over whitespace tokens."""
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            simhash(F.transform(F.col("toks"), hash60)).alias("sh"),
        )
    )


def simhash_pairs(docs: DataFrame) -> DataFrame:
    """SimHash near-dup pairs: 15-bit band blocking + Hamming verify."""
    sigs = simhash_signatures(docs)
    banded = sigs.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(str(i)), simhash_band(F.col("sh"), i).cast("string"))
                for i in range(4)
            ])
        ).alias("band"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", hamming60(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", "hamming")
    )
