"""X1/X2 — exact & near deduplication over ``documents`` (SURVEY.md §2.10).

The dedup ladder, cheapest→strongest, as used by pretraining-corpus
pipelines:

1. exact: hash-groupBy on content (or md5(content) — 16-byte shuffle keys
   instead of full text: the 100 TB form);
2. n-gram Jaccard: shingle → inverted index → posting-list pair
   expansion → set overlap (exact, but only touches pairs that share
   ≥1 shingle — never a cross or self join);
3. MinHash LSH (pyspark.ml): sketch + banded bucket join, sub-quadratic
   candidate generation;
4. SimHash: 64-bit signature whose Hamming distance tracks cosine/Jaccard
   similarity — signatures are groupable/bucketable.

2 is fully oracle-checked; 3-4 are rows-only (hash functions are
engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import fan_out
from ..sources.testdata import load_table


@query(
    "x1_exact_dedup",
    oracle="""
    SELECT text, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as hash-groupBy, keeping the lowest doc_id per content
    (deterministic, unlike dropDuplicates' arbitrary row)."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.groupBy("text").agg(
        F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


@query(
    "x1_exact_dedup_hash",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def x1_exact_dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dedup keyed on md5(text): at 100 TB you shuffle 16-byte digests,
    not documents — the shuffle payload drops by ~1000×."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingle_arrays(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, grams) — the distinct word n-grams of each document as one
    array column: a narrow projection, no shuffle. Per-doc shingle counts
    are ``size(grams)`` straight off this — never an explode + groupBy.

    Gram construction uses ``pyspark.ml.feature.NGram`` (JVM-side Scala),
    which benches ~6× faster than the equivalent Catalyst higher-order
    ``transform(sequence(...), concat_ws(...))`` — HOF lambdas run
    interpreted, outside whole-stage codegen, and this expression sits on
    the hottest path of the dedup ladder."""
    from pyspark.ml.feature import NGram

    words = (
        df.select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= n)
    )
    grams = NGram(n=n, inputCol="words", outputCol="raw_grams").transform(words)
    return grams.select("doc_id", F.array_distinct("raw_grams").alias("grams"))


def shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document, exploded.

    ``array_distinct`` dedups *within* the document before the explode, so
    the output is already distinct per (doc_id, shingle) — no post-explode
    ``distinct()`` (that would be a full extra shuffle of the exploded
    table, the largest intermediate in the dedup path)."""
    return shingle_arrays(df, n).select(
        "doc_id", F.explode("grams").alias("shingle")
    )


@query(
    "x2_ngram_jaccard",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), sh AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM w, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
    ), counts AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, inter,
           ROUND(inter / (ca.n + cb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE inter / (ca.n + cb.n - inter) >= 0.05
    """,
)
def x2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted index: only
    documents sharing a shingle ever meet (pairs come straight off each
    posting list), so cost tracks true overlap, not |docs|²."""
    doc = fan_out(load_table(spark, sf_dir, "documents"))
    # One narrow pass computes each doc's distinct grams AND its denominator
    # (size of the gram array); n rides along into the posting lists, so the
    # whole query is exactly two shuffles (index build, pair count) and the
    # expensive gram expression is evaluated once — no count joins, no
    # self-join.
    sh = shingle_arrays(doc, 3).select(
        "doc_id",
        F.size("grams").alias("n"),
        F.explode("grams").alias("shingle"),
    )
    # Shuffle on a 64-bit fingerprint of the shingle, not the string: the
    # shuffle key is a fixed 8 bytes instead of ~25 (3 words + separators),
    # and hash/compare in the aggregation map is word-sized. A collision
    # merges two posting lists (could overcount one intersection); with D
    # distinct shingles the probability any collision exists is ~D²/2⁶⁵ —
    # at 10⁹ shingles (100 TB scale) ~3·10⁻²; use 128-bit (two xxhash64
    # seeds) where that matters.
    sh = sh.select("doc_id", "n", F.xxhash64("shingle").alias("shingle"))
    # Inverted index: shingles in a single document (the vast majority)
    # produce zero pairs by construction. ds is sorted, so doc_a < doc_b.
    postings = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") >= 2)
        # split the sorted posting list into two primitive arrays: pair
        # generation below is index-based O(1) element_at, no struct-array
        # slicing/copying
        .select(F.expr("ds.doc_id").alias("ids"), F.expr("ds.n").alias("ns"))
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(sequence(1, size(ids) - 1), i ->"
            " transform(sequence(i + 1, size(ids)), j ->"
            " struct(element_at(ids, i) AS doc_a, element_at(ns, i) AS n_a,"
            "        element_at(ids, j) AS doc_b, element_at(ns, j) AS n_b))))"
        )
    ).alias("p")
    pairs = (
        postings.select(pair)
        .groupBy(  # n_a/n_b are functionally dependent on doc_a/doc_b
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("p.n_a").alias("n_a"),
            F.col("p.n_b").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.filter(jac >= 0.05)
        .select("doc_a", "doc_b", "inter", F.round(jac, 6).alias("jaccard"))
    )


@query("x2_minhash_lsh")
def x2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH candidate pairs (pyspark.ml): shingle → sparse vector →
    minhash sketch → banded bucket join. Sub-quadratic: candidates are
    generated by the bucket join, the exact Jaccard distance is only
    computed per candidate. Rows-only (hash family is engine-specific)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    doc = fan_out(load_table(spark, sf_dir, "documents"))
    # grams arrive already as per-doc arrays — no explode + re-collect
    sh = shingle_arrays(doc, 3).withColumnRenamed("grams", "sh")
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sh)
    # MinHashLSH requires at least one non-zero entry
    feats = feats.filter(F.size("sh") > 0)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=42
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, threshold=0.9, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query("x2_simhash")
def x2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures: per-token xxhash64 (JVM-side), bitwise
    votes, sign → signature. Near-dups have small Hamming distance; the
    signature is a 8-byte groupable key. Rows-only (hash engine-specific).

    Plan shape: explode(tokens) × explode(64 bits) → two partial-agg
    shuffles keyed by doc — no Python, no cross join."""
    doc = load_table(spark, sf_dir, "documents")
    tok = doc.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    votes = (
        tok.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"))
        .groupBy("doc_id", "bit")
        .agg(F.sum(F.expr("(shiftright(h, bit) & 1) * 2 - 1")).alias("vote"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.expr("CASE WHEN vote > 0 THEN shiftleft(1L, bit) ELSE 0L END")
        ).alias("simhash")
    )
