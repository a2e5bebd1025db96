"""Distributed BPE tokenizer training — the merge-table learner.

Byte-pair encoding (Sennrich et al. 2016) is the tokenizer behind most
LLM vocabularies; training it over the pre-training corpus itself is a
standard pipeline step.  The classic trainer shape (fastBPE, the
HuggingFace trainer) has exactly one corpus-scale pass — collect word
types with frequencies — after which every merge round runs over the
word-TYPE dim weighted by those counts, never over the corpus again.
That shape maps onto Spark directly and survives 100 TB: the word dim
is bounded by vocabulary (~10^8 types at web scale, KiB rows), each
round is one uniform-hash-key aggregation over it (map-side partials
absorb Zipf-hot pairs — a hot pair adds rows to partials, never keys),
and the argmax is a ``TakeOrderedAndProject`` map-side heap, never a
global sort.

The merge loop is inherently sequential (round k+1's counts depend on
round k's merge), so the per-round winner — one row — is the only
thing the driver ever materializes.  Real trainers run ~30k rounds by
batching compatible merges; this implementation keeps the textbook
one-merge-per-round rule so the result is the canonical BPE merge
table, and bounds lineage with a per-round ``localCheckpoint`` of the
vocab-sized dim.

Cross-engine determinism discipline (the repo-wide contract-query
rule): token sequences are carried as sentinel-wrapped strings,
``fast -> '|f||a||s||t|'`` — every token wrapped in its own pipes, so
the pair (a, b) occurs in a word exactly where the substring
``'|a||b|'`` does, and one literal ``replace()`` (identical
left-to-right non-overlapping semantics in Spark and DuckDB, matching
BPE's greedy left-to-right merge convention: ``a a a`` + merge (a,a)
-> ``(aa, a)``) applies a merge to every word type in a single
codegen'd projection.  Counts are exact integer sums and the argmax
tie-break is (count DESC, pair-string ASC) on ASCII, so the full merge
table reproduces bit-for-bit in any engine.

Reference analog: none — engine extension (SURVEY §2.10 E66); the
reference never tokenizes page text (pkg/linkstorage stores raw
bodies' hashes only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (LongType, IntegerType, StringType,
                               StructField, StructType)

MERGES_SCHEMA = StructType([
    StructField("merge_round", IntegerType(), False),
    StructField("lft", StringType(), False),
    StructField("rgt", StringType(), False),
    StructField("pair_count", LongType(), False),
])

# Tokens are wrapped '|tok|' and concatenated, so adjacency reads
# '|a||b|'; '|' can therefore never appear INSIDE a token, and words
# carrying it are dropped at ingest (a no-op on real text that the
# filter makes an invariant rather than an assumption).
_SENTINEL = "|"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus-scale pass: whitespace word types with exact
    counts — ``(word, n)``.  Everything after runs on this dim."""
    return (df.select(F.explode(F.split(F.col(text_col), " "))
                      .alias("word"))
            .filter((F.col("word") != "")
                    & ~F.col("word").contains(_SENTINEL))
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("n")))


def _pairs_col():
    """Adjacent-pair array over the wrapped column ``s`` — pure JVM
    (``transform`` over an index ``sequence``); empty for one-token
    words (``sequence(1, 0)`` would count DOWN, hence the guard)."""
    toks = F.split(F.btrim(F.col("s"), F.lit(_SENTINEL)), r"\|\|")
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit("||"),
                               F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))


def bpe_merges(words: DataFrame, rounds: int = 6) -> DataFrame:
    """Learn ``rounds`` BPE merges from a ``(word, n)`` frequency dim
    (from :func:`word_counts`); returns the merge table
    ``(merge_round, lft, rgt, pair_count)`` in learned order.

    Physical shape per round: vocab-dim scan -> adjacent-pair explode
    -> hash agg on uniform pair keys -> 1-row TakeOrdered argmax ->
    literal ``replace`` projection folding the winner back in.  Stops
    early (with fewer rows) if the corpus runs out of adjacent pairs.
    """
    spark = words.sparkSession
    # chars -> '|c|' each: 'fast' -> '|f||a||s||t|'
    dim = (words.select(
        F.regexp_replace(F.col("word"), "(.)", "|$1|").alias("s"),
        F.col("n"))
        .localCheckpoint(eager=True))

    out: list[tuple[int, str, str, int]] = []
    for k in range(1, rounds + 1):
        winner = (dim.select(F.explode(_pairs_col()).alias("pr"),
                             F.col("n"))
                  .groupBy("pr")
                  .agg(F.sum("n").cast("long").alias("pn"))
                  .orderBy(F.col("pn").desc(), F.col("pr").asc())
                  .limit(1).collect())
        if not winner:
            break
        pr, pn = winner[0]["pr"], winner[0]["pn"]
        lft, rgt = pr.split("||")
        out.append((k, lft, rgt, pn))
        dim = (dim.select(
            F.replace(F.col("s"),
                      F.lit(f"|{lft}||{rgt}|"),
                      F.lit(f"|{lft}{rgt}|")).alias("s"),
            F.col("n"))
            .localCheckpoint(eager=True))
    return spark.createDataFrame(out, MERGES_SCHEMA)


def bpe_encode(df: DataFrame, merges: DataFrame,
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a learned merge table to a corpus: adds ``out_col`` with
    each document's BPE token array, word boundaries respected.

    The merge table is tiny (at most vocabulary-sized) and ordered, so
    it collects to the driver once and the whole encode is ONE
    codegen'd projection per document — ``transform`` over the words,
    the merge list folded into a chain of literal ``replace`` calls on
    the wrapped form (merges applied in learned order — BPE's encode
    rule).  No shuffle, no Python: encoding 100 TB costs one pass.
    """
    ordered = [(r["lft"], r["rgt"])
               for r in merges.orderBy("merge_round").collect()]

    def encode_word(w):  # Column -> Column, all JVM expressions
        s = F.regexp_replace(w, "(.)", "|$1|")
        for lft, rgt in ordered:
            s = F.replace(s, F.lit(f"|{lft}||{rgt}|"),
                          F.lit(f"|{lft}{rgt}|"))
        return F.split(F.btrim(s, F.lit(_SENTINEL)), r"\|\|")

    words = F.split(F.col(text_col), " ")
    enc = F.flatten(F.transform(
        F.filter(words, lambda w: (w != "") & ~w.contains(_SENTINEL)),
        encode_word))
    return df.withColumn(out_col, enc)
