"""Tokenizer induction: BPE merge-candidate counting and a bounded
iterative trainer — the tokenizer-training leg of an LLM data
pipeline (Sennrich, Haddow & Birch 2016, arXiv:1508.07909: byte-pair
encoding learns subword units by repeatedly merging the most frequent
adjacent symbol pair over a word-frequency table).

Spark shape (the part that matters at 100 TB): the CORPUS-linear work
is one tokenize + one ``groupBy word`` — after that the working set
is the DISTINCT-WORD table (vocabulary-bounded, square-root-ish of
the corpus and independent of document count), so every BPE iteration
runs over the vocabulary, never the corpus. Pair counting explodes
each distinct word's adjacent symbol pairs weighted by word
frequency; the top-K pick is a TakeOrderedAndProject (total order:
count DESC, pair ASC), never a global window.

The registered query surfaces the FIRST iteration's top-20 merge
candidates (fully SQL-expressible — the DuckDB oracle recomputes them
from the same corpus); the k-step trainer is exercised against a
literal sequential BPE implementation in tests/test_tokenizer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aruna_spark.catalog import load_table
from aruna_spark.ops.text import ws_tokens
from aruna_spark.queries import register

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the ONLY
    corpus-linear pass; everything downstream is vocabulary-sized."""
    return (
        docs.select(
            F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_symbols(word: F.Column) -> F.Column:
    """Initial symbol sequence: single characters + the terminal
    end-of-word marker."""
    n = F.length(word)
    chars = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def pair_counts(words: DataFrame, symbols: F.Column | None = None) -> DataFrame:
    """Adjacent-pair counts over the (word, freq) table. ``symbols``
    defaults to the character-level split; the trainer passes the
    current merged symbol arrays instead."""
    syms = symbols if symbols is not None else _char_symbols(F.col("word"))
    staged = words.select("freq", syms.alias("syms"))
    n = F.size(F.col("syms"))
    # guard: a fully-merged word is ONE symbol and sequence(1, 0)
    # would DESCEND under Spark's default step
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("syms"), i.cast("int")),
                F.element_at(F.col("syms"), (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


_BPE_ORACLE = """
    WITH words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(w)
      WHERE w != ''
      GROUP BY 1
    ),
    pairs AS (
      SELECT substring(word, i, 1) || ' ' || substring(word, i + 1, 1)
               AS pair, freq
      FROM words, UNNEST(range(1, length(word))) AS r(i)
      UNION ALL
      SELECT substring(word, length(word), 1) || ' </w>', freq
      FROM words
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1
    ORDER BY pair_count DESC, pair
    LIMIT 20
"""


@register("corpus_bpe_merge_candidates", oracle=_BPE_ORACLE)
def corpus_bpe_merge_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 first-iteration BPE merge candidates over the corpus:
    character pairs (with the ``</w>`` terminal) weighted by word
    frequency, total-ordered by (count DESC, pair ASC)."""
    words = word_counts(load_table(spark, sf_dir, "documents"))
    return (
        pair_counts(words)
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(20)
    )


def apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """One BPE merge over a symbol array, left-to-right greedy — the
    aggregate fold carries (output array, skip-next flag), merging
    each non-overlapping (left, right) occurrence into one symbol."""
    merged = F.lit(left + right)
    folded = F.aggregate(
        F.zip_with(
            syms,
            F.concat(F.slice(syms, 2, 1_000_000), F.array(F.lit(None))),
            lambda a, b: F.struct(a.alias("cur"), b.alias("nxt")),
        ),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, x: F.struct(
            F.when(acc["skip"], acc["out"])
            .when(
                (x["cur"] == left) & (x["nxt"] == right),
                F.concat(acc["out"], F.array(merged)),
            )
            .otherwise(F.concat(acc["out"], F.array(x["cur"])))
            .alias("out"),
            (
                ~acc["skip"]
                & (x["cur"] == left)
                & (x["nxt"] == right)
            ).alias("skip"),
        ),
    )
    return folded["out"]


def train_bpe_merges(
    words: DataFrame, n_merges: int
) -> list[tuple[str, str, int]]:
    """The k-step BPE trainer: each iteration counts pairs over the
    CURRENT symbol table (vocabulary-sized) and applies the most
    frequent merge (count DESC, pair ASC tie order). The driver loop
    is k iterations over a vocab-bounded frame — the corpus is
    scanned exactly once, by :func:`word_counts`."""
    current = words.select(
        "freq", _char_symbols(F.col("word")).alias("syms")
    )
    current.cache()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = pair_counts(current, F.col("syms"))
        # one-row argmax collect per iteration — bounded by k
        row = (
            top.orderBy(F.col("pair_count").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not row or row[0]["pair_count"] < 2:
            break
        left, right = row[0]["pair"].split(" ", 1)
        merges.append((left, right, row[0]["pair_count"]))
        nxt = current.select(
            "freq", apply_merge(F.col("syms"), left, right).alias("syms")
        )
        nxt.cache()
        current.unpersist()
        current = nxt
    current.unpersist()
    return merges
