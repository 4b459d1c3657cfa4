"""BPE induction: the Spark trainer vs a literal sequential BPE
(Sennrich et al. 2016 learn_bpe), plus the greedy non-overlapping
merge fold's edge cases."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from aruna_spark.queries.tokenizer import (
    END_OF_WORD,
    apply_merge,
    train_bpe_merges,
    word_counts,
)


def literal_bpe(freqs: dict[str, int], n_merges: int):
    """The classic sequential trainer, rung-for-rung: count adjacent
    pairs over the symbolized vocabulary, merge the argmax (count
    DESC, pair ASC), repeat; stop below count 2."""
    vocab = {
        word: [*word, END_OF_WORD] for word in freqs
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[word]
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if count < 2:
            break
        merges.append((left, right, count))
        for word, syms in vocab.items():
            out, skip = [], False
            for cur, nxt in zip(syms, [*syms[1:], None]):
                if skip:
                    skip = False
                    continue
                if cur == left and nxt == right:
                    out.append(left + right)
                    skip = True
                else:
                    out.append(cur)
            vocab[word] = out
    return merges


WORDS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3,
    "aaaa": 4, "banana": 2, "bandana": 1,
}


def test_trainer_matches_literal_bpe(spark):
    words = spark.createDataFrame(
        list(WORDS.items()), "word string, freq long"
    )
    got = train_bpe_merges(words, 12)
    want = literal_bpe(WORDS, 12)
    assert got == want, (got, want)


def test_trainer_on_corpus_prefix_matches_literal(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    freqs = {
        r["word"]: r["freq"] for r in word_counts(docs).collect()
    }
    got = train_bpe_merges(word_counts(docs), 5)
    want = literal_bpe(freqs, 5)
    assert got == want, (got, want)


def test_greedy_merge_skips_overlaps(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],)],
        "syms array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "aa"]]
