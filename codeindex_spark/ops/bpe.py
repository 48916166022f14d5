"""Byte-pair-encoding tokenizer training + application (Sennrich
2016, arXiv:1508.07909) — the LLM-pipeline step that turns a curated
corpus into a token vocabulary and token counts.

Scale shape (the part that matters at 100 TB): BPE training never
iterates over the corpus. The ONE corpus-sized operation is the
word-frequency count (map-side-combinable groupBy keyed on the word —
skew bound is the hottest word's partial rows, which combine before
the exchange). Merges are then learned on the bounded
top-``max_words`` frequency summary on the driver — the same design
as SentencePiece / HF `tokenizers` (and this repo's
ivf_train_centroids): the merge loop is inherently sequential, and
its input is a vocabulary summary, not data. Application is
vocabulary-side too: segmentation runs once per DISTINCT word
(Arrow-batched kernel over the vocab table), and the corpus only
joins word -> n_subtokens on the word key — document text never
passes through Python.

Determinism (pinned by tests and the driver oracle replay):
- word freq ties in the top-``max_words`` cut break by word asc;
- merge choice = highest pair count, ties by (left, right) asc;
- a merge step replaces ALL non-overlapping occurrences of the
  chosen pair left-to-right (GPT-2 convention);
- segmentation repeatedly merges the earliest-learned pair present,
  all occurrences left-to-right.

The end-of-word marker is the conventional ``</w>`` appended as its
own symbol; corpora whose tokens can contain that literal string
must pre-normalize (documented limitation, irrelevant for
whitespace-split natural-language/code tokens).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codeindex_spark.ops._text import ws_tokens

__all__ = [
    "word_freqs",
    "bpe_train",
    "bpe_merges_df",
    "bpe_segment_words",
    "bpe_token_counts",
    "bpe_learn_from_freqs",
    "bpe_segment",
]

EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-token corpus — the single
    corpus-sized pass of BPE training."""
    from codeindex_spark.util import ensure_parallelism

    # fan out doc-level rows before the explode: a 1-2-split parquet
    # scan otherwise serializes the corpus-sized token explode
    return (
        ensure_parallelism(df.select(F.col(text_col)), factor=1)
        .select(F.explode(ws_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def bpe_learn_from_freqs(
    freqs: Sequence[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic BPE merge loop over a (word, freq) summary. Pure
    Python on purpose: it is the sequential part, its input is
    bounded, and the driver oracle replays it verbatim. Returns
    [(left, right, pair_count), ...] in merge order."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in freqs:
        sym = tuple(w) + (EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(f)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, cnt))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == left
                    and sym[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_words: int = 50_000,
    min_freq: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus: distributed
    word-frequency count, bounded top-``max_words`` summary
    (freq desc, word asc — a TakeOrdered, never a global sort),
    driver-side merge loop."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if max_words < 1:
        raise ValueError("max_words must be >= 1")
    wf = word_freqs(df, text_col)
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    top = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    rows = [(r["word"], r["freq"]) for r in top.collect()]
    return bpe_learn_from_freqs(rows, n_merges)


def bpe_merges_df(
    spark: SparkSession, merges: Sequence[tuple[str, str, int]]
) -> DataFrame:
    """(rank, left, right, merged, pair_count) merge table — the
    broadcastable tokenizer artifact."""
    return spark.createDataFrame(
        [
            (i + 1, l, r, l + r, int(c))
            for i, (l, r, c) in enumerate(merges)
        ],
        "rank long, left string, right string, merged string, pair_count long",
    )


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with learned merges: repeatedly apply the
    earliest-learned pair present (all non-overlapping occurrences,
    left-to-right)."""
    by_rank = {r: p for p, r in ranks.items()}
    sym = list(word) + [EOW]
    while len(sym) >= 2:
        best_rank = None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        left, right = by_rank[best_rank]
        merged = left + right
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_segment_words(
    words: DataFrame, merges: Sequence[tuple[str, str, int]]
) -> DataFrame:
    """(word, pieces, n_sub) for each row of a ``word`` column —
    Arrow-batched kernel over the (vocabulary-sized) input; the merge
    list ships in the task closure (tokenizer artifacts are KBs)."""
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces = [bpe_segment(w, ranks) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": pieces,
                    "n_sub": [len(p) for p in pieces],
                }
            )

    return words.select("word").mapInPandas(
        kernel, "word string, pieces array<string>, n_sub long"
    )


def bpe_token_counts(
    df: DataFrame,
    merges: Sequence[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): exact learned-BPE token
    counts per document. Segmentation runs once per distinct word;
    the corpus-side work is one explode + a join keyed on the word +
    a per-doc sum — all map-side combinable, no Python on the
    corpus path. Empty docs stay rows with zeros."""
    from codeindex_spark.util import ensure_parallelism

    toks = ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col)), factor=1
    ).select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(text_col)).alias("word"),
    )
    per_word = toks.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("n_occ")
    )
    vocab = per_word.select("word").distinct()
    seg = bpe_segment_words(vocab, merges).select("word", "n_sub")
    per_doc = (
        per_word.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_sub")).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
    )
    all_ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return all_ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )
