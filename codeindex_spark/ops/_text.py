"""Shared whitespace tokenizer for the LLM-pipeline ops.

One definition because the token boundary IS the contract that the
DuckDB oracles replay bit-exactly (n-gram hashing in dsir/lm, chunk
windows, profile token counts): a drift between two private copies
would silently break oracle parity for one op but not its siblings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["ws_tokens", "gram_array", "gram_arrays"]


def ws_tokens(text_col: str, lower: bool = True) -> Column:
    """Non-empty whitespace-delimited tokens of ``text_col`` as an
    array column. ``lower=True`` (the lm/dsir convention) lowercases
    before splitting; profile/chunk ops keep original case."""
    col = F.trim(F.col(text_col))
    if lower:
        col = F.lower(col)
    return F.filter(F.split(col, " +"), lambda w: w != "")


def gram_array(toks: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams of ``toks``, in
    positional order (length max(size - n + 1, 0)).

    Built as a zip_with chain whose lambdas touch ONLY their lambda
    variables — never a column — so projection collapse can never
    inline the token expression into a per-element lambda body (Spark
    does not CSE through lambda functions; the inlined shape re-splits
    the document once per gram position — the 10x slowdowns measured
    in dsir/gram_stream). Every reference to ``toks`` here is at ROW
    level (slice), evaluated once per row per chain step.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return toks
    g = toks
    size = F.size(toks)
    for k in range(2, n + 1):
        width = F.greatest(size - (k - 1), F.lit(0))
        g = F.zip_with(
            F.slice(g, 1, width),
            F.slice(toks, k, width),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return g


def gram_arrays(toks: Column, n: int) -> list[Column]:
    """[1-gram array, 2-gram array, ..., n-gram array] of ``toks`` —
    the incremental products of the same zip_with chain, for callers
    that need every order (dsir / NB featurization)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    out = [toks]
    g = toks
    size = F.size(toks)
    for k in range(2, n + 1):
        width = F.greatest(size - (k - 1), F.lit(0))
        g = F.zip_with(
            F.slice(g, 1, width),
            F.slice(toks, k, width),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        out.append(g)
    return out
