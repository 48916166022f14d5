"""Shared whitespace tokenizer for the LLM-pipeline ops.

One definition because the token boundary IS the contract that the
DuckDB oracles replay bit-exactly (n-gram hashing in dsir/lm, chunk
windows, profile token counts): a drift between two private copies
would silently break oracle parity for one op but not its siblings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["ws_tokens"]


def ws_tokens(text_col: str, lower: bool = True) -> Column:
    """Non-empty whitespace-delimited tokens of ``text_col`` as an
    array column. ``lower=True`` (the lm/dsir convention) lowercases
    before splitting; profile/chunk ops keep original case."""
    col = F.trim(F.col(text_col))
    if lower:
        col = F.lower(col)
    return F.filter(F.split(col, " +"), lambda w: w != "")
