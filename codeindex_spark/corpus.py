"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the engine's input table with the exact shape required by
BASELINE.json ``input_hint``:

    documents(repo:string, path:string, commit:string, lang:string,
              content:string)

Seeded (default 42) and pure-function deterministic — same args, same
bytes, so the sha256 ingest invariant (input_hint) is checkable and
builds are reproducible across parallelism levels.

The line templates exercise every tokenizer branch (cf.
/root/reference/src/CodeIndex.IndexBuilder/CodeTokenUtils/WordSegmenter.cs:97-110
and /root/reference/src/CodeIndex.Test/IndexBuilder/CodeAnalyzerTest.cs:14-56)
plus the skew fixture: hot terms ``get``/``string``/``return`` appear
Zipf-heavy in ~40% of lines (BASELINE.json north_star).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

EXT_LANG = {
    "cs": "csharp",
    "py": "python",
    "js": "javascript",
    "txt": "text",
    "sql": "sql",
    "xml": "xml",
}
_EXTS = list(EXT_LANG)

_PKGS = [
    "core", "index", "search", "query", "store", "util", "net", "io",
    "auth", "api", "model", "view", "ctrl", "sched", "cache", "log",
    "conf", "test", "bench", "meta",
]

_IDENTIFIERS = [
    "LucenePool", "SaveResultsAndClearLucenePool", "TempIndexDir",
    "IndexWriter", "CodeSource", "QueryGenerator", "SearchRequest",
    "BuildIndex", "TokenStream", "maintainer", "snapshot", "manifest",
    "partition", "checkpoint", "segment", "postings", "dictionary",
]

_HOT_TERMS = ["get", "string", "return"]

_PLAIN_WORDS = [
    "index", "writer", "add", "documents", "batch", "size", "merge",
    "commit", "flush", "reader", "score", "rank", "token", "field",
    "value", "config", "path", "file", "content", "result",
]

_CASE_LINE = "ABCD abcd Abcd ABCE"
_CJK_LINE = "这是一个例句,我知道了"


def _rng(seed: int, *key: object) -> np.random.Generator:
    """Independent deterministic stream per key — stable under
    reordering/parallelism (no shared sequential RNG state)."""
    h = hashlib.sha256(("|".join(map(str, key)) + f"#{seed}").encode())
    return np.random.default_rng(int.from_bytes(h.digest()[:8], "big"))


def _seeded_hex(seed: int, *key: object) -> str:
    h = hashlib.sha256(("|".join(map(str, key)) + f"@{seed}").encode())
    return h.hexdigest()


def _make_line(rng: np.random.Generator) -> str:
    kind = rng.random()
    if kind < 0.40:  # hot-term line (skew fixture), Zipf-ish over 3 hot terms
        zipf = np.array([1 / (i + 1) for i in range(len(_HOT_TERMS))])
        probs = zipf / zipf.sum()
        n = int(rng.integers(2, 6))
        hot = rng.choice(_HOT_TERMS, size=n, p=probs)
        plain = rng.choice(_PLAIN_WORDS, size=max(1, 6 - n))
        words = list(hot) + list(plain)
        rng.shuffle(words)
        return " ".join(words)
    if kind < 0.55:  # method-call line: CamelCase whole, punctuation tokens
        a, b, c = rng.choice(_IDENTIFIERS, size=3)
        return f"{a}.{b}({c});"
    if kind < 0.70:  # snake_case line: '_' is a special char -> splits
        a, b, c = rng.choice(_PLAIN_WORDS, size=3)
        d = rng.choice(_PLAIN_WORDS)
        return f"{a}_{b}.{c}_{d}(batch_size)"
    if kind < 0.78:
        return _CASE_LINE
    if kind < 0.84:
        return _CJK_LINE
    if kind < 0.90:  # plain words
        return " ".join(rng.choice(_PLAIN_WORDS, size=int(rng.integers(3, 9))))
    if kind < 0.94:  # blank / whitespace-only (line-number fixtures)
        return "" if rng.random() < 0.5 else "   \t"
    if kind < 0.97:  # long tokens around the 4..199 hint bounds
        return "L" + "x" * 149 + " " + "M" + "y" * 249
    # mixed wildcard/fuzzy bait
    return "stride strings stringify organization organisation strng"


@dataclass(frozen=True)
class CorpusSpec:
    n_docs: int = 200
    n_repos: int = 8
    seed: int = 42
    min_lines: int = 5
    max_lines: int = 40
    dup_every: int = 23  # every k-th doc duplicates content of doc i-dup_every


def generate_documents(spec: CorpusSpec = CorpusSpec()) -> pd.DataFrame:
    """The full corpus as one pandas frame (small SFs / oracle side)."""
    return generate_documents_range(spec, 0, spec.n_docs)


def generate_documents_range(
    spec: CorpusSpec, start: int, end: int
) -> pd.DataFrame:
    """Rows [start, end) of the corpus — the distributed entry point.

    Each row is derived only from (seed, i), so executors can generate
    disjoint ranges independently and the result is identical to the
    single-node frame: this is what makes the sha256 ingest invariant
    and two-parallelism-level benches compare the same bytes.
    """
    rows = []
    for i in range(start, end):
        repo = f"repo{i % spec.n_repos:03d}"
        rng = _rng(spec.seed, "doc", i)
        pkg = _PKGS[int(rng.integers(0, len(_PKGS)))]
        name = _IDENTIFIERS[int(rng.integers(0, len(_IDENTIFIERS)))]
        ext = _EXTS[int(rng.integers(0, len(_EXTS)))]
        path = f"src/{pkg}/{name}_{i}.{ext}"
        commit = "c" + _seeded_hex(spec.seed, repo, path)[:12]
        # duplicate-content rows across repos (dedup + sha256 fixtures):
        # every dup_every-th doc shares the content of the chain head,
        # forming one exact-dup cluster per chain.
        base = i
        if spec.dup_every:
            while base > 0 and base % spec.dup_every == 0:
                base -= spec.dup_every
        content = _make_content(_rng(spec.seed, "content", base), spec)
        rows.append((repo, path, commit, EXT_LANG[ext], content))
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )


def _make_content(rng: np.random.Generator, spec: CorpusSpec) -> str:
    n_lines = int(rng.integers(spec.min_lines, spec.max_lines + 1))
    return "\n".join(_make_line(rng) for _ in range(n_lines))


def content_sha256(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


def spark_documents(spark, spec: CorpusSpec = CorpusSpec(), partitions: int = 8):
    """Generate the corpus as a Spark DataFrame, distributed.

    Uses mapInPandas over a range frame so each partition synthesizes
    its own row range — no driver-side materialization, scales to any
    n_docs (at 10^12 scale the same generator shape would read Iceberg
    instead; this is the test/bench stand-in required by the brief).
    """
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
        ]
    )
    bounds = spark.range(0, spec.n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ranges need not be contiguous per batch; group runs
            yield generate_documents_range_ids(spec, ids)

    return bounds.mapInPandas(gen, schema=schema)


def generate_documents_range_ids(spec: CorpusSpec, ids) -> pd.DataFrame:
    """Generate rows for an id array by splitting it into contiguous
    runs (spark.range partitions are contiguous, so this is one call
    per partition, not per row)."""
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size == 0:
        return pd.DataFrame(
            columns=["repo", "path", "commit", "lang", "content"]
        )
    breaks = np.flatnonzero(np.diff(ids) != 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks + 1, [ids.size]))
    frames = [
        generate_documents_range(spec, int(ids[s]), int(ids[e - 1]) + 1)
        for s, e in zip(starts, ends)
    ]
    return frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
