"""Cross-index merge benchmark — the distributed-build pattern's
payoff: shard the corpus, build each shard as its own job, then
merge_indexes (the addIndexes analog) instead of re-indexing the
union. The merge never re-tokenizes — its cost is column arithmetic
+ one block-max rescale pass — so merge_s should be a small fraction
of whole_build_s, and that RATIO is the robust signal on this noisy
host (BENCH/BASELINE.md documents 10-18% steal).

Usage: python tools/bench_merge.py [--docs 800000] [--cpus 32]
Writes BENCH/merge.json; update BENCH/BASELINE.md prose by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=800_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from codeindex_spark.corpus import CorpusSpec, spark_documents
    from codeindex_spark.index.build import IndexParams
    from codeindex_spark.index.merge import merge_indexes
    from codeindex_spark.index.segments import IndexBuilder, IndexReader
    from codeindex_spark.query.planner import SearchEngine
    from codeindex_spark.session import get_spark

    spark = get_spark(
        app_name="bench-merge",
        cores=args.cpus,
        shuffle_partitions=args.cpus,
    )

    base = f"/tmp/bench_merge_{args.docs}"
    shutil.rmtree(base, ignore_errors=True)
    corpus = f"/tmp/scaling_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        spark_documents(
            spark, CorpusSpec(n_docs=args.docs, n_repos=64), partitions=64
        ).write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)
    params = IndexParams(num_buckets=args.cpus, block_size=128)

    def build(name, df):
        d = os.path.join(base, name)
        IndexBuilder(spark, d, params, n_groups=1).build(df, resume=False)
        return d

    # deliberately unequal shards (the offsets differ) keyed on a
    # stable column so the split is deterministic
    split = F.crc32(F.concat_ws("/", "repo", "path")) % 3
    a_s, da = timed(lambda: build("a", docs.filter(split == 0)))
    b_s, db = timed(lambda: build("b", docs.filter(split != 0)))
    whole_s, dw = timed(lambda: build("whole", docs))
    merge_s, _ = timed(
        lambda: merge_indexes(spark, [da, db], os.path.join(base, "m"))
    )

    # score identity spot check: top-10 over merged == over whole
    # (path-keyed; internal docIDs legitimately differ post-merge)
    def top(d):
        eng = SearchEngine(IndexReader(spark, d))
        rows = eng.search("get", k=10, with_docs=True).collect()
        return sorted(
            ((r["repo"], r["path"]), round(r["score"], 9)) for r in rows
        )

    identical = top(os.path.join(base, "m")) == top(
        os.path.join(base, "whole")
    )

    out = {
        "docs": args.docs,
        "cpus": args.cpus,
        "shard_a_build_s": a_s,
        "shard_b_build_s": b_s,
        "whole_build_s": whole_s,
        "merge_s": merge_s,
        "merge_vs_whole_ratio": round(merge_s / whole_s, 3),
        "merged_docs_per_sec": round(args.docs / merge_s, 1),
        "top10_scores_identical": bool(identical),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "merge.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
