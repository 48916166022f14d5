"""Incremental-maintenance benchmark — the ST5 production steady
state: base build at N docs, one snapshot-diff apply (1% updates,
0.5% deletes, 0.5% adds), query latency on the stacked reader, then
the two compaction strategies head to head:

  merge_compact — postings-level decode-filter-reencode, never
                  re-tokenizes (the Lucene segment-merge analog)
  compact       — full rebuild of live docs (force-merge analog)

Usage: python tools/bench_incremental.py [--docs 800000] [--cpus 32]
Writes BENCH/incremental.json; update BENCH/BASELINE.md prose by hand.
Numbers are single-run on a noisy host (BENCH/BASELINE.md documents
10-18% steal); the merge-vs-rebuild RATIO is the robust signal.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
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

    corpus = f"/tmp/scaling_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen = (
            "import sys; sys.path.insert(0, {repo!r});\n"
            "from codeindex_spark.session import get_spark\n"
            "from codeindex_spark.corpus import CorpusSpec, spark_documents\n"
            "spark = get_spark(app_name='gen', cores=32, shuffle_partitions=32)\n"
            "spark_documents(spark, CorpusSpec(n_docs={n}, n_repos=64), partitions=64)"
            ".write.mode('overwrite').parquet({corpus!r})\n"
            "spark.stop()"
        ).format(repo=REPO, n=args.docs, corpus=corpus)
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800)

    from pyspark.sql import functions as F

    from codeindex_spark.index.build import IndexParams
    from codeindex_spark.query.planner import SearchEngine
    from codeindex_spark.session import get_spark
    from codeindex_spark.streaming.maintain import IncrementalIndex

    spark = get_spark(
        app_name="bench-incremental", cores=args.cpus,
        shuffle_partitions=args.cpus,
    )
    base = spark.read.parquet(corpus)
    n_docs = base.count()
    out: dict = {"docs": n_docs, "cpus": args.cpus}

    root = "/tmp/bench_inc_idx"
    shutil.rmtree(root, ignore_errors=True)
    inc = IncrementalIndex(
        spark, root,
        IndexParams(num_buckets=64, block_size=128), n_groups=4,
    )
    s, _ = timed(lambda: inc.build_base(base))
    out["base_build_s"] = s
    out["base_build_files_per_sec"] = round(n_docs / s, 1)

    # snapshot diff: 1% updates (new commit + content suffix),
    # 0.5% deletes, 0.5% adds (cloned rows at new paths)
    h = F.abs(F.xxhash64("path")) % 1000
    upd = base.filter(h < 10).select(
        "repo", "path",
        F.concat(F.col("commit"), F.lit("u")).alias("commit"),
        "lang",
        F.concat(F.col("content"), F.lit(" updatedtokenx")).alias("content"),
    )
    keep = base.filter((h >= 15))  # h in [10,15) deleted
    adds = base.filter((h >= 15) & (h < 20)).select(
        "repo",
        F.concat(F.col("path"), F.lit(".addbench")).alias("path"),
        "commit", "lang", "content",
    )
    snapshot = (
        keep.select("repo", "path", "commit", "lang", "content")
        .unionByName(upd)
        .unionByName(adds)
    )
    n_changes = upd.count() + adds.count() + base.filter(
        (h >= 10) & (h < 15)
    ).count()
    s, counts = timed(lambda: inc.apply_snapshot(snapshot))
    out["apply_snapshot_s"] = s
    out["apply_counts"] = counts
    out["changes_per_sec"] = round(n_changes / s, 1)

    eng = SearchEngine(inc.reader())
    s, _ = timed(lambda: eng.search("updatedtokenx", k=100).collect())
    out["query_stacked_s"] = s

    s, _ = timed(inc.merge_compact)
    out["merge_compact_s"] = s
    eng2 = SearchEngine(inc.reader())
    s, _ = timed(lambda: eng2.search("updatedtokenx", k=100).collect())
    out["query_merged_s"] = s

    s, _ = timed(inc.compact)
    out["full_compact_s"] = s
    out["merge_vs_rebuild_ratio"] = round(
        out["merge_compact_s"] / out["full_compact_s"], 3
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    dest = os.path.join(REPO, "BENCH", "incremental.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
