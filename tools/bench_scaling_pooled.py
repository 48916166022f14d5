"""Pooled scaling evidence: N independent full runs per parallelism
level (one JVM each), aggregated as total files / total wall seconds.

Single runs on this host swing 0.68-1.02 in efficiency purely from
hypervisor noise (BENCH/BASELINE.md), so the gate is evaluated on the
pooled aggregate — the protocol the round-1 evidence established.

Usage: python tools/bench_scaling_pooled.py [--docs 800000]
       [--levels 2,8] [--runs 3]
Writes BENCH/scaling.json (raw runs + pooled efficiency); update
BENCH/BASELINE.md from it by hand (it carries prose the tool should
not clobber).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import run_level  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=800_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    n, n4 = (int(x) for x in args.levels.split(","))

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

    runs: dict[int, list[dict]] = {n: [], n4: []}
    # interleave levels so slow host phases hit both levels evenly
    for i in range(args.runs):
        for cpus in (n, n4):
            print(f"-- run {i + 1}/{args.runs} local[{cpus}] --", flush=True)
            r = run_level(cpus, corpus, args.docs)
            print(r, flush=True)
            runs[cpus].append(r)

    def pooled_fps(rs: list[dict]) -> float:
        total_s = sum(r["build_seconds"] for r in rs)
        return args.docs * len(rs) / total_s

    fps_n, fps_n4 = pooled_fps(runs[n]), pooled_fps(runs[n4])
    eff = fps_n4 / ((n4 / n) * fps_n)
    payload = {
        "n_docs": args.docs,
        "protocol": (
            f"{args.runs} independent full builds per level on the same "
            "materialized corpus, one JVM per run, levels interleaved; "
            "aggregate throughput = total files / total wall seconds"
        ),
        "runs": {
            f"local[{cpus}]": [
                {
                    "build_seconds": r["build_seconds"],
                    "files_per_sec": r["files_per_sec"],
                }
                for r in rs
            ]
            for cpus, rs in runs.items()
        },
        "query_p50_last_run": {
            f"local[{cpus}]": rs[-1]["query_p50"] for cpus, rs in runs.items()
        },
        "pooled_files_per_sec": {
            f"local[{n}]": round(fps_n, 1),
            f"local[{n4}]": round(fps_n4, 1),
        },
        "primary": {
            "N": n,
            "4N": n4,
            "scaling_efficiency": round(eff, 3),
            "gate": eff >= 0.8,
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["primary"]))


if __name__ == "__main__":
    main()
