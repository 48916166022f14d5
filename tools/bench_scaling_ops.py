"""Pooled two-level scaling evidence for PIPELINE ops,
complementing the build-job evidence in bench_scaling*.py.

--op minhash    : minhash-LSH dedup in its recommended shape
                  (collapse_exact + hot_bucket_cap) — shuffle-heavy.
--op repetition : repetition_stats — the zero-shuffle CPU-bound
                  contrast.
--op dsir       : DSIR weights + Gumbel-top-k — two bounded-key
                  groupBys plus a broadcast-joined scoring pass.
--op semdedup   : SemDeDup over a deterministic 64-dim vector corpus
                  (10% exact-copy twins) — one Arrow assignment pass
                  + one centroid-keyed shuffle + per-cluster kernels.

Same protocol as bench_scaling_pooled.py: N independent runs per
parallelism level, one JVM each, levels interleaved, pooled
aggregate throughput = total docs / total wall seconds. Each child
does one untimed warmup pass over a 10k-doc slice first so
whole-stage-codegen compilation does not land in the timed run
(fixed cold costs weigh 4x heavier on the faster level and would
understate efficiency).

Usage: python tools/bench_scaling_ops.py [--docs 200000]
       [--levels 2,8] [--runs 3] [--op minhash|repetition]
Writes BENCH/scaling_ops.json (minhash; schema-compatible with the
committed artifact: op=minhash_lsh_pairs, n_pairs) or
BENCH/scaling_ops_<op>.json; update BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, {repo!r})
from codeindex_spark.session import get_spark
from codeindex_spark.ops.dedup import minhash_lsh_pairs
from codeindex_spark.ops.analysis import repetition_stats
from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample
from codeindex_spark.ops.spans import remove_duplicate_spans
from codeindex_spark.ops.similarity import semdedup
from codeindex_spark.ops.sketch import heavy_hitters, kmv_distinct, gram_stream
from codeindex_spark.ops.graph import pagerank
from codeindex_spark.ops.web import (normalize_urls, url_dedup_keep,
                                     extract_links, anchor_stats)
from codeindex_spark.query import ast as qast
from codeindex_spark.query.percolate import QueryRegistry, percolate
from pyspark.sql import functions as F

cpus = {cpus}
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
# pin BLAS to one thread per worker: the semdedup kernel's numpy GEMM
# would otherwise fan out over every HOST core regardless of the
# Spark level, silently inflating the low-parallelism level and
# corrupting the scaling ratio (observed: eff 0.635 unpinned)
for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
          "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ[v] = "1"
spark = get_spark(app_name=f"opscaling{{cpus}}", cores=cpus,
                  shuffle_partitions=max(cpus * 4, 16))
if {op!r} == "semdedup":
    docs = spark.read.parquet({corpus!r})
else:
    docs = spark.read.parquet({corpus!r}).select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("text")
    )
# minhash: recommended pipeline shape on duplicate-heavy data —
# exact texts collapse to one representative AND hot band buckets
# are capped; the synthetic corpus is pathological (an ~8.7k-doc
# exact-dup cluster plus template families with identical
# signatures), so the uncapped op materializes >10^8 candidate
# pairs and the run measures shuffle-spill disk, not the engine.
# repetition: zero-shuffle Arrow kernel — the CPU-bound contrast.
OPS = {{
    "minhash": lambda d: minhash_lsh_pairs(d, collapse_exact=True,
                                           hot_bucket_cap=50),
    "repetition": lambda d: repetition_stats(d),
    # target = a deterministic 10% id slice; resample bounded to 1000
    "dsir": lambda d: dsir_resample(
        dsir_log_weights(d, d.filter(F.pmod("doc_id", F.lit(10)) == 0),
                         num_buckets=4096),
        1000,
    ),
    # spans: exact-substring scrub at a 20-token threshold — the
    # window pass + canonical agg + lag-coverage + anti-join chain;
    # the corpus's 8.7k-doc exact-dup cluster exercises the
    # heavy-overlap coverage path (every window duplicated).
    # The filter references n_kept_tokens so the harness's count()
    # cannot short-circuit the scrub (a bare count of the left join
    # returns the row total without computing the right side)
    "spans": lambda d: remove_duplicate_spans(d, window=20).filter(
        F.col("n_kept_tokens") >= 0
    ),
    # semdedup: filter references the computed kept column so the
    # count cannot skip the per-cluster kernel
    # n_centroids sized so clusters stay under max_cluster (the
    # paper's knob: more clusters at more data) — 3.2M/1024 ~ 3.1k
    "semdedup": lambda d: semdedup(
        d, dim=64, threshold=0.95, n_centroids=1024, sample=8192
    ).filter(F.col("kept")),
    # heavy: bigram Misra-Gries candidates (map-only pass 1 with
    # bounded state, eager at call time) + exact candidate re-count
    # (pass 2) — both land inside the timed region because OP(docs)
    # is called there; phi sized so k ~ 2001 counters/partition and
    # real evictions happen on the code-corpus bigram vocabulary
    "heavy": lambda d: heavy_hitters(d, phi=0.0005, n=2),
    # kmv: vocabulary estimation — bottom-1024 distinct sketch over
    # the ~100x-exploded unigram stream (the realistic 100 TB use:
    # distinct-token counts without a vocabulary shuffle); explode +
    # md5 + per-partition bottom-k, then a <= k-rows-per-partition
    # merge — map-dominated with a tiny exchange
    "kmv": lambda d: kmv_distinct(gram_stream(d, 1, "text"), "gram",
                                  k=1024),
    # pagerank: 5 power iterations over a deterministic 8-out-regular
    # graph with a hot-hub tail (1 of 8 links lands in a 1024-node
    # hub set -> the in-degree skew a web/link graph has). Two
    # shuffles per iteration, lineage checkpointed every 3 — the
    # iterative-replan trap this op family fixed in r4. The agg
    # references pr so nothing is pruned.
    "pagerank": lambda d: pagerank(
        d.select(F.col("doc_id").alias("src"), F.explode(F.array(*[
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i)),
                   F.lit(1024 if i == 0 else {n_docs})).alias(f"x{{i}}")
            for i in range(8)])).alias("dst")),
        iters=5,
    ),
    # url: canonicalize + first-occurrence dedup over a synthetic
    # crawl (zipf-ish duplicate pressure: ~2 rows per canonical URL,
    # 5k domains) — pure JVM regex projection + one min-agg keyed on
    # url_norm; the curation-pipeline web op.
    "url": lambda d: url_dedup_keep(normalize_urls(d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.site"),
            F.pmod(F.xxhash64("doc_id"), F.lit(5000)).cast("string"),
            F.lit(".example.org:443/p/"),
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(99)),
                   F.lit({n_docs} // 2)).cast("string"),
            F.lit("/?utm_source=x&q="),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    ))).filter(F.col("url_kept").cast("int") >= 0),
    # ^ the filter references the computed kept flag so the harness's
    #   count() cannot prune the dedup window away
    # linkgraph: HTML link extraction + inbound-anchor rollup over a
    # synthetic crawl page per doc (~3 anchors each embedded in real
    # corpus text, 5k hot targets) — the regex-extraction stage is
    # map-only JVM CPU, then anchor_stats's two target-keyed
    # map-side-combinable shuffles; the filter references n_links so
    # the rollup cannot be pruned by count()
    "linkgraph": lambda d: anchor_stats(extract_links(d.select(
        "doc_id",
        F.concat(
            F.lit("<p>"), F.substring("text", 1, 400),
            F.lit(' <a href="https://WWW.Site'),
            F.pmod(F.xxhash64("doc_id"), F.lit(5000)).cast("string"),
            F.lit('.example.org:443/p/'),
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(7)),
                   F.lit(1000)).cast("string"),
            F.lit('">'), F.substring("text", 10, 60),
            F.lit("</a> mid <a href=/rel/"),
            F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
            F.lit(">rel &amp; <b>deep</b> link</a> "),
            F.substring("text", 80, 200),
            F.lit(" <a href='#frag'>f</a></p>"),
        ).alias("html"))), k=2).filter(F.col("n_links") >= 1),
    # percolate: reverse search — an 8-shape registry (term, bool,
    # phrase, wildcard, fuzzy, regexp, msm) matched against every
    # doc in one stateless mapInPandas pass (the Lucene Monitor
    # MemoryIndex-per-batch kernel). Pure map, zero shuffle — the
    # tokenize+evaluate CPU contrast for the query-side op family;
    # count() cannot prune an opaque mapInPandas.
    "percolate": lambda d: percolate(
        d,
        QueryRegistry({{
            "t": "get",
            "band": "index AND writer",
            "bor": "string OR return NOT get",
            "ph": qast.parse_phrase_query("add documents"),
            "w": "stri*",
            "fz": "strng~2",
            "rx": "/st.*/",
            "msm": qast.Bool(
                should=(qast.Term("string"), qast.Term("return"),
                        qast.Term("get")),
                min_should_match=2,
            ),
        }}),
        id_col="doc_id", text_col="text",
    ),
}}
OP = OPS[{op!r}]
# untimed warmup: compile the plan shapes on a small slice
OP(docs.limit(10000)).count()
t0 = time.monotonic()
n_out = OP(docs).count()
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "seconds": round(dt, 2),
                   "docs_per_sec": round({n_docs} / dt, 1),
                   "n_out": n_out}}))
spark.stop()
"""


def run_level(cpus: int, corpus: str, n_docs: int, op: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, cpus=cpus,
                                            corpus=corpus, n_docs=n_docs,
                                            op=op)],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(
            f"bench child local[{cpus}] exited {out.returncode} "
            "(stderr tail above)"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--op", default="minhash",
                    choices=["minhash", "repetition", "dsir", "spans",
                             "semdedup", "heavy", "kmv", "pagerank",
                             "url", "linkgraph", "percolate"])
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    if len(levels) != 2 or levels[0] == levels[1]:
        ap.error("--levels needs exactly two distinct values, e.g. 2,8")
    n, n4 = levels

    corpus = f"/tmp/scaling_corpus_{args.docs}"
    if args.op == "semdedup":
        corpus = f"/tmp/scaling_vecs_{args.docs}"
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            gen = (
                "import sys; sys.path.insert(0, {repo!r});\n"
                "import numpy as np, pandas as pd\n"
                "from codeindex_spark.session import get_spark\n"
                "spark = get_spark(app_name='genvec', cores=32,"
                " shuffle_partitions=32)\n"
                "def k(batches):\n"
                "    for pdf in batches:\n"
                "        vecs = [np.random.default_rng(3_000_000 +"
                " int(i) % {base}).standard_normal(64).tolist()"
                " for i in pdf['id']]\n"
                "        yield pd.DataFrame({{'vec_id': pdf['id'],"
                " 'embedding': vecs}})\n"
                "(spark.range({n}).repartition(64)"
                ".mapInPandas(k, 'vec_id long, embedding array<double>')"
                ".write.mode('overwrite').parquet({corpus!r}))\n"
                "spark.stop()"
            ).format(repo=REPO, n=args.docs, corpus=corpus,
                     base=int(args.docs * 0.9))
            subprocess.run(
                [sys.executable, "-c", gen], check=True, timeout=1800
            )
    elif not os.path.exists(os.path.join(corpus, "_SUCCESS")):
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
    for i in range(args.runs):
        for cpus in (n, n4):
            print(f"-- run {i + 1}/{args.runs} local[{cpus}] --", flush=True)
            r = run_level(cpus, corpus, args.docs, args.op)
            print(r, flush=True)
            runs[cpus].append(r)

    def pooled(rs: list[dict]) -> float:
        return args.docs * len(rs) / sum(r["seconds"] for r in rs)

    dps_n, dps_n4 = pooled(runs[n]), pooled(runs[n4])
    eff = dps_n4 / ((n4 / n) * dps_n)
    run_rows = {
        f"local[{cpus}]": [
            (
                {**{k: v for k, v in r.items() if k != "n_out"},
                 "n_pairs": r["n_out"]}
                if args.op == "minhash"
                else r
            )
            for r in rs
        ]
        for cpus, rs in runs.items()
    }
    payload = {
        "op": {"minhash": "minhash_lsh_pairs",
               "repetition": "repetition_stats",
               "dsir": "dsir_log_weights+resample",
               "spans": "remove_duplicate_spans",
               "semdedup": "semdedup",
               "heavy": "heavy_hitters(bigram, phi=5e-4)",
               "kmv": "kmv_distinct(text, k=1024)",
               "pagerank": "pagerank(8-out-regular + hub tail, iters=5)",
               "url": "normalize_urls+url_dedup_keep",
               "linkgraph": "extract_links+anchor_stats(k=2)",
               "percolate": "percolate(8-shape registry)"}[args.op],
        "n_docs": args.docs,
        "protocol": (
            f"{args.runs} independent runs per level on the same "
            "materialized corpus, one JVM per run, untimed 10k-doc "
            "warmup per JVM, levels interleaved; aggregate throughput "
            "= total docs / total wall seconds"
        ),
        "runs": run_rows,
        "pooled_docs_per_sec": {
            f"local[{n}]": round(dps_n, 1),
            f"local[{n4}]": round(dps_n4, 1),
        },
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_name = ("scaling_ops.json" if args.op == "minhash"
                else f"scaling_ops_{args.op}.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["pooled_docs_per_sec"]), "eff:", payload["scaling_efficiency"])


if __name__ == "__main__":
    main()
