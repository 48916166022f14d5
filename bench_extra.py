"""Per-key profiling harness for optimization work (guide §1.4).

bench.py is FROZEN for measurement; this file replicates its exact
workloads key by key so individual operators can be timed (and their
plans captured) in isolation without running the whole suite.

Usage:
  python bench_extra.py --keys op_contamination,op_span_scrub \
      [--sf /root/testdata/sf1.0] [--runs 2] [--explain plans/r06] \
      [--tag before]

Prints one JSON line: {"sf":..., "keys": {name: {"median": s, "min": s,
"samples": [...]}}}.  --explain writes <dir>/<key>_<tag>.txt with
explain("formatted") of the final DataFrame of each keyed workload
(actions replaced by a plan capture of the same frame).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keys", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--tag", default="")
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from codeindex_spark.session import get_spark

    spark = get_spark(app_name="codeindex-bench-extra", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    sf_dir = args.sf

    docs_df = entrymod._load(spark, sf_dir, "documents")

    def _emb():
        return entrymod._load(spark, sf_dir, "embeddings")

    # ---- frame builders: each returns the DataFrame whose action the
    # bench key times (kept in lockstep with bench.py's opset) ----
    def f_op_minhash_lsh():
        from codeindex_spark.ops.dedup import minhash_lsh_pairs
        return minhash_lsh_pairs(docs_df)

    def f_op_contamination():
        from codeindex_spark.ops.dedup import contamination_overlaps
        return contamination_overlaps(
            docs_df, docs_df.filter(F.col("doc_id") % 97 == 0), n=5)

    def f_op_components():
        from codeindex_spark.ops.dedup import (duplicate_components,
                                               minhash_lsh_pairs)
        return duplicate_components(minhash_lsh_pairs(docs_df))

    def f_op_span_scrub():
        from codeindex_spark.ops.spans import remove_duplicate_spans
        return remove_duplicate_spans(docs_df, window=8).filter(
            F.col("n_kept_tokens") >= 0)

    def f_op_dsir():
        from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample
        return dsir_resample(
            dsir_log_weights(docs_df, docs_df.filter(F.col("lang") == "zh"),
                             num_buckets=4096), 100)

    def f_op_nb_classifier():
        return entrymod._q_nb_classifier(spark, sf_dir)

    def f_op_pagerank():
        from codeindex_spark.ops.graph import pagerank
        return pagerank(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
                "concat('o:', l_orderkey) AS src",
                "concat('p:', l_partkey) AS dst").distinct(),
            iters=5)

    def f_op_heavy():
        from codeindex_spark.ops.sketch import heavy_hitters
        return heavy_hitters(docs_df, phi=0.0012, n=2)

    def f_op_quantiles():
        from codeindex_spark.ops.analysis import group_quantiles
        return group_quantiles(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            "l_returnflag", "l_extendedprice", (0.25, 0.5, 0.75, 0.9))

    def f_op_kmv():
        from codeindex_spark.ops.sketch import kmv_distinct
        return kmv_distinct(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            "l_partkey", k=256, group_col="l_returnflag")

    def f_op_bpe():
        return entrymod._q_bpe_tokens(spark, sf_dir)

    def f_op_entropy():
        return entrymod._q_entropy(spark, sf_dir)

    def f_op_pmi():
        return entrymod._q_pmi(spark, sf_dir)

    def f_op_asof():
        return entrymod._q_asof(spark, sf_dir)

    def f_op_scrub():
        from codeindex_spark.ops.pipeline import scrub_text
        return scrub_text(docs_df)

    def f_op_chunk():
        from codeindex_spark.ops.pipeline import chunk_documents
        return chunk_documents(docs_df)

    def f_op_sample():
        from codeindex_spark.ops.pipeline import sample_by_hash
        return sample_by_hash(docs_df, 0.25, seed="42")

    def f_op_repetition():
        from codeindex_spark.ops.analysis import repetition_stats
        return repetition_stats(docs_df)

    def f_op_profile():
        from codeindex_spark.ops.analysis import corpus_profile
        return corpus_profile(docs_df)

    def f_op_quality():
        from codeindex_spark.ops.analysis import quality_score
        return quality_score(docs_df)

    def f_op_semdedup():
        from codeindex_spark.ops.similarity import semdedup
        return semdedup(_emb(), dim=64, threshold=0.95, n_centroids=8,
                        sample=256)

    def f_op_url_dedup():
        from codeindex_spark.ops.web import normalize_urls, url_dedup_keep
        return url_dedup_keep(
            normalize_urls(entrymod._url_corpus(spark, sf_dir)))

    def f_op_cluster_sample():
        from codeindex_spark.ops.cluster import cluster_balanced_sample
        return cluster_balanced_sample(
            entrymod._cluster_assigned(spark, sf_dir), 5)

    def f_op_ann_cosine():
        from codeindex_spark.ops.similarity import brute_force_cosine_topk
        emb = _emb()
        qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        return brute_force_cosine_topk(emb, qvec, k=10, exclude_id=0)

    def f_op_margin_align():
        from codeindex_spark.ops.similarity import margin_knn_align
        emb = _emb()
        return margin_knn_align(emb.filter(F.col("label") < 5),
                                emb.filter(F.col("label") >= 5),
                                k=4, threshold=1.02)

    def f_op_linkgraph_links():
        from codeindex_spark.ops.web import extract_links
        return extract_links(docs_df.select(
            "doc_id",
            F.expr(entrymod._HTML_LINKS_DERIVE_SQL).alias("html")))

    # actions per key (mirror bench.py exactly)
    def a_count(df):
        return df.count()

    ACT = {
        "op_minhash_lsh": (f_op_minhash_lsh, a_count),
        "op_contamination": (f_op_contamination, a_count),
        "op_components": (f_op_components, a_count),
        "op_span_scrub": (f_op_span_scrub, a_count),
        "op_dsir": (f_op_dsir, lambda df: df.collect()),
        "op_nb_classifier": (
            f_op_nb_classifier,
            lambda df: df.agg(F.sum("nb_logodds"), F.sum("n_grams")).collect()),
        "op_pagerank": (
            f_op_pagerank,
            lambda df: df.agg(F.sum("pr"), F.count("*")).collect()),
        "op_heavy": (
            f_op_heavy,
            lambda df: df.agg(F.sum("freq"), F.count("*")).collect()),
        "op_quantiles": (
            f_op_quantiles,
            lambda df: df.agg(F.sum("q50"), F.sum("q90")).collect()),
        "op_kmv": (
            f_op_kmv,
            lambda df: df.agg(F.sum("est_distinct"), F.sum("n_min")).collect()),
        "op_bpe": (
            f_op_bpe,
            lambda df: df.agg(F.sum("n_bpe_tokens"), F.sum("n_words")).collect()),
        "op_entropy": (
            f_op_entropy,
            lambda df: df.agg(F.sum("entropy"), F.sum("n_types")).collect()),
        "op_pmi": (
            f_op_pmi,
            lambda df: df.agg(F.sum("pmi"), F.sum("c12")).collect()),
        "op_asof": (
            f_op_asof,
            lambda df: df.agg(F.sum("lag_us"), F.sum("c_event"),
                              F.sum("c_value")).collect()),
        "op_scrub": (
            f_op_scrub,
            lambda df: df.agg(F.sum(F.length("text_clean")), F.sum("n_urls"),
                              F.sum("n_emails"), F.sum("n_ips")).collect()),
        "op_chunk": (
            f_op_chunk,
            lambda df: df.agg(F.sum(F.length("chunk_text")),
                              F.sum("n_chunk_tokens")).collect()),
        "op_sample": (f_op_sample, a_count),
        "op_repetition": (f_op_repetition, a_count),
        "op_profile": (f_op_profile, lambda df: df.collect()),
        "op_quality": (
            f_op_quality, lambda df: df.agg(F.sum("quality")).collect()),
        "op_semdedup": (
            f_op_semdedup,
            lambda df: df.agg(F.sum(F.col("kept").cast("long")),
                              F.sum("cluster"), F.count("*")).collect()),
        "op_url_dedup": (
            f_op_url_dedup,
            lambda df: df.agg(F.sum(F.length("url_norm")),
                              F.sum(F.col("url_kept").cast("long"))).collect()),
        "op_cluster_sample": (
            f_op_cluster_sample,
            lambda df: df.agg(F.sum("cent_sim"), F.sum("vec_id")).collect()),
        "op_ann_cosine": (f_op_ann_cosine, lambda df: df.collect()),
        "op_margin_align": (f_op_margin_align, lambda df: df.collect()),
        # plan-capture-only frames (use --runs 0 --warm 0 --explain):
        # the percolate pairs frame and the extract_links frame, so the
        # mapInPandas fan-out shape is committed alongside the op plans
        "frame_percolate": (
            lambda: __import__(
                "codeindex_spark.query.percolate", fromlist=["percolate"]
            ).percolate(
                docs_df,
                {"t": "merge", "a": "merge AND batch"},
                id_col="doc_id",
                text_col="text",
            ),
            a_count,
        ),
        "frame_links": (f_op_linkgraph_links, a_count),
    }

    # op_linkgraph is a two-action composite; handle specially
    def run_linkgraph():
        from codeindex_spark.ops.web import anchor_stats, link_graph
        links = f_op_linkgraph_links()
        anchor_stats(links, k=2).agg(F.sum("n_links"), F.count("*")).collect()
        link_graph(
            links.withColumn(
                "src_domain",
                F.concat(F.lit("src"),
                         (F.col("doc_id") % 53).cast("string"))),
            src_col="src_domain").count()

    # op_percolate
    def run_percolate():
        from codeindex_spark.query import ast
        from codeindex_spark.query.percolate import QueryRegistry, percolate
        reg = QueryRegistry({
            "t": "merge", "a": "merge AND batch",
            "on": "sort OR merge NOT spark",
            "ph": ast.parse_phrase_query("fast sort"),
            "w": "sc*", "fz": "spak~1"})
        percolate(docs_df, reg, id_col="doc_id", text_col="text").count()

    # text ops on the zipf mixture corpus need the corpus built; reuse
    # /tmp/bench_corpus_zipf if present (bench.py wrote it), else build.
    def _zipf_docs():
        zipf_pq = "/tmp/bench_corpus_zipf"
        if not os.path.exists(zipf_pq):
            raise RuntimeError("run bench.py first to materialize "
                               "/tmp/bench_corpus_zipf")
        return spark.read.parquet(zipf_pq)

    def run_op_lmz():
        from codeindex_spark.ops.lm import lm_score, lm_train
        zipf_docs = _zipf_docs()
        ztopic0 = zipf_docs.filter(F.col("doc_id") % 4 == 0)
        lm_score(zipf_docs,
                 lm_train(ztopic0, text_col="content", n=3, min_count=2),
                 text_col="content", broadcast_model=True).agg(
            F.avg("avg_log10_p"), F.sum("n_tokens")).collect()

    def run_op_dsirz():
        from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample
        zipf_docs = _zipf_docs()
        ztopic0 = zipf_docs.filter(F.col("doc_id") % 4 == 0)
        dsir_resample(dsir_log_weights(
            zipf_docs, ztopic0, text_col="content", num_buckets=4096),
            100).collect()

    def run_tx_keywordsz():
        from codeindex_spark.ops.analysis import top_terms_per_doc
        zipf_docs = _zipf_docs()
        top_terms_per_doc(zipf_docs, text_col="content", k=5, min_df=2).agg(
            F.sum("score"), F.count("*")).collect()

    # ---- build keys ----
    def run_build_sf_docs():
        from codeindex_spark.index.build import IndexParams
        from codeindex_spark.index.segments import IndexBuilder
        sf_docs = entrymod._as_corpus(docs_df)
        idx = "/tmp/bx_idx_sf"
        b = IndexBuilder(spark, idx,
                         IndexParams(num_buckets=16, block_size=128),
                         n_groups=1)
        b.build(sf_docs, resume=False)

    def run_build_sf_trigram():
        from codeindex_spark.index.build import (CONTENT_TRIGRAM_FIELDS,
                                                 IndexParams)
        from codeindex_spark.index.segments import IndexBuilder
        sf_docs = entrymod._as_corpus(docs_df)
        idx = "/tmp/bx_idx_sf_tri"
        b = IndexBuilder(spark, idx,
                         IndexParams(num_buckets=16, block_size=128,
                                     fields=CONTENT_TRIGRAM_FIELDS),
                         n_groups=1)
        b.build(sf_docs, resume=False)

    def run_build_synthetic():
        from codeindex_spark.corpus import CorpusSpec, spark_documents
        from codeindex_spark.index.build import IndexParams
        from codeindex_spark.index.segments import IndexBuilder
        corpus_pq = "/tmp/bx_corpus_syn"
        if not os.path.exists(corpus_pq):
            spark_documents(spark, CorpusSpec(n_docs=10000, n_repos=32),
                            partitions=args.cpus).write.parquet(corpus_pq)
        docs = spark.read.parquet(corpus_pq)
        idx = "/tmp/bx_idx_syn"
        b = IndexBuilder(spark, idx, IndexParams(num_buckets=64,
                                                 block_size=128), n_groups=4)
        b.build(docs, resume=False)

    def run_build_zipf_trigram():
        from codeindex_spark.index.build import (CONTENT_TRIGRAM_FIELDS,
                                                 IndexParams)
        from codeindex_spark.index.segments import IndexBuilder
        zipf_docs = _zipf_docs()
        idx = "/tmp/bx_idx_zipf_tri"
        b = IndexBuilder(spark, idx,
                         IndexParams(num_buckets=16, block_size=128,
                                     fields=CONTENT_TRIGRAM_FIELDS),
                         n_groups=1)
        b.build(zipf_docs, resume=False)

    RUNNERS = {
        "op_linkgraph": run_linkgraph,
        "op_percolate": run_percolate,
        "op_lmz": run_op_lmz,
        "op_dsirz": run_op_dsirz,
        "tx_keywordsz": run_tx_keywordsz,
        "build_sf_docs": run_build_sf_docs,
        "build_sf_trigram": run_build_sf_trigram,
        "build_synthetic": run_build_synthetic,
        "build_zipf_trigram": run_build_zipf_trigram,
    }

    out: dict = {"sf": sf_dir, "keys": {}}
    for key in keys:
        spark.sparkContext.setJobDescription(f"bench_extra:{key}")
        if key in ACT:
            build, act = ACT[key]
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                tag = f"_{args.tag}" if args.tag else ""
                with open(os.path.join(args.explain,
                                       f"{key}{tag}.txt"), "w") as fh:
                    fh.write(build()._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            fn = lambda b=build, a=act: a(b())
        elif key in RUNNERS:
            fn = RUNNERS[key]
        else:
            print(f"unknown key: {key}", file=sys.stderr)
            continue
        for _ in range(args.warm):
            fn()
        if args.runs == 0:
            continue
        samples = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            samples.append(round(time.monotonic() - t0, 3))
        out["keys"][key] = {
            "median": round(statistics.median(samples), 3),
            "min": min(samples),
            "samples": samples,
        }
        print(f"## {key}: {out['keys'][key]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
