"""Headline benchmark — prints ONE JSON line.

Phases:
  build  — inverted-index build over the deterministic synthetic
           source-code corpus (files/sec; the BASELINE.json metric)
  sfload — index build over $SPARK_GRAFT_SF_DIR/documents.parquet
  query  — the reference query set (FIXTURES.md §3 shapes) against
           the sf index, pooled auto-ranged medians (seconds per
           single call; reps recorded in queries_reps)
  ops    — dedup / ANN / analysis headline ops at the sf dir, same
           pooled protocol; builds report the median of BUILD_RUNS
           full rebuilds

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_DOCS (default 2000 synthetic files).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_RUNS = 3
# pooled timing (VERDICT r4 tasks 3-4): a sub-second key measures
# fixed job-launch cost, not engine work, and round-over-round diffs
# on such keys are unreadable (the r4 "regressions" were 0.4-2.7 s
# deltas inside the host's noise band). Each key is auto-ranged: one
# untimed warm/estimate call picks reps so a SAMPLE spans >= TARGET_S
# of wall (capped at MAX_REPS), then the median of N_RUNS samples is
# reported PER SINGLE CALL. Reps are recorded in the output
# (queries_reps) so rounds stay comparable.
TARGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_TARGET_S", "3.0"))
MAX_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", "8"))
BUILD_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_BUILD_RUNS", "3"))


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def p50(fn, runs: int = N_RUNS) -> float:
    samples = []
    for _ in range(runs):
        dt, _ = timed(fn)
        samples.append(dt)
    return statistics.median(samples)


_REPS_USED: dict[str, int] = {}


def pooled_p50(name: str, fn, runs: int = N_RUNS) -> float:
    """Auto-ranged pooled median: warm + estimate once (untimed in
    the report), then ``runs`` samples of ``reps`` back-to-back calls
    each, reporting median seconds per single call."""
    est, _ = timed(fn)
    reps = max(1, min(MAX_REPS, int(math.ceil(TARGET_S / max(est, 1e-3)))))
    _REPS_USED[name] = reps
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        for _ in range(reps):
            fn()
        samples.append((time.monotonic() - t0) / reps)
    return statistics.median(samples)


def pooled_build(builder_fn, runs: int = BUILD_RUNS) -> float:
    """Builds rebuild the same artifacts each run (resume=False), so
    the median of ``runs`` full builds is directly comparable and the
    final artifacts serve the query phases."""
    samples = []
    for _ in range(runs):
        dt, _ = timed(builder_fn)
        samples.append(dt)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "10000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from codeindex_spark.corpus import CorpusSpec, spark_documents
    from codeindex_spark.index.build import IndexParams
    from codeindex_spark.index.segments import IndexBuilder, IndexReader
    from codeindex_spark.query import ast
    from codeindex_spark.query.planner import Filters, SearchEngine
    from codeindex_spark.session import get_spark

    spark = get_spark(app_name="codeindex-bench", cores=cpus,
                      shuffle_partitions=cpus)

    queries: dict[str, float] = {}
    result: dict = {"sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "cpus": cpus}

    # ---- phase 0: JVM warmup (untimed) ----
    # A tiny end-to-end pass first: whole-stage-codegen compilation,
    # the Python worker pool fork, and Arrow init are per-JVM one-time
    # costs (~6-8 s measured) that land entirely on the FIRST job that
    # exercises each plan shape. On a real cluster they amortize to
    # zero over hours-long executors, so the timed keys measure
    # steady-state engine throughput. Query keys were already
    # effectively warm (p50 of 3 runs); this extends the same
    # treatment to the single-shot build keys.
    from pyspark.sql import functions as F
    from codeindex_spark.index.build import CONTENT_TRIGRAM_FIELDS
    from codeindex_spark.ops.dedup import minhash_lsh_pairs
    from codeindex_spark.query.planner import SearchEngine as _SE

    warm_pq = "/tmp/bench_corpus_warm"
    shutil.rmtree(warm_pq, ignore_errors=True)
    spark_documents(
        spark, CorpusSpec(n_docs=256, n_repos=4), partitions=8
    ).write.parquet(warm_pq)
    wdocs = spark.read.parquet(warm_pq)
    for wdir, wfields in (
        ("/tmp/bench_idx_warm", None),
        ("/tmp/bench_idx_warm_tri", CONTENT_TRIGRAM_FIELDS),
    ):
        shutil.rmtree(wdir, ignore_errors=True)
        wp = (
            IndexParams(num_buckets=16, block_size=128)
            if wfields is None
            else IndexParams(num_buckets=16, block_size=128, fields=wfields)
        )
        IndexBuilder(spark, wdir, wp, n_groups=1).build(wdocs, resume=False)
    weng = _SE(IndexReader(spark, "/tmp/bench_idx_warm"))
    weng.search("table", k=10).collect()
    minhash_lsh_pairs(
        wdocs.select(
            F.xxhash64("path").alias("doc_id"), F.col("content").alias("text")
        )
    ).count()

    # ---- phase 1: synthetic corpus build (files/sec headline) ----
    syn_dir = "/tmp/bench_idx_syn"
    shutil.rmtree(syn_dir, ignore_errors=True)
    spec = CorpusSpec(n_docs=bench_docs, n_repos=32)
    # materialize the corpus once (the "Iceberg source table" stand-in)
    # so the timed build measures indexing, not data synthesis
    corpus_pq = "/tmp/bench_corpus"
    shutil.rmtree(corpus_pq, ignore_errors=True)
    spark_documents(spark, spec, partitions=cpus).write.parquet(corpus_pq)
    docs = spark.read.parquet(corpus_pq)
    builder = IndexBuilder(
        spark, syn_dir, IndexParams(num_buckets=64, block_size=128), n_groups=4
    )
    build_s = pooled_build(lambda: builder.build(docs, resume=False))
    queries["build_synthetic"] = round(build_s, 3)
    result["build"] = {
        "n_docs": bench_docs,
        "seconds": round(build_s, 3),
        "files_per_sec": round(bench_docs / build_s, 2),
    }

    # ---- phase 2: sf documents index build ----
    import __spark_entry__ as entrymod

    sf_idx = f"/tmp/bench_idx_sf_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(sf_idx, ignore_errors=True)
    sf_docs = entrymod._as_corpus(entrymod._load(spark, sf_dir, "documents"))
    n_sf_docs = sf_docs.count()
    sfb = IndexBuilder(
        spark, sf_idx, IndexParams(num_buckets=16, block_size=128), n_groups=1
    )
    sfload_s = pooled_build(lambda: sfb.build(sf_docs, resume=False))
    queries["build_sf_docs"] = round(sfload_s, 3)
    eng = SearchEngine(IndexReader(spark, sf_idx))

    # ---- phase 2b: FOR bit-packed codec twin (r5) ----
    # same sf corpus, codec="forpack": build cost + one positional
    # query, directly comparable with build_sf_docs / q05_phrase
    fp_idx = sf_idx + "_forpack"
    shutil.rmtree(fp_idx, ignore_errors=True)
    fpb = IndexBuilder(
        spark,
        fp_idx,
        IndexParams(num_buckets=16, block_size=128, codec="forpack"),
        n_groups=1,
    )
    queries["build_sf_forpack"] = round(
        pooled_build(lambda: fpb.build(sf_docs, resume=False)), 3
    )
    eng_fp = SearchEngine(IndexReader(spark, fp_idx))
    queries["q05_phrase_forpack"] = round(
        pooled_p50(
            "q05_phrase_forpack",
            lambda: eng_fp.search(
                ast.parse_phrase_query("fast sort"), k=100
            ).collect(),
        ),
        3,
    )

    # ---- phase 3: reference query set latencies (p50) ----
    def run_q(q, **kw):
        return lambda: eng.search(q, k=100, **kw).collect()

    qset = {
        "q01_keyword_hot": run_q("table"),
        "q02_keyword": run_q("spark"),
        "q03_bool_and": run_q("merge AND batch"),
        "q04_bool_or_not": run_q("sort OR merge NOT spark"),
        "q05_phrase": run_q(ast.parse_phrase_query("fast sort")),
        "q06_phrase_wildcard": run_q(ast.parse_phrase_query("fast s*")),
        "q07_wildcard": run_q("sc*"),
        "q08_fuzzy": run_q("spak~1"),
        "q09_term_regexp": run_q("/(qu|s).*t/"),
        "q10_field_filtered": run_q("spark", filters=Filters(lang="en")),
        "q13_hints": lambda: eng.hints("sc").collect(),
    }
    for name, fn in qset.items():
        queries[name] = round(pooled_p50(name, fn), 3)

    # batch execution: the same 8 scored query shapes in ONE posting
    # scan + shuffle + kernel job (hints excluded — not a scored query)
    batch = {
        "b1": "table",
        "b2": "spark",
        "b3": "merge AND batch",
        "b4": "sort OR merge NOT spark",
        "b5": ast.parse_phrase_query("fast sort"),
        "b6": ast.parse_phrase_query("fast s*"),
        "b7": "sc*",
        "b8": "spak~1",
    }
    queries["q_batch8"] = round(
        pooled_p50("q_batch8",
                   lambda: eng.search_many(batch, k=100).collect()), 3
    )

    # r3 query-side additions (informational extras)
    from pyspark.sql import functions as _F

    mlt_key = (
        eng.reader.docs.filter(_F.col("path").rlike(r"/3\.txt$"))
        .select("doc_key")
        .collect()[0]["doc_key"]
    )
    queries["q_mlt"] = round(
        pooled_p50("q_mlt",
                   lambda: eng.more_like_this(mlt_key, k=10).collect()), 3
    )
    queries["q_facets"] = round(
        pooled_p50("q_facets",
                   lambda: eng.facet_counts("spark").collect()), 3
    )
    queries["q_suggest"] = round(
        pooled_p50("q_suggest", lambda: eng.suggest("hast", k=5).collect()), 3
    )
    # r4: same op through the bigram candidate sidecar (build cost
    # excluded — it is a one-time index artifact)
    eng.build_suggest_index()
    queries["q_suggest_idx"] = round(
        pooled_p50("q_suggest_idx",
                   lambda: eng.suggest("custmer", k=5).collect()), 3
    )

    # r5 session-12 query surfaces: collapse / field sort / top terms
    # / block-join-to-parent / percolation
    queries["q_collapse"] = round(
        pooled_p50(
            "q_collapse",
            lambda: eng.search_collapse(
                "merge OR sort", "lang", k=20, per_group=2
            ).collect(),
        ),
        3,
    )
    queries["q_sorted"] = round(
        pooled_p50(
            "q_sorted",
            lambda: eng.search_sorted(
                "merge AND batch", [("lang", "asc"), ("path", "desc")], k=100
            ).collect(),
        ),
        3,
    )
    queries["q_top_terms"] = round(
        pooled_p50(
            "q_top_terms", lambda: eng.top_terms("content", 100).collect()
        ),
        3,
    )
    queries["q_parent_join"] = round(
        pooled_p50(
            "q_parent_join",
            lambda: eng.join_to_parent(
                "merge OR sort", "repo", score_mode="total", k=100
            ).collect(),
        ),
        3,
    )
    queries["q_grouping"] = round(
        pooled_p50(
            "q_grouping",
            lambda: eng.search_groups(
                "merge OR sort", "repo", n_groups=10, per_group=3
            ).collect(),
        ),
        3,
    )
    queries["q_facet_drill"] = round(
        pooled_p50(
            "q_facet_drill",
            lambda: eng.facet_path_counts(
                "merge OR sort", under="src3", top_values=10
            ).collect(),
        ),
        3,
    )
    queries["q_join_field"] = round(
        pooled_p50(
            "q_join_field",
            lambda: eng.join_from_query(
                "merge AND batch", "repo", score_mode="max", k=100
            ).collect(),
        ),
        3,
    )
    from codeindex_spark.query.percolate import QueryRegistry, percolate

    _perc_reg = QueryRegistry(
        {
            "t": "merge",
            "a": "merge AND batch",
            "on": "sort OR merge NOT spark",
            "ph": ast.parse_phrase_query("fast sort"),
            "w": "sc*",
            "fz": "spak~1",
        }
    )
    _perc_docs = entrymod._load(spark, sf_dir, "documents")
    queries["op_percolate"] = round(
        pooled_p50(
            "op_percolate",
            lambda: percolate(
                _perc_docs, _perc_reg, id_col="doc_id", text_col="text"
            ).count(),
        ),
        3,
    )

    # ---- phase 3b: trigram substring/regex search (r2) ----
    # separate index: content_trigram is opt-in and must not perturb
    # the round-comparable build_sf_docs key
    from codeindex_spark.index.build import CONTENT_TRIGRAM_FIELDS

    tri_idx = f"{sf_idx}_tri"
    shutil.rmtree(tri_idx, ignore_errors=True)
    trib = IndexBuilder(
        spark,
        tri_idx,
        IndexParams(
            num_buckets=16, block_size=128, fields=CONTENT_TRIGRAM_FIELDS
        ),
        n_groups=1,
    )
    tri_s = pooled_build(lambda: trib.build(sf_docs, resume=False))
    queries["build_sf_trigram"] = round(tri_s, 3)
    tri_eng = SearchEngine(IndexReader(spark, tri_idx))
    queries["q14_substring"] = round(
        pooled_p50("q14_substring",
                   lambda: tri_eng.search_content_substring("ge sor").count()),
        3,
    )
    queries["q15_regex"] = round(
        pooled_p50(
            "q15_regex",
            lambda: tri_eng.search_content_regex(
                r"merge [a-z]+ sort", case_sensitive=False
            ).count(),
        ),
        3,
    )

    # ---- phase 3c: zipfian-vocabulary trigram evidence (r3) ----
    # The sf corpus has a 31-word vocabulary — the trigram WORST case:
    # every gram is hot, so the rarest-gram AND prunes almost nothing
    # and q14/q15 there measure job launch + a near-corpus candidate
    # set. A realistic zipfian vocabulary (5k distinct words, s=1.1)
    # is what actual code/text corpora look like, and there the
    # candidate set is a vanishing fraction of the corpus — the
    # design's claimed scale behavior, evidenced with the candidate
    # counts recorded alongside the runtimes.
    import numpy as np
    import pandas as pd

    zrng = np.random.default_rng(20260817)
    letters = list("abcdefghijklmnopqrstuvwxyz")
    zvocab = list(
        dict.fromkeys(
            "".join(zrng.choice(letters, size=int(zrng.integers(4, 11))))
            for _ in range(5000)
        )
    )
    zranks = np.arange(1, len(zvocab) + 1, dtype=np.float64)
    zprobs = 1.0 / zranks**1.1
    zprobs /= zprobs.sum()
    zvoc_arr = np.array(zvocab)
    n_zipf_docs = 10000
    # topical mixture (r4): each doc draws from its topic's reweighted
    # zipf distribution (6x boost on the topic's rank-stripe slice of
    # the vocabulary). Keeps the global shape zipfian while giving the
    # text ops (LM / DSIR / keywords) a real signal to separate —
    # uniform-vocabulary sf text exercises tie-break paths, not
    # ranking paths.
    N_TOPICS = 4
    topic_probs = []
    for t in range(N_TOPICS):
        p = zprobs.copy()
        p[np.arange(len(zvoc_arr)) % N_TOPICS == t] *= 6.0
        topic_probs.append(p / p.sum())

    def _zipf_gen(batches):
        for pdf in batches:
            texts = []
            for did in pdf["id"]:
                r = np.random.default_rng(7_000_000 + int(did))
                p = topic_probs[int(did) % N_TOPICS]
                words = r.choice(len(zvoc_arr), size=120, p=p)
                texts.append(" ".join(zvoc_arr[words]))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    zipf_pq = "/tmp/bench_corpus_zipf"
    shutil.rmtree(zipf_pq, ignore_errors=True)
    (
        spark.range(n_zipf_docs)
        .repartition(cpus)
        .mapInPandas(_zipf_gen, schema="doc_id long, text string")
        .select(
            F.col("doc_id"),
            F.lit("zipf").alias("repo"),
            F.concat(
                F.lit("zipf/"), F.col("doc_id").cast("string"), F.lit(".txt")
            ).alias("path"),
            F.lit("c000000000000").alias("commit"),
            F.lit("en").alias("lang"),
            F.col("text").alias("content"),
        )
        .write.parquet(zipf_pq)
    )
    zipf_docs = spark.read.parquet(zipf_pq)
    zipf_idx = "/tmp/bench_idx_zipf_tri"
    shutil.rmtree(zipf_idx, ignore_errors=True)
    zb = IndexBuilder(
        spark,
        zipf_idx,
        IndexParams(
            num_buckets=16, block_size=128, fields=CONTENT_TRIGRAM_FIELDS
        ),
        n_groups=1,
    )
    ztri_s = pooled_build(lambda: zb.build(zipf_docs, resume=False))
    queries["build_zipf_trigram"] = round(ztri_s, 3)
    zeng = SearchEngine(IndexReader(spark, zipf_idx))
    # needles from mid-rank vocabulary: present but selective
    zneedle = zvocab[400]
    zregex = rf"{zvocab[120]} [a-z]+ {zvocab[150]}"
    queries["q14z_substring"] = round(
        pooled_p50("q14z_substring",
                   lambda: zeng.search_content_substring(zneedle).count()), 3
    )
    queries["q15z_regex"] = round(
        pooled_p50("q15z_regex",
                   lambda: zeng.search_content_regex(zregex).count()), 3
    )

    def _cand_count(engine, needle):
        c = engine._trigram_candidates("content_trigram", needle.lower())
        if c is None:
            return 0
        if isinstance(c, str):
            return -1  # scan fallback
        return c.count()

    result["trigram_evidence"] = {
        "sf_vocab_words": 31,
        "sf_candidates_q14": _cand_count(tri_eng, "ge sor"),
        "sf_corpus_docs": n_sf_docs,
        "zipf_vocab_words": len(zvocab),
        "zipf_candidates_q14z": _cand_count(zeng, zneedle),
        "zipf_corpus_docs": n_zipf_docs,
        "zipf_matches_q14z": zeng.search_content_substring(zneedle).count(),
    }

    # ---- phase 3d: text ops on the zipfian mixture corpus (r4) ----
    # VERDICT r3 #7: sf text is a uniform 31-word vocabulary, so LM /
    # DSIR / keyword timings there run over degenerate (near-constant)
    # score distributions — tie-break paths, not ranking paths. The
    # topical-zipf corpus (4 topics, 6x slice boost) is the
    # representative measurement; text_evidence below records the
    # score SPREAD each op produces so the numbers provably measure
    # ranking work.
    from codeindex_spark.ops.analysis import top_terms_per_doc
    from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample
    from codeindex_spark.ops.lm import lm_score, lm_train

    ztopic0 = zipf_docs.filter(F.col("doc_id") % 4 == 0)
    queries["op_lmz"] = round(
        p50(
            lambda: lm_score(
                zipf_docs,
                lm_train(ztopic0, text_col="content", n=3, min_count=2),
                text_col="content",
                broadcast_model=True,
            )
            .agg(F.avg("avg_log10_p"), F.sum("n_tokens"))
            .collect()
        ),
        3,
    )
    queries["op_dsirz"] = round(
        p50(
            lambda: dsir_resample(
                dsir_log_weights(
                    zipf_docs, ztopic0, text_col="content", num_buckets=4096
                ),
                100,
            ).collect()
        ),
        3,
    )
    queries["tx_keywordsz"] = round(
        p50(
            lambda: top_terms_per_doc(
                zipf_docs, text_col="content", k=5, min_df=2
            )
            .agg(F.sum("score"), F.count("*"))
            .collect()
        ),
        3,
    )

    # spread evidence (one extra run each, small aggregates only)
    zsc = lm_score(
        zipf_docs,
        lm_train(ztopic0, text_col="content", n=3, min_count=2),
        text_col="content",
        broadcast_model=True,
    ).withColumn("is_t0", F.col("doc_id") % 4 == 0)
    lm_ev = {
        ("topic0" if r["is_t0"] else "rest"): [
            round(v, 4) for v in r["pct"]
        ]
        for r in zsc.groupBy("is_t0")
        .agg(
            F.expr(
                "percentile(avg_log10_p, array(0.1, 0.5, 0.9))"
            ).alias("pct")
        )
        .collect()
    }
    dsir_pct = [
        round(v, 2)
        for v in dsir_log_weights(
            zipf_docs, ztopic0, text_col="content", num_buckets=4096
        )
        .agg(
            F.expr("percentile(log_weight, array(0.1, 0.5, 0.9))")
        )
        .first()[0]
    ]
    kw_spread = (
        top_terms_per_doc(zipf_docs, text_col="content", k=1, min_df=2)
        .agg(
            F.countDistinct("term").alias("distinct_top1"),
            F.expr("percentile(score, array(0.1, 0.5, 0.9))").alias("pct"),
        )
        .first()
    )
    result["text_evidence"] = {
        "note": (
            "zipf mixture: 4 topics, 6x vocab-slice boost; LM trained "
            "on topic0 must rank topic0 docs above the rest, DSIR "
            "log-weights must spread, tf-idf top-1 terms must vary"
        ),
        "lm_avg_log10_p_p10_50_90": lm_ev,
        "dsir_log_weight_p10_50_90": dsir_pct,
        "keywords_distinct_top1_terms": int(kw_spread["distinct_top1"]),
        "keywords_top1_score_p10_50_90": [
            round(v, 3) for v in kw_spread["pct"]
        ],
    }

    # ---- phase 4: pipeline ops ----
    from codeindex_spark.ops.analysis import quality_score
    from codeindex_spark.ops.dedup import minhash_lsh_pairs
    from codeindex_spark.ops.pipeline import (
        chunk_documents,
        sample_by_hash,
        scrub_text,
    )
    from codeindex_spark.ops.similarity import (
        brute_force_cosine_topk,
        margin_knn_align,
    )
    from pyspark.sql import functions as F

    docs_df = entrymod._load(spark, sf_dir, "documents")
    emb = entrymod._load(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    from codeindex_spark.ops.analysis import corpus_profile, repetition_stats
    from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample
    from codeindex_spark.ops.spans import remove_duplicate_spans
    from codeindex_spark.ops.dedup import (
        contamination_overlaps,
        duplicate_components,
    )
    from codeindex_spark.ops.web import normalize_urls, url_dedup_keep

    opset = {
        "op_minhash_lsh": lambda: minhash_lsh_pairs(docs_df).count(),
        "op_ann_cosine": lambda: brute_force_cosine_topk(
            emb, qvec, k=10, exclude_id=0
        ).collect(),
        # r5: margin-based cross-corpus alignment (two grid-blocked
        # exact kNN passes + ratio-margin join)
        "op_margin_align": lambda: margin_knn_align(
            emb.filter(F.col("label") < 5),
            emb.filter(F.col("label") >= 5),
            k=4,
            threshold=1.02,
        ).collect(),
        # aggregates reference every computed column: a bare count()
        # of a pure projection is answered from the scan row count
        # with the expressions pruned away (measured nothing)
        "op_quality": lambda: quality_score(docs_df)
        .agg(F.sum("quality"))
        .collect(),
        "op_scrub": lambda: scrub_text(docs_df)
        .agg(
            F.sum(F.length("text_clean")),
            F.sum("n_urls"),
            F.sum("n_emails"),
            F.sum("n_ips"),
        )
        .collect(),
        "op_chunk": lambda: chunk_documents(docs_df)
        .agg(F.sum(F.length("chunk_text")), F.sum("n_chunk_tokens"))
        .collect(),
        "op_sample": lambda: sample_by_hash(docs_df, 0.25, seed="42").count(),
        "op_repetition": lambda: repetition_stats(docs_df).count(),
        "op_contamination": lambda: contamination_overlaps(
            docs_df, docs_df.filter(F.col("doc_id") % 97 == 0), n=5
        ).count(),
        "op_components": lambda: duplicate_components(
            minhash_lsh_pairs(docs_df)
        ).count(),
        "op_profile": lambda: corpus_profile(docs_df).collect(),
        # the filter touches n_kept_tokens so count() cannot
        # short-circuit the scrub join
        "op_span_scrub": lambda: remove_duplicate_spans(docs_df, window=8)
        .filter(F.col("n_kept_tokens") >= 0)
        .count(),
        # kept/cluster referenced so count() cannot prune the kernel
        "op_semdedup": lambda: __import__(
            "codeindex_spark.ops.similarity", fromlist=["semdedup"]
        )
        .semdedup(emb, dim=64, threshold=0.95, n_centroids=8, sample=256)
        .agg(
            F.sum(F.col("kept").cast("long")),
            F.sum("cluster"),
            F.count("*"),
        )
        .collect(),
        # aggregate references url_norm + url_kept so the projection
        # and the dedup groupBy both run
        "op_url_dedup": lambda: url_dedup_keep(
            normalize_urls(entrymod._url_corpus(spark, sf_dir))
        )
        .agg(
            F.sum(F.length("url_norm")),
            F.sum(F.col("url_kept").cast("long")),
        )
        .collect(),
        # sum over cent_sim + vec_id forces the assignment kernel and
        # the balanced-sample window both to run
        "op_cluster_sample": lambda: __import__(
            "codeindex_spark.ops.cluster", fromlist=["cluster_balanced_sample"]
        )
        .cluster_balanced_sample(entrymod._cluster_assigned(spark, sf_dir), 5)
        .agg(F.sum("cent_sim"), F.sum("vec_id"))
        .collect(),
        # sums over nb_logodds + n_grams force train (two bounded
        # collects) + broadcast-scored held-out quarter end to end
        "op_nb_classifier": lambda: entrymod._q_nb_classifier(spark, sf_dir)
        .agg(F.sum("nb_logodds"), F.sum("n_grams"))
        .collect(),
        # sums reference the matched columns so the window/match
        # kernel cannot be pruned by the action
        "op_asof": lambda: entrymod._q_asof(spark, sf_dir)
        .agg(F.sum("lag_us"), F.sum("c_event"), F.sum("c_value"))
        .collect(),
        "op_pmi": lambda: entrymod._q_pmi(spark, sf_dir)
        .agg(F.sum("pmi"), F.sum("c12"))
        .collect(),
        "op_entropy": lambda: entrymod._q_entropy(spark, sf_dir)
        .agg(F.sum("entropy"), F.sum("n_types"))
        .collect(),
        # sum over n_bpe_tokens forces train (bounded vocab collect)
        # + the vocab-side segmentation kernel + the count join
        "op_bpe": lambda: entrymod._q_bpe_tokens(spark, sf_dir)
        .agg(F.sum("n_bpe_tokens"), F.sum("n_words"))
        .collect(),
        # 5 power iterations over the symmetrized order-part graph;
        # sum(pr) references the rank vector so nothing is pruned
        "op_pagerank": lambda: __import__(
            "codeindex_spark.ops.graph", fromlist=["pagerank"]
        )
        .pagerank(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .selectExpr(
                "concat('o:', l_orderkey) AS src",
                "concat('p:', l_partkey) AS dst",
            )
            .distinct(),
            iters=5,
        )
        .agg(F.sum("pr"), F.count("*"))
        .collect(),
        # agg over freq forces the exact re-count pass (a bare count
        # would still run pass 1 eagerly but could prune pass 2's agg)
        "op_heavy": lambda: __import__(
            "codeindex_spark.ops.sketch", fromlist=["heavy_hitters"]
        )
        .heavy_hitters(docs_df, phi=0.0012, n=2)
        .agg(F.sum("freq"), F.count("*"))
        .collect(),
        # sums reference the quantile columns so the window + final
        # agg cannot be pruned
        "op_quantiles": lambda: __import__(
            "codeindex_spark.ops.analysis", fromlist=["group_quantiles"]
        )
        .group_quantiles(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            "l_returnflag",
            "l_extendedprice",
            (0.25, 0.5, 0.75, 0.9),
        )
        .agg(F.sum("q50"), F.sum("q90"))
        .collect(),
        # est_distinct forces the bottom-k merge + estimator
        "op_kmv": lambda: __import__(
            "codeindex_spark.ops.sketch", fromlist=["kmv_distinct"]
        )
        .kmv_distinct(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            "l_partkey",
            k=256,
            group_col="l_returnflag",
        )
        .agg(F.sum("est_distinct"), F.sum("n_min"))
        .collect(),
        "op_dsir": lambda: dsir_resample(
            dsir_log_weights(
                docs_df,
                docs_df.filter(F.col("lang") == "zh"),
                num_buckets=4096,
            ),
            100,
        ).collect(),
        # full web-graph front end: HTML -> links -> anchor rollup +
        # distinct domain edges (aggs reference the outputs so no
        # stage is pruned)
        "op_linkgraph": lambda: (
            lambda links: (
                __import__(
                    "codeindex_spark.ops.web", fromlist=["anchor_stats"]
                )
                .anchor_stats(links, k=2)
                .agg(F.sum("n_links"), F.count("*"))
                .collect(),
                __import__(
                    "codeindex_spark.ops.web", fromlist=["link_graph"]
                )
                .link_graph(
                    links.withColumn(
                        "src_domain",
                        F.concat(
                            F.lit("src"),
                            (F.col("doc_id") % 53).cast("string"),
                        ),
                    ),
                    src_col="src_domain",
                )
                .count(),
            )
        )(
            __import__(
                "codeindex_spark.ops.web", fromlist=["extract_links"]
            ).extract_links(
                docs_df.select(
                    "doc_id",
                    F.expr(entrymod._HTML_LINKS_DERIVE_SQL).alias("html"),
                )
            )
        ),
    }
    for name, fn in opset.items():
        queries[name] = round(pooled_p50(name, fn), 3)

    # headline total keeps the round-1-comparable set; keys added in
    # later rounds (batch execution, trigram search, pipeline-prep
    # ops) are informational extras so the r01 total stays apples-to-
    # apples across rounds
    EXTRA_KEYS = {
        "q09_term_regexp",
        "q_batch8",
        "build_sf_trigram",
        "q14_substring",
        "q15_regex",
        "build_zipf_trigram",
        "q14z_substring",
        "q15z_regex",
        "op_scrub",
        "op_chunk",
        "op_sample",
        "op_repetition",
        "op_contamination",
        "op_components",
        "op_profile",
        "op_dsir",
        "op_heavy",
        "op_semdedup",
        "op_url_dedup",
        "op_cluster_sample",
        "op_nb_classifier",
        "op_lmz",
        "op_dsirz",
        "tx_keywordsz",
        "op_span_scrub",
        "op_asof",
        "op_pmi",
        "op_entropy",
        "op_bpe",
        "op_pagerank",
        "op_quantiles",
        "op_kmv",
        "op_linkgraph",
        "q_mlt",
        "q_facets",
        "q_suggest",
        "q_suggest_idx",
    }
    total = sum(v for k, v in queries.items() if k not in EXTRA_KEYS)
    result.update(
        {
            "metric": "index build + reference query set + pipeline ops, wall seconds",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "queries_reps": _REPS_USED,
            "bench_protocol": {
                "runs": N_RUNS,
                "build_runs": BUILD_RUNS,
                "target_sample_s": TARGET_S,
                "max_reps": MAX_REPS,
            },
            "n_sf_docs": n_sf_docs,
        }
    )
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
