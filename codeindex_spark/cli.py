"""Command-line entry point — the spark-submit deployment surface
(BASELINE.json north_rule: "ships via spark-submit --py-files to a
multi-executor cluster").

Local:
    python -m codeindex_spark.cli build --input docs.parquet --index /idx
    python -m codeindex_spark.cli search --index /idx --query "get AND string" -k 20
    python -m codeindex_spark.cli hints --index /idx --prefix Luce

Cluster (package first):
    python -m codeindex_spark.cli package --out codeindex_spark.zip
    spark-submit --py-files codeindex_spark.zip tools/submit.py build \
        --input s3://bucket/documents --index s3://bucket/index --groups 256

On a real cluster the session comes from spark-submit's master/conf;
this module only builds one when none exists (local dev).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def _get_spark(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from codeindex_spark.session import get_spark

    return get_spark(app_name="codeindex-cli", cores=args.cores)


def cmd_build(args) -> int:
    from codeindex_spark.index.build import IndexParams
    from codeindex_spark.index.segments import IndexBuilder

    from codeindex_spark.sources import load_documents

    spark = _get_spark(args)
    docs = load_documents(
        spark,
        args.input,
        fmt=args.format,
        snapshot_id=args.snapshot_id,
    )
    if args.with_content_trigram:
        from codeindex_spark.index.build import CONTENT_TRIGRAM_FIELDS

        fields = CONTENT_TRIGRAM_FIELDS
    else:
        from codeindex_spark.index.build import ALL_FIELDS

        fields = ALL_FIELDS
    params = IndexParams(
        num_buckets=args.num_buckets, block_size=args.block_size,
        fields=fields,
    )
    builder = IndexBuilder(spark, args.index, params, n_groups=args.groups)
    records = builder.build(docs, resume=not args.no_resume)
    print(json.dumps({"built_groups": [r["group"] for r in records]}))
    return 0


def cmd_search(args) -> int:
    from codeindex_spark.index.segments import IndexReader
    from codeindex_spark.query import ast
    from codeindex_spark.query.planner import Filters, SearchEngine

    spark = _get_spark(args)
    eng = SearchEngine(IndexReader(spark, args.index))
    q = (
        ast.parse_phrase_query(args.query, args.case_sensitive)
        if args.phrase
        else ast.parse_query(args.query, args.case_sensitive)
    )
    filters = Filters(
        repo=args.repo, lang=args.lang, file_ext=args.ext,
        path_prefix=args.path_prefix,
    )
    if args.collapse:
        out = eng.search_collapse(
            q, args.collapse, k=args.k, per_group=args.per_group,
            filters=filters, case_sensitive=args.case_sensitive,
        )
        for r in out.collect():
            d = r.asDict()
            d["score"] = round(d["score"], 6)
            print(json.dumps(d))
        return 0
    if args.sort_by:
        sort = []
        for part in args.sort_by.split(","):
            fld, _, direction = part.partition(":")
            sort.append((fld.strip(), direction.strip() or "asc"))
        out = eng.search_sorted(
            q, sort, k=args.k, filters=filters,
            case_sensitive=args.case_sensitive,
        )
        for r in out.collect():
            d = r.asDict()
            if "score" in d:
                d["score"] = round(d["score"], 6)
            print(json.dumps(d))
        return 0
    if args.wand and filters.empty:
        top = eng.search_wand(q, k=args.k, case_sensitive=args.case_sensitive)
        rows = top.collect()
        meta = {
            r["doc_id"]: r
            for r in eng.reader.docs.select("doc_id", "repo", "path")
            .join(top.select("doc_id"), "doc_id", "left_semi")
            .collect()
        }
        for r in rows:
            m = meta.get(r["doc_id"])
            print(
                json.dumps(
                    {
                        "doc_id": r["doc_id"],
                        "score": round(r["score"], 6),
                        "repo": m["repo"] if m else None,
                        "path": m["path"] if m else None,
                    }
                )
            )
        return 0
    top = eng.search(
        q, k=args.k, filters=filters, case_sensitive=args.case_sensitive,
        with_docs=True,
    )
    for r in top.collect():
        print(
            json.dumps(
                {
                    "doc_id": r["doc_id"],
                    "score": round(r["score"], 6),
                    "repo": r["repo"],
                    "path": r["path"],
                }
            )
        )
    return 0


def cmd_grep(args) -> int:
    """Substring / regex content search over the trigram index
    (build with --with-content-trigram)."""
    from codeindex_spark.index.segments import IndexReader
    from codeindex_spark.query.planner import Filters, SearchEngine

    spark = _get_spark(args)
    eng = SearchEngine(IndexReader(spark, args.index))
    filters = Filters(
        repo=args.repo, lang=args.lang, file_ext=args.ext,
        path_prefix=args.path_prefix,
    )
    if args.lines:
        from codeindex_spark.query.present import grep_matched_lines

        rows = grep_matched_lines(
            eng, args.pattern, regex=args.regex,
            case_sensitive=args.case_sensitive, filters=filters,
            scan_fallback=not args.no_scan_fallback,
        ).limit(args.limit).collect()
        for r in rows:
            print(
                json.dumps(
                    {
                        "path": r["path"],
                        "line": r["line_number"],
                        "text": r["line_text"],
                    }
                )
            )
        return 0
    if args.regex:
        hits = eng.search_content_regex(
            args.pattern,
            case_sensitive=args.case_sensitive,
            scan_fallback=not args.no_scan_fallback,
            filters=filters,
        )
    else:
        hits = eng.search_content_substring(
            args.pattern,
            filters=filters,
            case_sensitive=args.case_sensitive,
            with_counts=args.counts,
        )
    cols = ["doc_id", "repo", "path"] + (
        ["n_matches"] if args.counts and not args.regex else []
    )
    for r in hits.select(*cols).limit(args.limit).collect():
        print(json.dumps({c: r[c] for c in cols}))
    return 0


def cmd_hints(args) -> int:
    from codeindex_spark.index.segments import IndexReader
    from codeindex_spark.query.planner import SearchEngine

    spark = _get_spark(args)
    eng = SearchEngine(IndexReader(spark, args.index))
    for r in eng.hints(args.prefix, args.case_sensitive, args.k).collect():
        print(r["word"])
    return 0


def cmd_stats(args) -> int:
    """Index inspection (the CheckIndex/segment-info analog): per-field
    dictionary and posting-block counts, corpus stats, on-disk bytes.
    Everything is a small aggregate — no unbounded collect."""
    from codeindex_spark.index.segments import IndexReader

    from pyspark.sql import functions as F

    spark = _get_spark(args)
    rdr = IndexReader(spark, args.index)
    fields = {}
    for r in (
        rdr.term_dict.groupBy("field")
        .agg(F.count("*").alias("n_terms"), F.sum("df").alias("sum_df"))
        .collect()
    ):
        fields[r["field"]] = {
            "n_terms": r["n_terms"],
            "sum_df": int(r["sum_df"]),
        }
    for r in (
        rdr.postings.groupBy("field").agg(F.count("*").alias("n")).collect()
    ):
        fields.setdefault(r["field"], {})["n_posting_blocks"] = r["n"]
    for r in rdr.stats.itertuples():
        fields.setdefault(r.field, {})["avgdl"] = round(float(r.avgdl), 3)

    def du(path):
        # Hadoop FileSystem API, not os.walk: the CLI accepts any
        # Hadoop-resolvable index path (s3a://, hdfs://, ...) and
        # os.walk silently reports 0 bytes for those
        try:
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(str(path))
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            return int(fs.getContentSummary(p).getLength())
        except Exception:
            if os.path.isdir(path):  # local fallback
                return sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _d, files in os.walk(path)
                    for f in files
                )
            return None

    out = {
        "n_docs": rdr.docs.count(),
        "fields": dict(sorted(fields.items())),
        "bytes": {
            "postings": du(rdr.paths.postings),
            "docs": du(rdr.paths.docs),
        },
        "params": rdr.params.to_dict(),
    }
    print(json.dumps(out, indent=2))
    return 0


def cmd_dedup(args) -> int:
    """Full dedup verdict over a documents table: exact collapse ->
    MinHash-LSH over representatives -> connected components -> one
    keeper per merged cluster. Writes (doc_id, component, keep)
    parquet with --out; always prints a JSON summary."""
    from codeindex_spark.ops.dedup import near_dedup_keep_list

    from pyspark.sql import functions as F

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    verdict = near_dedup_keep_list(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        hot_bucket_cap=args.hot_bucket_cap,
    )
    if args.out:
        verdict.write.mode("overwrite").parquet(args.out)
        verdict = spark.read.parquet(args.out)
    row = verdict.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.countDistinct("component").alias("n_components"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "n_docs": row["n_docs"],
                "n_keep": int(row["n_keep"]),
                "n_dropped": row["n_docs"] - int(row["n_keep"]),
                "n_components": row["n_components"],
                "out": args.out,
            }
        )
    )
    return 0


def cmd_spans(args) -> int:
    """Exact substring span dedup (Lee et al. 2022 semantics):
    either report per-doc duplicated-span stats, or scrub the
    non-canonical duplicated windows out of the text (--scrub)."""
    from pyspark.sql import functions as F

    from codeindex_spark.ops.spans import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    kw = dict(
        id_col=args.id_col, text_col=args.text_col, window=args.window
    )
    if args.scrub:
        out = remove_duplicate_spans(docs, **kw)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        row = out.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("toks_in"),
            F.sum("n_kept_tokens").alias("toks_out"),
            # emptied BY the scrub: docs that had tokens and lost all
            # of them (not docs that arrived empty)
            F.sum(
                (
                    (F.col("n_kept_tokens") == 0) & (F.col("n_tokens") > 0)
                ).cast("long")
            ).alias("n_emptied"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "n_docs": row["n_docs"],
                    "tokens_in": int(row["toks_in"] or 0),
                    "tokens_kept": int(row["toks_out"] or 0),
                    "docs_emptied": int(row["n_emptied"] or 0),
                    "out": args.out,
                }
            )
        )
    else:
        out = duplicate_span_stats(docs, **kw)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        row = out.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_dup_windows").alias("nd"),
            F.round(F.avg("dup_token_fraction"), 6).alias("avg_frac"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "n_docs": row["n_docs"],
                    "n_dup_windows": int(row["nd"] or 0),
                    "avg_dup_token_fraction": float(row["avg_frac"] or 0),
                    "out": args.out,
                }
            )
        )
    return 0


def cmd_mlt(args) -> int:
    """More-like-this: rank documents similar to one stored doc
    (Lucene MoreLikeThis analog). Source picked by --doc-key, or by
    --path (+ --repo when the path exists in several repos)."""
    from pyspark.sql import functions as F

    from codeindex_spark.index.segments import IndexReader
    from codeindex_spark.query.planner import SearchEngine

    spark = _get_spark(args)
    eng = SearchEngine(IndexReader(spark, args.index))
    key = args.doc_key
    if key is None:
        if not args.path:
            print(json.dumps({"error": "pass --doc-key or --path"}))
            return 2
        d = eng.reader.docs.filter(F.col("path") == args.path)
        if args.repo:
            d = d.filter(F.col("repo") == args.repo)
        rows = d.select("doc_key").limit(2).collect()
        if not rows:
            print(json.dumps({"error": "no document matches --path/--repo"}))
            return 1
        if len(rows) > 1:
            print(json.dumps({"error": "ambiguous --path; add --repo"}))
            return 2
        key = rows[0]["doc_key"]
    top = eng.more_like_this(
        key,
        k=args.k,
        max_query_terms=args.max_terms,
        min_term_freq=args.min_tf,
        min_doc_freq=args.min_df,
    )
    meta = eng.reader.docs.select("doc_id", "repo", "path")
    out = top.join(meta, "doc_id").orderBy(F.desc("score"), F.asc("doc_id"))
    for r in out.collect():
        print(
            json.dumps(
                {
                    "doc_id": r["doc_id"],
                    "score": round(r["score"], 6),
                    "repo": r["repo"],
                    "path": r["path"],
                }
            )
        )
    return 0


def cmd_select(args) -> int:
    """DSIR data selection: weight --input docs by hashed-n-gram
    importance against the --target corpus, Gumbel-top-k resample.
    Writes the selected (id, n_grams, log_weight) parquet with --out;
    always prints a JSON summary."""
    from pyspark.sql import functions as F

    from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample

    spark = _get_spark(args)
    raw = spark.read.parquet(args.input)
    target = spark.read.parquet(args.target)
    w = dsir_log_weights(
        raw,
        target,
        id_col=args.id_col,
        text_col=args.text_col,
        n=args.n,
        num_buckets=args.buckets,
    )
    picked = dsir_resample(
        w, args.k, id_col=args.id_col, seed=args.seed,
        temperature=args.temperature,
    )
    if args.out:
        picked.write.mode("overwrite").parquet(args.out)
        picked = spark.read.parquet(args.out)
    row = picked.agg(
        F.count("*").alias("n"),
        F.avg("log_weight").alias("avg_w"),
        F.min("log_weight").alias("min_w"),
        F.max("log_weight").alias("max_w"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "n_selected": row["n"],
                "avg_log_weight": (
                    round(float(row["avg_w"]), 6)
                    if row["avg_w"] is not None
                    else None
                ),
                "min_log_weight": (
                    round(float(row["min_w"]), 6)
                    if row["min_w"] is not None
                    else None
                ),
                "max_log_weight": (
                    round(float(row["max_w"]), 6)
                    if row["max_w"] is not None
                    else None
                ),
                "out": args.out,
            }
        )
    )
    return 0


def cmd_topterms(args) -> int:
    """HighFreqTerms: top-n dictionary terms of a field by df."""
    from codeindex_spark.index.segments import IndexReader
    from codeindex_spark.query.planner import SearchEngine

    spark = _get_spark(args)
    eng = SearchEngine(IndexReader(spark, args.index))
    for r in eng.top_terms(args.field, n=args.n).collect():
        print(
            json.dumps(
                {"term": r["term"], "df": int(r["df"]), "cf": int(r["cf"])}
            )
        )
    return 0


def cmd_percolate(args) -> int:
    """Reverse search: match every doc in --input against the
    registered queries (a JSON file {query_id: query_string}); prints
    (id, query_id) pairs, optionally capped with --limit."""
    from codeindex_spark.query.percolate import QueryRegistry, percolate

    with open(args.queries) as f:
        registry = QueryRegistry(
            json.load(f), case_sensitive=args.case_sensitive
        )
    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    out = percolate(
        docs,
        registry,
        id_col=args.id_col,
        text_col=args.text_col,
        path_col=args.path_col,
    )
    rows = out.limit(args.limit).collect() if args.limit else out.collect()
    for r in rows:
        print(json.dumps({args.id_col: r[args.id_col],
                          "query_id": r["query_id"]}))
    return 0


def cmd_package(args) -> int:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(args.out, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    print(args.out)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="codeindex_spark")
    ap.add_argument("--cores", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument(
        "--format",
        choices=["parquet", "table", "iceberg"],
        default=None,
        help="input source kind (default: infer — paths scan parquet, "
        "identifiers read through the session catalog)",
    )
    b.add_argument(
        "--snapshot-id",
        type=int,
        default=None,
        help="pin an Iceberg snapshot (needs iceberg-spark-runtime)",
    )
    b.add_argument(
        "--num-buckets",
        type=int,
        default=None,
        help="docID buckets; default scales with cluster parallelism",
    )
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--groups", type=int, default=4)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument(
        "--with-content-trigram",
        action="store_true",
        help="index content char trigrams (enables the grep command)",
    )
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="top-k BM25 search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--phrase", action="store_true")
    s.add_argument("--case-sensitive", action="store_true")
    s.add_argument("--wand", action="store_true")
    s.add_argument("--repo")
    s.add_argument("--lang")
    s.add_argument("--ext")
    s.add_argument("--path-prefix")
    s.add_argument(
        "--collapse",
        metavar="FIELD",
        help="field collapse: best --per-group hits per value of a "
        "stored field (repo/lang/file_ext)",
    )
    s.add_argument("--per-group", type=int, default=1)
    s.add_argument(
        "--sort-by",
        metavar="F[:asc|desc],...",
        help="order the match set by stored fields instead of "
        "relevance (Lucene Sort); 'score' is accepted as a field",
    )
    s.set_defaults(fn=cmd_search)

    g = sub.add_parser(
        "grep", help="substring/regex content search (trigram index)"
    )
    g.add_argument("--index", required=True)
    g.add_argument("--pattern", required=True)
    g.add_argument("--regex", action="store_true")
    g.add_argument("--case-sensitive", action="store_true")
    g.add_argument(
        "--no-scan-fallback",
        action="store_true",
        help="error instead of full scan when the regex has no "
        "required literal",
    )
    g.add_argument("--limit", type=int, default=100)
    g.add_argument(
        "--lines",
        action="store_true",
        help="print matched lines (path, line number, text)",
    )
    g.add_argument(
        "--counts",
        action="store_true",
        help="substring mode: add n_matches, order by it descending",
    )
    g.add_argument("--repo")
    g.add_argument("--lang")
    g.add_argument("--ext")
    g.add_argument("--path-prefix")
    g.set_defaults(fn=cmd_grep)

    h = sub.add_parser("hints", help="autocomplete hint words")
    h.add_argument("--index", required=True)
    h.add_argument("--prefix", required=True)
    h.add_argument("-k", type=int, default=20)
    h.add_argument("--case-sensitive", action="store_true")
    h.set_defaults(fn=cmd_hints)

    st = sub.add_parser("stats", help="index inspection (CheckIndex analog)")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    d = sub.add_parser(
        "dedup",
        help="exact+near dedup verdict (keep list) over a documents "
        "parquet",
    )
    d.add_argument("--input", required=True)
    d.add_argument("--out", help="write (doc_id, component, keep) parquet")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument(
        "--hot-bucket-cap",
        type=int,
        default=None,
        help="drop LSH band buckets larger than this (near-identical "
        "flood backstop)",
    )
    d.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser(
        "spans",
        help="exact substring span dedup: stats or --scrub removal",
    )
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", help="write result parquet")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument(
        "--window",
        type=int,
        default=50,
        help="token threshold: repeats >= this many tokens dedup",
    )
    sp.add_argument(
        "--scrub",
        action="store_true",
        help="emit scrubbed text instead of per-doc stats",
    )
    sp.set_defaults(fn=cmd_spans)

    m = sub.add_parser(
        "mlt", help="more-like-this: docs similar to a stored doc"
    )
    m.add_argument("--index", required=True)
    m.add_argument("--doc-key", help="source doc primary key")
    m.add_argument("--path", help="source doc path (alternative to --doc-key)")
    m.add_argument("--repo", help="disambiguate --path across repos")
    m.add_argument("-k", type=int, default=10)
    m.add_argument("--max-terms", type=int, default=25)
    m.add_argument("--min-tf", type=int, default=2)
    m.add_argument("--min-df", type=int, default=5)
    m.set_defaults(fn=cmd_mlt)

    se = sub.add_parser(
        "select",
        help="DSIR importance resampling of --input toward --target",
    )
    se.add_argument("--input", required=True)
    se.add_argument("--target", required=True)
    se.add_argument("-k", type=int, required=True)
    se.add_argument("--out", help="write selected rows parquet")
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--text-col", default="text")
    se.add_argument("--n", type=int, default=2, help="max n-gram order")
    se.add_argument("--buckets", type=int, default=10_000)
    se.add_argument("--seed", default="dsir")
    se.add_argument("--temperature", type=float, default=1.0)
    se.set_defaults(fn=cmd_select)

    tt = sub.add_parser(
        "topterms", help="top dictionary terms by df (HighFreqTerms)"
    )
    tt.add_argument("--index", required=True)
    tt.add_argument("--field", default="content")
    tt.add_argument("-n", type=int, default=50)
    tt.set_defaults(fn=cmd_topterms)

    pc = sub.add_parser(
        "percolate",
        help="reverse search: match docs against registered queries",
    )
    pc.add_argument("--input", required=True, help="docs parquet")
    pc.add_argument(
        "--queries", required=True,
        help="JSON file {query_id: query_string}",
    )
    pc.add_argument("--id-col", default="doc_id")
    pc.add_argument("--text-col", default="content")
    pc.add_argument("--path-col")
    pc.add_argument("--case-sensitive", action="store_true")
    pc.add_argument("--limit", type=int, default=0)
    pc.set_defaults(fn=cmd_percolate)

    p = sub.add_parser("package", help="zip the package for --py-files")
    p.add_argument("--out", default="codeindex_spark.zip")
    p.set_defaults(fn=cmd_package)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
