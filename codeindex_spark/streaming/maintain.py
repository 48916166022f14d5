"""Incremental index maintenance — the reference's watcher/maintainer
loop (SURVEY.md §2.9 ST1-ST6) re-expressed as snapshot deltas.

The reference mutates a live Lucene index in place under locks
(/root/reference/src/CodeIndex.MaintainIndex/IndexMaintainer.cs:140-181,
/root/reference/src/CodeIndex.IndexBuilder/CodeIndexBuilder.cs:266-468).
The Spark-native equivalent is Lucene's *segment* model made explicit:

- the base index is immutable;
- each applied change-set becomes a **delta segment** — a complete
  mini-index whose docID space stacks above all prior segments
  (block-aligned, so block algebra still works across segments);
- replaced/deleted docs become **tombstones** (doc_key rows);
  query-time scoring anti-joins them out;
- corpus statistics (N, avgdl, df) are merged across segments and —
  exactly like Lucene before a merge — still count tombstoned docs
  until ``compact()`` rebuilds a fresh base.

ST-operator mapping:
  ST1 source     -> any change-event DataFrame / readStream source
  ST2 debounce   -> micro-batch boundaries (foreachBatch)
  ST3 compaction -> compact_events (rename-back => Changed,
                    delete+create => Changed, keep-last dedup;
                    /root/reference/src/CodeIndex.Files/FileChangesPreProcessing.cs:11-110)
  ST4 retry      -> Spark task retry + resumable builds
  ST5 upserts    -> IncrementalIndex.apply_snapshot / apply_changes
  ST6 reconcile  -> reconcile(): full-outer join indexed vs snapshot
                    on (repo, path) comparing content sha256
                    (IndexMaintainer.InitializeIndexCore,
                    IndexMaintainer.cs:272-369)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codeindex_spark.index.build import (
    CONTENT_FIELDS,
    IndexParams,
    default_num_buckets,
    prepare_docs,
)
from codeindex_spark.index.segments import (
    IndexBuilder,
    IndexPaths,
    IndexReader,
    _atomic_write_json,
)

CHANGE_TYPES = ("Created", "Changed", "Deleted", "Renamed")

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("old_path", T.StringType(), True),
        T.StructField("change_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


# ------------------------------------------------------------------ ST3

def compact_events(events: DataFrame) -> DataFrame:
    """Event-queue compaction (FileChangesPreProcessing.cs:11-110
    semantics, three passes in reference order):

    1. RemoveTemplateChanges (:24-58): for each Renamed, the first
       LATER Renamed whose new path equals this one's old path is
       removed, and this one becomes Changed(old_path).
    2. RemoveTemplateDeletedChanges (:60-84): per path, a Deleted
       followed (anywhere later) by a Created drops the Deleted and
       turns that Created into Changed.
    3. RemoveDuplicatedChanges (:86-105): per (path, old_path, type),
       keep the LAST of exact duplicates.

    Pass 1's link is CROSS-PATH (Renamed A->B then C->A), so it
    cannot run inside a per-path group — but the reference's
    sequential loop is order-isomorphic to a DECLARATIVE matching on
    the original queue: a conversion at queue position i never
    changes any row at j > i (conversions only touch the row being
    processed, and drops don't change types), so every Renamed r
    independently matches the first strictly-later Renamed u — queue
    order = (ts, path, old_path) lexicographic, the same total order
    the driver loop sorted by — with u.path == r.old_path. Matched r
    converts to Changed(r.old_path); each distinct matched u loses
    exactly one copy (every matcher picks the same first copy). That
    is one keyed equi-join on (old_path = path) + a min-struct agg —
    fully distributed, no driver pull, no rename-count cap (a
    repo-root move with millions of renames is just a join).
    Identical surviving duplicates collapse to one row here; pass 3
    (keep-last of exact duplicates) makes that a no-op downstream.

    Passes 2-3 run distributed in a grouped pandas kernel (per-path
    groups are tiny).
    """
    renames = events.filter(F.col("change_type") == "Renamed")
    ren = renames.groupBy("ts", "path", "old_path").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    key = F.struct("ts", "path", "old_path")
    u_side = ren.select(
        F.col("path").alias("u_path"), key.alias("u_key")
    )
    ch_side = ren.select("ts", "path", "old_path", "cnt", key.alias("ch_key"))
    matches = (
        ch_side.join(
            u_side,
            (F.col("u_path") == F.col("old_path"))
            & (F.col("u_key") > F.col("ch_key")),
        )
        .groupBy("ch_key")
        .agg(F.min("u_key").alias("mu"))
    )
    converted = matches.select("ch_key", F.lit(True).alias("has_match"))
    dropped_u = (
        matches.select(F.col("mu").alias("ch_key"))
        .distinct()
        .withColumn("was_dropped", F.lit(True))
    )
    # degenerate self-renames (path == old_path): strict > on equal
    # keys cannot see copy-to-copy matches, so mirror the reference
    # loop's chain behavior explicitly. Duplicated self-renames
    # chain-drop each other: copy_i matches (and drops) copy_{i+1},
    # so unmatched-from-outside groups keep exactly ONE survivor
    # (Changed when cnt > 1), while a group some OTHER rename matched
    # loses its head copy too — the chain then kills every copy.
    self_ren = F.col("path") == F.col("old_path")
    dropped = F.coalesce("was_dropped", F.lit(False))
    resolved = (
        ch_side.join(converted, "ch_key", "left")
        .join(dropped_u, "ch_key", "left")
        .withColumn(
            "conv",
            F.coalesce("has_match", F.lit(False))
            | (self_ren & (F.col("cnt") > 1)),
        )
        .withColumn(
            "eff",
            F.when(self_ren & dropped, F.lit(0))
            .when(self_ren, F.lit(1))
            .otherwise(
                F.col("cnt") - F.when(dropped, 1).otherwise(0)
            ),
        )
        .filter(F.col("eff") > 0)
    )
    survived = resolved.select(
        F.when(F.col("conv"), F.col("old_path"))
        .otherwise(F.col("path"))
        .alias("path"),
        F.when(F.col("conv"), F.lit(None).cast("string"))
        .otherwise(F.col("old_path"))
        .alias("old_path"),
        F.when(F.col("conv"), F.lit("Changed"))
        .otherwise(F.lit("Renamed"))
        .alias("change_type"),
        "ts",
    )
    adj = events.filter(F.col("change_type") != "Renamed").unionByName(
        survived
    )

    def compact(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # ts is the queue order; break exact-ts ties deterministically
        # (shuffle order is arbitrary) on (change_type, old_path)
        recs = pdf.sort_values(
            ["ts", "change_type", "old_path"],
            kind="mergesort",
            na_position="first",
        ).to_dict("records")
        for r in recs:  # null old_path may arrive as NaN; NaN != NaN
            if pd.isna(r["old_path"]):
                r["old_path"] = None
        alive = [True] * len(recs)
        # pass 2: Deleted -> first later Created => keep Created as Changed
        for i, ev in enumerate(recs):
            if not alive[i] or ev["change_type"] != "Deleted":
                continue
            for j in range(i + 1, len(recs)):
                if alive[j] and recs[j]["change_type"] == "Created":
                    alive[i] = False
                    recs[j]["change_type"] = "Changed"
                    break
        # pass 3: exact duplicates (type, path, old_path) keep the last
        for i, ev in enumerate(recs):
            if not alive[i]:
                continue
            for j in range(i + 1, len(recs)):
                u = recs[j]
                if (
                    u["change_type"] == ev["change_type"]
                    and u["old_path"] == ev["old_path"]
                ):
                    alive[i] = False
                    break
        final = [r for i, r in enumerate(recs) if alive[i]]
        return pd.DataFrame(
            final, columns=["path", "old_path", "change_type", "ts"]
        )

    return adj.groupBy("path").applyInPandas(compact, schema=EVENT_SCHEMA)


# ------------------------------------------------------------------ ST6

def reconcile(indexed: DataFrame, snapshot: DataFrame) -> DataFrame:
    """Full-outer join of what's indexed vs the current snapshot on
    (repo, path); classify add / update / delete / unchanged.

    indexed:  (repo, path, doc_key, content_sha256)
    snapshot: (repo, path, commit, lang, content) — raw input shape
    Returns (repo, path, action, old_doc_key) plus snapshot columns
    for add/update rows.
    """
    snap = prepare_docs(snapshot).select(
        "repo", "path", "commit", "lang", "content",
        F.col("content_sha256").alias("new_sha"),
    )
    idx = indexed.select(
        "repo", "path",
        F.col("doc_key").alias("old_doc_key"),
        F.col("content_sha256").alias("old_sha"),
    )
    j = snap.join(idx, ["repo", "path"], "full_outer")
    return j.withColumn(
        "action",
        F.when(F.col("old_sha").isNull(), F.lit("add"))
        .when(F.col("new_sha").isNull(), F.lit("delete"))
        .when(F.col("new_sha") != F.col("old_sha"), F.lit("update"))
        .otherwise(F.lit("unchanged")),
    )


# ------------------------------------------------------ delta segments


def _exact_live_sums(seg_stats, dead_row: dict, needed: tuple) -> dict | None:
    """merge_compact's exact-stats reconstruction: live token sums =
    Σ per-segment stats totals − the dead docs' token counts, for the
    ``needed`` source columns only. Returns None when the stats shape
    predates total_dl or any reconstructed value is negative (the
    caller then falls back to re-tokenizing the live corpus)."""
    if "total_dl" not in seg_stats.columns:
        return None
    totals = seg_stats.groupby("field").agg(
        n_docs=("n_docs", "sum"), total_dl=("total_dl", "sum")
    )
    n_all = int(totals["n_docs"].iloc[0])
    sums = {"n_docs": n_all - int(dead_row["n_docs"] or 0)}
    for c in needed:
        tot = int(totals.loc[c, "total_dl"]) if c in totals.index else 0
        sums[f"sum_{c}"] = tot - int(dead_row.get(f"sum_{c}") or 0)
    if any(v < 0 for v in sums.values()):
        return None
    return sums


class IncrementalIndex:
    """Segment-stacked incremental index with tombstones.

    Layout under root/:
        base/                — full IndexBuilder layout
        deltas/d0001/ ...    — delta segments (same layout)
        tombstones.parquet   — doc_key rows excluded at query time,
                               epoch-tagged (the apply ordinal)
        merged/term_dict.parquet, merged/stats.parquet
        _segments.json       — ordered segment list + doc-space ends
                               + epochs + the n_applies counter

    Epochs give Iceberg-style snapshot time travel: ``reader(as_of=k)``
    serves queries against the exact state after the k-th apply
    (segments with epoch <= k, tombstones/removed-words with epoch
    <= k, prefix-merged stats/dictionary). compact()/merge_compact()
    expire history, like Iceberg's expire_snapshots.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        params: IndexParams = IndexParams(),
        n_groups: int = 1,
    ):
        stored = os.path.join(root, "base", "params.json")
        stored_d = json.load(open(stored)) if os.path.exists(stored) else None
        if params.num_buckets is None:
            # same resolution rule as IndexBuilder: adopt the bucket
            # count pinned by an existing base segment (docIDs depend
            # on it), else the scale-adaptive default — resolved HERE
            # so every delta segment inherits one consistent value
            if stored_d is not None:
                nb = stored_d["num_buckets"]
            else:
                nb = default_num_buckets(spark, n_groups)
            params = dataclasses.replace(params, num_buckets=nb)
        if stored_d is not None:
            # the posting codec is likewise pinned by the base segment
            # (every segment's byte streams must decode the same way);
            # a default-params reopen must never mix codecs
            params = dataclasses.replace(
                params, codec=stored_d.get("codec", "varint")
            )
        self.spark = spark
        self.root = root
        self.params = params
        self.n_groups = n_groups
        os.makedirs(root, exist_ok=True)

    # ---------- state ----------

    @property
    def _seg_file(self) -> str:
        return os.path.join(self.root, "_segments.json")

    @property
    def _tomb_dir(self) -> str:
        return os.path.join(self.root, "tombstones.parquet")

    @property
    def _removed_words_dir(self) -> str:
        return os.path.join(self.root, "removed_words.parquet")

    def segments(self) -> list[dict]:
        if not os.path.exists(self._seg_file):
            return []
        return json.load(open(self._seg_file))["segments"]

    def n_applies(self) -> int:
        """Snapshot epoch counter: 0 after build_base, +1 per
        apply_changes/apply_snapshot. Older _segments.json without
        the key falls back to segment count (each apply added one)."""
        if not os.path.exists(self._seg_file):
            return 0
        meta = json.load(open(self._seg_file))
        if "n_applies" in meta:
            return int(meta["n_applies"])
        return max(0, len(meta["segments"]) - 1)

    def _write_segments(
        self, segs: list[dict], n_applies: int | None = None
    ) -> None:
        if n_applies is None:
            n_applies = self.n_applies()
        tmp = self._seg_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"segments": segs, "n_applies": n_applies}, f, indent=1)
        os.replace(tmp, self._seg_file)

    def _segs_as_of(self, as_of: int | None) -> list[dict]:
        segs = self.segments()
        if as_of is None:
            return segs
        if as_of < 0:
            raise ValueError("as_of must be >= 0")
        # legacy records without an epoch: position == apply ordinal
        return [
            s for i, s in enumerate(segs) if s.get("epoch", i) <= as_of
        ]

    # ---------- build ----------

    def build_base(self, docs_raw: DataFrame) -> None:
        base_dir = os.path.join(self.root, "base")
        IndexBuilder(self.spark, base_dir, self.params, self.n_groups).build(
            docs_raw, resume=False
        )
        end_doc = self._segment_end(base_dir)
        self._write_segments(
            [{"name": "base", "dir": base_dir, "end_doc": end_doc, "epoch": 0}],
            n_applies=0,
        )
        self._merge_metadata()

    def _segment_end(self, seg_dir: str) -> int:
        offsets = pd.read_parquet(IndexPaths(seg_dir).offsets)
        last = offsets.iloc[-1]
        end = int(last["base"]) + int(last["n_docs"])
        bsz = self.params.block_size
        return -(-end // bsz) * bsz  # round up to block boundary

    def apply_snapshot(self, snapshot: DataFrame) -> dict:
        """ST6+ST5: reconcile the new snapshot against live docs, then
        upsert via a delta segment + tombstones."""
        live = self.live_docs().select(
            "repo", "path", "doc_key", "content_sha256"
        )
        rec = reconcile(live, snapshot).cache()
        # doc identity is (repo, path, commit): an update MUST carry a
        # new commit, else its doc_key collides with the tombstoned old
        # version and the new row would be filtered out too
        stale = (
            rec.filter(F.col("action") == "update")
            .withColumn(
                "new_doc_key",
                F.sha2(
                    F.concat_ws(
                        "\x1f", F.col("repo"), F.col("path"), F.col("commit")
                    ),
                    256,
                ),
            )
            .filter(F.col("new_doc_key") == F.col("old_doc_key"))
            .count()
        )
        if stale:
            raise ValueError(
                f"{stale} updated rows kept their commit unchanged; "
                "updates must carry a new commit (doc identity is "
                "(repo, path, commit))"
            )
        changed = rec.filter(F.col("action").isin("add", "update")).select(
            "repo", "path", "commit", "lang", "content"
        )
        dead_keys = rec.filter(F.col("action").isin("update", "delete")).select(
            F.col("old_doc_key").alias("doc_key")
        )
        counts = {
            r["action"]: r["count"]
            for r in rec.groupBy("action").count().collect()
        }
        self.apply_changes(changed, dead_keys)
        rec.unpersist()
        return counts

    def apply_changes(
        self, new_docs: DataFrame, dead_doc_keys: DataFrame | None
    ) -> None:
        segs = self.segments()
        if not segs:
            raise RuntimeError("build_base first")
        epoch = self.n_applies() + 1
        n_new = new_docs.count()
        if dead_doc_keys is not None:
            dead = dead_doc_keys.distinct()
            if os.path.exists(self._tomb_dir):
                # idempotence: never double-tombstone (would also
                # double-count removed hint words)
                dead = dead.join(
                    self.spark.read.parquet(self._tomb_dir),
                    "doc_key",
                    "left_anti",
                )
            # truncate lineage before appending to the same path we
            # just read from
            dead = dead.localCheckpoint()
            if dead.count():
                self._record_removed_words(dead, epoch)
                dead.withColumn("epoch", F.lit(epoch)).write.mode(
                    "append"
                ).parquet(self._tomb_dir)
        if n_new:
            idx = len(segs)
            seg_dir = os.path.join(self.root, "deltas", f"d{idx:04d}")
            params = IndexParams(
                **{
                    **self.params.to_dict(),
                    "fields": tuple(self.params.fields),
                    "base_doc_id": segs[-1]["end_doc"],
                }
            )
            IndexBuilder(self.spark, seg_dir, params, self.n_groups).build(
                new_docs, resume=False
            )
            segs.append(
                {
                    "name": f"d{idx:04d}",
                    "dir": seg_dir,
                    "end_doc": self._segment_end(seg_dir),
                    "epoch": epoch,
                }
            )
        self._write_segments(segs, n_applies=epoch)
        self._merge_metadata()

    def _record_removed_words(
        self, dead_keys: DataFrame, epoch: int
    ) -> None:
        """Incremental hint-word maintenance (reference deletes a hint
        word when its last live doc goes away — the Exists-before-
        delete semi-join, CodeIndexBuilder.cs:369-375,446-452).
        Tokenizes ONLY the docs being tombstoned (bounded by the
        change batch, never the corpus) and appends their per-word
        doc counts; hints() subtracts these from the merged
        dictionary's df, so a word with no live doc stops serving as
        a hint immediately instead of waiting for compact()."""
        from codeindex_spark.index.build import token_rows

        dead_docs = self.all_docs().join(dead_keys, "doc_key", "left_semi")
        words = (
            token_rows(dead_docs, fields=("content_cs",))
            .filter((F.length("term") >= 4) & (F.length("term") <= 199))
            .groupBy(F.col("term").alias("word"))
            .agg(F.count("*").alias("removed"))
        )
        words.withColumn("epoch", F.lit(epoch)).write.mode("append").parquet(
            self._removed_words_dir
        )

    # ---------- merged metadata ----------

    def _merge_metadata(self) -> None:
        merged = os.path.join(self.root, "merged")
        os.makedirs(merged, exist_ok=True)
        segs = self.segments()
        tds = [
            self.spark.read.parquet(IndexPaths(s["dir"]).term_dict)
            for s in segs
        ]
        td = tds[0]
        for t in tds[1:]:
            td = td.unionByName(t)
        td = td.groupBy("field", "term").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        )
        td.write.mode("overwrite").partitionBy("field").parquet(
            os.path.join(merged, "term_dict.parquet")
        )
        stats = pd.concat(
            [pd.read_parquet(IndexPaths(s["dir"]).stats) for s in segs]
        )
        g = stats.groupby("field", as_index=False).agg(
            n_docs=("n_docs", "sum"), total_dl=("total_dl", "sum")
        )
        g["avgdl"] = g["total_dl"] / g["n_docs"]
        g.to_parquet(os.path.join(merged, "stats.parquet"), index=False)

    # ---------- read ----------

    def live_docs(self, as_of: int | None = None) -> DataFrame:
        docs = self.all_docs(as_of)
        if os.path.exists(self._tomb_dir):
            tomb = self.spark.read.parquet(self._tomb_dir)
            if as_of is not None and "epoch" in tomb.columns:
                tomb = tomb.filter(F.col("epoch") <= as_of)
            docs = docs.join(tomb, "doc_key", "left_anti")
        return docs

    def all_docs(self, as_of: int | None = None) -> DataFrame:
        segs = self._segs_as_of(as_of)
        dfs = [self.spark.read.parquet(IndexPaths(s["dir"]).docs) for s in segs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def reader(self, as_of: int | None = None) -> "MultiReader":
        """``as_of=k`` reads the index exactly as it stood after the
        k-th apply (0 = just the base build) — Iceberg-style snapshot
        time travel over the segment/tombstone log. compact() and
        merge_compact() expire history: afterwards only the current
        state (epoch 0 again) is addressable."""
        return MultiReader(self, as_of)

    # ---------- compaction ----------

    def compact(self) -> None:
        """Merge all segments + tombstones into a fresh base (the
        Lucene force-merge analog). Afterwards stats/df are exact."""
        import shutil

        live = self.live_docs().select(
            "repo", "path", "commit", "lang", "content"
        )
        tmp_dir = os.path.join(self.root, "base_new")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        IndexBuilder(self.spark, tmp_dir, self.params, self.n_groups).build(
            live, resume=False
        )
        # atomic-ish swap
        old_base = os.path.join(self.root, "base")
        shutil.rmtree(old_base, ignore_errors=True)
        os.replace(tmp_dir, old_base)
        shutil.rmtree(os.path.join(self.root, "deltas"), ignore_errors=True)
        shutil.rmtree(self._tomb_dir, ignore_errors=True)
        shutil.rmtree(self._removed_words_dir, ignore_errors=True)
        self._write_segments(
            [
                {
                    "name": "base",
                    "dir": old_base,
                    "end_doc": self._segment_end(old_base),
                    "epoch": 0,
                }
            ],
            n_applies=0,  # history expired — snapshots restart at 0
        )
        self._merge_metadata()


    def merge_compact(self) -> None:
        """Postings-level compaction: drop tombstoned docs from the
        stacked posting blocks by decode-filter-reencode — WITHOUT
        re-tokenizing the corpus (the Lucene segment-merge analog:
        segments rewrite, content is never re-analyzed). At 100 TB the
        tokenize + (field, term, block) shuffle dominates a rebuild;
        this pass touches only the posting bytes plus one JVM-side
        token-COUNT pass over live docs for exact stats.

        Differences vs compact(): live doc_ids are PRESERVED (the doc
        space keeps holes where dead docs were), so the result is not
        byte-identical to a fresh build — but BM25 stats, df/cf, and
        block-max metadata are recomputed exactly, so scores match a
        fresh build per document.

        Scale shape: dead ids are grouped per doc-block (<= block_size
        ids per group) and JOINED to posting rows on block_id — no
        driver-side dead-id set, no broadcast of unbounded state."""
        import shutil

        from codeindex_spark.index import encoding
        from codeindex_spark.index.build import (
            POSTING_SCHEMA,
            _stats_from_sums,
            _tok_count_cols,
            hints_from_term_dict,
            term_dict_from_postings,
        )

        spark = self.spark
        segs = self.segments()
        if not segs:
            raise RuntimeError("build_base first")
        bsz = self.params.block_size
        k1, b_ = self.params.k1, self.params.b
        codec = self.params.codec

        live = self.live_docs()
        dead_docs = self.all_docs().join(
            live.select("doc_key"), "doc_key", "left_anti"
        )

        # only the token-count columns this index's fields actually
        # consume: reconstructing every _SUM_COLS entry would put a
        # phantom negative in sum_content_trigram for default-field
        # indexes (dead docs have trigram counts, segment stats have
        # no trigram row) and permanently disable the fast path
        needed = tuple(
            dict.fromkeys(
                "content" if f in CONTENT_FIELDS else f
                for f in self.params.fields
            )
        )

        def _sum_agg(docs_df) -> dict:
            return (
                _tok_count_cols(docs_df)
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    *[
                        F.sum(F.col(f"_tc_{c}")).alias(f"sum_{c}")
                        for c in needed
                    ],
                )
                .collect()[0]
                .asDict()
            )

        # Exact live stats WITHOUT re-tokenizing the live corpus:
        # every segment's stats parquet stores INTEGER total_dl per
        # field, so live sums = Σ segment totals − token counts of
        # the dead docs (a scan over churn, not corpus). Integer
        # arithmetic then the same total/n division a fresh build
        # does → bit-identical avgdl → identical scores. Falls back
        # to the full live token-count pass on any stats-shape
        # surprise (e.g. a pre-total_dl segment).
        stats = None
        try:
            seg_stats = pd.concat(
                [
                    pd.read_parquet(IndexPaths(s["dir"]).stats)
                    for s in segs
                ],
                ignore_index=True,
            )
            sums = _exact_live_sums(seg_stats, _sum_agg(dead_docs), needed)
            if sums is not None:
                stats = _stats_from_sums(sums, tuple(self.params.fields))
        except Exception:
            stats = None
        if stats is None:
            stats = _stats_from_sums(
                _sum_agg(live), tuple(self.params.fields)
            )
        avgdl_map = {r.field: float(r.avgdl) for r in stats.itertuples()}

        dead = dead_docs.select("doc_id").withColumn(
            "block_id", (F.col("doc_id") / bsz).cast("long")
        )
        dead_by_block = dead.groupBy("block_id").agg(
            F.collect_list("doc_id").alias("deadids")
        )
        posts = self.reader().postings.select(
            [f.name for f in POSTING_SCHEMA.fields]
        )
        joined = posts.join(dead_by_block, "block_id", "left")

        post_cols = [f.name for f in POSTING_SCHEMA.fields]

        def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            """Two-path vectorized rewrite. The posting byte streams
            (docs/tfs/dls/positions) are avgdl-INDEPENDENT; only the
            one block_max_tfnorm double per row depends on the new
            stats. So rows whose posting list holds no dead doc — the
            overwhelming majority at low churn, since a dead doc
            touches only rows of terms it contains — pass their bytes
            straight through and get a metadata-only refresh (decode
            of the two small tf/dl streams; positions, the byte bulk,
            are never decoded or re-encoded). Only rows that actually
            lose an entry take the full decode-filter-reencode path.
            All decoding stays batched per Arrow chunk (the builder's
            lesson: per-group Python calls were 35x slower)."""
            import numpy as np

            def refresh(pdf: pd.DataFrame) -> pd.DataFrame:
                n_arr = pdf["n"].to_numpy(dtype=np.int64)
                tfs = encoding.decode_rows_values(
                    [bytes(x) for x in pdf["tfs"]], n_arr, codec
                )
                dls = encoding.decode_rows_values(
                    [bytes(x) for x in pdf["dls"]], n_arr, codec
                )
                # same expression (op order included) as
                # encoding.bm25_tfnorm, with per-entry avgdl
                avg = np.repeat(
                    np.array(
                        [avgdl_map[f] for f in pdf["field"]],
                        dtype=np.float64,
                    ),
                    n_arr,
                )
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                tfn = tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b_ + b_ * dl / avg)
                )
                starts = np.zeros(n_arr.size, dtype=np.int64)
                np.cumsum(n_arr[:-1], out=starts[1:])
                return pdf.assign(
                    block_max_tfnorm=np.maximum.reduceat(tfn, starts)
                )[post_cols]

            def reencode(pdf: pd.DataFrame) -> pd.DataFrame:
                # encode_blocks_batch requires (field, term, block_id)
                # grouped order; rows are unique per group
                pdf = pdf.sort_values(
                    ["field", "term", "block_id"], kind="mergesort"
                )
                n_arr = pdf["n"].to_numpy(dtype=np.int64)
                block_ids = pdf["block_id"].to_numpy(dtype=np.int64)
                docs = encoding.decode_rows_docs(
                    [bytes(x) for x in pdf["docs_delta"]],
                    n_arr,
                    block_ids,
                    bsz,
                    codec,
                )
                tfs = encoding.decode_rows_values(
                    [bytes(x) for x in pdf["tfs"]], n_arr, codec
                )
                dls = encoding.decode_rows_values(
                    [bytes(x) for x in pdf["dls"]], n_arr, codec
                )
                pcounts, flat_pos = encoding.decode_positions_rows(
                    [bytes(x) for x in pdf["pos_counts"]],
                    [bytes(x) for x in pdf["pos_deltas"]],
                    n_arr,
                    codec,
                )
                total = int(n_arr.sum())
                assert pcounts.size == total, "positions/entries mismatch"
                field_rep = np.repeat(pdf["field"].to_numpy(), n_arr)
                term_rep = np.repeat(pdf["term"].to_numpy(), n_arr)
                block_rep = np.repeat(block_ids, n_arr)
                dead_arr = np.unique(
                    np.concatenate(
                        [
                            np.asarray(d, dtype=np.int64)
                            for d in pdf["deadids"]
                        ]
                    )
                )
                keep = ~np.isin(docs, dead_arr)
                if not keep.any():
                    return pd.DataFrame(columns=post_cols)
                pos_slices = np.split(flat_pos, np.cumsum(pcounts)[:-1])
                kept_idx = np.flatnonzero(keep)
                positions = [pos_slices[i] for i in kept_idx]
                cols = encoding.encode_blocks_batch(
                    field_rep[kept_idx],
                    term_rep[kept_idx],
                    block_rep[kept_idx],
                    docs[kept_idx],
                    tfs[kept_idx],
                    dls[kept_idx],
                    positions,
                    avgdl_map,
                    k1,
                    b_,
                    bsz,
                    codec,
                )
                return pd.DataFrame(cols)

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                has_dead = pdf["deadids"].notna().to_numpy()
                out: list[pd.DataFrame] = []
                clean = pdf.loc[~has_dead]
                cand = pdf.loc[has_dead]
                touched = None
                if len(cand):
                    # doc_ids are globally unique and block-disjoint,
                    # so one batch-wide membership test is exact
                    n_arr = cand["n"].to_numpy(dtype=np.int64)
                    block_ids = cand["block_id"].to_numpy(dtype=np.int64)
                    docs = encoding.decode_rows_docs(
                        [bytes(x) for x in cand["docs_delta"]],
                        n_arr,
                        block_ids,
                        bsz,
                        codec,
                    )
                    dead_arr = np.unique(
                        np.concatenate(
                            [
                                np.asarray(d, dtype=np.int64)
                                for d in cand["deadids"]
                            ]
                        )
                    )
                    kill = np.isin(docs, dead_arr)
                    row_rep = np.repeat(
                        np.arange(len(cand), dtype=np.int64), n_arr
                    )
                    row_kill = np.zeros(len(cand), dtype=bool)
                    row_kill[row_rep[kill]] = True
                    touched = cand.loc[row_kill]
                    clean = pd.concat([clean, cand.loc[~row_kill]])
                if len(clean):
                    out.append(refresh(clean))
                if touched is not None and len(touched):
                    out.append(reencode(touched))
                if out:
                    yield pd.concat(out, ignore_index=True)

        merged_dir = os.path.join(self.root, "base_merged")
        shutil.rmtree(merged_dir, ignore_errors=True)
        mp = IndexPaths(merged_dir)
        new_posts = joined.mapInPandas(rewrite, schema=POSTING_SCHEMA)
        par = max(spark.sparkContext.defaultParallelism, 4)
        (
            new_posts.repartitionByRange(par, "field", "term", "block_id")
            .sortWithinPartitions("field", "term", "block_id")
            .write.mode("overwrite")
            .partitionBy("field")
            .parquet(os.path.join(mp.postings, "group=0"))
        )
        live.write.mode("overwrite").partitionBy("group").parquet(mp.docs)
        stats.to_parquet(mp.stats, index=False)
        _atomic_write_json(mp.params, self.params.to_dict())
        # offsets are a planning artifact of the original base; the
        # merged segment keeps the SAME doc space, so carry them over
        pd.read_parquet(IndexPaths(segs[0]["dir"]).offsets).to_parquet(
            mp.offsets, index=False
        )
        td = term_dict_from_postings(spark.read.parquet(mp.postings))
        (
            td.repartitionByRange(max(par // 2, 2), "field", "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("field")
            .parquet(mp.term_dict)
        )
        hints_from_term_dict(spark.read.parquet(mp.term_dict)).coalesce(
            4
        ).write.mode("overwrite").parquet(mp.hints)

        end_doc = segs[-1]["end_doc"]
        for s in segs:
            if os.path.abspath(s["dir"]) != os.path.abspath(merged_dir):
                shutil.rmtree(s["dir"], ignore_errors=True)
        shutil.rmtree(self._tomb_dir, ignore_errors=True)
        shutil.rmtree(self._removed_words_dir, ignore_errors=True)
        self._write_segments(
            [
                {
                    "name": "merged",
                    "dir": merged_dir,
                    "end_doc": end_doc,
                    "epoch": 0,
                }
            ],
            n_applies=0,  # history expired — snapshots restart at 0
        )
        self._merge_metadata()


class MultiReader:
    """IndexReader-compatible view over stacked segments: unioned
    postings/docs, merged dictionary/stats, tombstone-aware liveness.
    Drop-in for SearchEngine."""

    def __init__(self, inc: IncrementalIndex, as_of: int | None = None):
        self.inc = inc
        self.spark = inc.spark
        self.as_of = as_of
        base = inc.segments()[0]["dir"]
        self._base_reader = IndexReader(inc.spark, base)
        self.params = self._base_reader.params
        self._stats: pd.DataFrame | None = None

    @property
    def docs(self) -> DataFrame:
        return self.inc.live_docs(self.as_of)

    @property
    def postings(self) -> DataFrame:
        """Unioned postings with a per-row `_ub_scale` column: block-max
        tfnorms were encoded with each SEGMENT's avgdl, but queries
        score with the MERGED avgdl. tfnorm is increasing in avgdl, so
        a valid query-time upper bound is the stored block-max times
        max(1, avgdl_merged / avgdl_segment) — without it, WAND could
        prune a block whose docs now out-score their build-time bound."""
        segs = self.inc._segs_as_of(self.as_of)
        merged = {
            r.field: float(r.avgdl) for r in self.stats.itertuples()
        }
        dfs = []
        for s in segs:
            seg_stats = pd.read_parquet(IndexPaths(s["dir"]).stats)
            fac = {}
            for r in seg_stats.itertuples():
                seg_avgdl = float(r.avgdl)
                fac[r.field] = (
                    max(1.0, merged.get(r.field, seg_avgdl) / seg_avgdl)
                    if seg_avgdl > 0
                    else 1.0
                )
            mapping = F.create_map(
                *[
                    x
                    for f_, v in sorted(fac.items())
                    for x in (F.lit(f_), F.lit(v))
                ]
            )
            dfs.append(
                self.spark.read.parquet(IndexPaths(s["dir"]).postings)
                .withColumn("_ub_scale", mapping[F.col("field")])
            )
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    @property
    def term_dict(self) -> DataFrame:
        if self.as_of is None:
            return self.spark.read.parquet(
                os.path.join(self.inc.root, "merged", "term_dict.parquet")
            )
        # snapshot read: merge the prefix's dictionaries on the fly
        # (the persisted merged/ artifacts only describe the latest
        # epoch); the union is |prefix| vocabulary-sized frames
        tds = [
            self.spark.read.parquet(IndexPaths(s["dir"]).term_dict)
            for s in self.inc._segs_as_of(self.as_of)
        ]
        td = tds[0]
        for t in tds[1:]:
            td = td.unionByName(t)
        return td.groupBy("field", "term").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        )

    @property
    def hints(self) -> DataFrame:
        """Hint words with at least one LIVE doc: merged-dictionary df
        minus the removed-doc counts recorded at tombstone time, so
        deleted-only words drop out of autocomplete without a
        compact() (reference CodeIndexBuilder.cs:369-375,446-452)."""
        td = self.inc_term_counts()
        live = td.filter(
            (F.length("word") >= 4) & (F.length("word") <= 199)
            & (F.col("df") > F.col("removed"))
        )
        return live.select(
            "word", F.lower("word").alias("word_lower")
        ).distinct()

    def inc_term_counts(self) -> DataFrame:
        td = self.term_dict.filter(F.col("field") == "content_cs").select(
            F.col("term").alias("word"), "df"
        )
        rw_dir = self.inc._removed_words_dir
        if os.path.exists(rw_dir):
            rw = self.spark.read.parquet(rw_dir)
            if self.as_of is not None and "epoch" in rw.columns:
                rw = rw.filter(F.col("epoch") <= self.as_of)
            rw = rw.groupBy("word").agg(F.sum("removed").alias("removed"))
            return td.join(rw, "word", "left").fillna({"removed": 0})
        return td.withColumn("removed", F.lit(0))

    @property
    def stats(self) -> pd.DataFrame:
        if self._stats is None:
            if self.as_of is None:
                self._stats = pd.read_parquet(
                    os.path.join(self.inc.root, "merged", "stats.parquet")
                )
            else:
                st = pd.concat(
                    [
                        pd.read_parquet(IndexPaths(s["dir"]).stats)
                        for s in self.inc._segs_as_of(self.as_of)
                    ]
                )
                g = st.groupby("field", as_index=False).agg(
                    n_docs=("n_docs", "sum"), total_dl=("total_dl", "sum")
                )
                g["avgdl"] = g["total_dl"] / g["n_docs"]
                self._stats = g
        return self._stats

    def field_stats(self, field: str) -> tuple[int, float]:
        row = self.stats[self.stats["field"] == field]
        if row.empty:
            raise KeyError(f"no stats for field {field!r}")
        return int(row["n_docs"].iloc[0]), float(row["avgdl"].iloc[0])

    def live_doc_ids(self) -> DataFrame | None:
        if os.path.exists(self.inc._tomb_dir):
            return self.inc.live_docs(self.as_of).select("doc_id")
        return None


# ------------------------------------------------------------- ST1/ST2

def maintain_stream(
    spark: SparkSession,
    upserts_dir: str,
    index: IncrementalIndex,
    checkpoint_dir: str,
    once: bool = True,
):
    """Structured Streaming maintenance: a file-source stream of doc
    upserts/deletes feeds foreachBatch micro-batches into the
    incremental index (the debounced watcher loop of the reference,
    with the watermark/trigger supplied by Structured Streaming).

    Upsert rows: (repo, path, commit, lang, content, change_type).
    change_type Deleted -> tombstone the live doc at (repo, path).
    """
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("change_type", T.StringType(), False),
        ]
    )
    stream = spark.readStream.schema(schema).json(upserts_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_docs = batch_df.filter(
            F.col("change_type").isin("Created", "Changed")
        ).select("repo", "path", "commit", "lang", "content")
        deletes = batch_df.filter(F.col("change_type") == "Deleted").select(
            "repo", "path"
        )
        live = index.live_docs().select("repo", "path", "doc_key")
        dead = live.join(deletes, ["repo", "path"], "left_semi").select("doc_key")
        # replaced versions of updated paths also tombstone
        replaced = live.join(
            new_docs.select("repo", "path"), ["repo", "path"], "left_semi"
        ).select("doc_key")
        index.apply_changes(new_docs, dead.unionByName(replaced))

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
