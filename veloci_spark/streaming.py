"""Incremental index maintenance — generations + Structured Streaming.

The reference engine explicitly excludes delta updates (its README "no
delta" note; the sharding module is commented out, shards.rs:1-267): an
index is built once, immutable. Spark-first we can do better without
touching that invariant: **log-structured generations**.

* Every ingested micro-batch becomes its own immutable GENERATION — a
  complete index (dict/postings/phrase/docs) over just that batch, built by
  the ordinary :func:`veloci_spark.build.build_index`. Nothing is ever
  rewritten in place, so every generation keeps the reference's
  immutability story and the per-stage resume/fingerprint machinery.
* Each generation's docs get GLOBAL doc ids: ``base + local`` where
  ``base`` is the running total from ``generations.json`` (ids are
  assigned before the build via ``doc_id_col``, so they are stable across
  compactions).
* Queries fan out over generations (:class:`MultiIndex`) — each
  generation evaluates segment-locally exactly like a single index, and
  candidates merge by the global (score DESC, doc_id DESC) order.
* ``compact()`` rebuilds one generation from the union of all docs —
  Lucene's segment merge, expressed as a plain batch rebuild. After
  compaction term statistics (num_occurences) are globally exact again;
  between compactions they are per-generation, exactly like Lucene
  segments before merge (documented approximation).
* ``delete_docs()`` tombstones global doc ids in an append-only
  ``deletes/`` parquet (Lucene's liveDocs bitmap, kept relational).
  Tombstoned docs disappear from :class:`MultiIndex` results immediately —
  each generation's top-k is inflated by ITS tombstone count so a deleted
  doc can never evict a live one from the truncated per-segment top-k,
  and the merge anti-joins the tombstone set (distributed, never a driver
  id list). ``compact()`` drops tombstoned docs physically and clears the
  tombstones; an *update* is delete + re-ingest (the new version gets a
  fresh global id — ids are never reused, ``id_hi`` tracks the high-water
  mark across compactions).

Structured Streaming enters via ``index_stream``: ``readStream`` source →
``writeStream.foreachBatch(ingest into a new generation)`` with a
checkpoint location, so a restarted stream resumes at the right batch and
never double-ingests (foreachBatch epochs are tracked by the checkpoint).
Single-writer by construction — foreachBatch serializes batches.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veloci_spark.config import IndexConfig

_GENS_FILE = "generations.json"
_DELETES_DIR = "deletes"


def _gen_hi(g: dict) -> int:
    """One past the highest global doc id a generation may contain.
    Pre-delete records lack ``id_hi`` (ids were contiguous)."""
    return int(g.get("id_hi", g["base"] + g["n_docs"]))


def delete_docs(spark: SparkSession, root_dir: str, doc_ids) -> int:
    """Tombstone global doc ids: append-only ``deletes/`` parquet, visible
    to every subsequently-constructed :class:`MultiIndex` immediately and
    removed physically at :func:`compact`. Deleting an id twice (or an id
    that was never ingested) is harmless — the set is deduped on read."""
    rows = [(int(i),) for i in doc_ids]
    if not rows:
        return 0
    (spark.createDataFrame(rows, "doc_id long")
     .coalesce(1)
     .write.mode("append").parquet(os.path.join(root_dir, _DELETES_DIR)))
    return len(rows)


def _deletes_df(spark: SparkSession, root_dir: str):
    p = os.path.join(root_dir, _DELETES_DIR)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


def _read_gens(root_dir: str) -> list[dict]:
    path = os.path.join(root_dir, _GENS_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def _write_gens(root_dir: str, gens: list[dict]) -> None:
    path = os.path.join(root_dir, _GENS_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(gens, f, indent=2)
    os.replace(tmp, path)  # atomic swap — readers never see a partial file


def gen_dir(root_dir: str, gen_id: int) -> str:
    return os.path.join(root_dir, f"gen={gen_id:06d}")


def ingest_batch(spark: SparkSession, df: DataFrame, config: IndexConfig,
                 root_dir: str) -> dict:
    """Index one batch of documents as a new generation. Returns the
    generation record {gen, base, n_docs, dir}."""
    from veloci_spark.build import build_index

    os.makedirs(root_dir, exist_ok=True)
    gens = _read_gens(root_dir)
    gen_id = (max(g["gen"] for g in gens) + 1) if gens else 0
    # next free id = the id high-water mark, NOT sum(n_docs): after a
    # compaction with deletes the id space has holes but ids are never
    # reused (an update's new version must not collide with a survivor)
    base = max((_gen_hi(g) for g in gens), default=0)
    d = gen_dir(root_dir, gen_id)

    # global ids: assign 0-based local ids via the normal machinery, offset
    # by the running base, then build with doc_id_col (no second assignment)
    from veloci_spark.build import assign_doc_ids

    if config.doc_id_col and config.doc_id_col in df.columns:
        with_ids = df.withColumn("_gid", F.col(config.doc_id_col) + F.lit(base))
    else:
        local = assign_doc_ids(df, config.order_col)
        with_ids = local.withColumn("_gid", F.col("doc_id") + F.lit(base)) \
            .drop("doc_id")
    # replace() carries EVERY config field (scoring, num_segments,
    # future additions) — re-enumerating the constructor
    # silently dropped scoring, so bm25-configured streams built
    # veloci-scored generations.
    gen_config = dataclasses.replace(config, doc_id_col="_gid")
    manifest = build_index(spark, with_ids, gen_config, d)
    rec = {"gen": gen_id, "base": base, "n_docs": manifest["n_docs"],
           "id_hi": base + manifest["n_docs"], "dir": d, "ts": time.time()}
    _write_gens(root_dir, gens + [rec])
    return rec


def index_stream(stream_df: DataFrame, config: IndexConfig, root_dir: str,
                 checkpoint_dir: str, **trigger_kw):
    """Attach generation ingestion to a streaming DataFrame.

    Returns the started ``StreamingQuery``; every non-empty micro-batch
    becomes one generation. ``trigger_kw`` forwards to ``trigger()`` —
    default ``availableNow=True`` (drain the source, then stop), use
    ``processingTime='30 seconds'`` for continuous tailing.
    """
    if not trigger_kw:
        trigger_kw = {"availableNow": True}

    def handle(batch_df: DataFrame, _epoch_id: int):
        if batch_df.isEmpty():
            return
        ingest_batch(batch_df.sparkSession, batch_df, config, root_dir)

    return (
        stream_df.writeStream
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger_kw)
        .start()
    )


class MultiIndex:
    """Query handle over all generations of a streamed index root."""

    def __init__(self, spark: SparkSession, root_dir: str):
        from veloci_spark.search import FulltextIndex

        self.spark = spark
        self.root_dir = root_dir
        self.gens = _read_gens(root_dir)
        self.indexes = [(g, FulltextIndex(spark, g["dir"])) for g in self.gens]
        self.deletes = _deletes_df(spark, root_dir)
        # per-generation tombstone counts (one aggregation job, ranges
        # broadcast): needed to inflate each generation's top-k so deleted
        # docs cannot evict live ones from the truncated per-segment top-k
        self._del_counts: dict[int, int] = {}
        self.n_deletes = 0
        if self.deletes is not None and self.gens:
            self.deletes = self.deletes.cache()
            ranges = spark.createDataFrame(
                [(g["gen"], g["base"], _gen_hi(g)) for g in self.gens],
                "gen int, lo long, hi long")
            d = self.deletes
            rows = (d.join(F.broadcast(ranges),
                           (d["doc_id"] >= ranges["lo"])
                           & (d["doc_id"] < ranges["hi"]))
                    .groupBy("gen").count().collect())
            self._del_counts = {r["gen"]: int(r["count"]) for r in rows}
            self.n_deletes = sum(self._del_counts.values())

    @property
    def n_docs(self) -> int:
        return sum(g["n_docs"] for g in self.gens)

    @property
    def live_docs(self) -> int:
        """Docs visible to search: ingested minus tombstoned."""
        return self.n_docs - self.n_deletes

    def search(self, request: dict) -> dict:
        """Ranked search across generations: per-generation evaluation
        (segment-local, unchanged), global (score DESC, doc_id DESC) merge.
        Returns the reference result shape (data + num_hits fields)."""
        import numpy as np

        from veloci_spark.search import (_apply_anchor_boosts,
                                         _apply_post_locality, _search_hits)

        top = request.get("top", 10)
        skip = request.get("skip", 0)
        merged = None
        exact = True
        for _g, idx in self.indexes:
            ndel = self._del_counts.get(_g["gen"], 0)
            gen_req = request
            if ndel:
                # widen this generation's candidate set by its tombstone
                # count: at most ndel of its per-segment top-k slots can be
                # occupied by deleted docs, so k+ndel live candidates always
                # survive the kernel truncation
                gen_req = {**request, "top": top + skip + ndel, "skip": 0}
            hits, plan, leaves = _search_hits(idx, gen_req, need_all=False)
            # mirror search(): nested fields disable kernel locality and
            # expect this post-pass — without it streamed nested indexes
            # silently dropped the text_locality boost.
            if plan.get("post_locality"):
                hits = _apply_post_locality(idx, hits, leaves,
                                            plan["scored_leaf_ids"])
            hits = _apply_anchor_boosts(idx, hits, request, leaves)
            exact = exact and plan.get("top") is None
            merged = hits if merged is None else merged.unionByName(hits)
        if merged is None:
            return {"num_hits": 0, "num_hits_exact": True, "data": []}
        if self.deletes is not None:
            merged = merged.join(self.deletes, on="doc_id", how="left_anti")
        ranked = merged.orderBy(F.desc("score"), F.desc("doc_id")) \
            .limit(top + skip).collect()[skip:]
        return {
            "num_hits": len(ranked),
            "num_hits_exact": exact,
            "data": [{"doc_id": r["doc_id"],
                      "score": float(np.float32(r["score"]))} for r in ranked],
        }

    def get_doc(self, doc_id: int, columns=None):
        """Route a global doc id to its generation; tombstoned ids resolve
        to None exactly like never-ingested ones."""
        from veloci_spark.search import get_doc

        if self.deletes is not None and \
                self.deletes.where(F.col("doc_id") == doc_id).limit(1).count():
            return None
        for g, idx in self.indexes:
            if g["base"] <= doc_id < _gen_hi(g):
                return get_doc(idx, doc_id, columns)
        return None


def compact(spark: SparkSession, root_dir: str, config: IndexConfig) -> dict:
    """Merge all generations into one (the segment-merge of this design):
    re-read every generation's doc store (global ids preserved), drop
    tombstoned docs, rebuild a single index over the union, atomically swap
    the generation list, then delete the old generation dirs and the
    tombstone set. Term statistics become globally exact; the surviving
    generation records ``id_hi`` (high-water mark + 1) so later ingests
    never reuse a deleted or surviving id."""
    import shutil

    from veloci_spark.build import build_index

    gens = _read_gens(root_dir)
    dels = _deletes_df(spark, root_dir)
    if len(gens) <= 1 and dels is None:
        return gens[0] if gens else {}
    if not gens:
        return {}
    docs = None
    for g in gens:
        d = spark.read.parquet(os.path.join(g["dir"], "docs"))
        docs = d if docs is None else docs.unionByName(d)
    if dels is not None:
        docs = docs.join(dels, on="doc_id", how="left_anti")
    new_id = max(g["gen"] for g in gens) + 1
    d = gen_dir(root_dir, new_id)
    cfg = dataclasses.replace(config, doc_id_col="doc_id")
    manifest = build_index(spark, docs, cfg, d)
    rec = {"gen": new_id, "base": 0, "n_docs": manifest["n_docs"],
           "id_hi": max(_gen_hi(g) for g in gens), "dir": d,
           "ts": time.time()}
    _write_gens(root_dir, [rec])
    for g in gens:
        shutil.rmtree(g["dir"], ignore_errors=True)
    shutil.rmtree(os.path.join(root_dir, _DELETES_DIR), ignore_errors=True)
    return rec
