"""Persistent IVF sidecar: O(delta) incremental vector search.

The ANN twin of `minhashindex.MinHashBandIndex` / `bloomindex`: a
corpus that grows by daily appends should not retrain its coarse
quantizer or re-assign every settled vector per batch of queries.
This index persists the corpus's INVERTED LISTS — one
``(cell, vec_id)`` row per vector, assigned to the cosine-nearest of k
trained spherical-kmeans centroids — as its OWN TxTable next to the
corpus; the centroids themselves ride the index manifest (k x dim
floats of JSON — quantizer state is metadata, not data).

``sync()`` follows the sidecar contract the bloom/minhash indexes
established: an append-only corpus advance assigns ONLY the delta
segments against the FROZEN centroids (standard IVF practice — the
quantizer is trained once and new vectors stream into existing lists);
anything else (restore, compaction across the sync boundary, replaced
current dir, changed parameters) triggers a full rebuild, which
RETRAINS the quantizer so the lists keep following the data's density.

``topk(queries)`` probes each query's ``nprobe`` nearest lists via an
equi-join on the int cell id, pulls candidate VECTORS by a
candidate-scoped join back to the corpus (the index never duplicates
embeddings — it stores two ints per vector), and exact-cosine re-ranks
inside the probed lists.  Approximate by design, so it is
recall-gated in tests rather than oracle-hashed (the q34/q147/q179
driver-contract rule).

Scale shape: the index table is 2 ints per corpus vector — appended
transactionally, compactable like any append table; the probe is one
int equi-join; re-rank cost is bounded by nprobe/k of the corpus per
query.  At 100 TB the quantizer trains on a bounded sample
(`kmeans_fit`'s hash-ordered seed sample), sync touches only new
segments, and no all-pairs join ever forms.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import kmeans_fit, with_nearest_cells
from .similarity import cosine


class IVFVectorIndex:
    def __init__(
        self,
        corpus,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k_cells: int = 8,
        nprobe: int = 2,
        max_iters: int = 20,
        tol: float = 1e-2,
        root: str | None = None,
    ):
        from ..sources.txlog import TxTable

        self.corpus = corpus
        self.vec_col = vec_col
        self.id_col = id_col
        self.k_cells = k_cells
        self.nprobe = nprobe
        # quantizer training budget: the tolerance is a LAYOUT quality
        # knob, not a correctness one (re-rank is exact either way) —
        # the looser default matches the bench's trained-IVF settings
        self.max_iters = max_iters
        self.tol = tol
        # a SIBLING of the corpus root (the sidecar convention): the
        # corpus table's verify()/vacuum() never see it
        self.index = TxTable(corpus.spark, root or (str(corpus.root).rstrip("/") + ".ivfidx"))

    def _params(self) -> dict:
        return {"ivf_k_cells": self.k_cells, "ivf_vec_col": self.vec_col}

    def _assign(self, df: DataFrame, centroids: list) -> DataFrame:
        return with_nearest_cells(
            df.select(F.col(self.id_col).alias("vec_id"), F.col(self.vec_col).alias("__v")),
            "__v",
            centroids,
            1,
        ).select(F.col("__cells")[0].cast("int").alias("cell"), "vec_id")

    def centroids(self) -> list:
        """The trained quantizer, from the index manifest."""
        iman = self.index.manifest() if self.index.exists() else None
        if iman is None or "ivf_centroids" not in iman:
            raise FileNotFoundError(
                f"no synced IVF index under {self.index.root}; call sync() first"
            )
        return json.loads(iman["ivf_centroids"])

    def sync(self) -> int | None:
        """Bring the inverted lists up to the corpus's current version.
        Append-only advance = assign the delta segments against the
        FROZEN centroids; anything else = full rebuild with a RETRAINED
        quantizer.  Returns the synced corpus version (None when the
        corpus has no commits yet).  Idempotent at the same version."""
        cman = self.corpus.manifest()
        if cman is None:
            return None
        v = cman["version"]
        iman = self.index.manifest() if self.index.exists() else None
        synced = iman.get("synced_corpus_version") if iman else None
        params_ok = iman is not None and all(
            iman.get(k) == val for k, val in self._params().items()
        )
        if params_ok and synced == v:
            return v

        delta = None
        if (
            params_ok
            and synced is not None
            and iman.get("synced_corpus_current") == cman.get("current")
            and "ivf_centroids" in iman
        ):
            try:
                old = self.corpus.manifest(synced)
                removed = set(old["closed"]) - set(cman["closed"])
                if not removed:
                    delta = self.corpus.read_closed_delta(synced, v)
            except Exception:  # pruned version, unreadable manifest: rebuild
                delta = None

        extra = {
            "synced_corpus_version": v,
            "synced_corpus_current": cman.get("current"),
            **self._params(),
        }
        if delta is not None:
            cents = json.loads(iman["ivf_centroids"])
            extra["ivf_centroids"] = iman["ivf_centroids"]  # frozen quantizer carries
            self.index.commit_append(self._assign(delta, cents), f"sync-v{v}", extra=extra)
        else:
            cents = kmeans_fit(
                self.corpus.read(), self.vec_col, self.id_col, k=self.k_cells,
                max_iters=self.max_iters, tol=self.tol,
            )
            extra["ivf_centroids"] = json.dumps(cents)
            self.index.commit_snapshot(
                self._assign(self.corpus.read(), cents), f"rebuild-v{v}", extra=extra
            )
        return v

    def topk(self, queries: DataFrame, k: int = 5, nprobe: int | None = None) -> DataFrame:
        """Top-k cosine neighbors of each query among the INDEXED corpus
        vectors: probe the ``nprobe`` nearest lists, candidate-scoped
        vector fetch, exact re-rank.  Requires a prior ``sync()``; the
        caller decides staleness policy (query-then-sync reads the
        settled corpus; sync-then-query includes today's appends)."""
        cents = self.centroids()
        lists = self.index.read()  # (cell, vec_id)
        corpus_vecs = self.corpus.read().select(
            F.col(self.id_col).alias("neighbor_id"), F.col(self.vec_col).alias("__cv")
        )
        q = with_nearest_cells(
            queries.select(F.col(self.id_col).alias("query_id"), F.col(self.vec_col).alias("__qv")),
            "__qv",
            cents,
            nprobe or self.nprobe,
        ).select("query_id", "__qv", F.explode("__cells").alias("cell"))
        cand = (
            q.join(lists, "cell")
            .filter(F.col("query_id") != F.col("vec_id"))
            .select("query_id", "__qv", F.col("vec_id").alias("neighbor_id"))
        )
        scored = cand.join(corpus_vecs, "neighbor_id").select(
            "query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos")
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank")
        )
