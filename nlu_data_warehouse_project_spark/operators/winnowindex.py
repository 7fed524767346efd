"""Persistent winnowing-fingerprint sidecar: O(delta) incremental
passage overlap.

The position-aware twin of `minhashindex.MinHashBandIndex` /
`bloomindex.BloomFingerprintIndex` (VERDICT r16 #3): a daily ingest
loop that wants MOSS-style passage overlap of each new batch against
the settled corpus should not re-tokenize and re-winnow the whole
corpus per batch.  This index persists the corpus's winnowed
fingerprint frame — the distinct ``(doc_id, fingerprint, gram)`` rows
`winnow.winnow_fingerprints` selects — as its OWN TxTable next to the
corpus, and ``sync()`` appends only the fingerprints of segments
committed since the last sync (``read_closed_delta``), falling back
to a full rebuild whenever the delta is not append-shaped (restore
shrank the closed list, compaction rewrote it, the current dir was
replaced, or the k/w parameters changed — the conservative rule both
sibling sidecars follow).

``overlap(batch)`` then fingerprints ONLY the batch and equi-joins
new-vs-(standing ∪ new) through `winnow.winnow_overlap_incremental`,
whose result equals the full-batch ``winnow_overlap_pairs`` over the
union corpus restricted to pairs touching the batch (the equivalence
property test's gate).  The ``max_df`` boilerplate cap is re-derived
per probe from UNION document frequency — the standing side's df is a
groupBy over the persisted frame, never a corpus re-tokenize.

Scale shape: the index table is ~2/(w+1) rows per corpus gram of
(bigint, short string) — appended transactionally, compactable with
``compact_closed`` like any append table; the probe cost is batch
tokenize + two equi-joins on (fingerprint, gram).  All deterministic
md5 hashing — two runs or two engines produce identical frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .winnow import winnow_fingerprints, winnow_overlap_incremental


class WinnowFingerprintIndex:
    def __init__(
        self,
        corpus,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 8,
        w: int = 4,
        root: str | None = None,
    ):
        from ..sources.txlog import TxTable

        self.corpus = corpus
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.w = w
        # a SIBLING of the corpus root (like the bloom/minhash
        # sidecars): the corpus table's verify()/vacuum() never see it
        self.index = TxTable(
            corpus.spark, root or (str(corpus.root).rstrip("/") + ".wnidx")
        )

    def _fps_of(self, df: DataFrame) -> DataFrame:
        return (
            winnow_fingerprints(df, self.text_col, self.id_col, k=self.k, w=self.w)
            .select(F.col("id").alias("doc_id"), "fingerprint", "gram")
            .distinct()
        )

    def _params(self) -> dict:
        return {"wn_k": self.k, "wn_w": self.w}

    def sync(self) -> int | None:
        """Bring the fingerprint table up to the corpus's current
        version.  Append-only advance = fingerprints of the delta
        segments only; anything else (restore, compaction across the
        sync boundary, replaced current dir, changed k/w) = full
        rebuild.  Returns the synced corpus version (None when the
        corpus has no commits yet).  Idempotent: re-sync at the same
        version is a no-op."""
        cman = self.corpus.manifest()
        if cman is None:
            return None
        v = cman["version"]
        iman = self.index.manifest() if self.index.exists() else None
        synced = iman.get("synced_corpus_version") if iman else None
        if iman is not None and synced == v and all(
            iman.get(key) == val for key, val in self._params().items()
        ):
            return v

        delta = None
        if (
            iman is not None
            and synced is not None
            and all(iman.get(key) == val for key, val in self._params().items())
            and iman.get("synced_corpus_current") == cman.get("current")
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
            self.index.commit_append(self._fps_of(delta), f"sync-v{v}", extra=extra)
        else:
            self.index.commit_snapshot(
                self._fps_of(self.corpus.read()), f"rebuild-v{v}", extra=extra
            )
        return v

    def overlap(
        self,
        incoming: DataFrame,
        min_shared: int = 2,
        max_df: int | None = None,
    ) -> DataFrame:
        """Passage-overlap pairs (a_id, b_id, n_shared) touching the
        incoming batch — new-vs-synced-corpus plus new-vs-new — equal
        to the full-batch ``winnow_overlap_pairs`` over (synced corpus
        ∪ batch) restricted to pairs with at least one batch id.
        Incoming ids must be disjoint from the synced corpus's."""
        if self.index.exists():
            standing = self.index.read().select(
                F.col("doc_id").alias("id"), "fingerprint", "gram"
            )
        else:
            standing = self._fps_of(incoming.limit(0)).select(
                F.col("doc_id").alias("id"), "fingerprint", "gram"
            )
        return winnow_overlap_incremental(
            standing, incoming, self.text_col, self.id_col,
            k=self.k, w=self.w, min_shared=min_shared, max_df=max_df,
        )
