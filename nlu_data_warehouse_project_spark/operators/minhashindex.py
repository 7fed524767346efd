"""Persistent banded-MinHash sidecar: O(delta) incremental NEAR-dup.

The near-dup twin of `bloomindex.BloomFingerprintIndex`: a streaming /
daily ingest loop that near-dedups each batch against the settled
corpus should not re-shingle and re-sign the whole corpus per batch.
This index persists the corpus's LSH band table — one
``(band_id, band_sig, doc_id)`` row per doc per band, the exact rows
`dedup.minhash_banded` computes — as its OWN TxTable next to the
corpus, and ``sync()`` appends only the bands of segments committed
since the last sync (``read_closed_delta``), falling back to a full
rebuild whenever the delta is not append-shaped (restore shrank the
closed list, compaction rewrote it, or the current dir was replaced —
the conservative rule the bloom sidecar follows).

``dedup(batch)`` then mirrors `incremental_embedding_dedup`'s
contract: drop every incoming doc whose exact n-gram Jaccard against
ANY settled corpus doc — or any LOWER-ID incoming doc — reaches the
threshold; keep the rest.  Candidates come from the band equi-join
(batch bands x index bands — never all pairs), and the exact verify
touches corpus TEXT only for candidate ids (a broadcast semi join
prunes the corpus scan to candidate rows).

Scale shape: the index table is docs x bands rows of short strings —
appended transactionally, compactable with ``compact_closed`` like any
append table; the probe is one equi-join on (band_id, band_sig); the
verify is candidate-scoped.  All deterministic md5 MinHash — two runs
or two engines produce identical band tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from .dedup import minhash_banded, ngram_jaccard_pairs


class MinHashBandIndex:
    def __init__(
        self,
        corpus,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
        threshold: float = 0.8,
        root: str | None = None,
    ):
        from ..sources.txlog import TxTable

        self.corpus = corpus
        self.text_col = text_col
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        # a SIBLING of the corpus root (like the bloom sidecar): the
        # corpus table's verify()/vacuum() never see it
        self.index = TxTable(corpus.spark, root or (str(corpus.root).rstrip("/") + ".mhidx"))

    def _bands_of(self, df: DataFrame) -> DataFrame:
        return minhash_banded(
            df, self.text_col, self.id_col, self.num_hashes, self.bands, self.shingle_n
        ).select(
            F.col("band_id"), F.col("band_sig"), F.col("__id").alias("doc_id")
        )

    def _params(self) -> dict:
        return {
            "mh_num_hashes": self.num_hashes,
            "mh_bands": self.bands,
            "mh_shingle_n": self.shingle_n,
        }

    def sync(self) -> int | None:
        """Bring the band table up to the corpus's current version.
        Append-only advance = bands of the delta segments only;
        anything else (restore, compaction across the sync boundary,
        replaced current dir, changed parameters) = full rebuild.
        Returns the synced corpus version (None when the corpus has no
        commits yet).  Idempotent: re-sync at the same version is a
        no-op."""
        cman = self.corpus.manifest()
        if cman is None:
            return None
        v = cman["version"]
        iman = self.index.manifest() if self.index.exists() else None
        synced = iman.get("synced_corpus_version") if iman else None
        if iman is not None and synced == v and all(
            iman.get(k) == val for k, val in self._params().items()
        ):
            return v

        delta = None
        if (
            iman is not None
            and synced is not None
            and all(iman.get(k) == val for k, val in self._params().items())
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
            self.index.commit_append(self._bands_of(delta), f"sync-v{v}", extra=extra)
        else:
            self.index.commit_snapshot(
                self._bands_of(self.corpus.read()), f"rebuild-v{v}", extra=extra
            )
        return v

    def dedup(self, incoming: DataFrame) -> DataFrame:
        """Incoming rows that are NOT near-dups (exact shingle Jaccard
        >= threshold) of the SYNCED corpus or of a lower-id incoming
        row — `incremental_embedding_dedup`'s non-transitive
        lowest-id-survives contract, over the persisted band table."""
        sh = F.array_distinct(shingles(self.text_col, self.shingle_n))
        if self.index.exists():
            inc_b = self._bands_of(incoming).withColumnRenamed("doc_id", "__iid")
            cand = (
                inc_b.join(self.index.read(), ["band_id", "band_sig"])
                .select("__iid", F.col("doc_id").alias("__cid"))
                .distinct()
            )
            # candidate-scoped corpus text fetch: the semi join prunes
            # the corpus scan to candidate rows before any shingling
            corpus_texts = (
                self.corpus.read()
                .select(F.col(self.id_col).alias("__cid"), sh.alias("__csh"))
                .join(F.broadcast(cand.select("__cid").distinct()), "__cid", "left_semi")
            )
            inc_sh = incoming.select(
                F.col(self.id_col).alias("__iid"), sh.alias("__ish")
            )
            inter = F.size(F.array_intersect("__ish", "__csh")).cast("double")
            union = F.size(F.array_union("__ish", "__csh")).cast("double")
            corpus_hits = (
                cand.join(inc_sh, "__iid")
                .join(corpus_texts, "__cid")
                .filter(F.round(inter / union, 4) >= self.threshold)
                .select("__iid")
                .distinct()
            )
        else:
            corpus_hits = incoming.limit(0).select(
                F.col(self.id_col).alias("__iid")
            )
        batch_hits = (
            ngram_jaccard_pairs(
                incoming, self.text_col, self.id_col,
                self.shingle_n, self.threshold, self.num_hashes, self.bands,
            )
            .select(F.col("id_b").alias("__iid"))
            .distinct()
        )
        dropped = corpus_hits.union(batch_hits).distinct()
        return incoming.join(
            dropped.withColumnRenamed("__iid", self.id_col), self.id_col, "left_anti"
        )
