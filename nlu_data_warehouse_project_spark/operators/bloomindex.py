"""Persistent Bloom sidecar for an append-shaped fingerprint corpus.

`bloom_incremental_dedup` rebuilds its bitmap from the full fingerprint
index every call — fine for a daily batch, wasteful for a streaming
ingest loop where every micro-batch would re-fold the whole settled
corpus.  This sidecar persists the bitmap NEXT TO the TxTable (one
binary file, atomic tmp+rename publish) tagged with the table version
it covers, and `sync()` folds in only the segments appended since —
O(delta) per micro-batch via `read_closed_delta`, not O(corpus).

Correctness protocol: the sidecar is only ever written by `sync()`,
and `sync()` only tags the file with a version whose fingerprints it
has fully folded in.  A crash anywhere leaves either the old
consistent file or the new one — never a bitmap missing fingerprints
it claims to cover, so the no-false-negative Bloom guarantee (every
true duplicate reaches the exact probe) survives any failure.  If the
delta is unrecoverable (compaction across the boundary, vacuumed
version, parameter change, corrupt file) sync falls back to a full
rebuild rather than guessing.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import bloom_incremental_dedup, build_fingerprint_bloom

_MAGIC = b"BFI1"


class BloomFingerprintIndex:
    """Bloom membership summary of a TxTable fingerprint column, kept in
    lock-step with the table's manifest version."""

    def __init__(
        self,
        table,
        fp_col: str = "fingerprint",
        num_bits: int = 1 << 23,
        num_hashes: int = 4,
        path: str | None = None,
    ):
        self.table = table
        self.fp_col = fp_col
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        # a SIBLING of the table root, not inside it: TxTable.verify()'s
        # orphan audit and vacuum never see it
        self.path = path or (str(table.root).rstrip("/") + ".bloom")

    # -- storage ----------------------------------------------------------

    def _load(self):
        """(bits, synced_version) or None when absent/corrupt/mismatched."""
        import numpy as np

        try:
            with open(self.path, "rb") as f:
                raw = f.read()
        except FileNotFoundError:
            return None
        try:
            if raw[:4] != _MAGIC:
                return None
            (hlen,) = struct.unpack("<I", raw[4:8])
            meta = json.loads(raw[8 : 8 + hlen])
            bits = np.frombuffer(raw[8 + hlen :], dtype=np.uint8).copy()
            if (
                meta.get("num_bits") != self.num_bits
                or meta.get("num_hashes") != self.num_hashes
                or bits.size != self.num_bits // 8
            ):
                return None  # parameters changed: rebuild
            return bits, int(meta["synced_version"])
        except Exception:  # noqa: BLE001 — any corruption means rebuild
            return None

    def _store(self, bits, version: int) -> None:
        meta = json.dumps(
            {
                "num_bits": self.num_bits,
                "num_hashes": self.num_hashes,
                "synced_version": int(version),
            }
        ).encode()
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(_MAGIC + struct.pack("<I", len(meta)) + meta + bits.tobytes())
        os.replace(tmp, self.path)  # atomic publish, same as the manifest

    # -- sync -------------------------------------------------------------

    def _fold(self, fps: DataFrame, into=None):
        import numpy as np

        fresh = build_fingerprint_bloom(
            fps.select(F.col(self.fp_col)), self.fp_col, self.num_bits, self.num_hashes
        )
        return fresh if into is None else (into | fresh)

    def sync(self):
        """Bring the bitmap up to the table's current version; returns
        the numpy uint8 bitmap.  O(delta) when the stored version's
        delta is recoverable, O(corpus) rebuild otherwise."""
        import numpy as np

        man = self.table.manifest() if self.table.exists() else None
        ver = int(man["version"]) if man else 0
        state = self._load()
        if state is not None:
            bits, synced = state
            if synced == ver:
                return bits
            if 0 < synced < ver:
                try:
                    delta = self.table.read_closed_delta(synced)
                    bits = self._fold(delta, into=bits)
                    self._store(bits, ver)
                    return bits
                except Exception:  # noqa: BLE001 — unrecoverable delta: rebuild
                    pass
        if ver == 0:
            bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        else:
            bits = self._fold(self.table.read())
        self._store(bits, ver)
        return bits

    # -- use --------------------------------------------------------------

    def dedup(self, incoming: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        """`bloom_incremental_dedup` against the table, with the bitmap
        served from the synced sidecar instead of rebuilt per call."""
        bits = self.sync()
        if self.table.exists():
            existing = self.table.read().select(self.fp_col)
        else:
            existing = incoming.limit(0).select(F.lit("").alias(self.fp_col))
        return bloom_incremental_dedup(
            incoming,
            existing,
            text_col,
            id_col,
            existing_is_fingerprints=True,
            num_bits=self.num_bits,
            num_hashes=self.num_hashes,
            prebuilt_bits=bits,
        )
