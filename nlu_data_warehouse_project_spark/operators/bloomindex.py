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
        # one broadcast per synced version, reused across dedup() calls
        # (a streaming loop must not leak one broadcast per micro-batch)
        self._bc = None
        self._bc_version = None

    # -- storage ----------------------------------------------------------
    # All IO goes through the table's Hadoop FileSystem (same as the
    # manifests), so the sidecar works wherever the table does — local,
    # HDFS, s3a — not just the local filesystem.

    def _jpath(self, p: str):
        return self.table._jvm().org.apache.hadoop.fs.Path(p)

    def _load(self):
        """(bits, synced_version) or None when absent/corrupt/mismatched."""
        import numpy as np

        fs = self.table._fs()
        jp = self._jpath(self.path)
        try:
            if not fs.exists(jp):
                return None
            stream = fs.open(jp)
            try:
                raw = bytes(
                    self.table._jvm().org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            finally:
                stream.close()
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
            return bits, int(meta["synced_version"]), meta.get("synced_current")
        except Exception:  # noqa: BLE001 — any corruption means rebuild
            return None

    def _store(self, bits, version: int, current: str | None) -> None:
        meta = json.dumps(
            {
                "num_bits": self.num_bits,
                "num_hashes": self.num_hashes,
                "synced_version": int(version),
                # the current dir the synced version pointed at: the
                # O(delta) path is only sound for append-shaped commits
                # (current untouched); a merge/snapshot/migration that
                # REPLACES current can carry fingerprints the closed
                # delta never sees, so a changed current forces rebuild
                "synced_current": current,
            }
        ).encode()
        payload = _MAGIC + struct.pack("<I", len(meta)) + meta + bits.tobytes()
        fs = self.table._fs()
        tmp = self._jpath(f"{self.path}.tmp.{os.getpid()}")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(payload))
        finally:
            out.close()
        dest = self._jpath(self.path)
        # delete-then-rename (Hadoop rename refuses an existing dest on
        # some filesystems).  A crash in the gap leaves NO sidecar -> the
        # next sync() full-rebuilds; never an inconsistent bitmap.
        if fs.exists(dest):
            fs.delete(dest, False)
        fs.rename(tmp, dest)

    # -- sync -------------------------------------------------------------

    def _fold(self, fps: DataFrame, into=None):
        fresh = build_fingerprint_bloom(
            fps.select(F.col(self.fp_col)), self.fp_col, self.num_bits, self.num_hashes
        )
        return fresh if into is None else (into | fresh)

    def sync(self):
        """Bring the bitmap up to the table's current version; returns
        the numpy uint8 bitmap.  O(delta) when the stored version's
        delta is recoverable, O(corpus) rebuild otherwise."""
        return self._sync()[0]

    def _sync(self):
        """(bits, synced_version) — the version rides along so callers
        needing both don't re-read the manifest."""
        import numpy as np

        man = self.table.manifest() if self.table.exists() else None
        ver = int(man["version"]) if man else 0
        cur = man.get("current") if man else None
        state = self._load()
        if state is not None:
            bits, synced, synced_cur = state
            if synced == ver:
                return bits, ver
            # O(delta) only when every commit since `synced` was
            # append-shaped: the current dir must be the very one the
            # sidecar was synced against (sidecars written before the
            # current-dir tag existed have synced_cur=None → rebuild).
            if 0 < synced < ver and synced_cur is not None and synced_cur == cur:
                try:
                    delta = self.table.read_closed_delta(synced)
                    bits = self._fold(delta, into=bits)
                    self._store(bits, ver, cur)
                    return bits, ver
                except Exception:  # noqa: BLE001 — unrecoverable delta: rebuild
                    pass
        if ver == 0:
            bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        else:
            bits = self._fold(self.table.read())
        self._store(bits, ver, cur)
        return bits, ver

    # -- use --------------------------------------------------------------

    def dedup(self, incoming: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        """`bloom_incremental_dedup` against the table, with the bitmap
        served from the synced sidecar instead of rebuilt per call."""
        bits, ver = self._sync()
        if self._bc is None or self._bc_version != ver:
            old = self._bc
            self._bc = incoming.sparkSession.sparkContext.broadcast(bits.tobytes())
            self._bc_version = ver
            if old is not None:
                old.unpersist(blocking=False)
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
            prebuilt_bits=self._bc,
        )
