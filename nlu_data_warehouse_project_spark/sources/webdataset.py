"""WebDataset-style tar-shard export/import for training corpora.

The interchange format sequence-training loaders actually consume
(webdataset/torchdata): a directory of ``shard-NNNNN.tar`` files, each
holding one ``{key}.{ext}`` entry per sample, streamed sequentially at
train time.  The writer here builds each shard INSIDE one partition
(no driver collect, no shuffle beyond the explicit shard assignment);
the reader turns shards back into a DataFrame via ``binaryFile`` +
an Arrow-batched tar parse, so a corpus can round-trip engine ⇄
trainer without a row-by-row export script.

Determinism: shard assignment is the shared md5 bucket (partition- and
run-independent), and entries within a shard are written in key order
— two runs produce byte-identical shards (modulo tar mtime fields,
which are pinned to 0).

Scale notes: one shard = one partition = one task; ``shard_size_rows``
bounds memory per task.  The writer targets a filesystem PATH visible
to every executor (local dir in local mode; a shared/fuse mount on a
cluster — tar construction is partition-local either way).  The reader
is fully location-transparent (``binaryFile`` goes through Hadoop FS).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import urllib.parse
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


class IncompleteShardSetError(RuntimeError):
    """The shard directory has no committed manifest (the export job
    never finished) or a manifest entry is missing on disk — refusing
    to train on a silently partial corpus."""


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    ext: str = "txt",
    rows_per_shard: int = 1000,
    seed: int = 42,
    payload_col: str | None = None,
    payload_ext: str = "bin",
    meta_cols: list[str] | None = None,
) -> int:
    """Export ``df`` as WebDataset tar shards; returns the shard count.

    Each sample key contributes up to three entries, the multimodal
    layout trainers expect: ``{key}.{ext}`` (text), ``{key}.{payload_ext}``
    (an opaque BINARY column — image/audio bytes — when ``payload_col``
    is given), and ``{key}.json`` (the ``meta_cols`` as a JSON object,
    canonical key order).  Shard id = md5-bucket(key) mod n_shards —
    deterministic and engine-portable like every sampler here, so a
    re-export after a node loss produces the same shard membership.
    NULL text/payload write empty entries (the trainer's collate
    decides policy); NULL keys are refused — a sample without identity
    cannot round-trip.

    Commit protocol (ADVICE r8): each task writes its shard to a
    uuid-fresh temp name and atomically renames it into place (a
    retried or speculative attempt can never leave a torn tar — the
    last rename wins, and shard content is deterministic so both
    attempts carry identical bytes), and the driver publishes
    ``_manifest.json`` (the sorted non-empty shard list) only after
    the whole job succeeds.  A job that dies mid-export leaves temp
    litter and possibly some final shards but NO manifest, and
    ``read_webdataset_shards`` refuses a manifest-less directory — a
    partial shard set is never mistaken for a complete one.  A
    RE-export over a non-empty directory first retracts the previous
    manifest, so a re-export that dies mid-flight cannot leave the old
    manifest live over partially overwritten shards (readers see "no
    committed export" until the new manifest publishes — the export is
    not atomic for concurrent readers, by design).
    """
    from ..operators.sampling import hash_bucket

    # the writer commits shards via executor-local os.replace and the
    # manifest via a driver-local rename: that contract requires a
    # posix-visible path shared by driver and executors.  A remote
    # scheme (hdfs://, s3a://, ...) would "succeed" with shards
    # scattered across machines and an unreadable export — fail fast
    # instead (ADVICE r9).  file:// is accepted and stripped.
    parsed = urllib.parse.urlparse(path)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else path
    else:
        raise ValueError(
            f"write_webdataset_shards needs a posix-visible path shared by "
            f"driver and executors; got scheme {parsed.scheme!r} ({path}). "
            "Export to a shared mount (NFS/local) and distcp, or extend the "
            "writer to route through the Hadoop FileSystem like the reader."
        )

    guard = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(key_col).alias("__nk"),
        F.count_distinct(key_col).alias("__nd"),
    ).collect()[0]
    n_rows = guard["__n"]
    if guard["__nk"] != n_rows:
        raise ValueError(f"NULL {key_col} rows cannot be exported to keyed shards")
    if guard["__nd"] != n_rows:
        raise ValueError(
            f"{key_col} is not unique ({n_rows - guard['__nd']} duplicate rows): "
            "duplicate tar entry names would silently shadow samples — dedup first"
        )
    n_shards = max(1, -(-n_rows // rows_per_shard))
    os.makedirs(path, exist_ok=True)
    # retract any previous export's manifest BEFORE touching shards: a
    # crash below must leave the directory unreadable, never the old
    # manifest over a mixed-generation shard set
    try:
        os.remove(os.path.join(path, _MANIFEST))
    except FileNotFoundError:
        pass
    shard = F.pmod(hash_bucket(key_col, seed, buckets=1 << 30), F.lit(n_shards))
    cols = [
        F.col(key_col).cast("string").alias("__key"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
        shard.alias("__shard"),
    ]
    if payload_col is not None:
        cols.append(F.coalesce(F.col(payload_col), F.lit(b"")).alias("__payload"))
    if meta_cols:
        # canonical JSON (sorted keys, no floats mangled by the engine):
        # built JVM-side so the bytes are engine-stable
        cols.append(
            F.to_json(F.struct(*[F.col(c) for c in sorted(meta_cols)])).alias("__meta")
        )
    assigned = df.select(*cols).repartition(n_shards, "__shard")

    def write_partition(rows):
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["__shard"], []).append(r)
        for sid, items in by_shard.items():
            name = f"shard-{sid:05d}.tar"
            tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}-{name}")
            with tarfile.open(tmp, "w") as tar:

                def add(entry: str, data: bytes) -> None:
                    info = tarfile.TarInfo(name=entry)
                    info.size = len(data)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(data))

                for r in sorted(items, key=lambda r: r["__key"]):
                    add(f"{r['__key']}.{ext}", r["__text"].encode("utf-8"))
                    if payload_col is not None:
                        add(f"{r['__key']}.{payload_ext}", bytes(r["__payload"]))
                    if meta_cols:
                        add(f"{r['__key']}.json", r["__meta"].encode("utf-8"))
            # same-directory rename: atomic on POSIX/HDFS-style stores —
            # a reader (or a racing attempt) sees the old bytes or the
            # new, never a torn file
            os.replace(tmp, os.path.join(path, name))
            yield name

    # rdd.mapPartitions (not foreachPartition) so each task reports the
    # shard names it committed; the collect is bounded by n_shards
    # strings — driver-safe at any data size
    written = sorted(assigned.rdd.mapPartitions(write_partition).collect())
    if len(set(written)) != len(written):
        raise RuntimeError(f"duplicate shard files written: {written}")
    manifest = {"n_shards": n_shards, "n_rows": n_rows, "shards": written}
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}-manifest")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return n_shards


def read_webdataset_shards(
    spark: SparkSession,
    path: str,
    ext: str = "txt",
    key_col: str = "key",
    text_col: str = "text",
) -> DataFrame:
    """Read a WebDataset shard directory back into (key, text, shard)
    rows.  ``binaryFile`` streams each tar through Hadoop FS (local,
    hdfs, s3a); the parse is one Arrow batch per shard — shards are
    the unit of parallelism exactly as they are at training time.

    Reads ONLY the shards the committed ``_manifest.json`` lists
    (ADVICE r8): no manifest → the export never completed →
    ``IncompleteShardSetError``; a listed shard missing on disk raises
    too.  Stale shards from an earlier export to the same path are
    ignored — the manifest is the source of truth, not the glob.  The
    manifest and existence checks go through the Hadoop FileSystem
    (like ``binaryFile`` itself), so the read path stays
    location-transparent — local, hdfs://, s3a:// — even though the
    WRITER targets a posix-visible path by contract."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jman = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _MANIFEST))
    fs = jman.getFileSystem(hconf)
    if not fs.exists(jman):
        raise IncompleteShardSetError(
            f"no {_MANIFEST} under {path}: the shard export never completed "
            "(or predates the manifest protocol) — re-run write_webdataset_shards"
        )
    stream = fs.open(jman)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    manifest = json.loads(raw.decode("utf-8"))
    shards = manifest["shards"]
    missing = [
        s
        for s in shards
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(os.path.join(path, s)))
    ]
    if missing:
        raise IncompleteShardSetError(f"manifest lists missing shard files: {missing}")
    if not shards:
        return spark.createDataFrame(
            [], f"{key_col} string, {text_col} string, shard string"
        )
    bins = spark.read.format("binaryFile").load([os.path.join(path, s) for s in shards])
    suffix = "." + ext

    def parse(batches):
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(fpath)
                keys, texts = [], []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        if not m.name.endswith(suffix):
                            continue
                        keys.append(m.name[: -len(suffix)])
                        texts.append(tar.extractfile(m).read().decode("utf-8"))
                yield pd.DataFrame({key_col: keys, text_col: texts, "shard": shard})

    return bins.select("path", "content").mapInPandas(
        parse, f"{key_col} string, {text_col} string, shard string"
    )
