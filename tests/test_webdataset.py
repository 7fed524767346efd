"""WebDataset tar-shard sink/source: roundtrip, determinism, and the
keyed-shard contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nlu_data_warehouse_project_spark.sources.webdataset import (
    read_webdataset_shards,
    write_webdataset_shards,
)


def _docs(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
    )


def test_webdataset_roundtrip(spark, tmp_path):
    docs = _docs(spark, 50)
    out = str(tmp_path / "wds")
    n_shards = write_webdataset_shards(docs, out, rows_per_shard=20)
    assert n_shards == 3
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert 1 <= len(tars) <= 3  # empty buckets write no file

    back = read_webdataset_shards(spark, out)
    got = {(r["key"], r["text"]) for r in back.collect()}
    want = {(str(r["doc_id"]), r["text"]) for r in docs.collect()}
    assert got == want


def test_webdataset_shards_are_deterministic(spark, tmp_path):
    docs = _docs(spark, 30)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(docs, a, rows_per_shard=10)
    write_webdataset_shards(docs.repartition(7), b, rows_per_shard=10)  # different layout
    fa = sorted(f for f in os.listdir(a) if f.endswith(".tar"))
    fb = sorted(f for f in os.listdir(b) if f.endswith(".tar"))
    assert fa == fb
    for f in fa:
        assert open(os.path.join(a, f), "rb").read() == open(os.path.join(b, f), "rb").read()


def test_webdataset_refuses_null_keys_and_keeps_null_text(spark, tmp_path):
    bad = spark.createDataFrame([(None, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        write_webdataset_shards(bad, str(tmp_path / "bad"))

    nulltext = spark.createDataFrame([(1, None), (2, "ok")], "doc_id long, text string")
    out = str(tmp_path / "nt")
    write_webdataset_shards(nulltext, out, rows_per_shard=10)
    got = {r["key"]: r["text"] for r in read_webdataset_shards(spark, out).collect()}
    assert got == {"1": "", "2": "ok"}


def test_webdataset_multimodal_entries(spark, tmp_path):
    """The (txt + bin + json) per-key layout: payload bytes intact,
    metadata canonical, all three entries share the key."""
    import io
    import tarfile

    rows = [(1, "caption one", bytearray(b"\x89PNG\r\nfakebytes"), "en", 11),
            (2, "caption two", None, "vi", 22)]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload binary, lang string, n int")
    out = str(tmp_path / "mm")
    write_webdataset_shards(
        df, out, payload_col="payload", payload_ext="png", meta_cols=["lang", "n"],
        rows_per_shard=10,
    )
    entries = {}
    for f in sorted(f for f in os.listdir(out) if f.endswith(".tar")):
        with tarfile.open(os.path.join(out, f)) as tar:
            for m in tar.getmembers():
                entries[m.name] = tar.extractfile(m).read()
    assert entries["1.png"] == b"\x89PNG\r\nfakebytes"
    assert entries["2.png"] == b""                      # NULL payload -> empty entry
    assert entries["1.txt"] == b"caption one"
    import json
    assert json.loads(entries["1.json"]) == {"lang": "en", "n": 11}
    # text-only reader still works against multimodal shards
    back = read_webdataset_shards(spark, out)
    assert {r["key"]: r["text"] for r in back.collect()} == {"1": "caption one", "2": "caption two"}


def test_curate_then_export_shards_end_to_end(spark, sf_smoke, tmp_path):
    """The pipeline's whole point in one pass: curate the corpus, keep
    the train split, export WebDataset shards, read them back — the set
    a trainer sees is exactly the curated train split (redacted text)."""
    from nlu_data_warehouse_project_spark.pipeline.curate import curate_corpus

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    curated = curate_corpus(docs, min_tokens=3)
    train = curated.filter(F.col("split") == "train").select(
        "doc_id", F.col("redacted").alias("text")
    )
    out = str(tmp_path / "train-shards")
    write_webdataset_shards(train, out, rows_per_shard=100)

    back = read_webdataset_shards(spark, out)
    got = {(r["key"], r["text"]) for r in back.collect()}
    want = {(str(r["doc_id"]), r["text"] or "") for r in train.collect()}
    assert got == want and len(got) > 0


def test_webdataset_refuses_duplicate_keys(spark, tmp_path):
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="not unique"):
        write_webdataset_shards(dup, str(tmp_path / "dup"))


def test_webdataset_reader_refuses_uncommitted_export(spark, tmp_path):
    """ADVICE r8: a shard directory without a committed manifest (the
    export job died mid-flight) must not read as a complete corpus,
    and a manifest entry missing on disk is equally fatal."""
    from nlu_data_warehouse_project_spark.sources.webdataset import (
        IncompleteShardSetError,
    )

    docs = _docs(spark, 30)
    out = str(tmp_path / "wds")
    write_webdataset_shards(docs, out, rows_per_shard=10)

    # simulate a died-before-commit export: shards present, no manifest
    os.remove(os.path.join(out, "_manifest.json"))
    with pytest.raises(IncompleteShardSetError, match="never completed"):
        read_webdataset_shards(spark, out)

    # re-commit, then lose a listed shard out-of-band
    write_webdataset_shards(docs, out, rows_per_shard=10)
    victim = sorted(f for f in os.listdir(out) if f.endswith(".tar"))[0]
    os.remove(os.path.join(out, victim))
    with pytest.raises(IncompleteShardSetError, match="missing shard"):
        read_webdataset_shards(spark, out)


def test_webdataset_manifest_ignores_stale_shards(spark, tmp_path):
    """A smaller re-export over the same path: shards from the earlier,
    larger export that the new manifest does not list are ignored — the
    manifest, not the directory glob, defines the corpus."""
    out = str(tmp_path / "wds")
    write_webdataset_shards(_docs(spark, 300), out, rows_per_shard=10)  # 30 shards
    write_webdataset_shards(_docs(spark, 20), out, rows_per_shard=10)   # 2 shards
    back = read_webdataset_shards(spark, out)
    got = {r["key"] for r in back.collect()}
    assert got == {str(i) for i in range(20)}


def test_webdataset_no_temp_litter_after_success(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset_shards(_docs(spark, 30), out, rows_per_shard=10)
    assert not [f for f in os.listdir(out) if f.startswith(".tmp-")]


def test_reexport_crash_cannot_leave_stale_manifest(spark, tmp_path, monkeypatch):
    """A re-export that dies mid-flight (here: at manifest publish,
    after overwriting some shards) must not leave the PREVIOUS
    manifest live over a mixed-generation shard set: the old manifest
    is retracted before any shard is touched, so the reader refuses
    the directory until a new export commits."""
    import nlu_data_warehouse_project_spark.sources.webdataset as wds
    from nlu_data_warehouse_project_spark.sources.webdataset import (
        IncompleteShardSetError,
    )

    out = str(tmp_path / "wds")
    write_webdataset_shards(_docs(spark, 300), out, rows_per_shard=10)  # gen A
    assert read_webdataset_shards(spark, out).count() == 300

    class Boom(RuntimeError):
        pass

    def exploding_dump(*a, **k):
        raise Boom("crash at manifest publish")

    monkeypatch.setattr(wds.json, "dump", exploding_dump)
    with pytest.raises(Boom):
        write_webdataset_shards(_docs(spark, 20), out, rows_per_shard=10)  # gen B
    monkeypatch.undo()

    # gen B overwrote shard files but never committed; gen A's manifest
    # was retracted up front -> the directory reads as UNCOMMITTED, not
    # as a silently mixed gen A
    with pytest.raises(IncompleteShardSetError, match="never completed"):
        read_webdataset_shards(spark, out)

    # a successful re-export recovers the directory
    write_webdataset_shards(_docs(spark, 20), out, rows_per_shard=10)
    assert read_webdataset_shards(spark, out).count() == 20


def test_webdataset_writer_refuses_remote_scheme(spark, tmp_path):
    """ADVICE r9: the writer's commit protocol is posix-rename based;
    a remote scheme would scatter shards across machines and publish
    an unreadable export — fail fast instead.  file:// is accepted."""
    from nlu_data_warehouse_project_spark.sources.webdataset import (
        write_webdataset_shards,
    )

    df = spark.createDataFrame([("k1", "hello")], "doc_id string, text string")
    with pytest.raises(ValueError, match="posix-visible"):
        write_webdataset_shards(df, "s3a://bucket/corpus")
    with pytest.raises(ValueError, match="posix-visible"):
        write_webdataset_shards(df, "hdfs://nn/corpus")
    out = str(tmp_path / "wd-file-scheme")
    assert write_webdataset_shards(df, "file://" + out, rows_per_shard=10) == 1
    assert os.path.exists(os.path.join(out, "_manifest.json"))
