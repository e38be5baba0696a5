"""WebDataset tar-shard sink/source (sources/webdataset).

The format contract under test: members named <key>.<ext>, adjacent
members of one key form a sample, shards are plain tars any tar tool
can read, shard bytes are deterministic run-over-run, and a NULL cell
just omits that member (the missing-modality convention)."""

import glob
import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from greenmask_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


def _sha_files(d):
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(d, "*.tar"))
    }


def test_roundtrip_bytes_exact(spark, sf_dir, tmp_path):
    """write → read restores every key and every payload byte of the
    real documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "wds")
    summary = write_webdataset(
        docs, out, members={"txt": "text"}, n_shards=4
    ).collect()
    assert len(summary) == 4
    assert sum(r.n_samples for r in summary) == docs.count()

    back = read_webdataset(spark, out + "/*.tar")
    orig = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.encode("text", "utf-8").alias("b"),
    )
    joined = back.join(orig, "key", "full_outer").select(
        "key",
        (F.col("payload") == F.col("b")).alias("eq"),
    )
    assert joined.filter(
        ~F.coalesce("eq", F.lit(False))
    ).count() == 0
    assert back.count() == docs.count()


def test_shard_bytes_deterministic(spark, sf_dir, tmp_path):
    """Two independent writes of the same rows produce byte-identical
    shards (pinned tar metadata + hash-assigned streams + in-shard
    key sort): the det_shuffle/COPY-codec reproducibility contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(docs, d1, members={"txt": "text"},
                     n_shards=4).collect()
    # different input partitioning must not change the bytes
    write_webdataset(docs.repartition(13), d2, members={"txt": "text"},
                     n_shards=4).collect()
    h1, h2 = _sha_files(d1), _sha_files(d2)
    assert h1 and h1 == h2


def test_multi_member_samples_adjacent(spark, tmp_path):
    """A sample's members are adjacent in the tar (the WebDataset
    sequential-reader contract) in fixed (key, ext) order, and a NULL
    cell omits only that member."""
    rows = [
        (1, "one", b"\x01\x02"),
        (2, "two", None),          # missing binary modality
        (3, None, b"\x03"),        # missing text modality
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, img binary")
    out = str(tmp_path / "wds")
    write_webdataset(
        df, out, members={"txt": "text", "bin": "img"}, n_shards=1
    ).collect()
    tars = glob.glob(out + "/*.tar")
    assert len(tars) == 1
    names = [m.name for m in tarfile.open(tars[0])]
    assert names == [
        "000000000001.bin", "000000000001.txt",
        "000000000002.txt",
        "000000000003.bin",
    ]


def test_read_depads_integer_keys(spark, tmp_path):
    rows = [(7, "x"), (123456, "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "wds")
    write_webdataset(df, out, members={"txt": "text"},
                     n_shards=1).collect()
    got = {r.key for r in read_webdataset(spark, out).collect()}
    assert got == {"7", "123456"}


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="members"):
        write_webdataset(df, "/tmp/x", members={})
    with pytest.raises(ValueError, match="not in df"):
        write_webdataset(df, "/tmp/x", members={"txt": "nope"})
    with pytest.raises(ValueError, match="extension"):
        write_webdataset(df, "/tmp/x", members={".txt": "text"})
    with pytest.raises(ValueError, match="n_shards"):
        write_webdataset(df, "/tmp/x", members={"txt": "text"},
                         n_shards=0)


def test_summary_accounts_for_every_member(spark, tmp_path):
    """Summary rows conserve samples/members and report real on-disk
    sizes; n_bytes equals the tar file size."""
    rows = [(i, f"doc {i}", bytes([i])) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, img binary")
    out = str(tmp_path / "wds")
    summary = write_webdataset(
        df, out, members={"txt": "text", "bin": "img"}, n_shards=3
    ).collect()
    assert sum(r.n_samples for r in summary) == 50
    assert sum(r.n_members for r in summary) == 100
    for r in summary:
        assert r.n_bytes == os.path.getsize(r.path)


def test_compose_with_multimodal_decode(spark, tmp_path):
    """The multimodal plumbing contract: binary members written
    through the tar round-trip into the PPM decoder unchanged —
    tar shards are a transport, not a transform."""
    from greenmask_spark.functions.multimodal import decode_image_bytes

    # tiny valid PPM P6: 2x1, maxval 255, pixels RGB
    ppm = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    df = spark.createDataFrame(
        [(1, ppm)], "doc_id long, img binary"
    )
    out = str(tmp_path / "wds")
    write_webdataset(df, out, members={"ppm": "img"},
                     n_shards=1).collect()
    rows = read_webdataset(spark, out).collect()
    assert len(rows) == 1 and rows[0].ext == "ppm"
    w, h, raw = decode_image_bytes(bytes(rows[0].payload))
    assert (w, h) == (2, 1) and raw == bytes([255, 0, 0, 0, 255, 0])
