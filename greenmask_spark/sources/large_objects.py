"""Large-object (PG LO / blob) dump & restore — the Spark analog of the
reference's blobs pipeline (internal/db/postgres/dumpers/large_object.go:37-164,
entries/large_object.go; layout: one ``blob_{oid}.dat[.gz]`` per object
plus a ``blobs.toc`` with lines ``{oid} blob_{oid}.dat``).

PostgreSQL stores large objects as 2048-byte pages in ``pg_largeobject``
(loid, pageno, data) — that page table is what a JDBC scan can read in
parallel, so the operators here work on the PAGE representation:

- ``read_large_object_pages`` — partitioned JDBC scan of pg_largeobject
  (parallel across loid ranges; the reference streams one object at a
  time through lo_open/lo_read on a single connection).
- ``reassemble_large_objects`` — pages → (loid, data) whole blobs; one
  shuffle on loid, page order restored by an array_sort on (pageno,
  chunk) structs.
- ``paginate_large_objects`` — the inverse, for restoring through a
  page-level INSERT sink (sources/restore.py) without materializing any
  blob on the driver.
- ``dump_large_objects`` / ``read_large_object_dump`` — the reference's
  per-object file layout (+ gzip), written per-partition; the parquet
  alternative is just ``write_dump({"_blobs": blobs, ...})``, which is
  the 100 TB path (columnar, splittable, no per-object file fan-out).
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: PostgreSQL's LOBLKSIZE (BLCKSZ/4): pg_largeobject page payload size
LO_PAGE_SIZE = 2048


def read_large_object_pages(
    spark: SparkSession,
    url: str,
    num_partitions: int = 8,
    max_loid: int = 1 << 31,
    properties: dict | None = None,
) -> DataFrame:
    """Partitioned scan of pg_largeobject: (loid, pageno, data)."""
    from greenmask_spark.sources.io import read_jdbc_table

    return read_jdbc_table(
        spark,
        url,
        "pg_largeobject",
        partition_column="loid",
        num_partitions=num_partitions,
        lower_bound=0,
        upper_bound=max_loid,
        properties=properties,
    )


def reassemble_large_objects(
    pages: DataFrame,
    loid_col: str = "loid",
    pageno_col: str = "pageno",
    data_col: str = "data",
) -> DataFrame:
    """(loid, data): concatenate pages in page order.

    One shuffle keyed on loid; the in-order binary fold runs per blob on
    the already-aggregated page array (pages/blob = size/2048 — the HOF
    cost is per-page, not per-byte). A blob must fit one task's memory —
    true by construction for PG large objects (≤ 4 TB is the PG limit,
    but blobs that size should use the page-level restore path instead).
    """
    chunks = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(pageno_col).alias("p"), F.col(data_col).alias("c")
            )
        )
    )
    folded = F.aggregate(
        F.transform(chunks, lambda s: s["c"]),
        F.lit(b""),
        lambda acc, c: F.concat(acc, c),
    )
    return (
        pages.groupBy(F.col(loid_col).alias("loid"))
        .agg(folded.alias("data"))
    )


def paginate_large_objects(
    blobs: DataFrame,
    loid_col: str = "loid",
    data_col: str = "data",
    page_size: int = LO_PAGE_SIZE,
) -> DataFrame:
    """(loid, pageno, data): split blobs back into pg_largeobject pages —
    the restore-side inverse; feeds the INSERT sink without any blob ever
    touching the driver. Empty blobs emit a single empty page 0 (matching
    a zero-length large object created by lo_create)."""
    src = blobs.select(
        F.col(loid_col).alias("loid"), F.col(data_col).alias("__data")
    )
    n_pages = F.greatest(
        F.ceil(F.length(F.col("__data")) / F.lit(page_size)), F.lit(1)
    ).cast("int")
    return src.select(
        "loid",
        "__data",
        F.explode(F.sequence(F.lit(0), n_pages - 1)).alias("pageno"),
    ).select(
        "loid",
        "pageno",
        F.expr(
            f"substring(__data, pageno * {page_size} + 1, {page_size})"
        ).alias("data"),
    )


def dump_large_objects(
    blobs: DataFrame,
    out_dir: str,
    compress: bool = True,
    loid_col: str = "loid",
    data_col: str = "data",
) -> int:
    """Write the reference's blob layout: ``blob_{oid}.dat[.gz]`` per
    object + ``blobs.toc`` (``{oid} blob_{oid}.dat`` lines, oid order —
    byte-compatible with generateBlobsToc, large_object.go:86-100).

    Files are written per-partition (parallel across blobs); requires a
    filesystem path all executors can reach (local[...]/NFS/fuse mount).
    For object stores or very many blobs prefer the parquet dump path.
    Returns the number of objects written."""
    os.makedirs(out_dir, exist_ok=True)
    src = blobs.select(
        F.col(loid_col).alias("loid"), F.col(data_col).alias("data")
    )

    def write_part(rows):
        for r in rows:
            name = f"blob_{r.loid}.dat" + (".gz" if compress else "")
            path = os.path.join(out_dir, name)
            payload = bytes(r.data) if r.data is not None else b""
            if compress:
                # mtime=0: deterministic bytes for identical payloads
                with open(path, "wb") as fh:
                    with gzip.GzipFile(fileobj=fh, mode="wb", mtime=0) as gz:
                        gz.write(payload)
            else:
                with open(path, "wb") as fh:
                    fh.write(payload)
        return iter(())

    src.rdd.mapPartitions(write_part).count()  # force the writes
    # the toc is a single-partition sorted text WRITE, not a collect:
    # loids never materialize on the driver (a billion-blob dump would
    # hold a billion ints in driver memory otherwise); one partition is
    # correct here because the toc is one file by contract
    import glob
    import shutil

    tmp = os.path.join(out_dir, "_blobs_toc_tmp")
    (
        src.select(
            F.col("loid").cast("long").alias("loid"),
            F.format_string("%d blob_%d.dat", "loid", "loid").alias("value"),
        )
        .repartition(1)
        .sortWithinPartitions("loid")
        .select("value")
        .write.mode("overwrite")
        .text(tmp)
    )
    parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
    toc = os.path.join(out_dir, "blobs.toc")
    if parts:
        shutil.move(parts[0], toc)
    else:  # zero blobs: legitimate empty dump
        open(toc, "w").close()
    shutil.rmtree(tmp, ignore_errors=True)
    # the object count comes from the toc just written (a streaming
    # line count of one local file), NOT a third src.count() action —
    # a re-evaluated lineage over a live source could disagree with
    # the files actually on disk
    with open(toc) as fh:
        return sum(1 for _ in fh)


def read_large_object_dump(
    spark: SparkSession, dump_dir: str
) -> DataFrame:
    """Read a blob-file dump back to (loid, data) via the toc. The file
    list is parallelized so each task decodes a slice of the objects."""
    with open(os.path.join(dump_dir, "blobs.toc")) as fh:
        entries = [line.split() for line in fh if line.strip()]

    def read_one(entry):
        oid, name = int(entry[0]), entry[1]
        path = os.path.join(dump_dir, name)
        if os.path.exists(path + ".gz"):
            with gzip.open(path + ".gz", "rb") as fh:
                return (oid, fh.read())
        with open(path, "rb") as fh:
            return (oid, fh.read())

    schema = "loid long, data binary"
    if not entries:
        # empty dump (zero blobs) is legitimate — toDF cannot infer a
        # schema from an empty RDD, so build the empty frame explicitly
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(entries, max(1, len(entries) // 64))
    return rdd.map(read_one).toDF(schema)
