"""Dump manifest: the Spark-side analog of the reference's toc.dat +
metadata.json (internal/db/postgres/cmd/dump.go:435-489,
storage/metadata_json.go) and schema snapshot with diff support
(pkg/toolkit/database_schema.go).

A dump directory is: one parquet dir per table + `_manifest.json` holding
schema snapshot, PK/FK metadata, sequence states, applied transformations,
dependency topo order, and engine salt/seed for reproducibility.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame

from greenmask_spark.subset.graph import FKGraph, Reference, condense, topo_order

MANIFEST_NAME = "_manifest.json"


def _local_path(path: str) -> str | None:
    """Local filesystem path for a dump dir, or None when the URI needs
    a Hadoop filesystem (s3a://, abfss://, hdfs://, …). ``file://`` URIs
    strip to their path — plain Python IO handles them; a bare path is
    already local."""
    if "://" not in path:
        return path
    from urllib.parse import urlparse

    u = urlparse(path)
    if u.scheme == "file":
        return u.path or "/"
    return None


def _hadoop_write_text(path: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API of the
    active session — the same resolver the parquet writers use, so the
    manifest lands next to the data on ANY supported scheme."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(f"no active SparkSession to resolve {path!r}")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read_text(path: str) -> str:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(f"no active SparkSession to resolve {path!r}")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


@dataclass
class TableMeta:
    name: str
    columns: list[dict]                     # [{name, type, nullable}]
    primary_key: list[str] = field(default_factory=list)
    row_count: int | None = None
    sequence_next: int | None = None        # reference: entries/sequence.go setval


@dataclass
class Manifest:
    tables: list[TableMeta]
    references: list[dict] = field(default_factory=list)
    restore_order: list[str] = field(default_factory=list)  # parents first
    transformations: list[dict] = field(default_factory=list)
    salt: str = ""
    seed: int | None = None
    created_at: float = 0.0
    #: per-table storage format ("parquet" | "copy"); read_dump dispatches
    #: on this instead of sniffing the directory (hive-partitioned parquet
    #: has no top-level .parquet file, and remote FS URIs can't be listed)
    data_format: str = "parquet"

    def to_json(self) -> str:
        return json.dumps(
            {
                "tables": [asdict(t) for t in self.tables],
                "references": self.references,
                "restore_order": self.restore_order,
                "transformations": self.transformations,
                "salt": self.salt,
                "seed": self.seed,
                "created_at": self.created_at,
                "data_format": self.data_format,
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "Manifest":
        d = json.loads(text)
        return cls(
            tables=[TableMeta(**t) for t in d["tables"]],
            references=d.get("references", []),
            restore_order=d.get("restore_order", []),
            transformations=d.get("transformations", []),
            salt=d.get("salt", ""),
            seed=d.get("seed"),
            created_at=d.get("created_at", 0.0),
            data_format=d.get("data_format", "parquet"),
        )

    def fk_graph(self) -> FKGraph:
        return FKGraph(
            tables=[t.name for t in self.tables],
            references=[
                Reference(
                    child=r["child"],
                    parent=r["parent"],
                    fk_columns=tuple(r["fk_columns"]),
                    pk_columns=tuple(r["pk_columns"]),
                    nullable=r.get("nullable", False),
                    condition=r.get("condition"),
                )
                for r in self.references
            ],
        )


def build_manifest(
    tables: dict[str, DataFrame],
    graph: FKGraph | None = None,
    primary_keys: dict[str, list[str]] | None = None,
    sequences: dict[str, str] | None = None,
    transformations: list[dict] | None = None,
    salt: str = "",
    seed: int | None = None,
    with_counts: bool = False,
    data_format: str = "parquet",
) -> Manifest:
    """Snapshot schema + metadata. ``sequences`` maps table → serial column;
    the next value is max(col)+1 (reference dumpers/sequence.go:27-41)."""
    pks = primary_keys or {}
    seqs = sequences or {}
    metas = []
    for name, df in tables.items():
        seq_next = None
        if name in seqs:
            from pyspark.sql import functions as F

            row = df.agg(F.max(seqs[name]).alias("m")).collect()[0]
            seq_next = (row.m or 0) + 1
        metas.append(
            TableMeta(
                name=name,
                columns=[
                    {"name": f.name, "type": f.dataType.simpleString(),
                     "nullable": f.nullable}
                    for f in df.schema.fields
                ],
                primary_key=pks.get(name, []),
                row_count=df.count() if with_counts else None,
                sequence_next=seq_next,
            )
        )

    refs_json, order = [], list(tables)
    if graph is not None:
        refs_json = [
            {
                "child": r.child, "parent": r.parent,
                "fk_columns": list(r.fk_columns),
                "pk_columns": list(r.pk_columns),
                "nullable": r.nullable, "condition": r.condition,
            }
            for r in graph.references
        ]
        comps, cid, cadj = condense(graph)
        order = [t for comp_id in topo_order(cadj) for t in comps[comp_id]
                 if t in tables]

    return Manifest(
        tables=metas,
        references=refs_json,
        restore_order=order,
        transformations=transformations or [],
        salt=salt,
        seed=seed,
        created_at=time.time(),
        data_format=data_format,
    )


def write_manifest(manifest: Manifest, out_dir: str) -> str:
    """Write ``_manifest.json`` into the dump dir. Scheme-aware: bare
    paths and ``file://`` URIs use plain Python IO; any other scheme
    (s3a://, abfss://, hdfs://) routes through the Hadoop FileSystem of
    the active session — the same resolver the table writers use."""
    local = _local_path(out_dir)
    if local is not None:
        os.makedirs(local, exist_ok=True)
        path = os.path.join(local, MANIFEST_NAME)
        with open(path, "w") as f:
            f.write(manifest.to_json())
        return path
    path = out_dir.rstrip("/") + "/" + MANIFEST_NAME
    _hadoop_write_text(path, manifest.to_json())
    return path


def read_manifest(dump_dir: str) -> Manifest:
    local = _local_path(dump_dir)
    if local is not None:
        with open(os.path.join(local, MANIFEST_NAME)) as f:
            return Manifest.from_json(f.read())
    return Manifest.from_json(
        _hadoop_read_text(dump_dir.rstrip("/") + "/" + MANIFEST_NAME))
