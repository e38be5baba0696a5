"""COPY text-format codec round-trip (pgcopy/encoder.go + decoder.go)."""

import datetime
import os
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from greenmask_spark.sources.copy_format import (
    NULL_MARKER,
    copy_decode,
    copy_encode,
    read_copy,
    write_copy,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("d", T.DateType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("amount", T.DecimalType(15, 2)),
    T.StructField("ratio", T.DoubleType()),
    T.StructField("blob", T.BinaryType()),
])

ROWS = [
    Row(id=1, name="plain", ok=True, d=datetime.date(2024, 1, 2),
        ts=datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
        amount=Decimal("1234.56"), ratio=1.5, blob=b"\x00\x01\xff"),
    Row(id=2, name="tab\there", ok=False, d=None, ts=None,
        amount=None, ratio=None, blob=None),
    Row(id=3, name="nl\nand\rcr", ok=None, d=datetime.date(1999, 12, 31),
        ts=datetime.datetime(1999, 12, 31, 23, 59, 59),
        amount=Decimal("-0.01"), ratio=-2.25, blob=b""),
    Row(id=4, name="back\\slash and \\N literal", ok=True,
        d=datetime.date(2000, 2, 29),
        ts=datetime.datetime(2000, 2, 29, 12, 0, 0, 1),
        amount=Decimal("0.00"), ratio=0.0, blob=b"ab"),
    Row(id=5, name=None, ok=False, d=datetime.date(2024, 6, 1),
        ts=datetime.datetime(2024, 6, 1, 0, 0, 0),
        amount=Decimal("9999999999999.99"), ratio=1e-10, blob=b"\xde\xad"),
]


def test_roundtrip_exact(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    back = copy_decode(copy_encode(df), SCHEMA)
    assert back.schema == SCHEMA
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_escaping_wire_format(spark):
    df = spark.createDataFrame(
        [Row(a="x\ty", b=None, c="\\N")],
        T.StructType([T.StructField("a", T.StringType()),
                      T.StructField("b", T.StringType()),
                      T.StructField("c", T.StringType())]),
    )
    [line] = copy_encode(df).collect()
    # data tab escaped, NULL is bare \N, literal "\N" string is "\\N"
    assert line.line == "x\\ty\t" + NULL_MARKER + "\t\\\\N"


def test_null_vs_literal_backslash_n(spark):
    """A literal string "\\N" must survive while SQL NULL maps to \\N."""
    schema = T.StructType([T.StructField("s", T.StringType())])
    df = spark.createDataFrame([("\\N",), (None,), ("",)], schema)
    back = copy_decode(copy_encode(df), schema)
    assert sorted([(r.s,) for r in back.collect()], key=str) == sorted(
        [("\\N",), (None,), ("",)], key=str)


def test_file_roundtrip_gzip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = os.path.join(str(tmp_path), "copy_out")
    write_copy(df, path)
    assert any(f.endswith(".gz") for f in os.listdir(path))
    back = read_copy(spark, path, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_customer_table_roundtrip(spark, tables):
    cust = tables["customer"]
    back = copy_decode(copy_encode(cust), cust.schema)
    assert back.schema == cust.schema
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, cust.collect()))
    assert a == b


def test_property_roundtrip_arbitrary_strings(spark):
    """Property: COPY encode∘decode is the identity on arbitrary unicode
    (tabs, newlines, backslashes, surrogate-free control chars, the \\N
    marker itself). Batched: one Spark job checks a whole corpus of
    generated examples."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # COPY text format cannot carry NUL (PostgreSQL text invariant, and
    # our decoder uses it as the unescape sentinel) — exclude \x00 only.
    texty = st.text(
        alphabet=st.characters(
            blacklist_characters="\x00", blacklist_categories=("Cs",)
        ),
        max_size=40,
    )
    schema = T.StructType([T.StructField("s", T.StringType())])

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.one_of(texty, st.none()), min_size=1, max_size=40))
    def check(batch):
        df = spark.createDataFrame([(s,) for s in batch], schema)
        back = copy_decode(copy_encode(df), schema)
        assert sorted([r.s for r in back.collect()], key=lambda x: (x is None, x)) \
            == sorted(batch, key=lambda x: (x is None, x))

    check()


def test_expression_only_plan(spark):
    """Codec must stay JVM-side: no Python eval nodes in the plan."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = copy_decode(copy_encode(df), SCHEMA)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dump_roundtrip_jsonl(spark, tables, tmp_path):
    """write_dump(fmt=json) → read_dump: schema comes from the manifest
    snapshot (no inference), values survive the text codec."""
    from pyspark.sql import functions as F

    from greenmask_spark.sources.io import read_dump, write_dump

    nation = tables["nation"]
    out = str(tmp_path / "jsondump")
    write_dump({"nation": nation}, out, fmt="json", compression="gzip")
    back = read_dump(spark, out)["nation"]
    assert [f.name for f in back.schema.fields] == [
        f.name for f in nation.schema.fields
    ]
    a = {tuple(r) for r in nation.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_jsonl_helpers_roundtrip(spark, tmp_path):
    from greenmask_spark.sources.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "a\nb", [1.5, 2.5]), (2, 'quote"inner', [0.0])],
        "id long, text string, vec array<double>",
    )
    p = str(tmp_path / "docs")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, "id long, text string, vec array<double>")
    assert {tuple((r.id, r.text, tuple(r.vec))) for r in back.collect()} == {
        (1, "a\nb", (1.5, 2.5)),
        (2, 'quote"inner', (0.0,)),
    }


def test_large_object_roundtrip(spark, tmp_path):
    """pages → reassemble → paginate → reassemble: byte-identical; dump
    layout matches the reference (blob_{oid}.dat.gz + blobs.toc)."""
    import gzip
    import os
    import random

    from greenmask_spark.sources.large_objects import (
        LO_PAGE_SIZE,
        dump_large_objects,
        paginate_large_objects,
        read_large_object_dump,
        reassemble_large_objects,
    )

    rng = random.Random(9)
    blobs = {
        100: rng.randbytes(3 * LO_PAGE_SIZE + 17),  # partial last page
        101: rng.randbytes(LO_PAGE_SIZE),           # exactly one page
        102: b"",                                    # empty LO
        103: rng.randbytes(5),
    }
    pages = [
        (oid, i, data[i * LO_PAGE_SIZE:(i + 1) * LO_PAGE_SIZE])
        for oid, data in blobs.items()
        for i in range(max(1, -(-len(data) // LO_PAGE_SIZE)))
    ]
    pdf = spark.createDataFrame(pages, "loid long, pageno int, data binary")

    got = {r.loid: bytes(r.data) for r in reassemble_large_objects(pdf).collect()}
    assert got == blobs

    back = paginate_large_objects(
        spark.createDataFrame(list(blobs.items()), "loid long, data binary")
    )
    got2 = {r.loid: bytes(r.data) for r in reassemble_large_objects(back).collect()}
    assert got2 == blobs
    # page shapes match pg_largeobject semantics
    bp = {(r.loid, r.pageno): bytes(r.data) for r in back.collect()}
    assert len(bp[(100, 3)]) == 17 and len(bp[(101, 0)]) == LO_PAGE_SIZE
    assert bp[(102, 0)] == b""

    out = str(tmp_path / "blobs")
    n = dump_large_objects(
        spark.createDataFrame(list(blobs.items()), "loid long, data binary"), out
    )
    assert n == 4
    toc = open(os.path.join(out, "blobs.toc")).read()
    assert toc == "".join(f"{o} blob_{o}.dat\n" for o in sorted(blobs))
    with gzip.open(os.path.join(out, "blob_103.dat.gz"), "rb") as fh:
        assert fh.read() == blobs[103]

    rd = {r.loid: bytes(r.data) for r in read_large_object_dump(spark, out).collect()}
    assert rd == blobs


def test_write_dump_with_blobs(spark, tables, tmp_path):
    from greenmask_spark.sources.io import write_dump
    from greenmask_spark.sources.large_objects import read_large_object_dump

    out = str(tmp_path / "dump_with_blobs")
    blobs = spark.createDataFrame([(7, b"abc"), (8, b"")],
                                  "loid long, data binary")
    write_dump({"nation": tables["nation"]}, out, blobs=blobs)
    back = {r.loid: bytes(r.data)
            for r in read_large_object_dump(spark, out + "/blobs").collect()}
    assert back == {7: b"abc", 8: b""}


def test_large_object_nondefault_columns_and_empty_dump(spark, tmp_path):
    from greenmask_spark.sources.large_objects import (
        dump_large_objects,
        paginate_large_objects,
        read_large_object_dump,
        reassemble_large_objects,
    )

    blobs = spark.createDataFrame([(5, b"xyz" * 1000)],
                                  "oid long, payload binary")
    pages = paginate_large_objects(blobs, loid_col="oid", data_col="payload")
    back = reassemble_large_objects(pages).collect()
    assert bytes(back[0].data) == b"xyz" * 1000

    out = str(tmp_path / "noblobs")
    n = dump_large_objects(
        spark.createDataFrame([], "loid long, data binary"), out)
    assert n == 0
    empty = read_large_object_dump(spark, out)
    assert empty.count() == 0 and empty.columns == ["loid", "data"]


def test_pgcopy_reference_vectors(spark):
    """The reference's own pgcopy test vectors
    (internal/db/postgres/pgcopy/row_test.go), ported as
    encode/decode expectations over the text codec:

    - TestDecode: '27\\they\\\\tmyname is\\\\nnoname\\t\\\\N' is three
      fields; the middle one decodes its \\t and \\n escapes, the last
      is NULL.
    - TestRow_SetColumn 'set literal': a value containing a real tab and
      newline encodes them as backslash escapes.
    - TestRow_SetColumn 'set null value': NULL encodes as \\N.
    - TestRow_Decode: empty fields round-trip as EMPTY STRINGS, never
      NULL ('27\\t1213\\t\\tasda' and trailing-empty '27\\t12\\t\\t').
    """
    schema3 = T.StructType([
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.StringType()),
    ])
    # --- decode: the row_test.go TestDecode vector ---------------------
    # literal bytes: 27 TAB hey\tmyname is\nnoname TAB \N
    raw = "27\they\\tmyname is\\nnoname\t\\N"
    line = spark.createDataFrame([(raw,)], ["line"])
    r = copy_decode(line, schema3).collect()[0]
    assert r.a == "27"
    assert r.b == "hey\tmyname is\nnoname"  # escapes decoded
    assert r.c is None                       # \N -> NULL

    # --- encode: the SetColumn vectors ---------------------------------
    df = spark.createDataFrame(
        [Row(a="27", b="\tnew_value\n", c=None)], schema3)
    enc = copy_encode(df).collect()[0].line
    assert enc == "27\t\\tnew_value\\n\t\\N"

    null_first = spark.createDataFrame(
        [Row(a=None, b="hey\tx", c=None)], schema3)
    enc2 = copy_encode(null_first).collect()[0].line
    assert enc2 == "\\N\they\\tx\t\\N"

    # --- empty string vs NULL (TestRow_Decode positions vectors) -------
    schema4 = T.StructType([
        T.StructField(n, T.StringType()) for n in "abcd"])
    rows = copy_decode(
        spark.createDataFrame([("27\t1213\t\tasda",), ("27\t12\t\t",)],
                              ["line"]),
        schema4,
    ).collect()
    by_a = {r.a: r for r in rows}
    assert by_a["27"].b in ("1213", "12")
    for r in rows:
        assert r.c == ""            # empty field, NOT NULL
    assert by_a["27"].d in ("asda", "")
    # and empty strings survive a full round trip distinct from NULL
    src = spark.createDataFrame([Row(a="", b=None, c="x", d="")], schema4)
    back = copy_decode(copy_encode(src), schema4).collect()[0]
    assert back.a == "" and back.b is None and back.c == "x" and back.d == ""
