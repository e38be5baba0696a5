"""PostgreSQL COPY text-format codec — the reference's native dump format.

Reference: internal/db/postgres/pgcopy/encoder.go (EncodeAttr: backslash
escaping of ``\\ \t \n \r``, NULL → ``\\N``) and pgcopy/decoder.go
(DecodeAttr: the inverse), driven by dumpers/table.go's COPY ... TO STDOUT
stream. Greenmask dumps each table as one gzip-compressed COPY text file;
restore replays it through COPY ... FROM STDIN.

Spark-first: encode/decode are pure Column expressions (regexp_replace /
split / cast chains inside whole-stage codegen — no Python in the data
path), and the file IO is ``df.write.text`` with a compression codec, so a
100 TB table encodes across the whole cluster instead of the reference's
single COPY stream per table. The output is bit-compatible with
``COPY t FROM STDIN`` (text format, default delimiter/null marker).

Decode uses a NUL (``\\x00``) sentinel for the one-pass backslash
unescape; PostgreSQL text data can never contain NUL, so the sentinel is
unambiguous (same invariant pgcopy relies on).

Type serialization (pkg/toolkit driver encoding → PG text form):
bool → t/f, date → yyyy-MM-dd, timestamp → ISO with microseconds,
bytea → ``\\x`` hex, numerics/strings → their SQL text cast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_MARKER = "\\N"
DELIM = "\t"

#: encode order matters: backslash FIRST (else escapes double-escape)
_ESCAPES = [("\\", "\\\\"), ("\t", "\\t"), ("\n", "\\n"), ("\r", "\\r")]


def _encode_text(col: Column) -> Column:
    for raw, esc in _ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def _decode_text(col: Column) -> Column:
    # one-pass-safe inverse: stash literal backslashes (encoded "\\\\")
    # behind a NUL sentinel so "\\t" (backslash + t) never re-decodes as tab
    col = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    col = F.replace(col, F.lit("\\t"), F.lit("\t"))
    col = F.replace(col, F.lit("\\n"), F.lit("\n"))
    col = F.replace(col, F.lit("\\r"), F.lit("\r"))
    return F.replace(col, F.lit("\x00"), F.lit("\\"))


def _to_pg_text(col: Column, dt: T.DataType) -> Column:
    """Serialize a typed value to its PG text representation (encoder.go's
    per-attr driver encoding)."""
    if isinstance(dt, T.BooleanType):
        # two-arm when: NULL falls through to null (→ \N), not "f"
        return F.when(col, F.lit("t")).when(~col, F.lit("f"))
    if isinstance(dt, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        # PG prints microseconds without trailing zeros; we keep full
        # microseconds — COPY FROM accepts both, round-trip is exact
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if isinstance(dt, T.BinaryType):
        # bytea text form is \x<hex>; like any text it must then be
        # COPY-escaped (pgcopy doubles the backslash → \\x on the wire,
        # which COPY FROM unescapes back before the bytea parser runs)
        return _encode_text(F.concat(F.lit("\\x"), F.lower(F.hex(col))))
    if isinstance(dt, T.StringType):
        return _encode_text(col)
    # ints / floats / decimals: SQL text cast is the PG text form
    return col.cast("string")


def _from_pg_text(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.BooleanType):
        return col == F.lit("t")
    if isinstance(dt, T.DateType):
        return F.to_date(col, "yyyy-MM-dd")
    if isinstance(dt, T.TimestampType):
        return F.to_timestamp(col)
    if isinstance(dt, T.TimestampNTZType):
        return F.to_timestamp_ntz(col)
    if isinstance(dt, T.BinaryType):
        return F.unhex(F.substring(_decode_text(col), 3, 1 << 30))
    if isinstance(dt, T.StringType):
        return _decode_text(col)
    return col.cast(dt)


def copy_encode(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """DataFrame → one COPY text line per row (single ``line`` column).

    NULLs become ``\\N`` after escaping (so a literal string "\\N" encodes
    as ``\\\\N`` and survives the round trip, exactly like pgcopy)."""
    cols = columns or df.columns
    fields = []
    for c in cols:
        dt = df.schema[c].dataType
        fields.append(
            F.coalesce(_to_pg_text(F.col(c), dt), F.lit(NULL_MARKER))
        )
    return df.select(F.concat_ws(DELIM, *fields).alias("line"))


def copy_decode(lines: DataFrame, schema: T.StructType,
                line_col: str = "line") -> DataFrame:
    """COPY text lines → typed DataFrame per ``schema`` (decoder.go).

    Splitting on the raw delimiter is safe BEFORE unescaping: data tabs
    are still ``\\t`` two-char sequences at this point, exactly why COPY
    escapes them."""
    parts = F.split(F.col(line_col), DELIM, -1)
    out = []
    for i, field in enumerate(schema.fields):
        raw = F.element_at(parts, i + 1)
        val = F.when(raw == F.lit(NULL_MARKER), F.lit(None)).otherwise(raw)
        out.append(_from_pg_text(val, field.dataType).alias(field.name))
    return lines.select(*out)


def write_copy(df: DataFrame, path: str, compression: str = "gzip",
               columns: list[str] | None = None) -> None:
    """COPY-format dump file(s): gzip text, one part per task — the
    distributed analog of dumpers/table.go's single COPY-to-gzip stream."""
    copy_encode(df, columns).write.mode("overwrite").option(
        "compression", compression
    ).text(path)


def read_copy(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return copy_decode(spark.read.text(path).withColumnRenamed("value", "line"),
                       schema)
