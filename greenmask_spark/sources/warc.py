"""WARC (Web ARChive, ISO 28500) source — the Common Crawl container,
i.e. THE input format of a web-scale training-data pipeline.

Stdlib-only parser (the warcio library is not in this container; the
format is a public spec): a WARC file is a sequence of records, each

    WARC/1.0\r\n
    <warc-headers: Name: value lines>\r\n
    \r\n
    <Content-Length bytes of block>\r\n\r\n

and the standard ``.warc.gz`` layout compresses EVERY RECORD as its own
gzip member (the spec's recommendation precisely so readers can split
work at member boundaries) — ``zlib`` decompresses member-by-member
with ``Z_FINISH``-style restarts, no external gzip framing library.

Spark shape: ``spark.read.format("binaryFile")`` lists the files (one
row per file: path + content), then an Arrow ``mapInPandas`` stage
parses records and emits one row per selected record. Parallelism is
per-FILE — exactly how Common Crawl distributes (100k × ~1 GB segment
files per crawl), so a 1000-executor cluster maps files to tasks
without any record-boundary splitting. Memory: one file's bytes per
task (binaryFile semantics) — the same bound the official crawl
readers accept; set ``spark.sql.files.maxPartitionBytes`` accordingly
and feed segment-sized files, not a single concatenated archive.

For the HTTP ``response`` records a training pipeline wants, the block
is an HTTP/1.1 message: status line + headers, CRLFCRLF, payload. The
payload stays a BINARY column (charset sniffing/decode is a downstream
choice — see functions/multimodal for the opaque-payload pattern);
``http_status`` and ``content_type`` are extracted for filtering.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: output schema: one row per selected WARC record
WARC_SCHEMA = T.StructType([
    T.StructField("file", T.StringType(), False),
    T.StructField("record_offset", T.LongType(), False),   # index in file
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("content_type", T.StringType(), True),   # of the block
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("http_content_type", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Split concatenated gzip members (the .warc.gz record-per-member
    layout) with stdlib zlib. A plain (non-gzip) buffer yields itself."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return  # trailing garbage / truncated member: stop cleanly
        yield out + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _split_headers(block: bytes):
    """(header_dict_lowercased, body) from a CRLFCRLF-delimited message;
    None when no delimiter exists."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None
    headers = {}
    for line in block[:sep].split(b"\r\n")[1:]:  # [0] is the version line
        c = line.find(b":")
        if c > 0:
            headers[line[:c].strip().lower().decode("latin-1")] = (
                line[c + 1:].strip().decode("latin-1", "replace")
            )
    return headers, block[sep + 4:]


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Iterate the records of one WARC file's bytes (gzip-per-record,
    whole-file gzip, or uncompressed). Malformed tails stop iteration
    instead of raising — a truncated crawl file yields its good prefix
    (the skip-don't-fail policy of ingestion)."""
    for member in _gzip_members(bytes(data)):
        pos, n = 0, len(member)
        # a member usually holds exactly one record, but a whole-file
        # gzip (or plain file) holds them back to back
        while pos < n:
            nxt = member.find(b"WARC/", pos)
            if nxt < 0:
                break
            head_end = member.find(b"\r\n\r\n", nxt)
            if head_end < 0:
                break
            headers, _ = _split_headers(member[nxt:head_end + 4])
            if headers is None:
                break
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                break
            body_start = head_end + 4
            if body_start + length > n:
                break  # truncated record
            yield {
                "headers": headers,
                "block": member[body_start:body_start + length],
            }
            pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Strip HTTP/1.1 chunked transfer framing: ``<hex-size>[;ext]\\r\\n
    <chunk>\\r\\n`` repeated until a zero-size chunk (trailers dropped).
    Raises ValueError on malformed framing — the caller nulls the
    payload per the skip-don't-fail ingestion policy."""
    out, pos, n = [], 0, len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked: missing size line terminator")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        # strict hex only: int(x, 16) also accepts '-5'/'+5'/'0x5'/
        # 'f_f', and a NEGATIVE size would turn the slice below into
        # negative indexing that returns framing junk as payload
        if not size_token or any(c not in b"0123456789abcdefABCDEF"
                                 for c in size_token):
            raise ValueError(f"chunked: bad size token {size_token!r}")
        size = int(size_token, 16)
        if size == 0:
            break  # trailers (if any) are dropped
        start = eol + 2
        end = start + size
        if end > n:
            raise ValueError("chunked: truncated chunk")
        out.append(body[start:end])
        if body[end:end + 2] not in (b"\r\n", b""):
            raise ValueError("chunked: missing chunk terminator")
        pos = end + 2
    return b"".join(out)


def _inflate_all(body: bytes, wbits: int, multi_member: bool) -> bytes:
    """Inflate requiring a COMPLETE stream: a truncated fetch recorded
    into a WARC must surface as ValueError (→ the caller nulls the
    payload) — ``decompressobj().decompress`` alone happily returns
    the partial prefix it managed to inflate. Multi-member gzip
    bodies (legal: each member is an independent stream, NUL padding
    between members tolerated) concatenate; trailing garbage after a
    deflate stream is an error, not silently dropped text."""
    out, data = [], body
    while True:
        d = zlib.decompressobj(wbits)
        out.append(d.decompress(data))
        if not d.eof:
            raise ValueError("truncated compressed body")
        data = d.unused_data
        if multi_member:
            data = data.lstrip(b"\x00")
        if not data:
            return b"".join(out)
        if not multi_member:
            raise ValueError("trailing bytes after compressed body")


def _decode_http_body(hh: dict, body: bytes) -> bytes | None:
    """De-frame an HTTP response body: undo chunked transfer framing,
    then decompress gzip/x-gzip/deflate Content-Encoding — otherwise
    chunked hex size lines or raw gzip bytes silently enter the corpus
    as document text. Stdlib zlib only (matching ``_gzip_members``);
    returns None on any framing/codec failure (skip-don't-fail:
    a corrupt record must not poison the corpus OR kill the task)."""
    try:
        te = (hh.get("transfer-encoding") or "").lower()
        if "chunked" in te:
            body = _dechunk(body)
        codings = [c.strip() for c in
                   (hh.get("content-encoding") or "").lower().split(",")
                   if c.strip()]
        # rare but legal: Transfer-Encoding: gzip, chunked — the gzip
        # layer sits under the (already removed) chunked framing
        codings += [c.strip() for c in te.split(",")
                    if c.strip() in ("gzip", "x-gzip", "deflate")]
        for coding in reversed(codings):  # applied last → undone first
            if coding in ("gzip", "x-gzip"):
                body = _inflate_all(body, 16 + zlib.MAX_WBITS,
                                    multi_member=True)
            elif coding == "deflate":
                try:
                    body = _inflate_all(body, zlib.MAX_WBITS,
                                        multi_member=False)
                except (zlib.error, ValueError):
                    # raw-deflate servers omit the zlib wrapper
                    body = _inflate_all(body, -zlib.MAX_WBITS,
                                        multi_member=False)
            elif coding == "identity":
                continue
            else:
                return None  # br/zstd/…: undecodable here, don't pass junk
        return body
    except (ValueError, zlib.error):
        return None


def _record_row(path: str, idx: int, rec: dict) -> dict:
    h, block = rec["headers"], rec["block"]
    wtype = h.get("warc-type")
    row = {
        "file": path,
        "record_offset": idx,
        "warc_type": wtype,
        "record_id": h.get("warc-record-id"),
        "target_uri": h.get("warc-target-uri"),
        "warc_date": h.get("warc-date"),
        "content_type": h.get("content-type"),
        "http_status": None,
        "http_content_type": None,
        "payload": block,
    }
    ctype = (h.get("content-type") or "").lower()
    if "application/http" in ctype and block[:5] in (b"HTTP/",):
        hh, body = _split_headers(block)
        if hh is not None:
            first = block.split(b"\r\n", 1)[0].split()
            try:
                row["http_status"] = int(first[1])
            except (IndexError, ValueError):
                pass
            row["http_content_type"] = hh.get("content-type")
            row["payload"] = _decode_http_body(hh, body)
    return row


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC files → one row per selected record (see ``WARC_SCHEMA``).

    ``record_types`` filters on WARC-Type (pass ``()`` for everything —
    warcinfo/request/metadata records included). HTTP response bodies
    are unwrapped to the payload bytes with status/content-type lifted
    into columns; feed ``payload`` to strip_html → the text pipeline,
    or to the multimodal decoders for image responses.
    """
    wanted = tuple(t.lower() for t in record_types)
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc_records(content)):
                    row = _record_row(p, i, rec)
                    if wanted and (row["warc_type"] or "").lower() \
                            not in wanted:
                        continue
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=WARC_SCHEMA)
