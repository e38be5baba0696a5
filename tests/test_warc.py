"""WARC source: stdlib record parser + the binaryFile → mapInPandas
Spark tier, over synthetic archives built by an independent in-test
writer (gzip-per-record, whole-file-gzip, and plain layouts)."""

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _record(wtype, uri, block, extra=(), rid=None):
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + (rid or wtype).encode() + b"-1>",
        b"WARC-Date: 2026-08-15T00:00:00Z",
    ]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head += [e.encode() for e in extra]
    head.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http_response(body: bytes, ctype="text/html"):
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)


def _archive():
    info = _record("warcinfo", None, b"software: test\r\n",
                   ("Content-Type: application/warc-fields",))
    req = _record("request", "http://a.example/x",
                  b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
                  ("Content-Type: application/http;msgtype=request",))
    resp1 = _record("response", "http://a.example/x",
                    _http_response(b"<html><body>hello</body></html>"),
                    ("Content-Type: application/http;msgtype=response",))
    resp2 = _record("response", "http://b.example/y",
                    _http_response(b"\x89PNGfakebytes", "image/png"),
                    ("Content-Type: application/http;msgtype=response",))
    return [info, req, resp1, resp2]


def test_parse_warc_records_layouts():
    from greenmask_spark.sources.warc import parse_warc_records

    recs = _archive()
    plain = b"".join(recs)
    per_record_gz = b"".join(gzip.compress(r) for r in recs)
    whole_gz = gzip.compress(plain)
    for data in (plain, per_record_gz, whole_gz):
        got = list(parse_warc_records(data))
        assert [r["headers"]["warc-type"] for r in got] == \
            ["warcinfo", "request", "response", "response"]
        assert got[2]["block"].startswith(b"HTTP/1.1 200")
    # truncated tail: the good prefix survives, no raise
    cut = per_record_gz[: len(per_record_gz) - 40]
    got = list(parse_warc_records(cut))
    assert 1 <= len(got) < 4
    # garbage input: empty, no raise
    assert list(parse_warc_records(b"not a warc")) == []


def test_read_warc_spark_tier(spark, tmp_path):
    from pyspark.sql import functions as F

    from greenmask_spark.sources.warc import read_warc

    recs = _archive()
    (tmp_path / "a.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs))
    (tmp_path / "b.warc").write_bytes(b"".join(recs))

    out = read_warc(spark, str(tmp_path) + "/*.warc*").collect()
    # 2 response records per file, requests/warcinfo filtered out
    assert len(out) == 4
    by = {(os.path.basename(r.file), r.target_uri): r for r in out}
    r1 = by[("a.warc.gz", "http://a.example/x")]
    assert r1.warc_type == "response" and r1.http_status == 200
    assert r1.http_content_type == "text/html"
    assert bytes(r1.payload) == b"<html><body>hello</body></html>"
    r2 = by[("b.warc", "http://b.example/y")]
    assert r2.http_content_type == "image/png"
    assert bytes(r2.payload).startswith(b"\x89PNG")

    # record_types=() keeps everything, with raw blocks for non-http
    allrecs = read_warc(spark, str(tmp_path) + "/a.warc.gz",
                        record_types=()).collect()
    assert sorted(r.warc_type for r in allrecs) == \
        ["request", "response", "response", "warcinfo"]
    info = next(r for r in allrecs if r.warc_type == "warcinfo")
    assert bytes(info.payload) == b"software: test\r\n"
    assert info.http_status is None

    # payload feeds the text pipeline directly
    texts = read_warc(spark, str(tmp_path) + "/b.warc").filter(
        F.col("http_content_type").startswith("text/")
    ).select(
        F.col("target_uri"),
        F.col("payload").cast("string").alias("text"),
    ).collect()
    assert texts[0].text == "<html><body>hello</body></html>"


def test_http_body_deframing():
    """Real Common Crawl responses arrive chunked and/or compressed:
    Transfer-Encoding chunked framing is stripped and gzip/x-gzip/
    deflate (zlib-wrapped OR raw) Content-Encoding bodies decompress —
    otherwise hex size lines / gzip bytes enter the corpus as document
    text. Corrupt framing or an undecodable coding (br) NULLS the
    payload per the skip-don't-fail policy instead of passing junk."""
    import zlib

    from greenmask_spark.sources.warc import _record_row, parse_warc_records

    body = b"<html><body>the real content of the page</body></html>"

    def chunk(data, sizes):
        out, pos = [], 0
        for s in sizes:
            piece = data[pos:pos + s]
            if not piece:
                break
            out.append(b"%x\r\n" % len(piece) + piece + b"\r\n")
            pos += len(piece)
        if pos < len(data):  # whatever the size list missed
            rest = data[pos:]
            out.append(b"%x\r\n" % len(rest) + rest + b"\r\n")
        return b"".join(out) + b"0\r\n\r\n"

    def http(headers, payload):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"".join(h + b"\r\n" for h in headers)
                + b"\r\n" + payload)

    cases = {
        "chunked": (
            [b"Transfer-Encoding: chunked"], chunk(body, [13, 42]), body),
        "gzip": (
            [b"Content-Encoding: gzip"],
            __import__("gzip").compress(body), body),
        "x-gzip": (
            [b"Content-Encoding: x-gzip"],
            __import__("gzip").compress(body), body),
        "deflate-zlib": (
            [b"Content-Encoding: deflate"], zlib.compress(body), body),
        "chunked+gzip": (
            [b"Transfer-Encoding: chunked", b"Content-Encoding: gzip"],
            chunk(__import__("gzip").compress(body), [11, 100, 1000]),
            body),
        "identity": ([b"Content-Encoding: identity"], body, body),
        "plain": ([], body, body),
        "bad-chunk": (
            [b"Transfer-Encoding: chunked"], b"zz\r\njunk\r\n0\r\n\r\n",
            None),
        "bad-gzip": (
            [b"Content-Encoding: gzip"], b"\x1f\x8bnot really gzip", None),
        "brotli": ([b"Content-Encoding: br"], b"\x0bbrbytes", None),
    }
    # servers that omit the zlib wrapper (raw deflate)
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw = co.compress(body) + co.flush()
    cases["deflate-raw"] = ([b"Content-Encoding: deflate"], raw, body)

    archive = b"".join(
        _record("response", f"http://e.example/{name}",
                http(headers, payload),
                ("Content-Type: application/http;msgtype=response",))
        for name, (headers, payload, _) in cases.items()
    )
    rows = {}
    for i, rec in enumerate(parse_warc_records(archive)):
        row = _record_row("mem", i, rec)
        rows[row["target_uri"].rsplit("/", 1)[1]] = row
    assert len(rows) == len(cases)
    for name, (_, _, want) in cases.items():
        got = rows[name]["payload"]
        if want is None:
            assert got is None, name
        else:
            assert got == want, name
        # framing failure must not lose the record's metadata
        assert rows[name]["http_status"] == 200, name


def test_chunked_truncation_nulls_payload():
    """A chunked body cut mid-chunk (truncated fetch) → NULL payload,
    record preserved."""
    from greenmask_spark.sources.warc import _decode_http_body

    assert _decode_http_body(
        {"transfer-encoding": "chunked"}, b"ff\r\nonly a few bytes"
    ) is None
    # and the trailing-CRLF-missing final chunk is tolerated
    assert _decode_http_body(
        {"transfer-encoding": "chunked"}, b"3\r\nabc\r\n0\r\n\r\n"
    ) == b"abc"


def test_malformed_compressed_bodies_null_not_corrupt():
    """The skip-don't-fail policy must hold for the CORRUPT shapes
    int()/decompressobj() quietly tolerate: a negative/garbage hex
    chunk size must not slice framing junk into the corpus, and a
    truncated gzip/deflate body must null instead of returning the
    partial prefix; legal multi-member gzip still concatenates."""
    import gzip
    import zlib

    from greenmask_spark.sources.warc import _decode_http_body

    ch = {"transfer-encoding": "chunked"}
    # int(b'-5', 16) == -5 → negative slice used to leak framing bytes
    assert _decode_http_body(ch, b"-5\r\n5\r\nAB\r\n0\r\n\r\n") is None
    assert _decode_http_body(ch, b"+5\r\nhello\r\n0\r\n\r\n") is None
    assert _decode_http_body(ch, b"0x5\r\nhello\r\n0\r\n\r\n") is None
    assert _decode_http_body(ch, b"f_f\r\n" + b"x" * 255) is None
    # truncated gzip: decompress() alone returns the partial prefix
    full = gzip.compress(b"the full body that was being fetched" * 4)
    assert _decode_http_body({"content-encoding": "gzip"},
                             full[: len(full) // 2]) is None
    # truncated zlib-deflate likewise
    zfull = zlib.compress(b"deflate body " * 16)
    assert _decode_http_body({"content-encoding": "deflate"},
                             zfull[: len(zfull) // 2]) is None
    # multi-member gzip (legal; NUL padding between members tolerated)
    two = gzip.compress(b"part one. ") + b"\x00\x00" + gzip.compress(
        b"part two.")
    assert _decode_http_body({"content-encoding": "gzip"},
                             two) == b"part one. part two."
    # complete single-member bodies still decode
    assert _decode_http_body({"content-encoding": "gzip"}, full) \
        == b"the full body that was being fetched" * 4
    assert _decode_http_body({"content-encoding": "deflate"}, zfull) \
        == b"deflate body " * 16
    # raw deflate (no zlib wrapper) still supported
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw = co.compress(b"raw deflate text") + co.flush()
    assert _decode_http_body({"content-encoding": "deflate"}, raw) \
        == b"raw deflate text"


def test_warc_corpus_pipeline_input(spark, tmp_path):
    """The crawl → corpus path end to end: a WARC input spec feeds the
    config-driven pipeline as a (doc_id, url, text) frame; non-text
    responses drop at the input tier."""
    from greenmask_spark.pipeline import run_corpus_pipeline

    recs = _archive()
    (tmp_path / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs))
    out = run_corpus_pipeline(spark, {
        "input": {"path": str(tmp_path) + "/c.warc.gz", "format": "warc"},
        "steps": [
            {"op": "strip_html"},
            {"op": "hash_split"},
        ],
    })
    rows = out.collect()
    assert len(rows) == 1  # the PNG response is not text/*
    assert rows[0].url == "http://a.example/x"
    assert rows[0].text.strip() == "hello"
    assert rows[0].split in ("train", "val", "test")
    assert rows[0].doc_id is not None


def test_warc_to_shards_end_to_end(spark, tmp_path):
    """The full Common Crawl path in ONE config (r8 verdict item 8):
    WARC input (including chunked and gzip-encoded HTTP bodies — the
    de-framing runs inside the e2e, not just unit tests) → strip_html
    → gopher_filter → fuzzy_dedup → deterministic training shards.
    Survivor set: the PNG drops at the input tier, the short doc at
    gopher, one of each near-dup pair at fuzzy_dedup."""
    import zlib

    from pyspark.sql import functions as F

    from greenmask_spark.pipeline import run_corpus_pipeline

    p_river = (
        "the river ran slow past the old mill and the miller stood "
        "with his son to watch the water turn the wheel that ground "
        "the grain they would have to carry into town before the "
        "market opened because the farmers of the valley depended on "
        "that flour for the bread of the whole long winter season")
    p_bridge = (
        "a mountain path climbed above the old stone bridge and the "
        "walkers moved slowly with heavy packs because the morning "
        "fog had not lifted from the high meadows where the shepherds "
        "kept their flocks through the short summer and every "
        "traveler that passed would have stopped beside the cold "
        "spring water")
    p_market = (
        "the harvest market filled early with carts of apples and "
        "pears while the sellers called out prices to the crowd that "
        "pressed between the stalls because the first frost had been "
        "late this year and everyone knew the good fruit would not "
        "have lasted another week in the cellars of the town")
    for p in (p_river, p_bridge, p_market):
        assert len(p.split()) >= 50  # clears the Gopher word-count rule

    def http(body, headers=()):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"".join(h + b"\r\n" for h in headers) + b"\r\n" + body)

    def html(text):
        return f"<html><body><p>{text}</p></body></html>".encode()

    def chunked(data):
        return (b"%x\r\n" % len(data)) + data + b"\r\n0\r\n\r\n"

    docs = {
        # two near-duplicates: same prose, one trailing word twisted
        "http://a.example/dup1": http(html(p_river)),
        "http://a.example/dup2": http(
            gzip.compress(html(p_river + " indeed")),
            (b"Content-Encoding: gzip",)),
        # unique keepers — one arrives chunked
        "http://b.example/keep1": http(
            chunked(html(p_bridge)),
            (b"Transfer-Encoding: chunked",)),
        "http://b.example/keep2": http(html(p_market)),
        # gopher drop: far under 50 words
        "http://c.example/short": http(html("too few words here")),
    }
    png = _record("response", "http://c.example/img",
                  _http_response(b"\x89PNGbytes", "image/png"),
                  ("Content-Type: application/http;msgtype=response",))
    archive = b"".join(
        gzip.compress(_record(
            "response", uri, payload,
            ("Content-Type: application/http;msgtype=response",),
            rid=uri.rsplit("/", 1)[1]))  # distinct WARC-Record-IDs
        for uri, payload in docs.items()
    ) + gzip.compress(png)
    (tmp_path / "crawl.warc.gz").write_bytes(archive)

    shard_dir = str(tmp_path / "shards")
    out = run_corpus_pipeline(spark, {
        "input": {"path": str(tmp_path / "crawl.warc.gz"),
                  "format": "warc"},
        "steps": [
            {"op": "strip_html"},
            {"op": "gopher_filter"},
            {"op": "fuzzy_dedup", "threshold": 0.7, "num_perm": 32},
        ],
        "output": {"format": "shards", "path": shard_dir,
                   "rows_per_shard": 2, "compression": "snappy"},
    })
    rows = out.collect()
    by_url = {r.url: r for r in rows}
    # 5 text docs in, PNG dropped at input, short dropped at gopher,
    # ONE of the dup pair dropped at fuzzy_dedup → 3 survivors
    assert len(rows) == 3
    assert set(by_url) <= set(docs) - {"http://c.example/short"}
    assert sum(u.startswith("http://a.example/dup") for u in by_url) == 1
    assert "http://b.example/keep1" in by_url  # chunked body de-framed
    keep1 = by_url["http://b.example/keep1"].text
    assert "above the old stone bridge" in keep1
    assert "<" not in keep1 and "%x" not in keep1
    # source_id rides along for collision forensics
    assert all(r.source_id for r in rows)

    # the shard sink wrote the same 3 rows, capped at 2 rows per file
    back = spark.read.parquet(shard_dir)
    assert back.count() == 3
    per_file = back.groupBy(F.input_file_name()).count().collect()
    assert max(r["count"] for r in per_file) <= 2
    assert {r.url for r in back.collect()} == set(by_url)


def test_png_codec_property():
    """Property test: for random images and RANDOM per-scanline filter
    choices, an independently-encoded PNG decodes to the exact pixels
    (the fixed-vector test covers each filter once; this sweeps filter
    interactions, widths including 1, and edge rows). Pure-Python —
    no Spark session."""
    import struct
    import zlib

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from greenmask_spark.functions.multimodal import decode_image_bytes

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    def encode(px, ftypes):
        h, w, _ = px.shape
        prev = np.zeros(w * 3, dtype=np.int64)
        rows = []
        for r in range(h):
            cur = px[r].reshape(w * 3).astype(np.int64)
            ft = ftypes[r]
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            ul = np.concatenate([[0, 0, 0], prev[:-3]])
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = cur - left
            elif ft == 2:
                enc = cur - prev
            elif ft == 3:
                enc = cur - ((left + prev) >> 1)
            else:
                p = left + prev - ul
                pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                              np.abs(p - ul))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, ul))
                enc = cur - pred
            rows.append(bytes([ft])
                        + (enc & 0xFF).astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(rows)))
                + chunk(b"IEND", b""))

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        w = data.draw(st.integers(1, 9))
        h = data.draw(st.integers(1, 9))
        seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        fts = [data.draw(st.integers(0, 4)) for _ in range(h)]
        got = decode_image_bytes(encode(px, fts))
        assert got is not None, fts
        gw, gh, raw = got
        assert (gw, gh) == (w, h)
        assert raw == px.tobytes(), fts

    run()


def test_optimal_lsh_params():
    """The LSH parameter solver: valid divisor pairs, monotone response
    to the threshold (higher threshold -> more rows per band), and the
    fp_weight lever shifts toward fewer false positives. Pure driver
    math — no Spark session."""
    import pytest

    from greenmask_spark.functions.dedup import optimal_lsh_params

    for np_ in (16, 64, 128):
        for thr in (0.3, 0.5, 0.8, 0.9):
            b, r = optimal_lsh_params(thr, np_)
            assert b * r == np_ and b >= 1 and r >= 1

    # higher threshold wants a steeper curve: r grows (b shrinks)
    b_lo, r_lo = optimal_lsh_params(0.3, 64)
    b_hi, r_hi = optimal_lsh_params(0.9, 64)
    assert r_hi > r_lo and b_hi < b_lo

    # weighting FP harder never increases the FP-prone band count
    b_bal, _ = optimal_lsh_params(0.5, 64, fp_weight=0.5)
    b_fp, _ = optimal_lsh_params(0.5, 64, fp_weight=0.95)
    assert b_fp <= b_bal

    # sanity vs the textbook rule of thumb: threshold ~ (1/b)^(1/r)
    b, r = optimal_lsh_params(0.5, 128)
    assert abs((1.0 / b) ** (1.0 / r) - 0.5) < 0.2

    with pytest.raises(ValueError, match="threshold"):
        optimal_lsh_params(1.0)
    with pytest.raises(ValueError, match="fp_weight"):
        optimal_lsh_params(0.5, fp_weight=2.0)
