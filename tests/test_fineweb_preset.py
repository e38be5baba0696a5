"""FineWeb preset (Penedo 2024, arXiv:2406.17557): the C4 line-rule
variant in isolation, the config builder, and the full preset e2e —
WARC crawl → URL blocklist → extraction → lang gate → Gopher +
repetition + C4-minus-terminal-punct → fuzzy dedup → PII scrub →
shards."""

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from greenmask_spark.functions.text_analysis import c4_clean_text  # noqa: E402
from greenmask_spark.pipeline.corpus import (  # noqa: E402
    CORPUS_STEPS,
    run_corpus_pipeline,
)
from greenmask_spark.pipeline.presets import (  # noqa: E402
    PRESETS,
    fineweb_config,
)


# ---------------------------------------------------------------------------
# the C4 line-rule variant
# ---------------------------------------------------------------------------


def test_c4_clean_text_terminal_punct_toggle(spark):
    text = ("a good long line that happens to end without punctuation\n"
            "this line mentions javascript and must always go.\n"
            "short one.\n"
            "a normal properly punctuated sentence stays here.")
    df = spark.range(1).select(F.lit(text).alias("t"))
    strict, loose = df.select(
        c4_clean_text(F.col("t")).alias("strict"),
        c4_clean_text(F.col("t"), require_terminal_punct=False)
        .alias("loose"),
    ).first()
    # default: the unpunctuated line drops
    assert strict == "a normal properly punctuated sentence stays here."
    # FineWeb variant: it survives; javascript/min-words still apply
    assert loose.splitlines() == [
        "a good long line that happens to end without punctuation",
        "a normal properly punctuated sentence stays here.",
    ]


# ---------------------------------------------------------------------------
# the config builder
# ---------------------------------------------------------------------------


def test_fineweb_config_shape():
    cfg = fineweb_config({"table": "documents"}, "/tmp/x",
                         blocklist=["spam.example"])
    ops = [s["op"] for s in cfg["steps"]]
    assert ops == ["normalize_urls", "blocklist", "strip_html",
                   "lang_id", "quality_filter", "gopher_filter",
                   "repetition_filter", "c4_filter", "fuzzy_dedup",
                   "scrub_pii"]
    c4 = next(s for s in cfg["steps"] if s["op"] == "c4_filter")
    assert c4["require_terminal_punct"] is False
    assert cfg["output"]["format"] == "shards"
    assert PRESETS["fineweb"] is fineweb_config
    assert all(op in CORPUS_STEPS for op in ops)
    # without a blocklist (test-scale inputs have no URL column) the
    # URL tier is omitted entirely
    ops2 = [s["op"] for s in fineweb_config({"table": "documents"})["steps"]]
    assert ops2[0] == "strip_html" and "blocklist" not in ops2


# ---------------------------------------------------------------------------
# e2e: WARC crawl → FineWeb → shards
# ---------------------------------------------------------------------------

_RIVER = (
    "the river ran slow past the old mill and the miller stood with "
    "his son to watch the water turn the wheel that ground the grain. "
    "they would carry it into town before the market opened because "
    "the farmers of the valley depended on that flour for the bread "
    "of the whole long winter season.")
_BRIDGE = (
    "a mountain path climbed above the old stone bridge and the "
    "walkers moved slowly with heavy packs because the morning fog "
    "had not lifted from the high meadows. the shepherds kept their "
    "flocks there through the short summer and every traveler that "
    "passed would have stopped beside the cold spring water. "
    "write to the warden at warden@example.org or 10.0.0.7 with news")
_FRENCH = (
    "le chat et la vache sont dans la ville pour un jour et le "
    "marchand est dans la rue avec une charrette de pommes pour "
    "les gens de la place qui sont dans les maisons.")
_GIBBERISH = (
    "zxqv wvruk qqzpt lmnop vvxzz kjhgf zzyxw pqrst uvwxy abcde. "
    "fghij klmno zzzzq wwwwk xxxxj yyyyh qpzmv nbvcx mklji uhygt. "
    "rfedc wsxqa plokm ijnuh bgtvf cdexs zzkjq wqpxv mnbas lkjhg. "
    "qwert yuiop asdfg hjklz xcvbn mqwzx plmok nijbu hvgyc tfxrd. "
    "zaqws xedcr fvtgb yhnuj mikol pzaqx swcde vfrbg tnhym juikl.")


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)


def _warc_record(uri: str, body: bytes) -> bytes:
    block = _http(body)
    head = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:" + uri.encode() + b">\r\n"
            b"WARC-Date: 2026-08-15T00:00:00Z\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n")
    return head + block + b"\r\n\r\n"


def _html(*paragraphs: str) -> bytes:
    return ("<html><body>"
            + "".join(f"<p>{p}</p>" for p in paragraphs)
            + "</body></html>").encode()


def test_fineweb_e2e_warc_to_shards(spark, tmp_path):
    """Each FineWeb stage earns its keep on one archive: the blocked
    domain drops at the URL tier, the French page at the language
    gate, the gibberish page at Gopher (no stop words), one of the
    near-dup river pair at fuzzy dedup; the survivor keeps a line
    that lacks terminal punctuation (the FineWeb C4 deviation) and
    the bridge page's email/IP are anonymized."""
    docs = {
        "http://a.example/river": _html(_RIVER),
        "http://a.example/river2": _html(_RIVER + " indeed the mill."),
        "http://b.example/bridge": _html(_BRIDGE),
        "http://c.example/fr": _html(_FRENCH),
        "http://d.example/gib": _html(_GIBBERISH),
        "http://spam.example/x": _html(_RIVER),
    }
    archive = b"".join(
        gzip.compress(_warc_record(u, b)) for u, b in sorted(docs.items()))
    (tmp_path / "crawl.warc.gz").write_bytes(archive)

    shards = str(tmp_path / "shards")
    cfg = fineweb_config(
        {"path": str(tmp_path / "crawl.warc.gz"), "format": "warc"},
        shards,
        blocklist=["spam.example"],
        min_sentences=2,
        rows_per_shard=10,
    )
    out = run_corpus_pipeline(spark, cfg)
    rows = {r.url: r for r in out.collect()}

    assert all("spam.example" not in u for u in rows)
    assert "http://c.example/fr" not in rows
    assert "http://d.example/gib" not in rows
    river_survivors = [u for u in rows if "river" in u]
    assert len(river_survivors) == 1
    bridge = rows["http://b.example/bridge"]
    # the C4-minus-terminal-punct deviation: the email line has no
    # terminal punctuation yet survives (and got anonymized)
    assert "[EMAIL]" in bridge.text and "[IP]" in bridge.text
    assert "warden@example.org" not in bridge.text
    assert bridge.lang == "en"
    shard_files = [f for f in os.listdir(shards) if f.endswith(".parquet")]
    assert shard_files
