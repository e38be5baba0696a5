"""Template function library + dynamic-param cast helpers.

Reference: pkg/toolkit/template_functions.go:71-199 (FuncMap) and
pkg/toolkit/type_caster_static_funtions.go (28 cast functions).
"""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import CAST_FUNCTIONS
from greenmask_spark.transformers.template import template_functions

FUNCS = template_functions()

#: the reference FuncMap names (template_functions.go:71-199) that must
#: all exist in our library
REFERENCE_FUNCS = [
    "null", "isNull", "isNotNull", "sqlCoalesce",
    "jsonExists", "mustJsonGet", "mustJsonGetRaw", "jsonGet", "jsonGetRaw",
    "jsonSet", "jsonDelete", "jsonSetRaw", "jsonValidate", "jsonIsValid",
    "toJsonRawValue",
    "isInt", "isFloat", "isNil", "isString", "isMap", "isSlice", "isBool",
    "masking", "truncateDate", "tsModify", "noiseDatePgInterval",
    "noiseDate", "noiseFloat", "noiseInt",
    "randomBool", "randomDate", "randomFloat", "randomInt", "randomString",
    "roundFloat",
    "fakerRealAddress", "fakerLatitude", "fakerLongitude", "fakerUnixTime",
    "fakerDate", "fakerTimeString", "fakerMonthName", "fakerYearString",
    "fakerDayOfWeek", "fakerDayOfMonth", "fakerTimestamp", "fakerCentury",
    "fakerTimezone", "fakerTimeperiod", "fakerEmail", "fakerMacAddress",
    "fakerDomainName", "fakerURL", "fakerUsername", "fakerIPv4",
    "fakerIPv6", "fakerPassword", "fakerWord", "fakerSentence",
    "fakerParagraph", "fakerCCType", "fakerCCNumber", "fakerCurrency",
    "fakerAmountWithCurrency", "fakerTitleMale", "fakerTitleFemale",
    "fakerFirstName", "fakerFirstNameMale", "fakerFirstNameFemale",
    "fakerFirstLastName", "fakerName", "fakerPhoneNumber",
    "fakerTollFreePhoneNumber", "fakerE164PhoneNumber", "fakerUUID",
    "fakerUUIDHyphenated", "fakerUUIDDigit", "timeToUnix", "unixToTime",
]

#: the reference's CastFunctionsMap keys
REFERENCE_CASTS = [
    f"Unix{u}To{t}"
    for u in ("Nano", "Micro", "Milli", "Sec")
    for t in ("Date", "Timestamp", "TimestampTz")
] + [
    f"{t}ToUnix{u}"
    for u in ("Nano", "Micro", "Milli", "Sec")
    for t in ("Date", "Timestamp", "TimestampTz")
] + ["IntToBool", "BoolToInt", "CastFloatToInt", "CastIntToFloat"]


def test_funcmap_covers_reference():
    missing = [n for n in REFERENCE_FUNCS if n not in FUNCS]
    assert missing == []


def test_cast_map_covers_reference():
    missing = [n for n in REFERENCE_CASTS if n not in CAST_FUNCTIONS]
    assert missing == []


def test_json_helpers():
    doc = '{"a": {"b": 2}, "k": 1}'
    assert FUNCS["jsonGet"](doc, "a.b") == 2
    assert FUNCS["jsonExists"](doc, "a.b") and not FUNCS["jsonExists"](doc, "x")
    assert FUNCS["jsonGet"](doc, "missing") is None
    out = FUNCS["jsonSet"](doc, "a.b", 9)
    assert FUNCS["jsonGet"](out, "a.b") == 9
    out = FUNCS["jsonDelete"](doc, "k")
    assert not FUNCS["jsonExists"](out, "k")
    assert FUNCS["jsonIsValid"](doc) and not FUNCS["jsonIsValid"]("{nope")
    try:
        FUNCS["mustJsonGet"](doc, "zzz")
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_type_predicates_and_null_helpers():
    assert FUNCS["isInt"](3) and not FUNCS["isInt"](True)
    assert FUNCS["isFloat"](3.5) and FUNCS["isBool"](False)
    assert FUNCS["isMap"]({}) and FUNCS["isSlice"]([1])
    assert FUNCS["sqlCoalesce"](None, None, 7) == 7
    assert FUNCS["isNull"](None) and FUNCS["isNotNull"](0)


def test_date_math():
    dt = datetime.datetime(2024, 5, 17, 13, 45, 10)
    assert FUNCS["truncateDate"]("month", dt) == datetime.datetime(2024, 5, 1)
    assert FUNCS["tsModify"]("P1D", dt) == dt + datetime.timedelta(days=1)
    assert FUNCS["tsModify"]("-PT2H", dt) == dt - datetime.timedelta(hours=2)
    assert FUNCS["timeToUnix"](dt.replace(tzinfo=datetime.timezone.utc)) \
        == int(dt.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert FUNCS["unixToTime"](0) == datetime.datetime(1970, 1, 1)


def test_random_and_faker_shapes():
    assert 1 <= FUNCS["randomInt"](1, 5) <= 5
    assert len(FUNCS["randomString"](7)) == 7
    assert "@" in FUNCS["fakerEmail"]()
    assert FUNCS["fakerIPv4"]().count(".") == 3
    assert FUNCS["fakerMacAddress"]().count(":") == 5
    assert len(FUNCS["fakerUUID"]()) == 36
    noise = FUNCS["noiseInt"](0.1, 100)
    assert 90 <= noise <= 110


def test_unix_time_casts_exact(spark):
    """Nano-epoch round trips must be exact — the double path loses
    low-order digits above 2^53."""
    nano = 1700000000123456789
    df = spark.createDataFrame([Row(ns=nano)])
    out = df.select(
        CAST_FUNCTIONS["UnixNanoToTimestamp"](F.col("ns")).alias("ts"),
        CAST_FUNCTIONS["UnixNanoToDate"](F.col("ns")).alias("d"),
    ).collect()[0]
    # truncation to microseconds is exact integer division
    assert out.ts == datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert out.d == datetime.date(2023, 11, 14)

    back = (
        spark.createDataFrame([Row(ts=out.ts)])
        .select(
            CAST_FUNCTIONS["TimestampToUnixMicro"](F.col("ts")).alias("us"),
            CAST_FUNCTIONS["TimestampToUnixSec"](F.col("ts")).alias("s"),
            CAST_FUNCTIONS["TimestampToUnixNano"](F.col("ts")).alias("ns"),
        )
        .collect()[0]
    )
    assert back.us == nano // 1000
    assert back.s == nano // 10**9
    assert back.ns == (nano // 1000) * 1000


def test_scalar_casts(spark):
    df = spark.createDataFrame([Row(i=0, f=2.6, b=True)])
    r = df.select(
        CAST_FUNCTIONS["IntToBool"](F.col("i")).alias("ib"),
        CAST_FUNCTIONS["BoolToInt"](F.col("b")).alias("bi"),
        CAST_FUNCTIONS["CastFloatToInt"](F.col("f")).alias("fi"),
        CAST_FUNCTIONS["CastIntToFloat"](F.col("i")).alias("if_"),
    ).collect()[0]
    assert r.ib is False and r.bi == 1 and r.fi == 3 and r.if_ == 0.0
