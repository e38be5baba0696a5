"""Template / TemplateRecord transformers.

Reference: internal/db/postgres/transformers/template.go:28-146 and
template_record.go:28-140 — Go templates with a function map
(pkg/toolkit/template_functions.go:71-199) rendering a cell (Template) or
mutating the whole record (TemplateRecord).

Dialect decision (SURVEY §7 known-hard #3): we do NOT emulate Go template
syntax. Templates are Jinja2 when available, else Python ``str.format``
maps; parity is by behavior on documented examples, not syntax. Both are
the pandas-UDF tier (Arrow-batched row materialization), mirroring the
reference which renders per row anyway.

Template context: ``record`` = dict of the row's typed values (the
reference's ``.GetValue``/``.GetRawValue`` duality collapses — Spark
columns are typed).
"""

from __future__ import annotations

import hashlib
import math
import random as _random
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import BuildContext, Transformer, register
from greenmask_spark.transformers.masker import masking as _masking

try:
    import jinja2

    _JINJA = jinja2.Environment(undefined=jinja2.StrictUndefined)
except Exception:  # pragma: no cover - jinja2 not in container
    _JINJA = None


def _truncate_date(part: str, dt):
    return dt.replace(
        **{
            "year": dict(month=1, day=1, hour=0, minute=0, second=0, microsecond=0),
            "month": dict(day=1, hour=0, minute=0, second=0, microsecond=0),
            "day": dict(hour=0, minute=0, second=0, microsecond=0),
            "hour": dict(minute=0, second=0, microsecond=0),
            "minute": dict(second=0, microsecond=0),
            "second": dict(microsecond=0),
        }[part]
    )


def _json_path(doc: Any, path: str) -> list:
    """Resolve a dotted gjson-style path into (parent, key) steps."""
    return path.split(".") if path else []


def _json_get(doc: Any, path: str, default=None):
    cur = doc
    for step in _json_path(doc, path):
        if isinstance(cur, dict) and step in cur:
            cur = cur[step]
        elif isinstance(cur, list) and step.isdigit() and int(step) < len(cur):
            cur = cur[int(step)]
        else:
            return default
    return cur


def _json_set(doc_str: str, path: str, value) -> str:
    import json as _json

    doc = _json.loads(doc_str)
    steps = _json_path(doc, path)
    cur = doc
    for step in steps[:-1]:
        cur = cur.setdefault(step, {})
    cur[steps[-1]] = value
    return _json.dumps(doc)


def _json_delete(doc_str: str, path: str) -> str:
    import json as _json

    doc = _json.loads(doc_str)
    steps = _json_path(doc, path)
    cur = doc
    for step in steps[:-1]:
        if not isinstance(cur, dict) or step not in cur:
            return _json.dumps(doc)
        cur = cur[step]
    if isinstance(cur, dict):
        cur.pop(steps[-1], None)
    return _json.dumps(doc)


def _ts_modify(interval: str, dt):
    """PG-interval arithmetic on a timestamp (reference tsModify /
    noiseDatePgInterval use PG interval strings)."""
    import datetime as _dt

    from greenmask_spark.transformers.temporal import _interval_to_seconds

    s = interval.strip()
    sign = -1 if s.startswith("-") else 1
    return dt + _dt.timedelta(seconds=sign * _interval_to_seconds(s.lstrip("+-")))


def _date_modify(duration: str, dt):
    """sprig ``date_modify``: shift a datetime by a Go duration string
    ("24h", "-1h30m", "90s", "1.5h"). Distinct from ``tsModify`` which
    takes PG/ISO-8601 interval syntax."""
    import datetime as _dtm
    import re as _rem

    s = duration.strip()
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("+-")
    total = 0.0
    pos = 0
    for m in _rem.finditer(r"(\d+(?:\.\d+)?)(h|ms|m|s|us|ns)", s):
        if m.start() != pos:
            raise ValueError(f"bad Go duration {duration!r}")
        pos = m.end()
        n = float(m.group(1))
        total += n * {"h": 3600, "m": 60, "s": 1, "ms": 1e-3,
                      "us": 1e-6, "ns": 1e-9}[m.group(2)]
    if pos != len(s) or pos == 0:
        raise ValueError(f"bad Go duration {duration!r}")
    return dt + _dtm.timedelta(seconds=sign * total)


def template_functions() -> dict[str, Any]:
    """Analog of the reference FuncMap (template_functions.go:71-199) —
    the full surface: null/json helpers, type predicates, masking/date
    math, noise/random generators, the faker* family (lexicon-backed, no
    external faker dependency), and unix-time conversion. Faker/random
    functions are per-call random like go-faker in the reference — the
    template tier is the random-engine tier."""
    import datetime as _dt
    import json as _json
    import uuid as _uuid

    from greenmask_spark.transformers import lexicons as lex

    def pick(xs):
        return xs[_random.randrange(len(xs))]

    def random_string(n=10,
                      syms="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"):
        return "".join(pick(syms) for _ in range(int(n)))

    def random_date(lo=None, hi=None):
        lo = lo or _dt.datetime(2000, 1, 1)
        hi = hi or _dt.datetime(2030, 1, 1)
        return lo + _dt.timedelta(seconds=_random.uniform(
            0, (hi - lo).total_seconds()))

    def must_json_get(doc, path):
        sentinel = object()
        v = _json_get(_json.loads(doc) if isinstance(doc, str) else doc,
                      path, sentinel)
        if v is sentinel:
            raise KeyError(f"json path {path!r} does not exist")
        return v

    def json_validate(doc):
        _json.loads(doc)
        return doc

    def json_is_valid(doc):
        try:
            _json.loads(doc)
            return True
        except Exception:
            return False

    sentence = lambda n=6: (  # noqa: E731
        " ".join(pick(lex.WORDS) for _ in range(int(n))).capitalize() + ".")

    def is_null(v):
        # the record reaches templates through an Arrow/pandas batch, so
        # a SQL NULL arrives as None OR NaT (timestamps) OR NaN (floats);
        # the reference's isNull means "SQL NULL" — all three must match
        if v is None:
            return True
        try:
            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False  # arrays/maps: pd.isna is elementwise

    return {
        # -- null helpers ---------------------------------------------------
        "null": None,
        "isNull": is_null,
        "isNotNull": lambda v: not is_null(v),
        "sqlCoalesce": lambda *vs: next(
            (v for v in vs if not is_null(v)), None),
        "coalesce": lambda *vs: next(
            (v for v in vs if not is_null(v)), None),
        # -- json helpers (dotted paths; gjson analog) ----------------------
        "jsonExists": lambda doc, path: _json_get(
            _json.loads(doc) if isinstance(doc, str) else doc, path,
            _MISSING) is not _MISSING,
        "jsonGet": lambda doc, path: _json_get(
            _json.loads(doc) if isinstance(doc, str) else doc, path),
        "jsonGetRaw": lambda doc, path: _json.dumps(_json_get(
            _json.loads(doc) if isinstance(doc, str) else doc, path)),
        "mustJsonGet": must_json_get,
        "mustJsonGetRaw": lambda doc, path: _json.dumps(
            must_json_get(doc, path)),
        "jsonSet": _json_set,
        "jsonSetRaw": lambda doc, path, raw: _json_set(
            doc, path, _json.loads(raw)),
        "jsonDelete": _json_delete,
        "jsonValidate": json_validate,
        "jsonIsValid": json_is_valid,
        "toJsonRawValue": lambda v: _json.dumps(v),
        # -- type predicates ------------------------------------------------
        "isInt": lambda v: isinstance(v, int) and not isinstance(v, bool),
        "isFloat": lambda v: isinstance(v, float),
        "isNil": is_null,
        "isString": lambda v: isinstance(v, str),
        "isMap": lambda v: isinstance(v, dict),
        "isSlice": lambda v: isinstance(v, (list, tuple)),
        "isBool": lambda v: isinstance(v, bool),
        # -- masking / date math -------------------------------------------
        # reference signature masking(dataType, value) with the full
        # go-masker rule set (transformers/masker.py shares the rules
        # with the Masking transformer's Column expressions)
        "masking": _masking,
        "truncateDate": _truncate_date,
        "tsModify": _ts_modify,
        "noiseDatePgInterval": lambda interval, dt: _ts_modify(
            ("-" if _random.random() < 0.5 else "+") + interval, dt),
        "noiseDate": lambda interval, dt: _ts_modify(
            ("-" if _random.random() < 0.5 else "+") + interval, dt),
        "noiseFloat": lambda ratio, dec, v: round(
            v * (1 + _random.uniform(-ratio, ratio)), int(dec)),
        "noiseInt": lambda ratio, v: int(
            v * (1 + _random.uniform(-ratio, ratio))),
        # -- random generators ----------------------------------------------
        "randomBool": lambda: _random.random() < 0.5,
        "randomDate": random_date,
        # reference signatures (template_functions.go): randomFloat has
        # an optional precision defaulting to 4; roundFloat takes
        # (decimal, value) in that order
        "randomFloat": lambda lo, hi, decimal=4: round(
            _random.uniform(lo, hi), int(decimal)),
        "randomInt": lambda lo, hi: _random.randint(lo, hi),
        "randomString": random_string,
        "roundFloat": lambda decimal, value: round(
            float(value), int(decimal)),
        # -- faker family (lexicon-backed) ----------------------------------
        "fakerRealAddress": lambda: (
            f"{_random.randint(1, 9999)} {pick(lex.CITIES)}, "
            f"{pick([a for _, a in lex.STATES])}"),
        "fakerLatitude": lambda: round(_random.uniform(-90, 90), 6),
        "fakerLongitude": lambda: round(_random.uniform(-180, 180), 6),
        "fakerUnixTime": lambda: _random.randint(0, 4102444800),
        "fakerDate": lambda: random_date().date().isoformat(),
        "fakerTimeString": lambda: (
            f"{_random.randint(0, 23):02d}:{_random.randint(0, 59):02d}"),
        "fakerMonthName": lambda: pick(lex.MONTH_NAMES),
        "fakerYearString": lambda: str(_random.randint(1950, 2049)),
        "fakerDayOfWeek": lambda: pick(lex.DAY_NAMES),
        "fakerDayOfMonth": lambda: str(_random.randint(1, 28)),
        "fakerTimestamp": lambda: random_date().isoformat(sep=" "),
        "fakerCentury": lambda: pick(
            ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
             "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII",
             "XIX", "XX", "XXI"]),
        "fakerTimezone": lambda: pick(lex.TIMEZONES),
        "fakerTimeperiod": lambda: pick(["AM", "PM"]),
        "fakerEmail": lambda: (
            f"{random_string(8, 'abcdefghijklmnopqrstuvwxyz')}@"
            f"{pick(lex.DOMAIN_WORDS)}.{pick(lex.TLDS)}"),
        "fakerMacAddress": lambda: ":".join(
            f"{_random.randint(0, 255):02x}" for _ in range(6)),
        "fakerDomainName": lambda: (
            f"{pick(lex.DOMAIN_WORDS)}.{pick(lex.TLDS)}"),
        "fakerURL": lambda: (
            f"https://{pick(lex.DOMAIN_WORDS)}.{pick(lex.TLDS)}/"
            f"{pick(lex.WORDS)}"),
        "fakerUsername": lambda: (
            f"{pick(lex.WORDS)}_{_random.randint(10, 9999)}"),
        "fakerIPv4": lambda: ".".join(
            str(_random.randint(0, 255)) for _ in range(4)),
        "fakerIPv6": lambda: ":".join(
            f"{_random.randint(0, 0xFFFF):04x}" for _ in range(8)),
        "fakerPassword": lambda: random_string(12, lex.PASSWORD_SYMBOLS),
        "fakerWord": lambda: pick(lex.WORDS),
        "fakerSentence": sentence,
        "fakerParagraph": lambda n=3: " ".join(sentence(5) for _ in range(int(n))),
        "fakerCCType": lambda: pick(lex.CC_TYPES),
        "fakerCCNumber": lambda: "4" + "".join(
            str(_random.randint(0, 9)) for _ in range(15)),
        "fakerCurrency": lambda: pick(lex.CURRENCIES),
        "fakerAmountWithCurrency": lambda: (
            f"{_random.uniform(0, 10000):.2f} {pick(lex.CURRENCIES)}"),
        "fakerTitleMale": lambda: "Mr.",
        "fakerTitleFemale": lambda: pick(["Ms.", "Mrs."]),
        "fakerFirstName": lambda: pick(
            lex.FIRST_NAMES_MALE + lex.FIRST_NAMES_FEMALE),
        "fakerFirstNameMale": lambda: pick(lex.FIRST_NAMES_MALE),
        "fakerFirstNameFemale": lambda: pick(lex.FIRST_NAMES_FEMALE),
        "fakerFirstLastName": lambda: pick(lex.LAST_NAMES),
        "fakerLastName": lambda: pick(lex.LAST_NAMES),
        "fakerName": lambda: (
            f"{pick(lex.FIRST_NAMES_MALE + lex.FIRST_NAMES_FEMALE)} "
            f"{pick(lex.LAST_NAMES)}"),
        "fakerPhoneNumber": lambda: (
            f"({_random.randint(200, 999)}) {_random.randint(200, 999)}-"
            f"{_random.randint(0, 9999):04d}"),
        "fakerTollFreePhoneNumber": lambda: (
            f"(800) {_random.randint(200, 999)}-{_random.randint(0, 9999):04d}"),
        "fakerE164PhoneNumber": lambda: (
            f"+1{_random.randint(200, 999)}{_random.randint(200, 999)}"
            f"{_random.randint(0, 9999):04d}"),
        "fakerUUID": lambda: str(_uuid.uuid4()),
        # the docs table lists the hyphenated variant under this name
        # (faker_function.md "UUID" section)
        "fakerUUIDHyphenated": lambda: str(_uuid.uuid4()),
        "fakerUUIDDigit": lambda: _uuid.uuid4().hex,
        # -- clock + sprig-style date math ----------------------------------
        # (sprig FuncMap ships with the reference's Go templates; `now` is
        # the documented driver of plan-build param templating and the
        # TemplateRecord dates example; date_modify takes Go durations)
        "now": lambda: _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
        "date_modify": _date_modify,
        # -- unix-time conversion -------------------------------------------
        "timeToUnix": lambda dt: int(dt.timestamp()),
        "unixToTime": lambda n: _dt.datetime.fromtimestamp(
            int(n), _dt.timezone.utc).replace(tzinfo=None),
        # -- general-purpose (sprig-core analog) ----------------------------
        "sha256": lambda s: hashlib.sha256(str(s).encode()).hexdigest(),
        "md5": lambda s: hashlib.md5(str(s).encode()).hexdigest(),
        "abs": abs,
        "ceil": math.ceil,
        "floor": math.floor,
        "upper": lambda s: s.upper(),
        "lower": lambda s: s.lower(),
        "title": lambda s: s.title(),
        "trim": lambda s: s.strip(),
        "repeat": lambda n, s: s * int(n),
        "default": lambda d, v: v if v not in (None, "") else d,
    }


_MISSING = object()


def compile_template(tpl: str):
    """Compile once (plan time / per executor), render per row. Compiling in
    ``render_template`` per row costs ~10× the render itself."""
    if _JINJA is not None:
        t = _JINJA.from_string(tpl)
        funcs = template_functions()
        return lambda record, **kw: t.render(record=record, **funcs, **kw)
    # fallback mini-dialect: '{col}' substitution only
    return lambda record, **kw: tpl.format(
        **{k: ("" if v is None else v) for k, v in record.items()}
    )


def render_template(tpl: str, record: dict[str, Any]) -> Any:
    return compile_template(tpl)(record)


def render_static_param(tpl: str) -> str:
    """Plan-build-time parameter templating (reference:
    pkg/toolkit/static_parameter.go:98-123; documented in
    docs/built_in_transformers/parameters_templating.md) — a parameter
    VALUE like ``{{ EncodeValue(tsModify('-30 years', now())) }}``
    renders ONCE when the plan is built, with the full template
    function library. ``EncodeValue`` (and the ByColumn/ByType forms)
    formats the rendered object the way our param parsers read it —
    the Spark collapse of the reference's PG-driver encode step."""
    import datetime as _dtm

    def encode_value(v):
        if isinstance(v, _dtm.datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, _dtm.date):
            return v.isoformat()
        return str(v)

    return str(compile_template(tpl)(
        {},
        EncodeValue=encode_value,
        EncodeValueByColumn=lambda _c, v: encode_value(v),
        EncodeValueByType=lambda _t, v: encode_value(v),
    ))


@register
class Template(Transformer):
    """Single-column template; context sees the whole row."""

    name = "Template"
    allowed_types = ("any",)
    defaults = {"keep_null": False}
    table_level = True  # needs full-row context

    def apply(self, df: DataFrame, ctx: BuildContext) -> DataFrame:
        tpl = ctx.params["template"]
        target = ctx.column
        target_type = ctx.spark_type
        # the record context is the VISIBLE columns only — planner-internal
        # helper/stash columns must not appear in the template environment
        cols = list(ctx.df_columns) or df.columns
        skip_col = ctx.skip_col

        def _render(it):
            render = compile_template(tpl)
            for pdf in it:
                skips = (pdf[skip_col].tolist()
                         if skip_col and skip_col in pdf.columns else None)
                rendered = [
                    # when-excluded rows are never rendered (their value
                    # here is a placeholder; the planner restores the
                    # type-exact original from the stash)
                    None if skips is not None and skips[i]
                    else render(dict(zip(cols, row)))
                    for i, row in enumerate(
                        pdf[cols].itertuples(index=False, name=None))
                ]
                pdf[target] = pd.Series(rendered, index=pdf.index).astype(object)
                yield pdf

        schema = df.schema
        out = df.mapInPandas(_render, schema=_with_string(schema, target))
        return out.withColumn(target, F.col(target).cast(target_type))


@register
class TemplateRecord(Transformer):
    """Whole-record template mutation: the template returns nothing; it sets
    columns via the ``set`` callable (reference: TemplateRecord exposes
    record setters — template_record.go:28-140)."""

    name = "TemplateRecord"
    allowed_types = ("any",)
    defaults = {}
    table_level = True

    def apply(self, df: DataFrame, ctx: BuildContext) -> DataFrame:
        tpl = ctx.params["template"]
        affected: list[str] = ctx.params.get("columns") or []
        # record env = visible columns only; planner-internal columns pass
        # through untouched (pdf.copy keeps them aligned)
        cols = list(ctx.df_columns) or df.columns
        skip_col = ctx.skip_col
        schema = df.schema

        def _render(it):
            render = compile_template(tpl)
            for pdf in it:
                skips = (pdf[skip_col].tolist()
                         if skip_col and skip_col in pdf.columns else None)
                recs = []
                for i, row in enumerate(
                    pdf[cols].itertuples(index=False, name=None)
                ):
                    rec = dict(zip(cols, row))
                    if skips is not None and skips[i]:
                        # when-excluded: never evaluated by the template
                        recs.append(rec)
                        continue
                    updates: dict[str, Any] = {}

                    def _set(k, v, _u=updates):
                        _u[k] = v
                        return ""

                    render(rec, set=_set)
                    rec.update(updates)
                    recs.append(rec)
                out = pdf.copy()
                for c in cols:
                    out[c] = pd.Series([r[c] for r in recs],
                                       index=pdf.index).astype(object)
                yield out

        _ = affected
        return df.mapInPandas(_render, schema=schema)

    def build(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise TypeError("TemplateRecord is table-level; use apply()")


def _with_string(schema, target):
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name == target else f.dataType,
                          True)
            for f in schema.fields
        ]
    )
