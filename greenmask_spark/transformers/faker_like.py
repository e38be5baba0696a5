"""The 22 faker-backed scalar transformers.

Reference: internal/db/postgres/transformers/random_faker.go:28-297 —
registered in a loop over go-faker calls. We re-express each as a
deterministic lexicon pick / formatted-number Column expression (no
Python faker on the hot path; behavior-parity is "same value family and
shape", not byte parity — SURVEY §2.3).

Each transformer keys its draws on the input value (hash engine) so
outputs are FK-consistent; random engine gives fresh draws per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from greenmask_spark.transformers import lexicons as lex
from greenmask_spark.transformers.base import (
    BuildContext,
    Transformer,
    keep_null_guard,
    register,
)


def _pick(arr, idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in arr]), (idx % len(arr)).cast("int") + 1
    )


class _FakerBase(Transformer):
    allowed_types = ("text", "varchar", "citext", "float4", "float8", "int2",
                     "int4", "int8", "numeric")
    defaults = {"keep_null": True}

    def _expr(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise NotImplementedError

    def build(self, ctx: BuildContext) -> Column:
        out = self._expr(ctx).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


def _u(ctx: BuildContext, draw: int = 0) -> Column:
    """Deterministic uniform [0,1) keyed on the cell."""
    return ctx.engine.uniform_double(ctx.col(), draw=draw)


def _i(ctx: BuildContext, lo: int, hi: int, draw: int = 0) -> Column:
    return ctx.engine.uniform_int(ctx.col(), F.lit(lo), F.lit(hi), draw=draw)


@register
class RandomLatitude(_FakerBase):
    name = "RandomLatitude"

    def _expr(self, ctx):
        return F.round(_u(ctx) * 180.0 - 90.0, 6)


@register
class RandomLongitude(_FakerBase):
    name = "RandomLongitude"

    def _expr(self, ctx):
        return F.round(_u(ctx) * 360.0 - 180.0, 6)


@register
class RandomMonthName(_FakerBase):
    name = "RandomMonthName"

    def _expr(self, ctx):
        return _pick(lex.MONTH_NAMES, _i(ctx, 0, 11))


@register
class RandomYearString(_FakerBase):
    name = "RandomYearString"

    def _expr(self, ctx):
        return _i(ctx, 1950, 2049).cast("string")


@register
class RandomDayOfWeek(_FakerBase):
    name = "RandomDayOfWeek"

    def _expr(self, ctx):
        return _pick(lex.DAY_NAMES, _i(ctx, 0, 6))


@register
class RandomDayOfMonth(_FakerBase):
    name = "RandomDayOfMonth"

    def _expr(self, ctx):
        return _i(ctx, 1, 28).cast("string")


@register
class RandomCentury(_FakerBase):
    name = "RandomCentury"

    _ROMAN = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
              "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII",
              "XIX", "XX", "XXI"]

    def _expr(self, ctx):
        return _pick(self._ROMAN, _i(ctx, 0, len(self._ROMAN) - 1))


@register
class RandomTimezone(_FakerBase):
    name = "RandomTimezone"

    def _expr(self, ctx):
        return _pick(lex.TIMEZONES, _i(ctx, 0, len(lex.TIMEZONES) - 1))


@register
class RandomDomainName(_FakerBase):
    name = "RandomDomainName"

    def _expr(self, ctx):
        return F.concat(
            _pick(lex.DOMAIN_WORDS, _i(ctx, 0, 10**6, draw=0)),
            _pick(lex.DOMAIN_WORDS, _i(ctx, 0, 10**6, draw=1)),
            F.lit("."),
            _pick(lex.TLDS, _i(ctx, 0, len(lex.TLDS) - 1, draw=2)),
        )


@register
class RandomURL(_FakerBase):
    name = "RandomURL"

    def _expr(self, ctx):
        return F.concat(
            F.lit("https://"),
            _pick(lex.DOMAIN_WORDS, _i(ctx, 0, 10**6, draw=0)),
            F.lit("."),
            _pick(lex.TLDS, _i(ctx, 0, len(lex.TLDS) - 1, draw=1)),
            F.lit("/"),
            _pick(lex.WORDS, _i(ctx, 0, 10**6, draw=2)),
        )


@register
class RandomUsername(_FakerBase):
    name = "RandomUsername"

    def _expr(self, ctx):
        return F.concat(
            _pick(lex.WORDS, _i(ctx, 0, 10**6, draw=0)),
            F.lit("_"),
            _i(ctx, 10, 9999, draw=1).cast("string"),
        )


@register
class RandomPassword(_FakerBase):
    name = "RandomPassword"
    defaults = {"length": 16, "keep_null": True}

    def _expr(self, ctx):
        # length chars from the password alphabet, 4 independent hex slices
        h = ctx.engine.hex(ctx.col())
        n = int(ctx.params.get("length", 16))
        syms = lex.PASSWORD_SYMBOLS
        arr = F.array(*[F.lit(c) for c in syms])
        chars = [
            F.element_at(
                arr,
                (ctx.engine.uniform_int(ctx.col(), F.lit(0),
                                        F.lit(len(syms) - 1), draw=i)).cast("int") + 1,
            )
            for i in range(n)
        ]
        _ = h
        return F.concat(*chars)


@register
class RandomWord(_FakerBase):
    name = "RandomWord"

    def _expr(self, ctx):
        return _pick(lex.WORDS, _i(ctx, 0, 10**6))


@register
class RandomSentence(_FakerBase):
    name = "RandomSentence"
    defaults = {"words": 8, "keep_null": True}

    def _expr(self, ctx):
        n = int(ctx.params.get("words", 8))
        parts = [_pick(lex.WORDS, _i(ctx, 0, 10**6, draw=i)) for i in range(n)]
        body = F.concat_ws(" ", *parts)
        return F.concat(F.upper(F.substring(body, 1, 1)), F.substring(body, 2, 10**6),
                        F.lit("."))


@register
class RandomParagraph(_FakerBase):
    name = "RandomParagraph"
    defaults = {"sentences": 3, "words": 8, "keep_null": True}

    def _expr(self, ctx):
        n_sent = int(ctx.params.get("sentences", 3))
        n_words = int(ctx.params.get("words", 8))
        sents = []
        for s in range(n_sent):
            parts = [
                _pick(lex.WORDS, _i(ctx, 0, 10**6, draw=s * n_words + w))
                for w in range(n_words)
            ]
            body = F.concat_ws(" ", *parts)
            sents.append(
                F.concat(F.upper(F.substring(body, 1, 1)),
                         F.substring(body, 2, 10**6), F.lit("."))
            )
        return F.concat_ws(" ", *sents)


@register
class RandomCCType(_FakerBase):
    name = "RandomCCType"

    def _expr(self, ctx):
        return _pick(lex.CC_TYPES, _i(ctx, 0, len(lex.CC_TYPES) - 1))


@register
class RandomCCNumber(_FakerBase):
    name = "RandomCCNumber"

    def _expr(self, ctx):
        # 16-digit number starting with 4 (Visa-shaped); no Luhn parity —
        # matches the reference's faker which fakes shape, not validity.
        return F.concat(
            F.lit("4"),
            F.lpad(_i(ctx, 0, 10**7 - 1, draw=0).cast("string"), 7, "0"),
            F.lpad(_i(ctx, 0, 10**8 - 1, draw=1).cast("string"), 8, "0"),
        )


@register
class RandomCurrency(_FakerBase):
    name = "RandomCurrency"

    def _expr(self, ctx):
        return _pick(lex.CURRENCIES, _i(ctx, 0, len(lex.CURRENCIES) - 1))


@register
class RandomAmountWithCurrency(_FakerBase):
    name = "RandomAmountWithCurrency"

    def _expr(self, ctx):
        amount = F.round(_u(ctx, draw=0) * 10000.0, 2).cast("string")
        cur = _pick(lex.CURRENCIES, _i(ctx, 0, len(lex.CURRENCIES) - 1, draw=1))
        return F.concat(amount, F.lit(" "), cur)


@register
class RandomPhoneNumber(_FakerBase):
    name = "RandomPhoneNumber"

    def _expr(self, ctx):
        return F.concat(
            F.lit("("), F.lpad(_i(ctx, 200, 999, draw=0).cast("string"), 3, "0"),
            F.lit(") "), F.lpad(_i(ctx, 200, 999, draw=1).cast("string"), 3, "0"),
            F.lit("-"), F.lpad(_i(ctx, 0, 9999, draw=2).cast("string"), 4, "0"),
        )


@register
class RandomTollFreePhoneNumber(_FakerBase):
    name = "RandomTollFreePhoneNumber"

    def _expr(self, ctx):
        prefix = _pick(["800", "833", "844", "855", "866", "877", "888"],
                       _i(ctx, 0, 6, draw=0))
        return F.concat(
            F.lit("("), prefix, F.lit(") "),
            F.lpad(_i(ctx, 200, 999, draw=1).cast("string"), 3, "0"),
            F.lit("-"), F.lpad(_i(ctx, 0, 9999, draw=2).cast("string"), 4, "0"),
        )


@register
class RandomE164PhoneNumber(_FakerBase):
    name = "RandomE164PhoneNumber"

    def _expr(self, ctx):
        return F.concat(
            F.lit("+1"),
            F.lpad(_i(ctx, 200, 999, draw=0).cast("string"), 3, "0"),
            F.lpad(_i(ctx, 200, 999, draw=1).cast("string"), 3, "0"),
            F.lpad(_i(ctx, 0, 9999, draw=2).cast("string"), 4, "0"),
        )
