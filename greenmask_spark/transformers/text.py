"""Text/value transformers: Hash, Replace, SetNull, Dict, RegexpReplace,
Masking, RandomString, RandomUuid, RandomChoice.

Reference semantics per file in internal/db/postgres/transformers/:
- hash.go:35-255        — md5/sha1/sha256/sha384/sha512 digest of text with
                          optional salt and ``max_length`` truncation.
- replace.go:25-266     — constant replacement honoring keep_null.
- set_null.go:25-91     — set cell to NULL.
- dict.go:27-253        — exact-match mapping with default / fail_not_matched.
- regexp_replace.go:26-141 — regexp → replace (RE2; we run Java regex and
                          document the dialect delta, SURVEY §7 known-hard #2).
- masking.go:30-198     — go-masker styles (default, password, name, addr,
                          email, mobile, tel, id, credit_card, url, postcode).
- random_string.go:26-180 — random string of length [min,max] over ``symbols``.
- random_uuid.go:26-141 — random or deterministic uuid.
- random_choice.go:28-232 — pick one of ``values``.

Everything here is a pure Column expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import (
    BuildContext,
    Transformer,
    keep_null_guard,
    register,
)

_DEFAULT_SYMBOLS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


@register
class Hash(Transformer):
    name = "Hash"
    allowed_types = ("text", "varchar", "char", "bpchar", "citext")
    defaults = {"function": "sha256", "salt": "", "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        fn = ctx.params.get("function", "sha256")
        salt = ctx.params.get("salt", "")
        src = F.concat(F.lit(salt), ctx.col().cast("string"))
        if fn == "md5":
            out = F.md5(src)
        elif fn == "sha1":
            out = F.sha1(src)
        elif fn in ("sha224", "sha256", "sha384", "sha512"):
            out = F.sha2(src, int(fn[3:]))
        else:
            raise ValueError(f"unknown hash function {fn!r}")
        max_len = ctx.params.get("max_length")
        if max_len:
            out = F.substring(out, 1, int(max_len))
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class Replace(Transformer):
    name = "Replace"
    allowed_types = ("any",)
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        out = ctx.param_col("value").cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))

    def validate_params(self, params, spark_type=None):
        from greenmask_spark.transformers.base import can_encode

        v = params.get("value")
        if isinstance(v, dict) and "column" in v:  # dynamic — checked at run
            return []
        if not can_encode(v, spark_type):
            return [f"Replace: value {v!r} cannot be encoded into column "
                    f"type {spark_type.simpleString()}"]
        return []


@register
class SetNull(Transformer):
    name = "SetNull"
    allowed_types = ("any",)

    def build(self, ctx: BuildContext) -> Column:
        return F.lit(None).cast(ctx.spark_type)


@register
class Dict(Transformer):
    name = "Dict"
    allowed_types = ("any",)
    defaults = {"fail_not_matched": False, "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        values: dict = ctx.params.get("values", {})
        mapping = F.create_map(
            *[F.lit(x) for kv in values.items() for x in kv]
        )
        looked = F.element_at(mapping, ctx.col().cast("string"))
        default = ctx.params.get("default")
        if default is not None:
            looked = F.coalesce(looked, F.lit(default))
        elif ctx.params.get("fail_not_matched"):
            looked = F.when(looked.isNotNull(), looked).otherwise(
                F.raise_error(
                    F.concat(F.lit("Dict: unmatched value "), ctx.col().cast("string"))
                )
            )
        out = looked.cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class RegexpReplace(Transformer):
    name = "RegexpReplace"
    allowed_types = ("text", "varchar", "char", "bpchar", "citext")
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        out = F.regexp_replace(
            ctx.col(),
            ctx.params["regexp"],
            ctx.params.get("replace", ""),
        )
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


def _overlay_expr(c: Column, mask: str, start: int, end: int) -> Column:
    """go-masker's overlay as an expression: replace chars [start, end)
    with the literal ``mask``, both bounds clamped to the length (the
    library's clamping keeps short-string behavior identical)."""
    n = F.length(c)
    s = F.least(F.lit(start), n)
    e = F.least(F.lit(end), n)
    return F.concat(c.substr(F.lit(1), s), F.lit(mask), c.substr(e + 1, n))


def _mask_name_expr(c: Column) -> Column:
    """Per space-separated word: 1 char → '**'; 2-3 chars →
    overlay(w,'**',1,2); longer → overlay(w,'**',1,3). Matches
    go-masker Name ('abcdef test' → 'a**def t**t', reference
    masking_test.go vector). transform() is a JVM HOF — no Python."""
    def word(w: Column) -> Column:
        lw = F.length(w)
        return (
            F.when(lw == 0, w)
            .when(lw == 1, F.lit("**"))
            .when(lw <= 3, _overlay_expr(w, "**", 1, 2))
            .otherwise(_overlay_expr(w, "**", 1, 3))
        )

    return F.when(c == "", c).otherwise(
        F.array_join(F.transform(F.split(c, " ", -1), word), " ")
    )


@register
class Masking(Transformer):
    """go-masker styles (reference masking.go:30-198 maps styles onto
    github.com/ggwhite/go-masker v1.1.0 + local default/postcode
    maskers). Semantics pinned by the reference's own masking_test.go
    vectors; the pure-Python twin in transformers/masker.py (template
    tier) shares the rule definitions and the test suite cross-checks
    both tiers."""

    name = "Masking"
    allowed_types = ("text", "varchar", "char", "bpchar", "citext")
    defaults = {"type": "default", "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        style = ctx.params.get("type", "default")
        c = ctx.col()
        if style == "default":
            out = F.regexp_replace(c, r".", "*")
        elif style == "password":
            out = F.lit("************")
        elif style == "name":
            out = _mask_name_expr(c)
        elif style == "email":
            # overlay(local, '****', 3, 7) + '@' + domain; no '@' → as-is
            local = F.substring_index(c, "@", 1)
            rest = c.substr(F.length(local) + 2, F.length(c))
            out = F.when(
                c.contains("@"),
                F.concat(_overlay_expr(local, "****", 3, 7),
                         F.lit("@"), rest),
            ).otherwise(c)
        elif style == "mobile":
            out = F.when(c == "", c).otherwise(_overlay_expr(c, "***", 4, 7))
        elif style in ("tel", "telephone"):
            cleaned = F.translate(c, " ()-", "")
            out = F.when(c == "", c).otherwise(
                F.when(
                    F.length(cleaned) == 10,
                    F.concat(
                        F.lit("("), cleaned.substr(1, 2), F.lit(")"),
                        cleaned.substr(3, 4), F.lit("-****"),
                    ),
                ).otherwise(cleaned)
            )
        elif style == "id":
            out = F.when(c == "", c).otherwise(_overlay_expr(c, "****", 6, 10))
        elif style == "credit_card":
            out = F.when(c == "", c).otherwise(
                _overlay_expr(c, "******", 6, 12))
        elif style == "url":
            # net/url Redacted(): password part of userinfo → 'xxxxx'
            out = F.regexp_replace(
                c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/@:]*:)[^@]*@",
                r"$1xxxxx@")
        elif style in ("addr", "address"):
            # go-masker v1.1.0 m.Address runtime: empty → empty, ≤6
            # chars fully mask to '******', else first 6 chars + a
            # FIXED 6-star tail (masker.mask_address is the Python twin)
            out = F.when(c == "", c).otherwise(
                F.when(F.length(c) <= 6, F.lit("******")).otherwise(
                    F.concat(c.substr(1, 6), F.lit("******"))
                )
            )
        elif style == "postcode":
            out = F.when(F.length(c) <= 2, c).otherwise(
                F.concat(c.substr(1, 2),
                         F.repeat(F.lit("*"), F.length(c) - 2)))
        else:
            raise ValueError(f"unknown masking type {style!r}")
        return keep_null_guard(c, out, ctx.params.get("keep_null", True))

    _STYLES = ("default", "password", "name", "email", "mobile", "tel",
               "telephone", "id", "credit_card", "url", "addr", "address",
               "postcode")

    def validate_params(self, params, spark_type=None):
        style = params.get("type", "default")
        if style not in self._STYLES:
            return [f"Masking: unknown masking type {style!r} "
                    f"(known: {list(self._STYLES)})"]
        return []


@register
class RandomString(Transformer):
    name = "RandomString"
    allowed_types = ("text", "varchar", "char", "bpchar", "citext")
    defaults = {"min_length": 1, "max_length": 10, "symbols": _DEFAULT_SYMBOLS,
                "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        p = ctx.params
        symbols: str = p.get("symbols", _DEFAULT_SYMBOLS)
        min_len = int(p.get("min_length", 1))
        max_len = int(p.get("max_length", 10))
        n_sym = len(symbols)
        length = ctx.engine.uniform_int(
            ctx.col(), F.lit(min_len), F.lit(max_len), draw=0
        )
        # One char per position, each an independent deterministic draw.
        # max_len is a plan-time constant so the expression tree is static.
        sym_arr = F.array(*[F.lit(ch) for ch in symbols])
        chars = [
            F.when(
                F.lit(i) < length,
                F.element_at(
                    sym_arr,
                    (
                        ctx.engine.uniform_int(
                            ctx.col(), F.lit(0), F.lit(n_sym - 1), draw=1 + i
                        )
                    ).cast("int")
                    + 1,
                ),
            ).otherwise(F.lit(""))
            for i in range(max_len)
        ]
        out = F.concat(*chars)
        return keep_null_guard(ctx.col(), out, p.get("keep_null", True))

    def validate_params(self, params, spark_type=None):
        w = []
        lo = int(params.get("min_length", 1))
        hi = int(params.get("max_length", 10))
        if lo > hi:
            w.append(f"RandomString: min_length ({lo}) is greater than "
                     f"max_length ({hi})")
        if not params.get("symbols", _DEFAULT_SYMBOLS):
            w.append("RandomString: symbols alphabet is empty")
        return w


@register
class RandomUuid(Transformer):
    name = "RandomUuid"
    allowed_types = ("uuid", "text", "varchar")
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        if ctx.engine.deterministic:
            h = ctx.engine.hex(ctx.col())
            # RFC-4122 v4 shape from hash bytes: version nibble '4', variant 'a'
            out = F.concat_ws(
                "-",
                F.substring(h, 1, 8),
                F.substring(h, 9, 4),
                F.concat(F.lit("4"), F.substring(h, 14, 3)),
                F.concat(F.lit("a"), F.substring(h, 18, 3)),
                F.substring(h, 21, 12),
            )
        else:
            out = F.uuid()
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class RandomChoice(Transformer):
    name = "RandomChoice"
    allowed_types = ("any",)
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        values: list = ctx.params["values"]
        idx = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(len(values) - 1))
        arr = F.array(*[F.lit(v) for v in values])
        out = F.element_at(arr, idx.cast("int") + 1).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))

    def validate_params(self, params, spark_type=None):
        from greenmask_spark.transformers.base import can_encode

        values = params.get("values")
        if not values:
            return ["RandomChoice: values list is empty"]
        return [
            f"RandomChoice: value {v!r} cannot be encoded into column type "
            f"{spark_type.simpleString()}"
            for v in values
            if not can_encode(v, spark_type)
        ]
