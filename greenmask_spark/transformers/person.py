"""Multi-column correlated transformers: RandomPerson, RandomCompany, RealAddress.

Reference semantics:
- RandomPerson (internal/db/postgres/transformers/random_person.go:22-352,
  core generators/transformers/random_person.go): one generator draw per
  ROW selects a persona; multiple configured columns (FirstName, LastName,
  Title, Gender) are filled from the SAME persona → cross-column
  correlation. ``gender`` may be static, 'Any', or dynamic via a
  ``gender_mapping`` over another column.
- RandomCompany (random_company.go:15-244): same for CompanyName/Suffix.
- RealAddress (real_address.go:30-203): real-looking addresses into mapped
  columns via per-column attribute selection.

Spark-first: the shared persona index is ONE deterministic draw keyed on a
chosen key column (hash engine) or one rand() (random engine), and every
attribute is `element_at(lexicon_array, shared_idx)` — correlation falls
out of sharing the index expression; Catalyst CSE keeps it evaluated once.
These are multi-column transformers: ``build_multi`` returns a dict of
column → expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from greenmask_spark.transformers import lexicons as lex
from greenmask_spark.transformers.base import BuildContext, Transformer, register


def _pick(arr: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(v) for v in arr]), (idx % len(arr)).cast("int") + 1)


class MultiColumnTransformer(Transformer):
    multi_column = True

    def build_multi(self, ctx: BuildContext) -> dict[str, Column]:  # pragma: no cover
        raise NotImplementedError

    def build(self, ctx: BuildContext) -> Column:
        return self.build_multi(ctx)[ctx.column]


@register
class RandomPerson(MultiColumnTransformer):
    """columns param: list of {name, template} where template references one
    of FirstName / LastName / Title / FullName / Gender (reference accepts
    Go templates over these attributes; we accept the attribute name or a
    '{{ .Attr }}'-style string and extract the attribute)."""

    name = "RandomPerson"
    allowed_types = ("text", "varchar", "citext")
    defaults = {"gender": "Any", "keep_null": True}

    def build_multi(self, ctx: BuildContext) -> dict[str, Column]:
        p = ctx.params
        cols: list[dict] = p["columns"]
        key = F.concat_ws("\x1f", *[F.col(c["name"]).cast("string") for c in cols])
        idx = ctx.engine.uniform_int(key, F.lit(0), F.lit(10**9), draw=0)

        gender_p = p.get("gender", "Any")
        if isinstance(gender_p, dict) and "column" in gender_p:
            mapping = p.get("gender_mapping", {})
            gcol = F.col(gender_p["column"]).cast("string")
            gender = F.lit(p.get("fallback_gender", "Any"))
            for k, v in mapping.items():
                gender = F.when(gcol == k, F.lit(v)).otherwise(gender)
        else:
            gender = F.lit(gender_p)

        is_male = (gender == "Male") | (
            (gender == "Any") & (idx % 2 == 0)
        )
        first = F.when(is_male, _pick(lex.FIRST_NAMES_MALE, idx)).otherwise(
            _pick(lex.FIRST_NAMES_FEMALE, idx)
        )
        last = _pick(lex.LAST_NAMES, idx)
        title = F.when(is_male, _pick(lex.TITLES_MALE, idx)).otherwise(
            _pick(lex.TITLES_FEMALE, idx)
        )
        attrs = {
            "FirstName": first,
            "LastName": last,
            "Title": title,
            "FullName": F.concat_ws(" ", first, last),
            "Gender": F.when(is_male, F.lit("Male")).otherwise(F.lit("Female")),
        }
        out = {}
        for c in cols:
            attr = c.get("template", c.get("attribute", "FullName"))
            attr = attr.replace("{{", "").replace("}}", "").replace(".", "").strip()
            out[c["name"]] = attrs[attr]
        return out


@register
class RandomCompany(MultiColumnTransformer):
    name = "RandomCompany"
    allowed_types = ("text", "varchar", "citext")
    defaults = {"keep_null": True}

    def build_multi(self, ctx: BuildContext) -> dict[str, Column]:
        cols: list[dict] = ctx.params["columns"]
        key = F.concat_ws("\x1f", *[F.col(c["name"]).cast("string") for c in cols])
        idx = ctx.engine.uniform_int(key, F.lit(0), F.lit(10**9), draw=0)
        name = _pick(lex.COMPANY_NAMES, idx)
        suffix = _pick(lex.COMPANY_SUFFIXES, idx)
        attrs = {
            "CompanyName": name,
            "CompanySuffix": suffix,
            "FullCompanyName": F.concat_ws(" ", name, suffix),
        }
        out = {}
        for c in cols:
            attr = c.get("template", c.get("attribute", "FullCompanyName"))
            attr = attr.replace("{{", "").replace("}}", "").replace(".", "").strip()
            out[c["name"]] = attrs[attr]
        return out


@register
class RealAddress(MultiColumnTransformer):
    name = "RealAddress"
    allowed_types = ("text", "varchar", "citext")
    defaults = {"keep_null": True}

    def build_multi(self, ctx: BuildContext) -> dict[str, Column]:
        cols: list[dict] = ctx.params["columns"]
        key = F.concat_ws("\x1f", *[F.col(c["name"]).cast("string") for c in cols])
        idx = ctx.engine.uniform_int(key, F.lit(0), F.lit(10**9), draw=0)
        num = (idx % 9899 + 100).cast("string")
        street = _pick(lex.STREET_NAMES, idx)
        city = _pick(lex.CITIES, idx)
        state = _pick([s for s, _ in lex.STATES], idx)
        state_abbr = _pick([a for _, a in lex.STATES], idx)
        zipc = F.lpad((idx % 90000 + 10000).cast("string"), 5, "0")
        attrs = {
            "Address": F.concat_ws(" ", num, street),
            "City": city,
            "State": state,
            "StateAbbr": state_abbr,
            "PostalCode": zipc,
            "FullAddress": F.concat_ws(
                ", ", F.concat_ws(" ", num, street), city,
                F.concat_ws(" ", state_abbr, zipc)
            ),
        }
        out = {}
        for c in cols:
            attr = c.get("template", c.get("attribute", "FullAddress"))
            attr = attr.replace("{{", "").replace("}}", "").replace(".", "").strip()
            out[c["name"]] = attrs[attr]
        return out
