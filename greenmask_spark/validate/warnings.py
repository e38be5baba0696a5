"""Validation warnings with resolvable hashes.

Reference: pkg/toolkit/validation_warning.go:44-102 — warnings carry
{msg, severity, meta} and an md5 hash over a canonical signature so a user
can list known-accepted hashes in config (``resolved_warnings``) to
suppress them; ``error`` severity is fatal; validate's strict mode fails
on any unresolved warning/error (HasUnresolved).

Plan-level checks mirror internal/db/postgres/context/config_builder.go's
parameter validation: unknown columns, transformer/column type
compatibility, primary-key-affected transforms, NOT NULL violations —
plus each transformer's own ``validate_params``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

ERROR = "error"
WARNING = "warning"
INFO = "info"

#: Spark type → canonical PG family used in Transformer.allowed_types
_SPARK_TO_PG = {
    "tinyint": "int2", "smallint": "int2", "int": "int4", "integer": "int4",
    "bigint": "int8", "float": "float4", "double": "float8",
    "string": "text", "boolean": "bool", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp", "binary": "bytea",
}


def pg_family(spark_type: T.DataType) -> str:
    s = spark_type.simpleString()
    if s.startswith("decimal"):
        return "numeric"
    return _SPARK_TO_PG.get(s, s)


@dataclass
class ValidationWarning:
    msg: str
    severity: str = WARNING
    meta: dict[str, Any] = field(default_factory=dict)

    @property
    def hash(self) -> str:
        """md5 over the canonical signature (validation_warning.go:89-102:
        'msg=<msg> severity=<sev> k=v ...' with sorted meta keys)."""
        meta = "".join(
            f" {k}={self.meta[k]}" for k in sorted(self.meta)
        )
        sig = f"msg={self.msg} severity={self.severity} {meta}"
        return hashlib.md5(sig.encode()).hexdigest()

    def to_dict(self) -> dict[str, Any]:
        return {"msg": self.msg, "severity": self.severity,
                "meta": dict(self.meta), "hash": self.hash}


def is_fatal(warnings: list[ValidationWarning]) -> bool:
    return any(w.severity == ERROR for w in warnings)


def has_unresolved(
    warnings: list[ValidationWarning], resolved: list[str] | set[str] = ()
) -> bool:
    """Strict-mode check (validation_warning.go HasUnresolved): any
    warning/error whose hash is not in the resolved list."""
    resolved = set(resolved)
    return any(
        w.severity in (WARNING, ERROR) and w.hash not in resolved
        for w in warnings
    )


def _meta(plan, step, extra=None) -> dict[str, Any]:
    m = {"TableName": plan.table,
         "TransformerName": step.transformer.name}
    if step.column:
        m["ColumnName"] = step.column
    if extra:
        m.update(extra)
    return m


def validate_plan(
    plan,
    schema: T.StructType,
    primary_key: tuple[str, ...] = (),
    not_null: tuple[str, ...] = (),
) -> list[ValidationWarning]:
    """Static checks of one TablePlan against its table schema."""
    warnings: list[ValidationWarning] = []
    fields = {f.name: f for f in schema.fields}
    pk = set(primary_key)
    nn = set(not_null) | {f.name for f in schema.fields if not f.nullable}

    for step in plan.steps:
        t = step.transformer
        targets = []
        if step.column:
            targets = [step.column]
        elif getattr(t, "multi_column", False):
            targets = [
                c["name"] if isinstance(c, dict) else c
                for c in step.params.get("columns", [])
            ]
        for col in targets:
            if col not in fields:
                warnings.append(ValidationWarning(
                    f"column {col!r} is not found in the table",
                    ERROR, _meta(plan, step, {"ColumnName": col})))
                continue
            allowed = getattr(t, "allowed_types", ())
            if allowed and "any" not in allowed:
                fam = pg_family(fields[col].dataType)
                if fam not in allowed:
                    warnings.append(ValidationWarning(
                        f"column type {fam!r} is not allowed for "
                        f"transformer {t.name!r} (allowed: {sorted(allowed)})",
                        ERROR, _meta(plan, step, {"ColumnName": col,
                                                  "TypeName": fam})))
            if col in pk:
                # reference warns: transforming a PK risks FK integrity
                # unless hash engine + apply_for_references propagate it
                warnings.append(ValidationWarning(
                    f"transformer affects primary key column {col!r}",
                    WARNING, _meta(plan, step, {"ColumnName": col,
                                                "ConstraintType": "PK"})))
            if col in nn and t.name == "SetNull":
                warnings.append(ValidationWarning(
                    f"SetNull on NOT NULL column {col!r}",
                    ERROR, _meta(plan, step, {"ColumnName": col,
                                              "ConstraintType": "NotNull"})))
        ttype = (fields[targets[0]].dataType
                 if targets and targets[0] in fields else None)
        for msg in t.validate_params(step.params, ttype):
            warnings.append(ValidationWarning(msg, WARNING, _meta(plan, step)))
    return warnings


def validate_plans(
    plans,
    schemas: dict[str, T.StructType],
    primary_keys: dict[str, tuple[str, ...]] | None = None,
    resolved: list[str] | set[str] = (),
) -> list[ValidationWarning]:
    """All-plan validation, with resolved-hash suppression."""
    primary_keys = primary_keys or {}
    out: list[ValidationWarning] = []
    resolved = set(resolved)
    for plan in plans:
        if plan.table not in schemas:
            w = ValidationWarning(
                f"table {plan.table!r} not found", ERROR,
                {"TableName": plan.table})
            if w.hash not in resolved:
                out.append(w)
            continue
        for w in validate_plan(plan, schemas[plan.table],
                               primary_keys.get(plan.table, ())):
            if w.hash not in resolved:
                out.append(w)
    return out
