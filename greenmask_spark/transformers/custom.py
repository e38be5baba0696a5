"""Custom (user-packaged) transformer registry.

Reference: ``custom_transformers`` config — each entry names an executable
that self-describes via ``--print-definition`` emitting a JSON definition
(schema pkg/toolkit/definition.go:86,
custom/custom_transformer_definition.go:29); greenmask registers it at
startup (custom/bootatrsp_transformers.go:32, custom/custom_cmd.go:44-305)
as a Cmd-protocol transformer, with an interactive ``--validate``
handshake (custom_cmd.go:169).

Spark-first twins:

- :func:`load_custom_transformers` — subprocess handshake: run
  ``<executable> <args> --print-definition``, parse the definition JSON,
  register a Cmd-backed table-level transformer under the declared name.
- :func:`register_python_transformer` — in-process plugin path (the
  Python-native analog of a packaged binary): register (param schema,
  Column-expression builder) directly; builders stay inside
  Catalyst/codegen instead of paying the subprocess protocol.
"""

from __future__ import annotations

import json
import subprocess
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame

from greenmask_spark.transformers.base import (
    DEFAULT_REGISTRY,
    BuildContext,
    Transformer,
    TransformerRegistry,
)
from greenmask_spark.transformers.cmd import Cmd


@dataclass
class CustomDefinition:
    """Parsed ``--print-definition`` payload (pkg/toolkit/definition.go:86)."""

    name: str
    description: str = ""
    driver: str = "json"
    parameters: list[dict[str, Any]] = field(default_factory=list)
    validate: bool = False  # whether the binary supports --validate

    @classmethod
    def from_json(cls, payload: str) -> "CustomDefinition":
        d = json.loads(payload)
        driver = d.get("driver", {})
        return cls(
            name=d["name"],
            description=d.get("description", ""),
            driver=(driver.get("name", "json")
                    if isinstance(driver, dict) else str(driver)),
            parameters=d.get("parameters", []),
            validate=bool(d.get("validate", False)),
        )


def discover_definition(
    executable: str, args: tuple[str, ...] = (), timeout: float = 10.0
) -> CustomDefinition:
    """``--print-definition`` handshake (custom_cmd.go:44-305)."""
    res = subprocess.run(
        [executable, *args, "--print-definition"],
        capture_output=True, text=True, timeout=timeout, check=True,
    )
    return CustomDefinition.from_json(res.stdout)


class CustomCmdTransformer(Transformer):
    """A registered custom transformer: the Cmd protocol machinery with
    the definition's driver, executable and declared parameters."""

    table_level = True
    allowed_types = ("any",)

    def __init__(self, definition: CustomDefinition, executable: str,
                 args: tuple[str, ...] = ()):
        self.definition = definition
        self.name = definition.name
        self.executable = executable
        self.args = tuple(args)
        self.defaults = {
            p["name"]: p.get("default_value")
            for p in definition.parameters
            if "default_value" in p
        }

    def validate_params(self, params: dict[str, Any],
                        spark_type=None) -> list[str]:
        warnings = []
        for p in self.definition.parameters:
            if p.get("required") and params.get(p["name"]) is None:
                warnings.append(
                    f"required parameter {p['name']!r} of custom "
                    f"transformer {self.name!r} is missing"
                )
        if self.definition.validate:
            payload = json.dumps(params, default=str)
            res = subprocess.run(
                [self.executable, *self.args, "--validate"],
                input=payload, capture_output=True, text=True, timeout=10,
            )
            if res.stdout.strip():
                for w in json.loads(res.stdout):
                    warnings.append(str(w))
        return warnings

    def apply(self, df: DataFrame, ctx: BuildContext) -> DataFrame:
        cmd_ctx = BuildContext(
            column=ctx.column,
            spark_type=ctx.spark_type,
            params={
                **ctx.params,
                "executable": self.executable,
                "args": list(self.args),
                "driver": self.definition.driver,
            },
            engine=ctx.engine,
            df_columns=ctx.df_columns,
            skip_col=ctx.skip_col,
        )
        return Cmd().apply(df, cmd_ctx)

    def build(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise TypeError(f"{self.name} is table-level; use apply()")


class PythonTransformer(Transformer):
    """In-process plugin: a user-supplied Column-expression builder with a
    parameter schema — stays vectorized inside Catalyst (no subprocess)."""

    def __init__(self, name: str, builder: Callable[[BuildContext], Column],
                 parameters: list[dict[str, Any]] | None = None,
                 allowed_types: tuple[str, ...] = ("any",)):
        self.name = name
        self._builder = builder
        self.parameters = parameters or []
        self.allowed_types = allowed_types
        self.defaults = {
            p["name"]: p.get("default_value")
            for p in self.parameters if "default_value" in p
        }

    def validate_params(self, params: dict[str, Any],
                        spark_type=None) -> list[str]:
        return [
            f"required parameter {p['name']!r} of {self.name!r} is missing"
            for p in self.parameters
            if p.get("required") and params.get(p["name"]) is None
        ]

    def build(self, ctx: BuildContext) -> Column:
        return self._builder(ctx)


def _register(registry: TransformerRegistry, t: Transformer) -> Transformer:
    # re-registering a custom transformer replaces the previous definition
    # (the reference re-bootstraps custom transformers per run)
    registry._by_name[t.name] = t
    return t


def load_custom_transformers(
    configs: list[dict[str, Any]],
    registry: TransformerRegistry = DEFAULT_REGISTRY,
) -> list[Transformer]:
    """Bootstrap custom transformers from config (the
    ``custom_transformers`` YAML section): run the definition handshake
    and register each under its self-declared name."""
    out = []
    for cfg in configs:
        definition = discover_definition(
            cfg["executable"], tuple(cfg.get("args", ())),
            timeout=float(cfg.get("timeout", 10.0)),
        )
        if cfg.get("name") and cfg["name"] != definition.name:
            raise ValueError(
                f"custom transformer declares name {definition.name!r} but "
                f"config expects {cfg['name']!r}"
            )
        out.append(_register(
            registry,
            CustomCmdTransformer(definition, cfg["executable"],
                                 tuple(cfg.get("args", ()))),
        ))
    return out


def register_python_transformer(
    name: str,
    builder: Callable[[BuildContext], Column],
    parameters: list[dict[str, Any]] | None = None,
    registry: TransformerRegistry = DEFAULT_REGISTRY,
) -> Transformer:
    return _register(registry, PythonTransformer(name, builder, parameters))
