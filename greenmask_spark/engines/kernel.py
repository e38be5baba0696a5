"""Deterministic / random generation kernel.

The reference supports two transformation engines per transformer
(reference: internal/db/postgres/transformers/utils.go:19-28 and
internal/generators/):

- ``hash``   — SHA-3 of (input value + global salt), reduced to the byte
  budget the transformer needs, so equal inputs yield equal outputs across
  runs and tables (FK-consistent masking). Reference chain:
  internal/generators/utils.go:41-68 (hash-size choice),
  hash_reducer.go (XOR fold), hybrid.go:42-57 (PRNG extension).
- ``random`` — crypto-seeded PRNG, non-reproducible
  (internal/generators/random_bytes.go).

Spark-first re-expression: we match the *guarantee* (salted, deterministic,
collision-resistant, uniform), not the exact reference bytes. The hash
engine is a pure Column expression — ``sha2(concat(salt, value), 256)``
sliced into independent 60-bit integer "draws" — which keeps the hot path
inside whole-stage codegen with zero Python involvement. The random engine
is ``rand(seed)`` with the seed recorded by the caller (strictly more
reproducible than the reference's crypto-seeded PRNG).

Every primitive has a twin ``duck_*`` generator producing the equivalent
DuckDB SQL text, used by the correctness oracle so Spark and DuckDB stay
in lockstep by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 15 hex chars = 60 bits; < 2^63 so bigint arithmetic never overflows.
_SLICE_W = 15
_TWO60 = float(1 << 60)

GLOBAL_SALT_ENV = "GREENMASK_GLOBAL_SALT"


def global_salt() -> str:
    """Global salt (reference: internal/db/postgres/context/context.go:204-215)."""
    return os.environ.get(GLOBAL_SALT_ENV, "")


# ---------------------------------------------------------------------------
# Spark Column builders
# ---------------------------------------------------------------------------


def salted_hex(value: Column, salt: str = "") -> Column:
    """Lowercase sha256 hex of salt || string(value). NULL stays NULL."""
    return F.sha2(F.concat(F.lit(salt), value.cast("string")), 256)


def hash_slice_u60(hexcol: Column, draw: int = 0) -> Column:
    """The ``draw``-th independent 60-bit unsigned int from a sha256 hex.

    64 hex chars / 15 per slice → draws 0..3 are independent; draw ≥ 4
    re-hashes the hex (mirrors the reference's hybrid PRNG extension,
    internal/generators/hybrid.go:42-57, without byte parity).
    """
    if draw >= 4:
        hexcol = F.sha2(hexcol, 256)
        draw -= 4
    start = 1 + draw * _SLICE_W
    return F.conv(F.substring(hexcol, start, _SLICE_W), 16, 10).cast("bigint")


def uniform_int(
    value: Column, lo: Column, hi: Column, salt: str = "", draw: int = 0
) -> Column:
    """Deterministic uniform bigint in [lo, hi] keyed by ``value``."""
    h = hash_slice_u60(salted_hex(value, salt), draw)
    return lo + F.pmod(h, hi - lo + F.lit(1))


def uniform_double(value: Column, salt: str = "", draw: int = 0) -> Column:
    """Deterministic uniform double in [0, 1) keyed by ``value``."""
    return hash_slice_u60(salted_hex(value, salt), draw) / F.lit(_TWO60)


# ---------------------------------------------------------------------------
# DuckDB SQL twins (oracle side) — same formulas, dialect-translated
# ---------------------------------------------------------------------------


def duck_salted_hex(value_sql: str, salt: str = "") -> str:
    return f"sha256('{salt}' || CAST(({value_sql}) AS VARCHAR))"


def duck_slice_u60(hex_sql: str, draw: int = 0) -> str:
    if draw >= 4:
        hex_sql = f"sha256({hex_sql})"
        draw -= 4
    start = 1 + draw * _SLICE_W
    return f"CAST(('0x' || substr({hex_sql}, {start}, {_SLICE_W})) AS BIGINT)"


def duck_uniform_int(
    value_sql: str, lo_sql: str, hi_sql: str, salt: str = "", draw: int = 0
) -> str:
    h = duck_slice_u60(duck_salted_hex(value_sql, salt), draw)
    return f"(({lo_sql}) + ({h}) % (({hi_sql}) - ({lo_sql}) + 1))"


def duck_uniform_double(value_sql: str, salt: str = "", draw: int = 0) -> str:
    h = duck_slice_u60(duck_salted_hex(value_sql, salt), draw)
    return f"(CAST({h} AS DOUBLE) / {_TWO60!r})"


# ---------------------------------------------------------------------------
# Engine objects bound by the planner
# ---------------------------------------------------------------------------


class HashEngine:
    """Deterministic engine: draws are keyed by the input value + salt.

    Required by ``apply_for_references`` (FK-consistent masking, reference:
    internal/db/postgres/context/config_builder.go:337-356).
    """

    name = "hash"
    deterministic = True

    def __init__(self, salt: str | None = None):
        self.salt = global_salt() if salt is None else salt

    def u60(self, key: Column, draw: int = 0) -> Column:
        return hash_slice_u60(salted_hex(key, self.salt), draw)

    def uniform_int(self, key: Column, lo: Column, hi: Column, draw: int = 0) -> Column:
        return uniform_int(key, lo, hi, self.salt, draw)

    def uniform_double(self, key: Column, draw: int = 0) -> Column:
        return uniform_double(key, self.salt, draw)

    def hex(self, key: Column) -> Column:
        return salted_hex(key, self.salt)


class RandomEngine:
    """Non-deterministic engine: per-row draws from rand(seed).

    ``seed`` should be recorded in the run manifest so any run can be
    replayed — strictly better than the reference's crypto-seeded PRNG
    (internal/generators/random_bytes.go), which is unreproducible.
    """

    name = "random"
    deterministic = False

    def __init__(self, seed: int | None = None):
        self.seed = seed
        self._draws = 0

    def _rand(self) -> Column:
        self._draws += 1
        if self.seed is None:
            return F.rand()
        return F.rand(self.seed + self._draws)

    def u60(self, key: Column, draw: int = 0) -> Column:
        return F.floor(self._rand() * _TWO60).cast("bigint")

    def uniform_int(self, key: Column, lo: Column, hi: Column, draw: int = 0) -> Column:
        return lo + F.floor(self._rand() * (hi - lo + F.lit(1))).cast("bigint")

    def uniform_double(self, key: Column, draw: int = 0) -> Column:
        return self._rand()

    def hex(self, key: Column) -> Column:
        return F.sha2(self._rand().cast("string"), 256)


def make_engine(name: str, *, salt: str | None = None, seed: int | None = None):
    if name == "hash":
        return HashEngine(salt=salt)
    if name == "random":
        return RandomEngine(seed=seed)
    raise ValueError(f"unknown engine {name!r}; expected 'hash' or 'random'")
