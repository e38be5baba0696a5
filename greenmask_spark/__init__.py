"""greenmask_spark — a PySpark-native data-anonymization & pipeline engine.

A from-scratch rebuild of the capabilities of GreenmaskIO/greenmask
(reference: /root/reference, Go) on top of the Spark DataFrame/SQL stack:

- config-driven per-table transformation plans (reference:
  internal/db/postgres/context/config_builder.go) compiled to Column
  expressions so Catalyst/Tungsten run the hot path JVM-side;
- the full transformer operator library (reference:
  internal/db/postgres/transformers/) as vectorized expressions, with
  pandas-UDF fallbacks only where semantics require row materialization;
- a deterministic hash engine (reference: internal/generators/) so equal
  inputs map to equal outputs across runs and tables;
- a subset engine computing referentially-intact slices via FK-graph
  analysis compiled to DataFrame joins (reference:
  internal/db/postgres/subset/);
- a validate mode diffing original vs transformed rows (reference:
  internal/db/postgres/cmd/validate.go);
- large-scale training-data operators: dedup (exact/MinHash-LSH/SimHash),
  similarity search, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"

from greenmask_spark.session import get_spark, load_tables  # noqa: F401
