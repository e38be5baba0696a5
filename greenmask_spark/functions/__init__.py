"""Large-scale training-data pipeline operators (beyond reference parity):
dedup, similarity search, text analysis, multimodal plumbing."""

from greenmask_spark.functions import dedup, similarity, text_analysis  # noqa: F401
