"""Large-scale training-data pipeline operators (beyond reference parity):
dedup (exact/MinHash-LSH/SimHash/winnowing/connected-components/semantic),
similarity search (brute-force/LSH/IVF), text analysis, web hygiene,
sampling/splitting/mixtures/packing, temporal joins, quantization, skew
tools, multimodal plumbing."""

from greenmask_spark.functions import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    quantize,
    sampling,
    similarity,
    skew,
    text_analysis,
    web,
)
