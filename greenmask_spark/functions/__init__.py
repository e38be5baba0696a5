"""Large-scale training-data pipeline operators (beyond reference parity):
dedup (exact/MinHash-LSH/SimHash/winnowing/connected-components/semantic),
similarity search (brute-force/LSH/IVF/PQ), text analysis, web hygiene,
link-graph centrality (PageRank/HITS), mergeable sketches (Bloom/
Count-Min/HLL/histogram), sampling/splitting/mixtures/packing/budget
selection, n-gram LM and classifier scoring, BPE tokenization, temporal
joins, quantization, skew tools, multimodal plumbing."""

from greenmask_spark.functions import (  # noqa: F401
    asof,
    bpe,
    classifier,
    dedup,
    linkgraph,
    lm,
    multimodal,
    quantize,
    sampling,
    similarity,
    sketches,
    skew,
    text_analysis,
    web,
)
