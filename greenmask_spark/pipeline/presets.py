"""Named corpus-pipeline presets: published crawl→corpus recipes as
one-call config builders for ``run_corpus_pipeline`` (and the
``corpus --preset`` CLI verb).

The reference engine has no corpus tier (its surface ends at
dump/restore); presets package the §2.10 extension steps into the
canonical end-to-end artifacts a training-data pipeline actually
ships. Every preset returns a PLAIN config dict — the same shape a
hand-written YAML/JSON config loads to — so users can start from a
preset and override any step parameter before running.
"""

from __future__ import annotations

from typing import Any

__all__ = ["ccnet_config", "PRESETS"]


def ccnet_config(
    input_spec: dict[str, Any],
    reference: dict[str, Any],
    output_path: str | None = None,
    *,
    langs: tuple[str, ...] = ("en",),
    keep_buckets: tuple[str, ...] = ("head", "middle"),
    lm_n: int = 2,
    dedup_threshold: float = 0.8,
    token_budget: int | None = None,
    rows_per_shard: int = 100_000,
    seed: int = 42,
) -> dict[str, Any]:
    """The CC-Net pipeline (Wenzek et al. 2020, "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data",
    arXiv:1911.00359) as one config:

      WARC/raw input → strip_html → per-paragraph exact dedup (§3.1)
      → language ID (§3.2) → LM perplexity against a trusted
      reference + head/middle/tail buckets per language (§3.3, keep
      head+middle by default) → near-dup removal (fuzzy MinHash-LSH)
      → optional token-budget cut (score = -ppl, best-first)
      → deterministically-shuffled training shards.

    ``input_spec`` is any ``run_corpus_pipeline`` input (``{"path":
    ".../*.warc.gz", "format": "warc"}`` for the real Common Crawl
    path, or ``{"table": "documents"}`` at test scale).
    ``reference`` is the trusted-corpus input spec the Stupid-Backoff
    LM trains on (CC-Net uses Wikipedia) — self-training is refused
    upstream as an outlier-detection footgun (see _step_lm_score).

    Every stage is the scale-shaped operator: paragraph dedup moves
    digests, lang-ID is scan-bandwidth expressions, the LM model is a
    DataFrame whose lookups broadcast below AQE's threshold, the
    bucket cuts are a ≤ #langs-row broadcast, fuzzy dedup moves band
    keys, and the budget cut sorts only the threshold bucket.
    """
    steps: list[dict[str, Any]] = [
        {"op": "strip_html"},
        {"op": "dedup_lines"},
        {"op": "lang_id"},
        {"op": "quality_filter", "langs": list(langs)},
        {"op": "lm_score", "reference": reference, "n": int(lm_n)},
        {"op": "ppl_bucket", "group_col": "lang",
         "keep": list(keep_buckets)},
        {"op": "fuzzy_dedup", "threshold": float(dedup_threshold)},
    ]
    if token_budget is not None:
        steps.append({
            "op": "select_to_budget",
            "token_budget": int(token_budget),
            "score_expr": "-ppl",
        })
    cfg: dict[str, Any] = {"input": dict(input_spec), "steps": steps}
    if output_path is not None:
        cfg["output"] = {
            "path": output_path,
            "format": "shards",
            "rows_per_shard": int(rows_per_shard),
            "seed": int(seed),
        }
    return cfg


#: preset name → config builder (CLI: ``corpus --preset ccnet``)
PRESETS = {
    "ccnet": ccnet_config,
}
