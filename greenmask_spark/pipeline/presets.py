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

__all__ = [
    "ccnet_config", "c4_config", "gopher_config", "fineweb_config",
    "PRESETS",
]


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


def c4_config(
    input_spec: dict[str, Any],
    output_path: str | None = None,
    *,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 3,
    min_sentences: int = 5,
    benchmark: dict[str, Any] | None = None,
    rows_per_shard: int = 100_000,
    seed: int = 42,
) -> dict[str, Any]:
    """The C4 cleaning pipeline (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", §2.2) as one config:

      input (C4 starts from extracted text; pass a WARC spec to add
      the extraction tier) → language ID + allowlist (the paper gates
      on langdetect en) → the C4 line/page rules (terminal
      punctuation, min words per line, javascript lines, lorem ipsum,
      curly braces, min sentences per page) → corpus-wide line dedup
      (the paper's three-sentence-span dedup, line-granular here) →
      optional benchmark decontamination (the paper drops pages
      sharing any 13-gram with eval sets) → shards.
    """
    steps: list[dict[str, Any]] = [
        {"op": "lang_id"},
        {"op": "quality_filter", "langs": list(langs)},
        {"op": "c4_filter", "min_words": int(min_words),
         "min_sentences": int(min_sentences)},
        {"op": "dedup_lines"},
    ]
    if benchmark is not None:
        steps.append({"op": "decontaminate", "benchmark": dict(benchmark),
                      "n": 13})
    cfg: dict[str, Any] = {"input": dict(input_spec), "steps": steps}
    if output_path is not None:
        cfg["output"] = {
            "path": output_path, "format": "shards",
            "rows_per_shard": int(rows_per_shard), "seed": int(seed),
        }
    return cfg


def gopher_config(
    input_spec: dict[str, Any],
    output_path: str | None = None,
    *,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.18,
    dedup_threshold: float = 0.8,
    rows_per_shard: int = 100_000,
    seed: int = 42,
) -> dict[str, Any]:
    """The MassiveWeb/Gopher data pipeline (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training
    Gopher", appendix A) as one config:

      input → the Gopher document-quality rule bundle (A1.1: word
      count/length/symbol-ratio/bullet/ellipsis/stopword rules, one
      scan-bandwidth filter) → repetition gates (A1.1 dup-line and
      top-bigram fractions; the paper's thresholds) → exact dedup →
      MinHash near-dup removal (A1.2) → shards.
    """
    steps: list[dict[str, Any]] = [
        {"op": "gopher_filter"},
        {"op": "repetition_filter",
         "max_dup_line_frac": float(max_dup_line_frac),
         "max_top_bigram_frac": float(max_top_bigram_frac)},
        {"op": "dedup_exact"},
        {"op": "fuzzy_dedup", "threshold": float(dedup_threshold)},
    ]
    cfg: dict[str, Any] = {"input": dict(input_spec), "steps": steps}
    if output_path is not None:
        cfg["output"] = {
            "path": output_path, "format": "shards",
            "rows_per_shard": int(rows_per_shard), "seed": int(seed),
        }
    return cfg


def fineweb_config(
    input_spec: dict[str, Any],
    output_path: str | None = None,
    *,
    langs: tuple[str, ...] = ("en",),
    blocklist: dict[str, Any] | list[str] | None = None,
    url_col: str = "url",
    min_words: int = 3,
    min_sentences: int = 5,
    dedup_threshold: float = 0.75,
    pii_kinds: tuple[str, ...] = ("email", "ipv4"),
    rows_per_shard: int = 100_000,
    seed: int = 42,
) -> dict[str, Any]:
    """The FineWeb pipeline (Penedo et al. 2024, "The FineWeb
    Datasets: Decanting the Web for the Finest Text Data at Scale",
    arXiv:2406.17557) as one config:

      WARC/raw input → URL normalization + domain blocklist (§3.1;
      only when ``blocklist`` is given — test-scale ``documents``
      inputs have no URL column) → text extraction (strip_html; the
      paper uses trafilatura) → language ID + allowlist (§3.1, the
      paper gates fastText en ≥ 0.65; this engine's n-gram heuristic
      twin) → the Gopher quality + repetition rule bundles (§3.2
      adopts both) → the C4 rules WITHOUT the terminal-punctuation
      line gate (§3.2: FineWeb keeps the other C4 filters but found
      that one too aggressive) → per-snapshot MinHash near-dedup
      (§3.3; threshold ~0.75 ≈ the paper's 5-gram 112-hash banding
      operating point) → PII anonymization (§3.5: email + IP) →
      deterministically-shuffled shards.

    ``blocklist`` is an inline domain list or a {table/path} input
    spec (resolved through pipeline context, same as the blocklist
    step). Every stage is the scale-shaped operator: URL rules and
    the quality bundles are scan-bandwidth expressions, fuzzy dedup
    moves band keys (bodies never shuffle), PII scrubbing is a
    regexp rewrite on the scan."""
    steps: list[dict[str, Any]] = []
    if blocklist is not None:
        steps.append({"op": "normalize_urls", "url_col": url_col,
                      "domain_col": "__domain"})
        bl: dict[str, Any] = (
            {"domains": list(blocklist)} if isinstance(blocklist, list)
            else {"source": dict(blocklist)}
        )
        steps.append({"op": "blocklist", "url_col": url_col,
                      "domain_col": "__domain", **bl})
    steps += [
        {"op": "strip_html"},
        {"op": "lang_id"},
        {"op": "quality_filter", "langs": list(langs)},
        {"op": "gopher_filter"},
        {"op": "repetition_filter"},
        {"op": "c4_filter", "min_words": int(min_words),
         "min_sentences": int(min_sentences),
         "require_terminal_punct": False},
        {"op": "fuzzy_dedup", "threshold": float(dedup_threshold)},
        {"op": "scrub_pii", "kinds": list(pii_kinds)},
    ]
    cfg: dict[str, Any] = {"input": dict(input_spec), "steps": steps}
    if output_path is not None:
        cfg["output"] = {
            "path": output_path, "format": "shards",
            "rows_per_shard": int(rows_per_shard), "seed": int(seed),
        }
    return cfg


#: preset name → config builder (CLI: ``corpus --preset <name>``)
PRESETS = {
    "ccnet": ccnet_config,
    "c4": c4_config,
    "gopher": gopher_config,
    "fineweb": fineweb_config,
}
