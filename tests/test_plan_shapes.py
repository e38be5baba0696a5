"""Structural perf guards: key queries must keep their plan SHAPE.

A correctness suite can stay green while a refactor quietly turns a
scan+project into a shuffle or drops a Python boundary into the hot
path; these assertions pin the executed-plan node counts that
matter at 100 TB (see PLANS.md for the full audit)."""

import pytest

import __spark_entry__ as entrymod  # conftest puts the repo root on sys.path
from greenmask_spark.plan.health import plan_health  # noqa: E402


def _query_fn(name):
    """Registry rows by name; guards for operators whose registry rows
    were consolidated into family rows (r10: ann_topk_lsh/ann_topk_ivf
    → ann_variants, dedup_against[_fuzzy] → dedup_against_levels) and
    for bench-only rows (unigram_encode) keep their ORIGINAL per-variant
    budgets by resolving to the still-defined q_* function directly.
    tests/test_registry_contract.py pins this resolvability."""
    return entrymod.queries().get(name) or getattr(entrymod, "q_" + name)


def _health(spark, sf_dir, name):
    df = _query_fn(name)(spark, sf_dir)
    df.count()  # finalize AQE
    return plan_health(df)


#: name → (max_shuffles, max_python_boundaries)
SHAPES = {
    # masking chains: pure scan+project, NEVER a shuffle or Python node
    "mask_customer": (0, 0),
    "t_orders_temporal": (0, 0),
    "t_faker": (0, 0),
    "train_split": (0, 0),
    "scrub_pii": (0, 0),
    # aggregation anchors: partial+final agg pairs only
    "q1_pricing_summary": (2, 0),
    "dedup_exact": (1, 0),
    # explode+agg signatures: the parallelizing repartition + the agg
    # exchange (AQE may fuse them at larger sf)
    "minhash_sigs": (2, 0),
    "simhash": (2, 0),
    # ANN: one top-k exchange; IVF's single Python node is the
    # centroid-assignment mapInPandas (licensed)
    "ann_topk": (1, 0),
    "ann_topk_ivf": (1, 1),
    # LSH: the two Python nodes are the query/corpus Arrow-batch bucket
    # taggers (licensed — replacing the 8-plane interpreted HOF fold)
    "ann_topk_lsh": (1, 2),
    # event-time daily rollup: one partial+final agg exchange
    "events_daily": (1, 0),
    # subset semi-join chain: dims broadcast, fact never shuffles
    "subset_lineitem": (0, 0),
    # star join: worst case 4 exchanges at tiny sf (AQE broadcasts the
    # dims as sf grows); never Python
    "q5_region_revenue": (4, 0),
    # text profile: winnow window + stats assembly — 3 integer-payload
    # shuffles is the audited shape (PLANS.md); a 4th means a regression
    "text_profile": (3, 0),
    # r6 — HTML stripping: a chained regexp_replace projection; any
    # shuffle or Python node is a regression
    "strip_html": (0, 0),
    # r6 — Stupid-Backoff LM scoring (n=2): the computed model is
    # persisted before its 2n-lookup fan-out (reuse="auto"), so the
    # audited shape is the ONE single-pass train fill (all orders from
    # one corpus scan) + the scoring per-doc agg + id-restore, with
    # cache reads feeding the lookups; all model joins broadcast at
    # test sf (AQE flips them to shuffle joins as the model outgrows
    # the threshold — design, not regression, and impossible at the
    # pinned sf). 6 shuffles / 6 scans here means the per-lookup model
    # recompute crept back. No Python, no HOF (gram windows are
    # codegen'd element_at/concat_ws + array_join(slice))
    "lm_score": (5, 0),
    # r6 — incremental exact dedup vs a prepared reference: the
    # reference digest distinct is the single exchange; the anti-join
    # broadcasts at test sf
    "dedup_against": (1, 0),
    # r6 — band-only fuzzy dedup vs a prepared reference: new-side sig
    # agg (repartition + groupBy), the band-key join, candidate
    # distinct, and the anti-join
    "dedup_against_fuzzy": (5, 0),
    # r6 — linear quality scoring: token-explode agg pair + id-restore;
    # the weights table stays a broadcast
    "linear_text_score": (3, 0),
    # r6 — as-of join: union + ONE keyed window pass (the second
    # exchange is the window partitionBy after the union); a range
    # cross-join or Python lookup here would explode these counts
    "asof_join": (2, 0),
    # r6 — bucketized range join: intervals broadcast at test sf, the
    # residual filter rides the join — at most the points-side exchange
    "range_join": (1, 0),
    # r6 — URL canonicalization: pure regexp chain, scan bandwidth
    "normalize_urls": (0, 0),
    # r6 — mixture building: hash-gated scan+project per source, union
    "sample_mixture": (0, 0),
    # r6 — event-time tumbling windows: one partial+final agg exchange,
    # exactly like events_daily
    "events_windowed": (1, 0),
    # r6 — skew-safe two-stage agg: the salted partial + the final
    # combine are the two exchanges; a third means the salting collapsed
    "salted_agg": (2, 0),
    # r7 — NB classifier training: the (doc,label,term) distinct and
    # the per-term agg are the two exchanges (the vocab cut is a
    # TakeOrdered, not a sort exchange); document bodies never shuffle
    "classifier_weights": (2, 0),
    # r7 — per-stratum hash sampling: pure scan+filter, sampleBy
    # without the RNG — any exchange is a regression
    "stratified_sample": (0, 0),
    # r7 — shard-writer contract probe: per-file count agg + the final
    # one-row combine over the read-back (the write itself happens at
    # plan-build time)
    "shard_write": (2, 0),
    # r7 — ExactSubstr detection: the persisted window stream's
    # parallelizing repartition + its repeat-count agg, the candidate
    # semi-join, the text re-extraction join and the verify re-group —
    # five exchanges whose rows are (id, pos, h) slivers; detection
    # never runs Python (the surgery UDF lives in
    # remove_repeated_spans, not this query)
    "repeated_spans": (5, 0),
    # r7 — BM25: query terms/dfreq/corpus-stats broadcast; the tf agg,
    # per-term df agg, per-doc sum and the zero-restore id join are
    # the exchanges, all carrying (id, score)-class slivers
    "bm25": (6, 0),
    # r8 — sparse top-k path: include_misses=False drops the
    # full-corpus zero-restore join (one fewer exchange than bm25);
    # the ordered limit is TakeOrderedAndProject, not a global sort
    "bm25_topk": (5, 0),
    # r8 — columns_type_override + RandomInt: casts fuse into the
    # transformer projection, zero exchanges
    "t_type_override": (0, 0),
    # r8 — two-phase domain quota: per-domain count agg + the window
    # exchange for over-quota rows only (the broadcast marker join and
    # the pass-through branch add none)
    "cap_per_domain": (3, 0),
    # r8 — PQ-ADC: encode scan + the broadcast-queries scorer are the
    # two licensed Python (Arrow) stages; exchanges are the final
    # per-query rank only (+AQE coalesce headroom)
    "ann_topk_pq": (2, 2),
    # r8 — DSIR: two bucket-count aggs (raw + target gram streams),
    # the per-doc ordered-fold agg, and the zero-restore ids join;
    # the log-ratio table rides a broadcast, grams shuffle as ints
    "dsir_weights": (6, 0),
    # r8 — Morton keys: one codegen'd projection, zero exchanges
    "zorder_events": (0, 0),
    # r9 — Gopher rules: ONE scan of pure expressions; any shuffle or
    # Python node is a regression (this is the scan-bandwidth filter
    # floor every crawl pipeline pays)
    "gopher_filter": (0, 0),
    # r9 — fixed-point PageRank: per-iteration exchanges are sealed
    # behind eager localCheckpoints (the subset-fixpoint convention),
    # so the RESULT plan is a checkpoint scan — a shuffle or Python
    # node appearing here means an iteration leaked its lineage
    "pagerank": (0, 0),
    # r9 — IVF-PQ composition: the three licensed Arrow stages are
    # centroid tagging, PQ encoding and the ADC scorer; the lone
    # exchange is the final per-query rank
    "ivf_pq_topk": (1, 3),
    # r9 — persisted-index BM25 (2 prompts): postings materialize once
    # (r14: share_subtree persist in the registry row — the
    # bm25_save_index production shape) and never re-shuffle. r14
    # accounting change: the persist keeps the index-build subtree
    # VISIBLE to this audit (the old eager localCheckpoint truncated
    # it to an ExistingRDD, hiding its one postings groupBy exchange
    # that still ran in the checkpoint job), so the audited count is
    # now the TRUE end-to-end 8: the 7 sliver exchanges of r9 (stats
    # distinct + 1-row agg, per-term df, the tiny query-term
    # distincts, the final per-(query,doc) sum) + the index build's
    # postings aggregation. Executed shuffles unchanged.
    "bm25_indexed": (8, 0),
    # r9 — perceptual/acoustic fingerprints: decode+hash is ONE
    # Arrow-batch mapInPandas over a scan — zero exchanges; a shuffle
    # here means pixels/samples started moving between stages
    "image_dhash": (0, 1),
    "audio_fingerprint": (0, 1),
    # r9 — Hamming near-dup: the (id, hash) frame pins before the
    # self-join so decode runs ONCE, not once per side. r14 accounting
    # change: the pin is now a share_subtree persist (no dedicated
    # checkpoint job), which keeps the decode mapInPandas VISIBLE to
    # this audit inside the cached subtree — the budget admits that
    # ONE Python node (it executes once; the other join side is an
    # InMemoryTableScan, counted under cache_reads). A SECOND Python
    # node would mean the pin was dropped and decode runs per side.
    "image_near_dup": (3, 1),
    # r9 — link graph: the page→links explode stays shuffle-free; the
    # id join (AQE-broadcast at test sf) + the host-pair agg are the
    # only exchanges; never Python
    "host_graph": (3, 0),
    # r9 — robots.txt enforcement: the two per-domain parse windows
    # (KB-sized robots frames), the domain rule join and the verdict
    # re-join on row id; never Python
    "robots_filter": (5, 0),
    # r11 — consolidated split family: train_split contributes zero
    # exchanges (pure scan+project); the 4 are cluster_split's audited
    # CC-fixpoint shape (PLANS.md: split_levels = exact sum of its
    # members)
    "split_levels": (4, 0),
    # r11/r12 — CC-Net ppl buckets (method=rank over the lm_score ppl
    # pipeline). r12 two-phase shape: the (id, lang, ppl) sliver is
    # eagerly checkpointed (sealing its upstream lineage), so the
    # result plan is lm_score's 4 audited exchanges on the rejoin side
    # + the (lang, bucket)-partitioned rank window + the label rejoin
    # + the lang join; never Python. The per-language single-task
    # window funnel is gone — test_ppl_bucket_rank_no_group_funnel
    # pins the window's partition keys
    "ppl_bucket": (7, 0),
    # r11 — unigram-LM Viterbi encode: ONE Arrow-batch pandas UDF over
    # a scan, the ≤ vocab_size piece dict in the task closure — zero
    # exchanges (training happens once per sf_dir at plan-build time,
    # outside the returned plan); a shuffle here means the model stopped
    # being a broadcast-free closure
    "unigram_encode": (0, 1),
    # r11 — windowed HLL distinct: the two map-side-combined exchanges
    # are (window, register) partial-max + the per-window register
    # fold; rows crossing each are ≤ 2^p per window regardless of
    # event volume
    "windowed_distinct": (2, 0),
    # r11 (late) — integer-exact k-means assignment: scan + ONE
    # Arrow-batch stage with the k*dim centroid matrix in the
    # closure, zero exchanges (training runs at plan-build time); a
    # shuffle here means assignment stopped being closure-driven
    "kmeans_clusters": (0, 1),
    # r12 — semantic benchmark decontamination: benchmark matrix in
    # the closure (collected at plan-build time), scan + ONE Arrow
    # stage + filter, zero exchanges; a shuffle here means the
    # benchmark stopped being a closure
    "semantic_decontaminate": (0, 1),
    # r13 — per-document n-gram novelty (the staged r14 row): four
    # map-side-combined exchanges carrying (bigint, bigint) gram-hash
    # slivers (per-doc distinct, per-doc count, gram min-owner,
    # owner count) + broadcast rejoins of the two #docs-row
    # aggregates; never Python, bodies never shuffle
    "ngram_novelty": (4, 0),
    # r13 — the staged r14 minhash+simhash fold: the union of the two
    # original rows' plans (2 explode-agg exchanges each); never
    # Python
    "fingerprints": (4, 0),
    # r13 — fixed context-window chunking (the staged r15 debut row):
    # ZERO exchanges — one scan, codegen'd split/sequence/explode/
    # slice; a shuffle here means chunking stopped being inline
    "chunk_documents": (0, 0),
    # r13 — the staged r15 bm25 + bm25_indexed fold: the union of the
    # two original rows' plans (6 + 7 exchange budgets); never Python
    "bm25_variants": (13, 0),
    # r13 — char-distribution quality signals (the staged r16 debut
    # row): (id, char) sliver count agg + the per-doc histogram agg +
    # the id rejoin; never Python, bodies never shuffle, the entropy
    # fold runs per DISTINCT char
    "entropy_profile": (3, 0),
    # r13 — the staged r16 ann_variants + ann_topk_pq fold: the union
    # of the four legs' plans (brute/lsh/ivf Arrow stages + the PQ
    # encode/ADC pair; exchanges are the per-query ranks)
    "ann_methods": (4, 5),
    # r13 — the staged r17 pagerank + hits fold: both legs' iteration
    # lineage is sealed behind eager localCheckpoints; what remains is
    # hits' final quantized-rescale joins — never Python
    "linkrank_scores": (4, 0),
    # r13 — WebDataset tar roundtrip (the staged r17 debut row): the
    # RESULT plan is the read side — binaryFile scan + ONE Arrow
    # tarfile parse stage, zero exchanges (the write's single shard
    # repartition runs eagerly inside the row)
    "webdataset_roundtrip": (0, 1),
    # r13 — Unicode-script composition (the staged r18 debut row):
    # ONE scan of pure codegen'd regexp length-drop expressions —
    # the gopher_filter cost floor; a shuffle or Python node here is
    # a regression
    "script_profile": (0, 0),
    # r13 — the staged r18 embedding_near_dup + ngram_jaccard fold:
    # the union of the two original rows' plans (the tiled-BLAS Arrow
    # pair stage + the shingle explode/agg + verify-join exchanges,
    # all sliver-sized)
    "near_pair_scores": (9, 1),
    # r13 — the staged r19 image_dhash + audio_fingerprint fold: the
    # union of the two original rows' plans (one Arrow decode+hash
    # stage each, zero shuffles)
    "media_fingerprints": (0, 2),
    # r13 — the staged r19 SFT conversation assembly: the window
    # pre-filter and the collect_list gather share ONE exchange on
    # the conversation key; zero Python (pure JVM expressions)
    "assemble_conversations": (1, 0),
    # r13 — the staged r20 t_random_float + t_random_numeric melt:
    # two scan-only transformer legs, stack() stays codegen'd
    "t_numeric_draws": (0, 0),
    # r13 — the staged r20 per-domain quality rollup: ONE map-side-
    # combined shuffle of (domain, count, decimal-sum) slivers
    "domain_profile": (1, 0),
}


@pytest.mark.parametrize("name", sorted(SHAPES))
def test_plan_shape(spark, sf_dir, name):
    max_shuffles, max_python = SHAPES[name]
    h = _health(spark, sf_dir, name)
    assert h["shuffles"] <= max_shuffles, h
    assert h["python"] <= max_python, h


def test_masking_plans_are_single_codegen_span(spark, sf_dir):
    h = _health(spark, sf_dir, "mask_customer")
    assert h["codegen"] >= 1 and h["scans"] == 1


def test_lsh_corpus_tagging_not_interpreted_hof(spark, sf_dir):
    """Regression guard for the r4 scale liability: LSH bucket tagging
    must run in the Arrow-batch kernel, not as per-row interpreted
    aggregate(zip_with(...)) folds. Only the per-pair _staged_cosine dot
    (post bucket join, bounded by collisions) may remain an aggregate
    HOF — before the fix the plan carried 8 folds per tagging side."""
    df = _query_fn("ann_topk_lsh")(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("aggregate(") <= 2, plan.count("aggregate(")


def test_lm_score_no_interpreted_hofs(spark, sf_dir):
    """The LM gram windows must stay codegen'd (element_at + concat_ws
    over an exploded position sequence) — transform()/aggregate()/
    zip_with() in the executed plan would mean the interpreted-HOF
    formulation crept back into a per-token hot path."""
    df = entrymod.queries()["lm_score"](spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for hof in ("transform(", "aggregate(", "zip_with("):
        assert hof not in plan, hof
