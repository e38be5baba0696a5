"""Link-graph quality signals for crawl curation.

Common-Crawl-scale pipelines weight documents by host/domain graph
centrality (the crawl's own ranking data sets are PageRank/harmonic
centrality over the host web graph); this module computes weighted
PageRank relationally, with one twist that makes it verifiable at any
scale: **fixed-point integer arithmetic**.

Floating-point PageRank sums contributions in shuffle order, so two
runs (or two engines) disagree in the last ulps and the disagreement
compounds per iteration. Here ranks live as bigint nano-units
(RANK_SCALE = 1e9 per unit of probability mass) and every operation is
integer multiply / integer divide / integer sum — commutative and
associative EXACTLY, so any partitioning, any engine, any iteration
count produces bit-identical ranks, and a plain-SQL oracle can unroll
the loop and hash-match. The truncation the integer divides introduce
is bounded by a few nano-units per node per iteration —
~1e-9-scale, far below any ranking decision — and it is the SAME
truncation everywhere, which is the point.

Scale shape: one iteration = one groupBy(dst) over (dst, bigint)
contribution rows (map-side combined) + a left join back to the node
list; dangling mass redistributes via a 1-row broadcast aggregate.
Edges carry two longs and a weight — document bodies never enter the
graph tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: units of probability mass per 1.0 of rank (1e9: nano-units). Chosen
#: so the overflow contract below holds for web-scale graphs; see
#: ``pagerank``.
RANK_SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping_ppm: int = 850_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list → (node, rank_fp) where
    ``rank_fp`` is the fixed-point rank in RANK_SCALE units (divide by
    RANK_SCALE for the probability; Σ rank_fp ≈ N·RANK_SCALE up to
    integer truncation). ``damping_ppm`` is the damping factor in
    parts-per-million (850_000 = the classic 0.85) so it, too, stays
    integer-exact.

    Per iteration (the standard power step, integer-exact):
      contrib(e) = (rank[src] * w_e) DIV W_src          -- per edge
      dangling   = Σ rank[v] over out-degree-0 nodes    -- 1-row agg
      rank'[v]   = (1-d)·RANK_SCALE + d·(Σ contrib + dangling DIV N)

    Nodes = src ∪ dst of the edge list. Self-loops count like any
    edge; multi-edges pre-aggregate into weights. A fixed, explicit
    iteration count (default 5) instead of a convergence test keeps
    the operator a deterministic bounded plan — the oracle unrolls the
    same count.

    Every multiply-then-divide uses the overflow-safe split form
    ``(a div b)*m + ((a mod b)*m) div b`` (identical value, bounded
    intermediates). Remaining overflow contract, documented not
    checked: per-node total out-weight W and the damping modulus keep
    ``(a mod b)*m`` under 2^63 — W ≤ ~9e9 with nano-unit ranks; cap or
    normalize edge weights beyond that.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters={n_iters} must be >= 1")
    if not 0 < damping_ppm < 1_000_000:
        raise ValueError(f"damping_ppm={damping_ppm} outside (0, 1e6)")
    w = (F.col(weight_col).cast("bigint") if weight_col
         else F.lit(1).cast("bigint"))
    # setup frames all localCheckpoint (the per-iteration joins read
    # them; un-checkpointed, every iteration would re-run the raw edge
    # scan + aggregations behind them). e is EAGER: inside the ew job
    # its checkpoint feeds two SIBLING exchange stages (the e side and
    # the deg side, which re-reads e), and a lazy checkpoint is not a
    # compute barrier — the scheduler runs sibling map stages
    # concurrently and each would materialize the edge aggregation
    # itself ('Block rdd_N already exists' warnings). deg and nodes
    # stay lazy: each has a single first consumer (deg fills inside
    # ew's job, nodes inside its count), so they piggyback on jobs
    # that already run instead of paying dedicated setup jobs.
    e = (
        edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
            w.alias("w"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & (F.col("w") > 0))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(
        F.sum("w").alias("wtot")).localCheckpoint(eager=False)
    # edges annotated once with the source's total weight; iterations
    # only touch (src, dst, w, wtot) + the rank column. localCheckpoint
    # breaks the per-iteration lineage growth (the subset-fixpoint
    # convention) and frees with the result.
    ew = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    d, scale = int(damping_ppm), RANK_SCALE
    ppm = 1_000_000

    # the dangling flag (no out-edges) is a property of the GRAPH, not
    # of the iteration — computing it once here and carrying it as a
    # boolean through every checkpoint removes the per-iteration
    # rank ⟕ deg anti-join the old form paid (2 exchanges + 2 sorts
    # per iteration at any scale, guide §2.4); the per-iteration
    # dangling mass becomes a filtered 1-row aggregate over the
    # already-checkpointed rank partitions. EAGER because each
    # iteration reads rank from two sibling consumers (the contrib
    # join and the dangling aggregate).
    rank = (
        nodes.join(deg.select(F.col("src").alias("__s")),
                   F.col("node") == F.col("__s"), "left")
        .select("node", F.lit(scale).cast("bigint").alias("r"),
                F.col("__s").isNull().alias("dg"))
        .localCheckpoint(eager=True)
    )
    base = (ppm - d) * scale // ppm
    # checkpoint CADENCE: an eager localCheckpoint per iteration costs
    # one dedicated materialization job + full physical planning each
    # time. Every SECOND iteration (and the last) checkpoints; the
    # iteration in between persist()s instead — the block-manager
    # compute locks still guarantee each iteration computes once
    # (rank has three consumers: the contrib join, the dangling
    # aggregate's broadcast build, and the rank ⟕ contrib outer join),
    # lineage stays bounded at two iterations, and the persisted
    # intermediates unpersist as soon as the next checkpoint seals
    # them — nothing outlives the call. Halves the checkpoint jobs of
    # the loop at any scale (guide §5: localCheckpoint for lineage,
    # persist for reuse).
    pending: list[DataFrame] = []
    for it in range(n_iters):
        if it == 0:
            # iteration 1: every rank is the constant RANK_SCALE and
            # every ew.src is a node, so the ew ⋈ rank contribution
            # join keeps all edge rows with r = scale — fold it into a
            # pure projection over the checkpointed edges with r
            # inlined as a literal (guide §2.4: remove shuffles
            # outright — this deletes one edge-sized exchange + join
            # per call at any scale). Same split-form integer
            # arithmetic, so the value is bit-identical.
            contrib = (
                ew.select(
                    "dst",
                    F.expr(f"(cast({scale} as bigint) div wtot) * w "
                           f"+ ((cast({scale} as bigint) % wtot) * w) "
                           f"div wtot").alias("c"),
                )
                .groupBy("dst").agg(F.sum("c").alias("inflow"))
            )
        else:
            contrib = (
                ew.join(rank, ew["src"] == rank["node"])
                # (r div W)*w + ((r mod W)*w) div W ≡ (r*w) div W,
                # bounded
                .select(
                    "dst",
                    F.expr("(r div wtot) * w + ((r % wtot) * w) div wtot")
                    .alias("c"),
                )
                .groupBy("dst").agg(F.sum("c").alias("inflow"))
            )
        # dangling nodes spread their mass uniformly — a flag filter
        # over rank, not a join (the flag rides in the frame)
        dangling = rank.agg(
            F.coalesce(F.sum(F.when(F.col("dg"), F.col("r"))),
                       F.lit(0)).alias("dang")
        )
        rank = (
            rank.join(contrib, rank["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .withColumn(
                "x",
                F.coalesce(F.col("inflow"), F.lit(0))
                + F.expr(f"dang div {n_nodes}"),
            )
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(f"(x div {ppm}) * {d} "
                             f"+ ((x % {ppm}) * {d}) div {ppm}")
                ).alias("r"),
                "dg",
            )
        )
        if it == n_iters - 1 or it % 2 == 1:
            rank = rank.localCheckpoint(eager=True)
            for h in pending:
                h.unpersist(False)
            pending = []
        else:
            rank = rank.persist()
            pending.append(rank)
    for h in pending:  # unreachable for n_iters >= 1; belt and braces
        h.unpersist(False)
    return rank.select("node", F.col("r").alias("rank_fp"))


def hits(
    edges: DataFrame,
    n_iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted HITS hubs/authorities (Kleinberg 1999) over an edge
    list → (node, hub_fp, auth_fp) in RANK_SCALE fixed-point units —
    the link-analysis complement to ``pagerank`` for crawl curation:
    authorities are the pages good hubs point AT (seed-quality
    signal), hubs are the pages that point at good authorities
    (frontier-expansion signal).

    Same exactness contract as ``pagerank``: all integer arithmetic,
    so any partitioning, engine, or iteration order is bit-identical
    and a plain-SQL oracle unrolls the loop and hash-matches. The one
    place textbook HITS is float — per-iteration normalization — is
    replaced by a QUANTIZED-DIVISOR rescale: scores divide by
    ``q = max(1, max_raw DIV RANK_SCALE)``, pinning the max score to
    ~RANK_SCALE (relative quantization error ≤ 1/q per step, the SAME
    everywhere). Rankings are unaffected — integer division by a
    shared positive q is order-preserving.

    Per iteration: auth_raw[v] = Σ hub[u]·w over u→v (one map-side-
    combined groupBy(dst) of (dst, bigint) rows), rescale via a 1-row
    scalar max; then the mirrored groupBy(src) for hubs. Edges
    carry two longs + a weight; bodies never enter the graph tier.
    Overflow contract (documented, like ``pagerank``): rescaled scores
    reach up to ~2·RANK_SCALE−1 (q = max_raw DIV SCALE truncates, so
    the max-scoring node lands in [SCALE, 2·SCALE)), so per-node
    weighted in/out-degree must keep degree × 2·RANK_SCALE under
    2^63 — cap or pre-normalize edge weights beyond ~4.6e9.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters={n_iters} must be >= 1")
    w = (F.col(weight_col).cast("bigint") if weight_col
         else F.lit(1).cast("bigint"))
    e = (
        edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
            w.alias("w"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & (F.col("w") > 0))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
        # EAGER on purpose: e feeds SIBLING exchange stages inside each
        # iteration job, and a lazy checkpoint is not a compute
        # barrier — the scheduler launches sibling map stages
        # concurrently and each materializes the un-checkpointed
        # subtree itself (visible as 'Block rdd_N already exists'
        # warnings), so laziness here re-runs the edge scan+aggregation
        # once per sibling instead of skipping the setup job
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scale = RANK_SCALE
    raws: list[DataFrame] = []

    def _rescaled(raw: DataFrame, key: str, out: str) -> DataFrame:
        """raw scores divided by the quantized max divisor (a 1-row
        scalar agg). SPARSE: nodes with no raw score simply have no row
        — value-identical to carrying an explicit 0, because every
        consumer is a weighted SUM over an inner edge join (a missing
        row contributes exactly what a 0-score row would: nothing) and
        the final output re-attaches absent nodes with coalesce(.., 0).
        Dropping the old nodes ⟕ raw rescale join removes one
        node-set-sized exchange per HALF-iteration at any scale (guide
        §2.4: remove shuffles outright).

        ``raw`` is referenced twice — by the divisor aggregate AND the
        rescale projection. Un-persisted, the whole e ⋈ scores ⋈
        groupBy subtree behind it would execute twice per rescale
        (once inside the divisor job, once in the projection's
        job) — at any scale that is a full extra pass over the edge
        list per half-iteration. persist() (NOT a lazy
        localCheckpoint: the block-manager's per-partition compute
        locks make concurrent sibling stages wait for one computation
        instead of each running their own) materializes it exactly
        once; the handles unpersist after the loop's eager checkpoints
        are final."""
        raw = raw.persist()
        raws.append(raw)
        # the divisor is ONE bigint — fetch it like pagerank fetches
        # n_nodes (a scalar action, not driver data work) and inline
        # it as a literal: the rescale becomes a pure projection over
        # the cached raw partitions, with no broadcast exchange to
        # build or wait on (measured ~30% faster than the broadcast
        # form locally; one less exchange per half-iteration at any
        # scale)
        qv = raw.agg(
            F.greatest(
                F.lit(1).cast("bigint"),
                F.expr(f"coalesce(max(raw), 0) div {scale}"),
            ).alias("q")
        ).collect()[0]["q"]
        # the rescale stays LAZY: it has exactly one consumer (the
        # next half-iteration's edge join, or the final output join),
        # so a dedicated checkpoint job per half-iteration would only
        # re-write the node-sized frame the cache already holds — the
        # divisor collect above has already materialized raw, and the
        # consumer's plan truncates at the InMemoryRelation, so
        # lineage stays bounded without it (the loop's final hub/auth
        # ARE checkpointed below, before the caches release)
        return raw.select(
            F.col(key).alias("node"),
            F.expr(f"raw div {int(qv)}").alias(out),
        )

    hub = nodes.select(
        "node", F.lit(scale).cast("bigint").alias("h")
    )
    auth = None
    for it in range(n_iters):
        if it == 0:
            # iteration 1: every hub score is the constant RANK_SCALE
            # and every e.src is a node (nodes = src ∪ dst, distinct),
            # so the e ⋈ hub join keeps all edge rows with h = scale —
            # fold it into a pure projection with the score inlined
            # (guide §2.4); deletes one edge-sized exchange + the
            # node-sized hub exchange from the first half-iteration at
            # any scale. Same integer multiply, bit-identical.
            araw = (
                e.select(
                    "dst",
                    (F.lit(scale).cast("bigint") * F.col("w")).alias("c"),
                )
                .groupBy("dst").agg(F.sum("c").alias("raw"))
            )
        else:
            araw = (
                e.join(hub, e["src"] == hub["node"])
                .select("dst", (F.col("h") * F.col("w")).alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("raw"))
            )
        auth = _rescaled(araw, "dst", "a")
        hraw = (
            e.join(auth, e["dst"] == auth["node"])
            .select("src", (F.col("a") * F.col("w")).alias("c"))
            .groupBy("src").agg(F.sum("c").alias("raw"))
        )
        hub = _rescaled(hraw, "src", "h")
    # the loop's final hub/auth become eager checkpoints HERE (two
    # jobs total instead of one per half-iteration) so the returned
    # plan reads materialized RDDs; only then can the raw caches —
    # which the lazy rescale projections still reference — release
    # without the final join recomputing the whole loop
    hub = hub.localCheckpoint(eager=True)
    auth = auth.localCheckpoint(eager=True)
    for r in raws:
        r.unpersist(False)
    # absent nodes re-attach ONCE here (they scored 0 all along);
    # the sparse iterations never paid to carry them
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("h"), F.lit(0).cast("bigint")).alias("hub_fp"),
            F.coalesce(F.col("a"), F.lit(0).cast("bigint")).alias("auth_fp"),
        )
    )
