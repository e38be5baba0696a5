"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: baseline; broadcast the (small) query set and
  scan the corpus once — no shuffle beyond the top-k aggregation.
- LSH-bucketed (random hyperplane) variant: the 100 TB path — corpus and
  queries hash to sign-bit buckets; only bucket collisions are scored.
  Hyperplanes are generated from a fixed seed on the driver and inlined as
  literal arrays (a few KB in the plan, like a broadcast).

Dot products use F.aggregate/F.zip_with (JVM-side, no Python).

Cross-engine float determinism (the oracle contract): every floating-point
reduction that feeds a discrete decision (LSH sign bit, IVF argmin/probe
order, top-k rank) accumulates as a SEQUENTIAL left fold in element order —
Spark's ``aggregate`` expression, numpy folds written dimension-by-dimension,
and DuckDB's ``list_sum`` all produce bit-identical IEEE-754 results under
that order, so a value landing exactly on a rounding/sign/argmin boundary
cannot diverge between engines. Reordering any of these reductions (e.g.
``ndarray.sum``'s pairwise summation, tree-reduce) voids that guarantee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lit_vec(vals) -> Column:
    """Literal double array built from ONE parsed SQL string.

    ``F.array(*[F.lit(x) ...])`` issues a py4j round trip per element —
    a 16x64 centroid table costs ~2s of DRIVER time at plan build
    (measured). One ``F.expr`` call parses the whole array; the ``D``
    suffix forces DOUBLE (bare ``1.5`` parses as DECIMAL), and repr()
    round-trips IEEE-754 exactly, so values are bit-identical to the
    per-element form."""
    return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(a: str, b: str) -> str:
    """Parsed-SQL twin of ``dot`` over column NAMES — ONE py4j parse
    instead of the dozens of Column-API round trips the lambda form
    issues at plan-build time (the _lit_vec/_probe_expr precedent;
    cProfile put ~2 s of q_ann_variants' build inside dot/norm
    construction). Parses to the IDENTICAL zip_with/aggregate Catalyst
    expressions with the same fold order and the same 0.0 double seed —
    bit-identical values by construction."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"cast(x as double) * cast(y as double)), 0.0D, "
            f"(acc, v) -> acc + v)")


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pd(a: Column, b: Column) -> Column:
    """Arrow-batched cosine — value-identical to ``cosine`` but vectorized.

    The HOF expression form runs INTERPRETED (~dim lambda evaluations per
    pair); this pandas UDF computes the whole Arrow batch with numpy while
    keeping the SAME sequential dimension-order fold, so every IEEE-754
    intermediate — dot, both norms, the quotient — is bit-identical to the
    expression form and to the DuckDB oracle's list_sum (see module
    docstring on why the fold order is load-bearing). Use this on pair
    streams (the hot path); the expression form stays for contexts where
    a Python boundary is unwanted."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if not len(sa):
            return pd.Series([], dtype="float64")
        # NULL or length-mismatched vectors yield NULL, exactly like the
        # expression form (zip_with NULL-pads the shorter side, which
        # turns the whole fold NULL) instead of crashing the task on a
        # ragged matrix; valid rows batch by their common dimension
        out = np.full(len(sa), np.nan)
        pair_len = [
            None if va is None or vb is None or len(va) != len(vb)
            else len(va)
            for va, vb in zip(sa, sb)
        ]
        for plen in set(p for p in pair_len if p is not None):
            idx = [i for i, p in enumerate(pair_len) if p == plen]
            ma = np.array([np.asarray(sa.iloc[i], dtype=np.float64)
                           for i in idx])
            mb = np.array([np.asarray(sb.iloc[i], dtype=np.float64)
                           for i in idx])
            d = np.zeros(len(idx))
            na = np.zeros(len(idx))
            nb = np.zeros(len(idx))
            for j in range(plen):  # sequential fold in dimension order
                x, y = ma[:, j], mb[:, j]
                d = d + x * y
                na = na + x * x
                nb = nb + y * y
            out[idx] = d / (np.sqrt(na) * np.sqrt(nb))
        res = pd.Series(out)
        return res.where([p is not None for p in pair_len], None)

    return _cos(a, b)


def _staged_cosine() -> Column:
    """The one load-bearing scoring expression every top-k path shares:
    staged-norm dot fold rounded to 4 decimals. Fold order and rounding
    live in ONE place — the oracle contract and rerank_topk's
    exact-input identity depend on every path producing bit-identical
    scores."""
    return F.expr(
        f"round({_dot_sql('qvec', 'cvec')} / (qnorm * cnorm), 4)"
    ).alias("cos_sim")


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k tail: rank per query by (score desc, neighbor asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus neighbors per query vector (exact, brute force).

    ``queries`` is expected to be small → broadcast join (verified in the
    plan: BroadcastNestedLoopJoin/BroadcastHashJoin, corpus never shuffles
    its vectors)."""
    # norms are staged ONCE per row on each side; the per-pair work is the
    # single dot fold. cosine() inline would re-evaluate both norm folds
    # for every (query, neighbor) pair — 3x the interpreted-expression
    # cost measured at sf0.1. qnorm*cnorm preserves cosine()'s exact
    # norm(a)*norm(b) multiplication order (bit-identical, oracle-checked).
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("qnorm", F.expr(_norm_sql("qvec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("cnorm", F.expr(_norm_sql("cvec")))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        _staged_cosine(),
    )
    return _rank_topk(scored, k)


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    group_col: str | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — exact, fully
    distributed via matrix-product tiling.

    Plan shape (no driver materialization — the r1 version collected the
    whole corpus with ``toPandas()``, which OOMs the driver long before
    scale): rows hash into ``n_blocks`` blocks; the n×n similarity matrix
    is tiled into block-pairs (p ≤ q); each row is replicated to the
    tiles it participates in (≈ n_blocks× replication, the standard
    distributed-matmul tradeoff) and one ``applyInPandas`` task per tile
    runs a BLAS block product. Every unordered pair lands in exactly one
    tile, so results match the all-pairs oracle exactly.

    Per-pair JVM expressions (zip_with + aggregate) would run the 64-dim
    dot as ~64 interpreted lambda calls; the BLAS matmul is ~100× faster.
    At 100 TB, exact all-pairs is O(n²) by definition — raise n_blocks so
    tiles fit executor memory, or use the LSH path (``cosine_topk_lsh``)
    when approximate recall is acceptable.

    Rounding policy: results round to 4 decimals before thresholding,
    matching the oracle.

    ``group_col`` restricts pairs to rows sharing that column (the
    SemDeDup within-cluster case): tiles key on (group, p, q), so a
    skewed group still splits across n_blocks² tasks.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    keep_cols = [F.col(group_col).alias("g")] if group_col else []
    src = df.select(
        *keep_cols, F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    blk = src.withColumn("b", F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
    tile_ids = F.array(*[F.lit(i) for i in range(n_blocks)])
    # row in block b participates in tile (p,q), p<=q: as side 0 when p=b,
    # side 1 when q=b; diagonal tiles keep side 0 only (self-pairs handled
    # in-tile).
    g_cols = ["g"] if group_col else []
    left = (
        blk.withColumn("q", F.explode(tile_ids))
        .filter(F.col("q") >= F.col("b"))
        .select(*g_cols, F.col("b").alias("p"), "q",
                F.lit(0).alias("side"), "id", "vec")
    )
    right = (
        blk.withColumn("p", F.explode(tile_ids))
        .filter(F.col("p") < F.col("b"))
        .select(*g_cols, "p", F.col("b").alias("q"),
                F.lit(1).alias("side"), "id", "vec")
    )
    tiles = left.unionByName(right)

    schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def run_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        p, q = key[-2], key[-1]  # key may be (g, p, q) under group_col
        a = pdf[pdf["side"] == 0]
        ids_a = a["id"].to_numpy()
        mat_a = np.array([np.asarray(v, dtype=np.float64) for v in a["vec"]])
        if p == q:
            ids_b, mat_b = ids_a, mat_a
        else:
            b = pdf[pdf["side"] == 1]
            ids_b = b["id"].to_numpy()
            mat_b = np.array([np.asarray(v, dtype=np.float64) for v in b["vec"]])
        if not len(ids_a) or not len(ids_b):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
            )
        na = np.sqrt((mat_a * mat_a).sum(axis=1))
        nb = np.sqrt((mat_b * mat_b).sum(axis=1))
        sims = np.round((mat_a @ mat_b.T) / (na[:, None] * nb[None, :]), 4)
        ii, jj = np.nonzero(sims >= threshold)
        if p == q:
            # diagonal tile scores both (i,j) and (j,i): keep one orientation
            keep = ids_a[ii] < ids_b[jj]
        else:
            # off-diagonal: each unordered pair appears exactly once
            keep = np.ones(len(ii), dtype=bool)
        lo, hi = ids_a[ii][keep], ids_b[jj][keep]
        return pd.DataFrame({
            "id_a": np.minimum(lo, hi),
            "id_b": np.maximum(lo, hi),
            "cos_sim": sims[ii, jj][keep],
        })

    return tiles.groupBy(*g_cols, "p", "q").applyInPandas(run_tile, schema=schema)


def _probe_expr(vec_col: str, cents, n_probe: int):
    """n_probe nearest-centroid ids as one SQL expression (see ivf_topk)."""
    terms = []
    for i, cv in enumerate(cents):
        arr = "array(" + ",".join(f"{float(v)!r}D" for v in cv) + ")"
        d = (f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> "
             f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
             f"0.0D, (acc, v) -> acc + v)")
        terms.append(f"named_struct('d', {d}, 'i', {i})")
    return F.expr(
        f"transform(slice(array_sort(array({','.join(terms)})), 1, "
        f"{int(n_probe)}), s -> s.i)"
    )


def _sqdiff(a: Column, b: Column) -> Column:
    # explicit product, not **2: pow(x, 2.0) is not guaranteed bit-equal to
    # x*x across engines, and the DuckDB oracle computes (x1-x2)*(x1-x2)
    d = a.cast("double") - b
    return d * d


def _assign_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_col: str = "cid",
    norm_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment (argmin squared-L2) per Arrow batch.

    This is the corpus-tagging stage of IVF — the dominant cost of
    ``ivf_topk`` at scale — so it must NOT be an interpreted per-row
    expression fold (the r3 form evaluated n_centroids × dim interpreted
    lambda ops per corpus row, ~300× slower than codegen by the builder's
    measurements). Here each Arrow batch computes all distances with
    vectorized numpy: the plan stays scan+project (mapInPandas, NO
    shuffle), centroids ride inside the closure (k×dim floats).

    Cross-engine reproducibility (the correctness-oracle contract): the
    per-dimension accumulation runs as an explicit SEQUENTIAL left fold
    (one vectorized add per dimension, in dimension order) — bit-identical
    to Spark's ``aggregate`` expression and DuckDB's ``list_sum`` over the
    same values, unlike ``ndarray.sum`` whose pairwise summation could
    flip an argmin on a last-ulp distance tie. Ties break to the smallest
    centroid index on every engine (numpy argmin = first minimum; SQL twin
    orders by (distance, index))."""
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    cmat = np.array(centroids, dtype=np.float64)  # k × dim
    fields = list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    if norm_col:
        # L2 norm rides along for free (same numpy pass) — folded in
        # dimension order so it is bit-identical to the JVM norm()
        # expression and the oracle's list_sum (see docstring)
        fields.append(T.StructField(norm_col, T.DoubleType()))
    schema = T.StructType(fields)

    dim = cmat.shape[1]

    def run(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf) == 0:
                out[out_col] = np.array([], dtype="int32")
                if norm_col:
                    out[norm_col] = np.array([], dtype="float64")
                yield out
                continue
            # a NULL or wrong-dimension vector must not kill the stage
            # (one bad row in a 100 TB corpus): it gets a NULL cid/norm
            # (the SQL twin's list ops over NULL do the same) and drops
            # out at the probe join
            valid = np.array(
                [v is not None and len(v) == dim for v in pdf[vec_col]]
            )
            cids = np.full(len(pdf), np.nan)
            nrms = np.full(len(pdf), np.nan)
            if valid.any():
                vmat = np.array([
                    np.asarray(v, dtype=np.float64)
                    for v, ok in zip(pdf[vec_col], valid) if ok
                ])
                acc = np.zeros((len(vmat), len(cmat)))
                nrm = np.zeros(len(vmat))
                for d in range(dim):
                    diff = vmat[:, d, None] - cmat[None, :, d]
                    acc = acc + diff * diff  # sequential fold in dim order
                    if norm_col:
                        nrm = nrm + vmat[:, d] * vmat[:, d]
                cids[valid] = np.argmin(acc, axis=1)
                if norm_col:
                    nrms[valid] = np.sqrt(nrm)
            vmask = pd.Series(valid, index=pdf.index)
            out[out_col] = (
                pd.Series(cids, index=pdf.index).astype("Int32")
                .where(vmask, None)
            )
            if norm_col:
                out[norm_col] = pd.Series(nrms, index=pdf.index).where(
                    vmask, None)
            yield out

    return df.mapInPandas(run, schema=schema)


def hash_centroids(
    dim: int, n_centroids: int, seed: int = 42, scale: float = 0.25
) -> list[list[float]]:
    """Deterministic data-independent coarse centroids (same sha256-derived
    uniforms as ``_hyperplanes``, scaled to the expected component range).

    Trained k-means centroids (``train_ivf_centroids``) give better recall,
    but float mean arithmetic is not bit-reproducible across engines; these
    are exactly reproducible anywhere — including inside an ANSI-SQL oracle
    as literal arrays — so the IVF probe/assignment machinery itself can be
    hash-verified cross-engine."""
    return [
        [x * scale for x in row] for row in _hyperplanes(dim, n_centroids, seed)
    ]


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    sample_mod: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: k-means over a hash-selected
    training sample.

    - init: the ``n_centroids`` sample vectors with smallest
      ``xxhash64(seed, id)`` — stable under any partitioning (no RNG, no
      ``sample()`` partition sensitivity).
    - Lloyd iterations run distributively: assignment is the vectorized
      Arrow-batch argmin (``_assign_centroids``), the mean update is
      ``posexplode(vec) → groupBy(cid, pos).avg`` whose shuffle rows are
      (int, int, double) triples — never whole vectors. Only the k×dim
      centroid matrix ever reaches the driver (a few KB).
    - training reads only ``1/sample_mod`` of the corpus (hash-gated scan,
      standard IVF practice); the full corpus is touched once at
      assignment time in ``ivf_topk``.
    """
    sample = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.xxhash64(F.lit(seed), F.col(id_col)).alias("h"),
    ).filter(F.pmod(F.col("h"), F.lit(sample_mod)) == 0)

    init = [
        [float(x) for x in r.vec]
        for r in sample.orderBy("h", "id").limit(n_centroids).collect()
    ]
    if not init:
        raise ValueError(
            "train_ivf_centroids: empty training sample — lower sample_mod "
            "or check the corpus"
        )
    # a sample smaller than n_centroids degrades to fewer centroids
    # (every list still non-empty) instead of indexing past init
    n_centroids = min(n_centroids, len(init))
    centroids = init
    for _ in range(n_iters):
        assigned = _assign_centroids(sample, centroids, vec_col="vec")
        means = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r.cid, {})[r.pos] = r.m
        centroids = [
            [by_cid[i][p] for p in sorted(by_cid[i])] if i in by_cid
            else centroids[i]  # empty cluster keeps its previous centroid
            for i in range(n_centroids)
        ]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors partition into inverted lists
    by nearest centroid; each query probes its ``n_probe`` nearest lists.

    Scale shape (the FAISS-IVF plan re-expressed relationally): the
    centroid matrix is tiny and rides in the plan as literals; the corpus
    is scanned once to tag ``cid`` (at 100 TB you'd persist that column —
    it IS the index — and bucket the table by it so each probe touches
    only matching buckets); queries explode to (query, cid) pairs and the
    probe is an equi-join on ``cid``, so a query scores ~``n_probe/
    n_centroids`` of the corpus instead of all of it."""
    cents = centroids or train_ivf_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed
    )
    c = _assign_centroids(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        ),
        cents,
        vec_col="cvec",
        norm_col="cnorm",  # free in the same numpy pass, bit-identical
    )

    # per-query n_probe nearest centroids: sort the (dist, cid) struct
    # array and slice — expression-only (queries are small by contract;
    # the corpus-side scan is the one that must stay vectorized)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("qnorm", F.expr(_norm_sql("qvec")))
    # the whole probe selector is ONE parsed SQL string: the per-centroid
    # Column-API loop (16 aggregate/zip_with lambda exprs) spent ~1s of
    # driver time per plan build in py4j round trips; semantics identical
    # (same fold order, same (d, i) struct sort, same tie-break)
    q = q.withColumn(
        "cid", F.explode(_probe_expr("qvec", cents, n_probe))
    )

    scored = (
        c.join(F.broadcast(q), on="cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # staged norms: per-pair work is the single dot fold (see
            # cosine_topk); qnorm*cnorm keeps cosine()'s exact order
            _staged_cosine(),
        )
    )
    return _rank_topk(scored, k)


def hash_pq_codebooks(
    dim: int, m: int = 8, k_sub: int = 16, seed: int = 42,
    scale: float = 0.25,
) -> list[list[list[float]]]:
    """Deterministic data-independent PQ codebooks: ``m`` books of
    ``k_sub`` × (dim/m) sub-centroids from the same sha256-derived
    uniforms as ``hash_centroids`` (per-subspace seed offset so the
    books differ). Trained codebooks (``train_pq_codebooks``) quantize
    tighter, but float mean arithmetic is not bit-reproducible across
    engines; these replay as literal arrays inside the SQL oracle, so
    the encode + ADC machinery itself is hash-verified cross-engine."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [
            [x * scale for x in row]
            for row in _hyperplanes(dsub, k_sub, seed + 1009 * (s + 1))
        ]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Product-quantization encode (Jégou et al. 2011): each vector
    splits into ``m`` subvectors; each subvector maps to the index of
    its nearest sub-centroid (argmin squared-L2, ties to the smallest
    code). Output adds ``out_col`` = array<int> of m codes — the PQ
    index column: at 100 TB, persist it and drop the float vectors
    (64 fp32 dims → m bytes per vector at k_sub ≤ 256).

    Cross-engine contract as ``_assign_centroids``: one vectorized
    Arrow pass (scan+project, NO shuffle), per-dimension SEQUENTIAL
    fold so the SQL twin's list_sum sees identical doubles; NULL or
    wrong-dimension vectors get a NULL code and drop out downstream."""
    import numpy as np
    from pyspark.sql import types as T

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dim = m * dsub
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def run(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf) == 0:
                out[out_col] = []
                yield out
                continue
            valid = np.array(
                [v is not None and len(v) == dim for v in pdf[vec_col]]
            )
            codes = [None] * len(pdf)
            if valid.any():
                vmat = np.array([
                    np.asarray(v, dtype=np.float64)
                    for v, ok in zip(pdf[vec_col], valid) if ok
                ])
                cmat = np.empty((len(vmat), m), dtype=np.int64)
                for s in range(m):
                    sub = vmat[:, s * dsub:(s + 1) * dsub]
                    acc = np.zeros((len(vmat), len(books[s])))
                    for d in range(dsub):
                        diff = sub[:, d, None] - books[s][None, :, d]
                        acc = acc + diff * diff  # sequential fold
                    cmat[:, s] = np.argmin(acc, axis=1)  # first minimum
                rows = iter(cmat)
                codes = [
                    [int(x) for x in next(rows)] if ok else None
                    for ok in valid
                ]
            out[out_col] = codes
            yield out

    return df.mapInPandas(run, schema=schema)


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    n_iters: int = 2,
    sample_mod: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Deterministic PQ codebook training: per-subspace k-means over a
    hash-selected sample, all ``m`` subspaces trained in the SAME
    distributed passes (not m separate jobs).

    - init: per subspace, the subvectors of the ``k_sub`` sample
      vectors with smallest ``xxhash64(seed, id)`` — the
      ``train_ivf_centroids`` rule, stable at any partitioning;
    - Lloyd iteration: one Arrow pass encodes every sample vector in
      all subspaces (``pq_encode``); the mean update is
      ``posexplode(vec)`` → derive (subspace, code, pos) → one
      ``groupBy.avg`` whose shuffle rows are (int, int, int, double)
      — never whole vectors. Only m × k_sub × dsub floats reach the
      driver per iteration (the codebooks themselves).
    - empty cells keep their previous sub-centroid (IVF convention).
    """
    # dim = the MOST COMMON positive vector size, not the first row's:
    # one truncated vector arriving first must not abort training (or,
    # worse, pick a dim that filters out every good vector). One
    # column-pruned agg over sizes; ties break to the larger dim.
    sizes = (
        corpus.select(F.size(F.col(vec_col)).alias("n"))
        .filter(F.col("n") > 0)
        .groupBy("n").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.desc("n")).limit(1).collect()
    )
    if not sizes:
        raise ValueError("train_pq_codebooks: empty corpus")
    dim = int(sizes[0].n)
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    # NULL / wrong-dimension vectors are excluded BEFORE the hash gate:
    # one bad row in a 100 TB corpus must not crash training (the same
    # skip contract pq_encode documents) nor poison the smallest-hash
    # init selection with an unsliceable vector
    sample = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.xxhash64(F.lit(seed), F.col(id_col)).alias("h"),
    ).filter(
        F.col("vec").isNotNull() & (F.size("vec") == dim)
        & (F.pmod(F.col("h"), F.lit(sample_mod)) == 0)
    )
    init_rows = sample.orderBy("h", "id").limit(k_sub).collect()
    if not init_rows:
        raise ValueError(
            "train_pq_codebooks: empty training sample — lower "
            "sample_mod or check the corpus")
    books = [
        [
            [float(x) for x in r.vec[s * dsub:(s + 1) * dsub]]
            for r in init_rows
        ]
        for s in range(m)
    ]
    for _ in range(n_iters):
        coded = pq_encode(sample, books, id_col="id", vec_col="vec")
        means = (
            coded.filter(F.col("pq_code").isNotNull())
            .select(F.col("pq_code"), F.posexplode("vec").alias("pos", "val"))
            .withColumn("s", (F.col("pos") / dsub).cast("int"))
            .select(
                "s",
                F.element_at("pq_code", F.col("s") + 1).alias("j"),
                (F.col("pos") % dsub).alias("d"),
                "val",
            )
            .groupBy("s", "j", "d")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r.s, r.j), {})[r.d] = r.mean
        books = [
            [
                [got[(s, j)][d] for d in sorted(got[(s, j)])]
                if (s, j) in got else books[s][j]
                for j in range(len(books[s]))
            ]
            for s in range(m)
        ]
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    codebooks: list[list[list[float]]] | None = None,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ approximate top-k by Asymmetric Distance Computation (the
    FAISS IndexPQ plan re-expressed): corpus vectors live as m small
    codes; each query precomputes an m × k_sub lookup table of partial
    squared distances to every sub-centroid ONCE, and scoring a corpus
    row is m table gathers + a sum — no per-pair float vector math.
    Output: (query_id, neighbor_id, adc_dist, rank), rank ascending by
    the 4-decimal-rounded distance, ties to the smallest neighbor;
    self-pairs excluded.

    Scale shape: encoding is one corpus scan (pass ``codes`` — the
    persisted output of ``pq_encode`` — to skip it: the codes ARE the
    index, m bytes a vector); the scorer is an Arrow pass over
    codes × broadcast queries with the LUT memoized per query per
    batch — scan-only, the lone exchange is the final per-query
    top-k rank. Cross-engine parity: LUT entries fold per dimension
    sequentially, the ADC total folds per subspace sequentially, both
    replayed by ordered list_sum in the SQL oracle.

    Prebuilt ``codes`` require the ``codebooks`` that produced them —
    retraining fresh codebooks against persisted codes would gather
    LUT cells from a different quantization space and return silently
    wrong neighbors (same contract as ``ivf_pq_topk``'s index guard)."""
    if codes is not None and codebooks is None:
        raise ValueError(
            "pq_topk: prebuilt codes require the codebooks that built "
            "them (retraining would mismatch the stored pq_code space)")
    books = codebooks or train_pq_codebooks(
        corpus, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col, seed=seed
    )
    if codes is None:
        codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    c = codes.select(
        F.col(id_col).alias("neighbor_id"), F.col("pq_code")
    ).filter(F.col("pq_code").isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    paired = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    return _adc_rank_topk(paired, books, k)


def _adc_rank_topk(paired: DataFrame, books, k: int) -> DataFrame:
    """Shared ADC tail for the PQ paths: score (neighbor_id, pq_code,
    query_id, qvec) pairs via per-query LUT gathers (memoized per
    batch; per-dimension then per-subspace SEQUENTIAL folds — the
    oracle contract), round JVM-side (F.round is HALF_UP like SQL
    round(); numpy's np.round is half-even and would diverge on exact
    .00005 boundaries), rank ascending with neighbor_id tie-break."""
    from pyspark.sql import types as T

    m = len(books)
    dsub = len(books[0][0])
    dim = m * dsub
    bmats = [np.array(b, dtype=np.float64) for b in books]
    schema = T.StructType([
        T.StructField("query_id", paired.schema["query_id"].dataType),
        T.StructField("neighbor_id", paired.schema["neighbor_id"].dataType),
        T.StructField("adc_dist", T.DoubleType()),
    ])

    def run(it):
        luts: dict = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            outs = {"query_id": [], "neighbor_id": [], "adc_dist": []}
            for qid, grp in pdf.groupby("query_id", sort=False):
                qv = grp["qvec"].iloc[0]
                if qv is None or len(qv) != dim:
                    continue
                lut = luts.get(qid)
                if lut is None:
                    qarr = np.asarray(qv, dtype=np.float64)
                    lut = np.empty((m, len(bmats[0])))
                    for s in range(m):
                        sub = qarr[s * dsub:(s + 1) * dsub]
                        acc = np.zeros(len(bmats[s]))
                        for d in range(dsub):
                            diff = sub[d] - bmats[s][:, d]
                            acc = acc + diff * diff  # sequential fold
                        lut[s] = acc
                    luts[qid] = lut
                cmat = np.array(
                    [list(cd) for cd in grp["pq_code"]], dtype=np.int64
                )
                dist = np.zeros(len(grp))
                for s in range(m):  # sequential fold in subspace order
                    dist = dist + lut[s][cmat[:, s]]
                outs["query_id"].extend([qid] * len(grp))
                outs["neighbor_id"].extend(grp["neighbor_id"])
                outs["adc_dist"].extend(dist)
            yield pd.DataFrame(outs, columns=list(schema.fieldNames()))

    scored = paired.mapInPandas(run, schema=schema).withColumn(
        "adc_dist", F.round(F.col("adc_dist"), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivf_pq_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistable IVF-PQ index frame: one corpus pass tags each
    vector with its inverted list (``cid``) and its PQ codes
    (``pq_code``). At 100 TB you write THIS out bucketed by ``cid``
    and drop the float vectors — m bytes + one int per vector; every
    later query run is probe-join + LUT gathers over it."""
    tagged = _assign_centroids(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
        ),
        centroids,
        vec_col="v",
    )
    return pq_encode(
        tagged, codebooks, id_col="neighbor_id", vec_col="v"
    ).select("neighbor_id", "cid", "pq_code")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    n_centroids: int = 16,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the two scale levers composed: the
    IVF probe restricts each query to ``n_probe/n_centroids`` of the
    corpus (an equi-join on ``cid``, never a full scan at query time
    once the index frame is persisted+bucketed), and PQ-ADC scores the
    probed rows from codes alone (m gathers + an ordered fold; float
    vectors never reach the scorer). Codes quantize the vectors
    themselves, not FAISS's per-list residuals — residual encoding
    breaks the cross-engine replay guarantee the flat-PQ oracle row
    relies on, and on normalized text embeddings at m=8 the recall
    difference is marginal (documented in SCALE.md).

    Pass ``index`` (an ``ivf_pq_index`` output, possibly read back
    from its bucketed parquet) to skip the tagging scan entirely —
    together with the SAME ``centroids``/``codebooks`` that built it:
    retraining fresh artifacts against a prebuilt index would probe
    cids and gather LUT cells from a different quantization space and
    return silently wrong neighbors, so that combination raises."""
    if index is not None and (centroids is None or codebooks is None):
        raise ValueError(
            "ivf_pq_topk: a prebuilt index requires the centroids and "
            "codebooks that built it (retraining would mismatch the "
            "stored cid/pq_code space)")
    cents = centroids or train_ivf_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed
    )
    books = codebooks or train_pq_codebooks(
        corpus, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col, seed=seed
    )
    if index is None:
        index = ivf_pq_index(corpus, cents, books, id_col, vec_col)
    idx = index.filter(
        F.col("pq_code").isNotNull() & F.col("cid").isNotNull()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("cid", F.explode(_probe_expr("qvec", cents, n_probe)))
    paired = (
        idx.join(F.broadcast(q), on="cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "pq_code", "qvec")
    )
    return _adc_rank_topk(paired, books, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes without numpy RNG state
    ambiguity: values from a hash-derived uniform in [-1, 1]."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()
            u = int.from_bytes(h[:8], "big") / float(1 << 64)
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    vec: Column | str, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Sign-bit bucket id in [0, 2^n_planes) — pure expression.

    Pass the column NAME to build the whole bucket expression from one
    parsed SQL string (the Column-API loop costs n_planes py4j lambda
    round trips of driver time per plan build); a Column keeps the
    composable form. Values are identical either way."""
    planes = _hyperplanes(dim, n_planes, seed)
    if isinstance(vec, str):
        terms = []
        for i, plane in enumerate(planes):
            arr = "array(" + ",".join(f"{float(v)!r}D" for v in plane) + ")"
            d = (f"aggregate(zip_with({vec}, {arr}, (x, y) -> "
                 f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                 f"0.0D, (acc, v) -> acc + v)")
            terms.append(f"CASE WHEN {d} > 0 THEN {1 << i} ELSE 0 END")
        return F.expr("0 + " + " + ".join(terms))
    acc = F.lit(0)
    for i, plane in enumerate(planes):
        parr = _lit_vec(plane)
        d = dot(vec, parr)
        acc = acc + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def _lsh_tag_batch(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str,
    bucket_col: str = "bucket",
    norm_col: str | None = None,
) -> DataFrame:
    """Sign-bit LSH bucket (+ optional L2 norm) per Arrow batch.

    Value-identical to the ``lsh_bucket`` expression but vectorized: the
    expression form evaluates n_planes interpreted
    ``aggregate(zip_with(...))`` folds per row (dim=64, 8 planes → ~512
    lambda ops/row — the pattern measured ~300× slower than codegen),
    which is fine for a query set but not for corpus tagging, the
    dominant cost of ``cosine_topk_lsh`` at scale. Here each Arrow batch
    computes all plane dots with numpy; the plan stays scan+project
    (mapInPandas, NO shuffle) and the n_planes×dim plane matrix rides in
    the closure.

    Cross-engine reproducibility (the oracle contract): the
    per-dimension accumulation is an explicit SEQUENTIAL fold in
    dimension order — bit-identical to the ``aggregate`` expression and
    the DuckDB oracle's ``list_sum``, so a dot landing exactly on 0
    cannot flip its sign bit between engines (same discipline as
    ``_assign_centroids``). The bucket sum itself is exact integer
    arithmetic."""
    from pyspark.sql import types as T

    pmat = np.array(planes, dtype=np.float64)  # n_planes × dim
    weights = 1 << np.arange(pmat.shape[0], dtype=np.int64)
    fields = list(df.schema.fields) + [
        T.StructField(bucket_col, T.IntegerType())
    ]
    if norm_col:
        fields.append(T.StructField(norm_col, T.DoubleType()))
    schema = T.StructType(fields)

    dim = pmat.shape[1]

    def run(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf) == 0:
                out[bucket_col] = np.array([], dtype="int32")
                if norm_col:
                    out[norm_col] = np.array([], dtype="float64")
                yield out
                continue
            # NULL / wrong-dimension vectors match the expression form:
            # every plane dot is NULL → every CASE falls to 0 → bucket 0,
            # and norm() is NULL. Valid rows batch through the matmul.
            valid = np.array(
                [v is not None and len(v) == dim for v in pdf[vec_col]]
            )
            buckets = np.zeros(len(pdf), dtype="int32")
            norms = np.full(len(pdf), np.nan)
            if valid.any():
                vmat = np.array([
                    np.asarray(v, dtype=np.float64)
                    for v, ok in zip(pdf[vec_col], valid) if ok
                ])
                acc = np.zeros((len(vmat), len(pmat)))
                nrm = np.zeros(len(vmat))
                for d in range(dim):
                    acc = acc + vmat[:, d, None] * pmat[None, :, d]
                    if norm_col:
                        nrm = nrm + vmat[:, d] * vmat[:, d]
                buckets[valid] = ((acc > 0) @ weights).astype("int32")
                if norm_col:
                    norms[valid] = np.sqrt(nrm)
            out[bucket_col] = buckets
            if norm_col:
                out[norm_col] = pd.Series(norms, index=pdf.index).where(
                    pd.Series(valid, index=pdf.index), None)
            yield out

    return df.mapInPandas(run, schema=schema)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket are scored. Recall trades with n_planes; at scale, bucket on
    (hash-partitioned) bucket id so each task scores one bucket.

    Both sides tag through the vectorized Arrow-batch kernel
    (``_lsh_tag_batch``) which also emits the L2 norm in the same pass —
    corpus tagging is the linear-cost stage and must not run as an
    interpreted 8-plane expression fold. Per-pair scoring after the
    bucket equi-join stays the shared JVM ``_staged_cosine`` fold."""
    planes = _hyperplanes(dim, n_planes, seed=42)
    q = _lsh_tag_batch(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        planes, "qvec", "bucket", "qnorm",
    )
    c = _lsh_tag_batch(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        ),
        planes, "cvec", "bucket", "cnorm",
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # staged norms: per-pair work is the single dot fold (see
            # cosine_topk); qnorm*cnorm keeps cosine()'s exact order
            _staged_cosine(),
        )
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup: cluster embeddings, near-dup only within cluster)
# ---------------------------------------------------------------------------

def semantic_near_dup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 2,
) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest centroid,
    then compute exact pairwise cosine ONLY within each cluster —
    O(Σ|C|²) work instead of the O(n²) all-pairs scan, with the clusters
    doing the same job LSH bands do for MinHash.

    Scale shape: centroid assignment is a shuffle-free mapInPandas BLAS
    argmin (``_assign_centroids``, k×dim closure); within-cluster pairs
    run through the tiled block-product machinery keyed on
    (cid, p, q) — a skewed cluster still splits across n_blocks² tasks.
    Pass ``hash_centroids(dim, k)`` for deterministic, oracle-replayable
    clustering or ``train_ivf_centroids`` for data-adaptive quality.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    assigned = _assign_centroids(src, centroids, "vec", "cid")
    return cosine_pairs_blocked(
        assigned, threshold, "id", "vec", n_blocks, group_col="cid"
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 2,
) -> DataFrame:
    """Drop semantic near-duplicates: pairs → connected components →
    keep each cluster's minimum id. Note the within-centroid restriction
    means near-dups straddling a centroid boundary survive (the SemDeDup
    recall tradeoff — raise the centroid count for speed, lower it for
    recall)."""
    from greenmask_spark.functions.dedup import connected_components

    pairs = semantic_near_dup(
        df, centroids, threshold, id_col, vec_col, n_blocks
    )
    cc = connected_components(pairs, "id_a", "id_b")
    dupes = (
        cc.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(dupes, id_col, "left_anti")


#: the benchmark matrix rides inside every task's closure — rail it
#: like the k-means trainer rails k*dim (a benchmark set is small by
#: definition; a "benchmark" that trips this is a corpus, and corpus ×
#: corpus similarity is the LSH/IVF families' job)
_SEMDECON_MAX_CELLS = 1 << 24


def semantic_decontaminate(
    df: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """Drop rows whose embedding is too close to ANY benchmark vector —
    the SEMANTIC twin of ``dedup.ngram_decontaminate`` (GPT-3 appendix C
    drops on 13-gram collision; paraphrased or translated benchmark
    leakage has no n-gram overlap, and eval-hygiene work post-GPT-4
    checks embedding similarity for exactly that reason). A row is
    contaminated iff max over benchmark of round(cosine, 4) >=
    ``threshold``; rows with NULL / wrong-dimension / zero-norm vectors
    cannot match anything and are KEPT (their score is NULL), mirroring
    the invalid-row contract of ``_assign_centroids``.

    Scale shape: the benchmark embeddings are collected ONCE onto the
    driver (railed at ``_SEMDECON_MAX_CELLS`` cells, with the rail
    enforced by a distributed count+dim pre-check BEFORE the collect so
    an oversized or mixed-dimension benchmark raises without ever
    materializing on the driver) and ride inside the
    task closure as a k×dim float64 matrix — the full corpus pays one
    Arrow-batch mapInPandas pass with ZERO exchanges (scan → filter),
    the assign_clusters discipline. Cross-engine reproducibility: dot
    products and both norms accumulate as an explicit SEQUENTIAL fold in
    dimension order (bit-identical to DuckDB's list_sum / Spark's
    aggregate over the same values — ndarray matmul's pairwise summation
    could flip a 4th-decimal knife-edge); the kernel emits the RAW max
    (max commutes with the monotone round, so max(round(c)) ==
    round(max(c))) and the 4-dp rounding runs JVM-side with F.round —
    HALF_UP exactly like SQL round(), where np.round's half-even would
    diverge on exact halves (the pq_topk precedent).

    ``score_col`` keeps the max rounded cosine as a column (diagnostic /
    oracle form); default drops it."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bcol = bench_vec_col or vec_col
    # Pre-flight over the benchmark BEFORE any driver collect: one
    # map-side-combined agg (count + min/max dim) so an oversized or
    # mixed-dimension benchmark raises the documented ValueError instead
    # of materializing onto the driver first (the k-means driver-rail
    # discipline). Passing a corpus as `bench` by mistake now costs one
    # distributed count, not a driver OOM.
    pre = bench.filter(F.col(bcol).isNotNull()).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.size(bcol)).alias("__dmin"),
        F.max(F.size(bcol)).alias("__dmax"),
    ).collect()[0]
    if pre["__n"] == 0:
        raise ValueError("semantic_decontaminate: empty benchmark")
    if pre["__dmin"] != pre["__dmax"]:
        raise ValueError(
            f"semantic_decontaminate: benchmark contains mixed embedding "
            f"dimensions ({pre['__dmin']}..{pre['__dmax']}) — a malformed "
            "benchmark would silently turn the filter into a no-op; clean "
            "it (filter size(vec) = expected_dim) before decontaminating"
        )
    dim = int(pre["__dmax"])
    if dim == 0:
        raise ValueError(
            "semantic_decontaminate: benchmark embeddings are zero-length"
        )
    if pre["__n"] * dim > _SEMDECON_MAX_CELLS:
        raise ValueError(
            f"semantic_decontaminate: benchmark matrix {pre['__n']}x{dim} "
            f"exceeds the {_SEMDECON_MAX_CELLS}-cell closure rail — a set "
            "this large is a corpus; use the LSH/IVF near-dup families"
        )
    brows = [r[0] for r in bench.select(bcol).collect() if r[0] is not None]
    bmat = np.array(brows, dtype=np.float64)  # k × dim
    bnorm = np.zeros(len(bmat))
    for d in range(dim):  # sequential fold in dim order (docstring)
        bnorm = bnorm + bmat[:, d] * bmat[:, d]
    bnorm = np.sqrt(bnorm)
    keep_score = score_col is not None
    out_col = score_col or "__semdecon_max_cos"
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def run(it):
        for pdf in it:
            out = pdf.copy()
            if len(pdf) == 0:
                out[out_col] = np.array([], dtype="float64")
                yield out
                continue
            valid = np.array(
                [v is not None and len(v) == dim for v in pdf[vec_col]]
            )
            scores = np.full(len(pdf), np.nan)
            if valid.any():
                vmat = np.array([
                    np.asarray(v, dtype=np.float64)
                    for v, ok in zip(pdf[vec_col], valid) if ok
                ])
                dots = np.zeros((len(vmat), len(bmat)))
                vn = np.zeros(len(vmat))
                for d in range(dim):  # sequential fold in dim order
                    dots = dots + vmat[:, d, None] * bmat[None, :, d]
                    vn = vn + vmat[:, d] * vmat[:, d]
                vn = np.sqrt(vn)
                denom = vn[:, None] * bnorm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom > 0, dots / denom, np.nan)
                # RAW max — rounding happens JVM-side (docstring)
                mx = np.nanmax(
                    np.where(np.isnan(cos), -np.inf, cos), axis=1
                )
                scores[valid] = np.where(np.isinf(mx), np.nan, mx)
            out[out_col] = pd.Series(scores, index=pdf.index).where(
                pd.Series(valid, index=pdf.index)
                & ~pd.Series(np.isnan(scores), index=pdf.index),
                None,
            )
            yield out

    tagged = df.mapInPandas(run, schema=schema).withColumn(
        out_col, F.round(F.col(out_col), 4)
    )
    kept = tagged.filter(
        F.col(out_col).isNull() | (F.col(out_col) < F.lit(threshold))
    )
    return kept if keep_score else kept.drop(out_col)


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> float:
    """Mean per-query recall of an approximate top-k result against the
    exact one (both in the (query_id, neighbor_id, ...) shape the topk
    operators emit) — the ANN quality dial for tuning n_planes /
    n_centroids / n_probe. Two small aggregations; the only driver
    value is the final scalar."""
    e = exact.select(query_col, neighbor_col)
    a = approx.select(query_col, neighbor_col)
    hit = e.join(a, [query_col, neighbor_col], "left_semi")
    per_q = (
        e.groupBy(query_col).agg(F.count("*").alias("n"))
        .join(
            hit.groupBy(query_col).agg(F.count("*").alias("h")),
            query_col, "left",
        )
        .select((F.coalesce(F.col("h"), F.lit(0)) / F.col("n")).alias("r"))
    )
    row = per_q.agg(F.avg("r")).first()
    return float(row[0]) if row[0] is not None else 0.0


def rerank_topk(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact re-rank of a candidate stream — the second stage of the
    standard coarse→fine ANN architecture: a cheap recall-oriented stage
    (IVF/LSH over full or int8-quantized vectors) proposes
    (query_id, neighbor_id) candidates, and this scores ONLY those pairs
    at full precision and keeps the top-k.

    Scale shape: candidates carry ids only; vectors attach via two
    id-keyed joins (query side broadcasts — small by contract; corpus
    side joins on its key, touching only candidate rows). Per-pair work
    is the single staged-norm dot fold, same as the direct topk paths.

    Compose: ``rerank_topk(ivf_topk(quantize(c), q, k=50), c, q, k=5)``
    — the coarse stage reads 4× narrower vectors, the fine stage reads
    full precision for ~50 rows per query."""
    cand = candidates.select("query_id", "neighbor_id").distinct()
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("qnorm", F.expr(_norm_sql("qvec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("cnorm", F.expr(_norm_sql("cvec")))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _staged_cosine(),
        )
    )
    return _rank_topk(scored, k)
