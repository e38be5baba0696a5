"""Integer-exact k-means clustering over embedding columns.

The repo already trains float k-means centroids for the IVF coarse
quantizer (`similarity.train_ivf_centroids`), but its `avg()` updates
are explicitly NOT bit-reproducible across engines — float summation
is order-dependent, so a DuckDB replay of the same iterations can
land on different centroids and a hash-compare is meaningless. This
module is the clustering twin of `linkgraph.pagerank`'s fixed-point
discipline: every arithmetic step is integer-exact and therefore
identical on any engine and any partitioning.

    quantize    q[d]    = floor(v[d] * 2^qbits)        (exact: the
                scale is a power of two, so the multiply only shifts
                the float exponent — no rounding before the floor)
    distance    dist(q, c) = sum_d (q[d] - c[d])^2     (int64)
    assign      cid     = argmin dist, ties -> lowest cid
    update      c'[d]   = floordiv(sum_members q[d], n_members)
                        = (s - pmod(s, n)) / n         (exact floor
                division via the nonnegative modulus, the same form
                an ANSI-SQL twin can spell with `%`)
    empty cluster -> keeps its previous centroid (same convention as
                similarity.train_ivf_centroids).

Initialization is data-dependent but deterministic: the k sample
vectors with the smallest `(sha256-slice(id:kmeans:seed), id)` key —
the repo's portable-hash discipline (sampling._unit_hash, SQL twin
``('0x' || substr(sha256(k), 1, 15))::BIGINT``), NOT xxhash64, which
no other engine reproduces.

100 TB shape:
- training reads only a hash-gated 1/sample_mod of the corpus
  (standard k-means-for-IVF practice); the full corpus is touched
  exactly once, by the final assignment pass.
- per Lloyd iteration the only exchange is a (cid, pos, sum, n)
  aggregation whose partial sums are combined INSIDE the Arrow batch
  (each batch emits at most k*dim rows), then map-side combined again
  by the groupBy — shuffle volume is O(batches * k * dim), never
  O(rows * dim).
- driver-side state is the k*dim centroid matrix (a few KB), railed
  at `_MAX_CELLS` with sizing guidance; no corpus row ever reaches
  the driver.
- int64 headroom: |q[d]| <= 2^qbits for unit-normalized components,
  so per-cluster component sums stay exact while
  n_members < 2^(62-qbits) (~4e12 at the default qbits=20), and
  squared distances stay under 2^(2*qbits+2) * dim (2^48 at dim<=64).

Reference parity: the reference engine (greenmask) has no clustering
operator; this extends the LLM-pipeline tier (SemDeDup-style corpus
clustering / IVF quantizer training need exactly this primitive).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: default component quantization: floor(v * 2^20)
QBITS = 20

#: rail on the per-iteration driver collect (k * dim cells)
_MAX_CELLS = 1 << 20


def _init_hash(key, seed: int):
    """Portable init-order hash (sampling._unit_hash arithmetic, tag
    ``kmeans``): sha256 hex slice as a bigint — reproducible in any
    engine that has sha256, unlike xxhash64."""
    tagged = F.concat(key.cast("string"), F.lit(f":kmeans:{seed}"))
    return F.conv(
        F.substring(F.sha2(tagged, 256), 1, 15), 16, 10
    ).cast("bigint")


def _quantize(mat: np.ndarray, qbits: int) -> np.ndarray:
    # float32 -> float64 is exact; * 2^qbits only shifts the exponent
    return np.floor(mat * float(1 << qbits)).astype(np.int64)


def _valid_mask(col: pd.Series, dim: int) -> np.ndarray:
    # O(n), not O(n*dim): same validity contract as the float
    # assigner (similarity._assign_centroids); non-finite components
    # are caught AFTER the vmat build (_finite_filter — vectorized,
    # so the O(n*dim) check costs a fraction of the distance pass)
    return np.array([v is not None and len(v) == dim for v in col])


def _finite_filter(valid: np.ndarray, vmat: np.ndarray):
    """Demote rows with NaN/Inf components to invalid (NULL cid):
    np.floor(nan).astype(int64) is undefined behavior and +/-Inf
    overflows the int64 squared distance — either silently breaks the
    module's cross-engine bit-exactness, so non-finite vectors follow
    the NULL/wrong-dim path instead. Mutates ``valid`` in place and
    returns the finite-row submatrix."""
    finite = np.isfinite(vmat).all(axis=1) if len(vmat) else np.empty(
        0, dtype=bool)
    if not finite.all():
        valid[np.nonzero(valid)[0][~finite]] = False
        vmat = vmat[finite]
    return vmat


def assign_clusters(
    df: DataFrame,
    qcentroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cid",
    qbits: int = QBITS,
    passthrough: bool = False,
) -> DataFrame:
    """(id, cid) for every row of ``df`` against a FIXED quantized
    centroid matrix: ONE Arrow-batch pass, zero shuffles — the
    centroid matrix rides inside the closure (k*dim int64, a few KB
    broadcast with the task), so the plan is a scan + mapInPandas
    however large the corpus is. Invalid vectors (null / wrong
    dimension) get a NULL cid, matching `_assign_centroids`.

    ``passthrough=True`` keeps EVERY input column and appends the cid
    — the corpus-pipeline shape (the alternative, (id, cid) plus a
    rejoin on id, pays a corpus-sized shuffle for nothing). Stateless
    either way, so the same plan runs on a streaming DataFrame."""
    cmat = np.array(qcentroids, dtype=np.int64)
    dim = cmat.shape[1]
    if passthrough:
        from pyspark.sql.types import IntegerType, StructField, StructType

        if out_col in df.columns:
            raise ValueError(
                f"assign_clusters: passthrough would duplicate column "
                f"{out_col!r}; pass a different out_col"
            )
        schema = StructType(
            list(df.schema.fields) + [StructField(out_col, IntegerType())]
        )
    else:
        id_field = df.schema[id_col]
        schema = (
            f"{id_col} {id_field.dataType.simpleString()}, {out_col} int"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            valid = _valid_mask(pdf[vec_col], dim)
            cids = np.full(len(pdf), -1, dtype=np.int64)
            if valid.any():
                vmat = np.array(
                    [np.asarray(v, dtype=np.float64)
                     for v, ok in zip(pdf[vec_col], valid) if ok]
                )
                vmat = _finite_filter(valid, vmat)
            if valid.any():
                q = _quantize(vmat, qbits)
                # int64 throughout; argmin takes the FIRST minimum =
                # lowest cid, the documented tie-break (SQL twin:
                # ORDER BY dist, cid LIMIT 1)
                diff = q[:, None, :] - cmat[None, :, :]
                cids[valid] = (diff * diff).sum(axis=2).argmin(axis=1)
            cid_series = pd.Series(cids, index=pdf.index).astype(
                "Int32").where(pd.Series(valid, index=pdf.index), None)
            if passthrough:
                out = pdf.copy()
                out[out_col] = cid_series
            else:
                out = pd.DataFrame({
                    id_col: pdf[id_col],
                    out_col: cid_series,
                })
            yield out

    return df.mapInPandas(run, schema=schema)


def _partial_sums(
    df: DataFrame,
    qcentroids: list[list[int]],
    vec_col: str,
    qbits: int,
) -> DataFrame:
    """One Lloyd E+partial-M step: per Arrow batch, assign every
    vector and emit the per-(cid, pos) component sums and member
    counts — at most k*dim rows PER BATCH leave Python, so the
    following groupBy shuffles pre-combined slivers, not vectors."""
    cmat = np.array(qcentroids, dtype=np.int64)
    k, dim = cmat.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            valid = _valid_mask(pdf[vec_col], dim)
            if not valid.any():
                continue
            vmat = np.array(
                [np.asarray(v, dtype=np.float64)
                 for v, ok in zip(pdf[vec_col], valid) if ok]
            )
            vmat = _finite_filter(valid, vmat)
            if not valid.any():
                continue
            q = _quantize(vmat, qbits)
            diff = q[:, None, :] - cmat[None, :, :]
            cids = (diff * diff).sum(axis=2).argmin(axis=1)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, cids, q)
            counts = np.bincount(cids, minlength=k).astype(np.int64)
            hit = counts > 0
            ks = np.nonzero(hit)[0]
            yield pd.DataFrame({
                "cid": np.repeat(ks, dim).astype(np.int32),
                "pos": np.tile(np.arange(dim, dtype=np.int32), len(ks)),
                "s": sums[hit].reshape(-1),
                "n": np.repeat(counts[ks], dim),
            })

    return df.mapInPandas(run, schema="cid int, pos int, s long, n long")


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int = 1,
    qbits: int = QBITS,
) -> list[list[int]]:
    """Quantized Lloyd's k-means; returns the k x dim INT64 centroid
    matrix (divide by 2^qbits for the float centroids). Every step is
    integer-exact (module docstring), so the result is bit-identical
    across engines, partitionings, and reruns."""
    sample = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        _init_hash(F.col(id_col), seed).alias("h"),
    )
    if sample_mod > 1:
        sample = sample.filter(F.pmod("h", F.lit(sample_mod)) == 0)
    init_rows = sample.orderBy("h", "id").limit(k).collect()
    init = [r.vec for r in init_rows if r.vec is not None]
    # a malformed row (wrong dimension) in the init window would make
    # the centroid matrix ragged; keep the first row's dimension.
    # NaN/Inf components would quantize to undefined int64 — exclude
    # them the same way the assigner NULLs them (_finite_filter)
    if init:
        init = [
            v for v in init
            if len(v) == len(init[0])
            and np.isfinite(np.asarray(v, dtype=np.float64)).all()
        ]
    if not init:
        raise ValueError(
            "kmeans_train: empty training sample — lower sample_mod or "
            "check the corpus"
        )
    dim = len(init[0])
    if k * dim > _MAX_CELLS:
        raise ValueError(
            f"kmeans_train: k*dim = {k}*{dim} = {k * dim} exceeds the "
            f"{_MAX_CELLS}-cell driver rail — the per-iteration collect "
            "is the centroid matrix itself; shrink k or train a coarse "
            "level first"
        )
    # a sample smaller than k degrades to fewer centroids
    cents = [
        [int(x) for x in _quantize(np.asarray(v, np.float64), qbits)]
        for v in init
    ]
    sample = sample.select("id", "vec")
    for _ in range(n_iters):
        rows = (
            _partial_sums(sample, cents, "vec", qbits)
            .groupBy("cid", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in rows:
            # floor division on exact integer sums: python's // IS
            # floor (SQL twin: (s - ((s % n) + n) % n) / n)
            by_cid.setdefault(r.cid, {})[r.pos] = r.s // r.n
        cents = [
            [by_cid[i][p] for p in sorted(by_cid[i])] if i in by_cid
            else cents[i]
            for i in range(len(cents))
        ]
    return cents


def kmeans_centroids_float(
    df: DataFrame,
    k: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int = 1,
    qbits: int = QBITS,
) -> list[list[float]]:
    """Trained centroids in the float form ``similarity.ivf_topk`` /
    ``ivf_pq_index`` take as their ``centroids`` argument — bridging
    this trainer into the ANN family: previously trained-IVF meant
    ``train_ivf_centroids`` (better recall than hash centroids, but
    float avg() updates that no other engine reproduces, so the
    oracle rows run hash centroids); these are trained AND exactly
    reproducible anywhere, including as literal arrays in an
    ANSI-SQL twin. Each component is an int64 divided by 2^qbits —
    exact in a double — so cross-engine parity survives the cast."""
    cents = kmeans_train(
        df, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col,
        seed=seed, sample_mod=sample_mod, qbits=qbits,
    )
    s = float(1 << qbits)
    return [[c / s for c in row] for row in cents]


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cid",
    seed: int = 42,
    sample_mod: int = 1,
    qbits: int = QBITS,
    passthrough: bool = False,
) -> DataFrame:
    """Train on the hash-gated sample, then assign the FULL corpus:
    (id, cid) for every row — or every input column plus cid with
    ``passthrough=True``. The returned plan is scan + one Arrow
    stage, zero exchanges — training ran eagerly at plan-build time
    (n_iters pre-combined sliver aggregations over the sample)."""
    cents = kmeans_train(
        df, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col,
        seed=seed, sample_mod=sample_mod, qbits=qbits,
    )
    return assign_clusters(
        df, cents, id_col=id_col, vec_col=vec_col, out_col=out_col,
        qbits=qbits, passthrough=passthrough,
    )
