"""Deterministic scale-up of the driver testdata: sf0.1 -> sf1 (or any
multiple), for the decade-step oracle sweep SCALE.md records.

The sandbox has no network, so DuckDB's `tpch` extension cannot
install; instead this derives a larger SF from the committed sf0.1
parquet with the SAME seeds every run:

- region/nation: copied verbatim (dimensions are SF-invariant).
- customer/supplier/part/orders/lineitem/events: replicated ``mult``
  times with per-copy key offsets (stride = max(key)+1 of the base),
  applied consistently to every FK, so referential integrity and the
  key-collision-free invariants hold at the new SF.
- documents/embeddings: synthesized FRESH from the base tables'
  empirical distributions (vocab + word frequencies, lang/source
  mixes, doc length range; unit-normalized Gaussian embeddings) with
  a fixed numpy seed — replicating text 10x would turn the whole
  corpus into exact duplicates and distort every dedup/ANN operator's
  behavior at scale, which is exactly what the sweep must measure.

Synthesis v2 (r13): each document additionally gets (a) 0-4 DISTINCT
Gopher stopwords injected at random positions (separate rng stream,
seed+2, so the base word draw is unchanged vs v1; ~80% of docs get
the >= 2 the Gopher stopword rule needs) and (b) a sentence-final
'.' every 5-10 words (same stream; the base vocabulary contains no
`.!?`, so C4's min_sentences rule annihilated the funnel the same
way), and (c) ~2% of docs become one-word-swapped NEAR-duplicates of
an earlier doc (fresh synthesis has no 0.75-Jaccard pairs, so the
fuzzy-dedup funnel stage never fired; originals keep the lower doc_id
and survive). The base sf0.1 vocabulary contains exactly ONE Gopher stopword
(measured, VERDICT r12), which gated the fineweb preset funnel to 0
survivors at the gopher stage — the seeding lets the funnel's
post-gopher stages (MinHash dedup, PII, shards) actually execute at
sf >= 1 while still exercising both gates (0/1-stopword docs fail
Gopher; short docs fail min_sentences). SCALE.md records which
synthesis version each pinned run used; v1-pinned value evidence
predates this.

Correctness of the sweep is unaffected by the data being derived:
tools/check_oracle.py runs Spark and DuckDB over the SAME files.

Usage: python tools/make_sf.py [out_dir] [--mult 10] [--base DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: table -> [(key_column, stride_source_column)] offsets; stride is
#: max(stride_source)+1 in the BASE table so copies never collide
_OFFSETS = {
    "customer": [("c_custkey", "customer.c_custkey")],
    "supplier": [("s_suppkey", "supplier.s_suppkey")],
    "part": [("p_partkey", "part.p_partkey")],
    "orders": [("o_orderkey", "orders.o_orderkey"),
               ("o_custkey", "customer.c_custkey")],
    "lineitem": [("l_orderkey", "orders.o_orderkey"),
                 ("l_partkey", "part.p_partkey"),
                 ("l_suppkey", "supplier.s_suppkey")],
    "events": [("event_id", "events.event_id"),
               ("user_id", "events.user_id")],
}


def _strides(con, base: str) -> dict[str, int]:
    out = {}
    for table, cols in _OFFSETS.items():
        for _, src in cols:
            t, c = src.split(".")
            if src not in out:
                out[src] = con.execute(
                    f"SELECT max({c}) + 1 FROM "
                    f"read_parquet('{base}/{t}.parquet')"
                ).fetchone()[0]
    return out


def _replicate(con, base, out_dir, table, mult, strides):
    cols = con.execute(
        f"SELECT * FROM read_parquet('{base}/{table}.parquet') LIMIT 0"
    ).description
    names = [c[0] for c in cols]
    offset_for = dict(_OFFSETS[table])
    sel = ", ".join(
        f"t.{n} + i.i * {strides[offset_for[n]]} AS {n}"
        if n in offset_for else f"t.{n}"
        for n in names
    )
    if mult < 200:
        # small multipliers: one query, global key sort (the path that
        # produced the recorded sf1/sf10 artifacts — kept bit-stable)
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{base}/{table}.parquet') t, "
            f"range({mult}) i(i) ORDER BY {names[0]}) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT parquet)"
        )
        return
    # large multipliers (sf100+): the single-query ORDER BY sorts the
    # whole replicated table in DuckDB memory (600M lineitem rows
    # OOMed a 125 GB host). Offsets are copy-monotone (stride >
    # max(key)), so global key order == (copy, key) order: write
    # key-sorted per-copy-group chunks, then stream-concat their row
    # groups with pyarrow — peak memory is one chunk + one row group.
    step = 10
    parts = []
    for lo in range(0, mult, step):
        hi = min(lo + step, mult)
        part = f"{out_dir}/.{table}.part{lo:05d}.parquet"
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{base}/{table}.parquet') t, "
            f"range({lo}, {hi}) i(i) ORDER BY i.i, t.{names[0]}) "
            f"TO '{part}' (FORMAT parquet)"
        )
        parts.append(part)
    writer = None
    try:
        for part in parts:
            f = pq.ParquetFile(part)
            for rg in range(f.num_row_groups):
                batch = f.read_row_group(rg)
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{out_dir}/{table}.parquet", batch.schema
                    )
                writer.write_table(batch)
            f.close()
    finally:
        if writer is not None:
            writer.close()
    for part in parts:
        os.remove(part)


def _copy_dim(con, base, out_dir, table):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{base}/{table}.parquet')) "
        f"TO '{out_dir}/{table}.parquet' (FORMAT parquet)"
    )


def _synth_documents(con, base, out_dir, mult, seed):
    words, freqs = zip(*con.execute(
        "SELECT word, count(*) FROM (SELECT unnest(str_split(text, ' ')) "
        f"AS word FROM read_parquet('{base}/documents.parquet')) "
        "WHERE word <> '' GROUP BY 1 ORDER BY 1"
    ).fetchall())
    langs, lfreqs = zip(*con.execute(
        "SELECT lang, count(*) FROM "
        f"read_parquet('{base}/documents.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall())
    n_base, lo_w, hi_w = con.execute(
        "SELECT count(*), min(len(str_split(text, ' '))), "
        "max(len(str_split(text, ' '))) FROM "
        f"read_parquet('{base}/documents.parquet')"
    ).fetchone()
    n_src = con.execute(
        "SELECT count(DISTINCT source) FROM "
        f"read_parquet('{base}/documents.parquet')"
    ).fetchone()[0]
    n = n_base * mult
    rng = np.random.default_rng(seed)
    p_w = np.asarray(freqs, dtype=np.float64)
    p_w /= p_w.sum()
    p_l = np.asarray(lfreqs, dtype=np.float64)
    p_l /= p_l.sum()
    lens = rng.integers(lo_w, hi_w + 1, size=n)
    word_ids = rng.choice(len(words), size=int(lens.sum()), p=p_w)
    # v2: inject 0-4 DISTINCT Gopher stopwords per doc (separate rng
    # stream so the base word draw above is bit-identical to v1) —
    # ~80% of docs clear the stops>=2 Gopher rule, the rest fail it,
    # so the fineweb gate filters instead of annihilating (docstring)
    stopwords = ["the", "be", "to", "of", "and", "that", "have", "with"]
    srng = np.random.default_rng(seed + 2)
    n_stops = srng.choice(5, size=n, p=[0.1, 0.1, 0.3, 0.3, 0.2])
    texts, pos = [], 0
    for ln, ns in zip(lens, n_stops):
        doc = [words[w] for w in word_ids[pos:pos + ln]]
        if ns:
            picks = srng.choice(len(stopwords), size=ns, replace=False)
            for sw in picks:
                doc.insert(int(srng.integers(0, len(doc) + 1)),
                           stopwords[sw])
        # sentence punctuation every 5-10 words (same v2 stream): the
        # base vocabulary contains NO `.!?`, so the C4 min_sentences
        # rule would annihilate the funnel exactly like the stopword
        # rule did — short docs still fail it, which keeps the gate a
        # filter rather than a pass-through
        i = 0
        while i < len(doc):
            i += int(srng.integers(5, 11))
            doc[min(i - 1, len(doc) - 1)] += "."
        texts.append(" ".join(doc))
        pos += ln
    # v2: ~2% of docs become NEAR-duplicates of an earlier doc (one
    # word swapped) — a fresh-synthesized corpus has no 0.75-Jaccard
    # pairs at all, so the funnel's fuzzy_dedup stage never fired at
    # sf >= 1; the planted twins make it a real filter while the
    # originals (lower doc_id) survive by the keep-min rule
    n_dup = max(1, n // 50)
    dup_j = srng.choice(np.arange(1, n), size=n_dup, replace=False)
    for j in dup_j:
        src_i = int(srng.integers(0, j))          # twin an EARLIER doc
        tw = texts[src_i].split(" ")
        tw[int(srng.integers(0, len(tw)))] = words[
            int(srng.integers(0, len(words)))]
        texts[j] = " ".join(tw)
    lang = [langs[i] for i in rng.choice(len(langs), size=n, p=p_l)]
    source = [f"src{i}" for i in rng.integers(0, n_src, size=n)]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out_dir}/documents.parquet")


def _synth_embeddings(con, base, out_dir, mult, seed):
    n_base, dim, n_label = con.execute(
        "SELECT count(*), max(len(embedding)), "
        "count(DISTINCT label) FROM "
        f"read_parquet('{base}/embeddings.parquet')"
    ).fetchone()
    n = n_base * mult
    rng = np.random.default_rng(seed + 1)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, n_label, size=n), pa.int32()),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/root/repo/.scale/sf1")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    con = duckdb.connect()
    strides = _strides(con, args.base)
    for t in ("region", "nation"):
        _copy_dim(con, args.base, args.out_dir, t)
        print("dim   ", t)
    for t in _OFFSETS:
        _replicate(con, args.base, args.out_dir, t, args.mult, strides)
        print("x{:<4}".format(args.mult), t)
    _synth_documents(con, args.base, args.out_dir, args.mult, args.seed)
    print("synth  documents")
    _synth_embeddings(con, args.base, args.out_dir, args.mult, args.seed)
    print("synth  embeddings")
    for f in sorted(os.listdir(args.out_dir)):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out_dir}/{f}')"
        ).fetchone()[0]
        print(f"{f:24} {n:>10}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
