"""Synthesize an sf1 (10x sf0.1) dataset for the scale proof.

/root/testdata is read-only and driver-generated; the scale study needs one
order of magnitude more rows with the SAME schema and distribution family.
Everything here is deterministic (fixed numpy PCG seeds) and derived from
the empirical sf0.1 tables: token unigram/length distributions for
documents (the fixed 31-word vocab means blocked pair counts genuinely go
~100x for 10x docs — the honest quadratic-block stress), per-label
centroid + residual scale for embeddings, empirical categorical
frequencies and numeric ranges for the TPC-style tables.

Usage: python tools/make_scaledata.py [out_dir] [scale]
Defaults: /root/repo/scaledata/sf1, 10x. Output is gitignored.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


N_CHUNKS = 32  # files per table: production lakes are multi-file, and a
# single small parquet file gives Spark exactly ONE scan split — every
# broadcast join downstream then runs on one task (measured: the sf1 doc-
# pair queries collapsed to load-average 1.0 on a 32-core box)


def _write(df: pd.DataFrame, out_dir: str, name: str) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    # Spark 4 rejects TIMESTAMP(NANOS): force microsecond units like the
    # driver's testdata (TIMESTAMP_NTZ micros)
    for c in df.columns:
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    if os.path.isfile(path):
        os.remove(path)
    os.makedirs(path, exist_ok=True)
    step = -(-len(df) // N_CHUNKS)
    for i in range(N_CHUNKS):
        chunk = df.iloc[i * step:(i + 1) * step]
        if len(chunk) == 0:
            break
        chunk.to_parquet(
            os.path.join(path, f"part-{i:05d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    print(f"  {name:12s} {len(df):>9,} rows -> {path} ({N_CHUNKS} files)")


def _empirical(col: pd.Series, rng, n: int) -> np.ndarray:
    vals, counts = np.unique(col.to_numpy(), return_counts=True)
    return rng.choice(vals, size=n, p=counts / counts.sum())


def main(out_dir: str = "/root/repo/scaledata/sf1", scale: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260817)

    # region / nation: dimension tables stay fixed (as in TPC-H)
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
        print(f"  {t:12s} copied")

    # ---- customer ----
    c0 = pd.read_parquet(f"{SRC}/customer.parquet")
    n = len(c0) * scale
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype="int64"),
            "c_name": [f"Customer#{i:09d}" for i in range(n)],
            "c_nationkey": rng.integers(0, 25, n).astype("int32"),
            "c_acctbal": np.round(
                rng.uniform(c0.c_acctbal.min(), c0.c_acctbal.max(), n), 2
            ),
            "c_mktsegment": _empirical(c0.c_mktsegment, rng, n),
        }
    )
    _write(cust, out_dir, "customer")

    # ---- supplier ----
    s0 = pd.read_parquet(f"{SRC}/supplier.parquet")
    n = len(s0) * scale
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(n, dtype="int64"),
            "s_name": [f"Supplier#{i:09d}" for i in range(n)],
            "s_nationkey": rng.integers(0, 25, n).astype("int32"),
            "s_acctbal": np.round(
                rng.uniform(s0.s_acctbal.min(), s0.s_acctbal.max(), n), 2
            ),
        }
    )
    _write(supp, out_dir, "supplier")

    # ---- part ----
    p0 = pd.read_parquet(f"{SRC}/part.parquet")
    n = len(p0) * scale
    adjs = sorted({x.split()[0] for x in p0.p_name})
    nouns = sorted({x.split()[1] for x in p0.p_name})
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype="int64"),
            "p_name": [
                f"{adjs[int(a)]} {nouns[int(b)]}"
                for a, b in zip(
                    rng.integers(0, len(adjs), n), rng.integers(0, len(nouns), n)
                )
            ],
            "p_brand": _empirical(p0.p_brand, rng, n),
            "p_type": _empirical(p0.p_type, rng, n),
            "p_size": rng.integers(1, 51, n).astype("int32"),
            "p_retailprice": np.round(
                900.0 + (np.arange(n) % (len(p0))) * 0.1, 2
            ),
        }
    )
    _write(part, out_dir, "part")

    # ---- orders ----
    o0 = pd.read_parquet(f"{SRC}/orders.parquet")
    n = len(o0) * scale
    dmin, dmax = o0.o_orderdate.min(), o0.o_orderdate.max()
    span_s = int((dmax - dmin).total_seconds())
    odate = dmin + pd.to_timedelta(
        (rng.integers(0, span_s // 86400 + 1, n) * 86400), unit="s"
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": rng.integers(0, len(cust), n).astype("int64"),
            "o_orderstatus": _empirical(o0.o_orderstatus, rng, n),
            "o_totalprice": np.round(
                rng.uniform(o0.o_totalprice.min(), o0.o_totalprice.max(), n), 2
            ),
            "o_orderdate": odate,
            "o_orderpriority": _empirical(o0.o_orderpriority, rng, n),
        }
    )
    _write(orders, out_dir, "orders")

    # ---- lineitem ----
    l0 = pd.read_parquet(f"{SRC}/lineitem.parquet")
    n = len(l0) * scale
    smin, smax = l0.l_shipdate.min(), l0.l_shipdate.max()
    sdays = int((smax - smin).total_seconds()) // 86400
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, len(orders), n).astype("int64"),
            "l_partkey": rng.integers(0, len(part), n).astype("int64"),
            "l_suppkey": rng.integers(0, len(supp), n).astype("int64"),
            "l_linenumber": rng.integers(1, 8, n).astype("int32"),
            "l_quantity": rng.integers(1, 51, n).astype("float64"),
            "l_extendedprice": np.round(
                rng.uniform(l0.l_extendedprice.min(),
                            l0.l_extendedprice.max(), n), 2
            ),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
            "l_returnflag": _empirical(l0.l_returnflag, rng, n),
            "l_linestatus": _empirical(l0.l_linestatus, rng, n),
            "l_shipdate": smin + pd.to_timedelta(
                rng.integers(0, sdays + 1, n) * 86400, unit="s"
            ),
        }
    )
    _write(li, out_dir, "lineitem")

    # ---- events ----
    e0 = pd.read_parquet(f"{SRC}/events.parquet")
    n = len(e0) * scale
    tmin = e0.ts.min()
    span_us = int((e0.ts.max() - tmin).total_seconds() * 1e6)
    # same wall-clock window, 10x users → per-user event rate preserved
    # (sessionization gap structure scales by entity count, not density)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": tmin + pd.to_timedelta(
                np.sort(rng.integers(0, span_us, n)), unit="us"
            ),
            "user_id": rng.integers(
                0, e0.user_id.nunique() * scale, n
            ).astype("int64"),
            "event_type": _empirical(e0.event_type, rng, n),
            "value": np.round(
                rng.uniform(e0.value.min(), e0.value.max(), n), 2
            ),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)],
        }
    )
    _write(ev, out_dir, "events")

    # ---- documents ----
    d0 = pd.read_parquet(f"{SRC}/documents.parquet")
    n = len(d0) * scale
    toks0 = d0.text.str.strip().str.split()
    vocab, vcounts = np.unique(
        np.concatenate(toks0.to_numpy()), return_counts=True
    )
    lens = toks0.str.len().to_numpy()
    new_lens = rng.choice(lens, size=n)
    flat = rng.choice(vocab, size=int(new_lens.sum()),
                      p=vcounts / vcounts.sum())
    texts = []
    off = 0
    for ln in new_lens:
        texts.append(" ".join(flat[off:off + ln]))
        off += ln
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": _empirical(d0.lang, rng, n),
            "source": [f"src{int(s)}" for s in
                       rng.integers(0, d0.source.nunique(), n)],
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    _write(docs, out_dir, "documents")

    # ---- embeddings ----
    emb0 = pd.read_parquet(f"{SRC}/embeddings.parquet")
    n = len(emb0) * scale
    mat0 = np.vstack(emb0.embedding.to_numpy()).astype("float64")
    labels0 = emb0.label.to_numpy()
    centroids = {
        int(lab): mat0[labels0 == lab].mean(axis=0)
        for lab in np.unique(labels0)
    }
    resid_std = float(
        np.mean([mat0[labels0 == lab].std(axis=0).mean()
                 for lab in centroids])
    )
    new_labels = _empirical(emb0.label, rng, n).astype("int32")
    base = np.vstack([centroids[int(lab)] for lab in new_labels])
    vecs = base + rng.normal(0.0, resid_std, size=base.shape)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [row.astype("float32") for row in vecs],
            "label": new_labels,
        }
    )
    _write(emb, out_dir, "embeddings")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    sc = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, sc)
