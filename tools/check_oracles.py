"""Mimic the driver's correctness gate: run every benchqueries entry on Spark
and its DuckDB oracle at the given SF dir; compare row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted)."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from ontologymatching_spark import benchqueries as B  # noqa: E402
from ontologymatching_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: str(v))
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("int64")
    pdf = pdf.sort_values(cols).reset_index(drop=True)
    h = hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]
    return len(pdf), cols, h


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    names = only or list(B.QUERIES)
    fails = 0
    for name in names:
        try:
            if name not in B.ORACLE_SQL:
                n = B.QUERIES[name](spark, sf_dir).count()
                print(f"ROWS {name:28s} spark={n} (rows-only: no SQL oracle)")
                continue
            got = B.QUERIES[name](spark, sf_dir).toPandas()
            want = con.execute(B.ORACLE_SQL[name]).df()
            ng, cg, hg = canon(got)
            nw, cw, hw = canon(want)
            ok = (ng, cg, hg) == (nw, cw, hw)
            print(f"{'OK  ' if ok else 'FAIL'} {name:28s} spark={ng} duck={nw} "
                  f"hash={'match' if hg == hw else f'{hg}!={hw}'} "
                  f"{'' if cg == cw else f'cols {cg} vs {cw}'}")
            if not ok:
                fails += 1
                if ng and nw and cg == cw:
                    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                    w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
                    if len(g) == len(w):
                        for c in g.columns:
                            gs, ws = g[c], w[c]
                            try:
                                neq = (gs.astype(str) != ws.astype(str)).sum()
                            except Exception:
                                neq = "?"
                            if neq:
                                print(f"      col {c}: {neq} mismatched cells; "
                                      f"sample got={gs[gs.astype(str)!=ws.astype(str)].head(2).tolist()} "
                                      f"want={ws[gs.astype(str)!=ws.astype(str)].head(2).tolist()}")
                    else:
                        print(f"      row diff: got-extra={len(g)-len(w)}")
        except Exception as ex:
            fails += 1
            print(f"ERR  {name:28s} {type(ex).__name__}: {str(ex)[:300]}")
    print(f"\n{len(names) - fails}/{len(names)} queries match")
    return fails


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, only) else 0)
