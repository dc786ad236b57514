"""Mimic the driver's correctness gate locally: run each __spark_entry__
query on Spark and its oracle on DuckDB over the same sf dir, compare
row-count, column names, and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWCOUNT MISMATCH spark={len(spark_pdf)} duck={len(duck_pdf)}"
    cols = sorted(spark_pdf.columns)

    def _canon_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort on a ROUNDED view of float columns: raw floats as sort
        # keys let a sub-tolerance (<1e-9) engine difference reorder two
        # near-equal rows, misaligning the row-wise compare into a false
        # VALUE MISMATCH on some other column. 6-decimal keys make the
        # orderings agree wherever the values agree within tolerance
        # (the engine's own display contract rounds scores to 6).
        keyed = pdf[cols].copy()
        key_cols = []
        for c in cols:
            if np.issubdtype(keyed[c].to_numpy().dtype, np.floating):
                keyed[f"_k_{c}"] = keyed[c].round(6)
                key_cols.append(f"_k_{c}")
            else:
                key_cols.append(c)
        return (keyed.sort_values(key_cols, kind="mergesort")
                .reset_index(drop=True)[cols])

    a = _canon_sorted(spark_pdf)
    b = _canon_sorted(duck_pdf)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
            )
        else:
            ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
        if not ok:
            bad = np.flatnonzero(pd.Series(av).astype(str).to_numpy()
                                 != pd.Series(bv).astype(str).to_numpy())[:3]
            detail = [(int(i), av[i], bv[i]) for i in bad]
            return f"VALUE MISMATCH col={c} examples(spark,duck)={detail}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from jvector_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            # a typo'd name silently matching nothing would exit 0 — a
            # false PASS from the gate-replication tool
            print(f"UNKNOWN QUERY NAME(S): {unknown} "
                  f"(known: {sorted(qs)[:8]}...)")
            return 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:24s} SPARK ERROR: {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(spdf)} (no oracle; rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name:24s} DUCK ERROR: {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        try:
            verdict = compare(name, spdf, dpdf)
        except Exception as ex:  # malformed result: count ONE failure,
            verdict = f"COMPARE ERROR: {type(ex).__name__}: {str(ex)[:200]}"
        print(f"{name:24s} rows={len(spdf)} {verdict} [{time.time()-t0:.1f}s]")
        if verdict != "OK":
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
