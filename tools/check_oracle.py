"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and values
(columns sorted by name, rows sorted, exact equality; doubles compared
bit-for-bit — our determinism contract promises it).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}")
        return problems
    if problems:
        return problems
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
            eq = (sv.values == dv.values) | (pd.isna(sv.values) & pd.isna(dv.values))
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {bad} float mismatches, first at row {idx}: "
                    f"{sv.iloc[idx]!r} vs {dv.iloc[idx]!r} (diff {abs(sv.iloc[idx]-dv.iloc[idx])})"
                )
        else:
            eq = sv.astype(str).values == dv.astype(str).values
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {bad} mismatches, first at row {idx}: "
                    f"{sv.iloc[idx]!r} vs {dv.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from terrorblade_spark.registry import get_oracles, get_queries
    from terrorblade_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    from terrorblade_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = get_queries(), get_oracles()
    failed = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} rows): " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
