"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same sf dir, compare row count + schema-width + order-insensitive values.

Usage:  python tests/compare_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so Spark/DuckDB containers compare equal
    def canon(v):
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        try:
            import numpy as np

            if isinstance(v, np.ndarray):
                return tuple(canon(x) for x in v.tolist())
            if isinstance(v, np.generic):
                return v.item()
        except ImportError:
            pass
        if isinstance(v, dict):
            return tuple(sorted((k, canon(x)) for k, x in v.items()))
        if v is pd.NaT:
            return None
        if isinstance(v, float) and pd.isna(v):
            return None
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return None
        return v

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), kind="mergesort", na_position="first").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as entrymod
    from eventkit_spark.session import get_spark

    spark = get_spark("compare_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        checked += 1
        try:
            sp_df = fn(spark, sf_dir)
            # the DRIVER's canonicalizer sorts all columns with pandas
            # sort_values, which cannot sort array/map/struct cells —
            # a complex-typed contract output is a guaranteed harness
            # ERR row even when the values are right (r5's
            # embed_standardize). Fail loudly here first.
            complex_cols = [
                f.name
                for f in sp_df.schema.fields
                if f.dataType.simpleString().startswith(
                    ("array", "map", "struct")
                )
            ]
            if complex_cols and name in oracles:
                failures.append((name, f"complex output cols {complex_cols}"))
                print(
                    f"FAIL {name}: complex-typed contract output "
                    f"{complex_cols} — the driver canon cannot sort these; "
                    "flatten (posexplode / serialize) the contract form"
                )
                continue
            sdf = sp_df.toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: spark error {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL {name}: duckdb error {str(exc)[:300]}")
            continue
        if len(sdf) != len(ddf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(ddf)}"))
            print(f"FAIL {name}: rowcount spark={len(sdf)} duckdb={len(ddf)}")
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append((name, f"schema {sorted(sdf.columns)} vs {sorted(ddf.columns)}"))
            print(f"FAIL {name}: schema spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        if not a.equals(b):
            diff_idx = None
            for i in range(len(a)):
                if not a.iloc[i].equals(b.iloc[i]):
                    diff_idx = i
                    break
            failures.append((name, f"values differ at sorted row {diff_idx}"))
            print(f"FAIL {name}: values differ; first diff at sorted row {diff_idx}")
            if diff_idx is not None:
                print("  spark :", a.iloc[diff_idx].to_dict())
                print("  duckdb:", b.iloc[diff_idx].to_dict())
            continue
        print(f"PASS {name} ({len(sdf)} rows)")

    # under a name filter, report what actually RAN — "0 failures /
    # 265" when 13 ran overstates what the run verified (r9 VERDICT)
    print(f"\n{len(failures)} failures / {checked} checked / {len(qs)} registered")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
