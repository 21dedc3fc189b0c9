#!/usr/bin/env python3
"""Side-by-side check of selected queries() entries vs their oracle_sql()
on DuckDB — the driver's CORRECTNESS gate in miniature.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
Defaults: sf0.001, all queries. Prints RESULT <name> ok|MISMATCH per query.
"""

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:]


def main():
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", SF)
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from document_quality_assessment_ocr_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in ["documents", "lineitem", "events", "embeddings", "orders",
              "customer", "part", "supplier", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    names = ONLY or [n for n in qs if n in oracles]
    bad = 0
    for name in names:
        # a typo'd name must not read as a semantic MISMATCH (q100/q90
        # false-alarm lesson): fail loudly as UNKNOWN instead
        if name not in qs or name not in oracles:
            bad += 1
            print(f"RESULT {name} UNKNOWN-QUERY (not in registry)")
            continue
        try:
            sdf = qs[name](spark, SF).toPandas()
            odf = con.execute(oracles[name]).df()
            cols = sorted(sdf.columns)
            assert cols == sorted(odf.columns), f"cols {list(sdf.columns)} vs {list(odf.columns)}"
            s = sdf[cols].sort_values(cols).reset_index(drop=True)
            o = odf[cols].sort_values(cols).reset_index(drop=True)
            assert s.shape == o.shape, f"shape {s.shape} vs {o.shape}"
            for c in cols:
                a, b = s[c], o[c]
                # The driver's value-hash is representation-sensitive: a
                # DuckDB HUGEINT materializing as float64 against Spark's
                # int64 hash-mismatches even when values are equal (q20/q41
                # lesson).  Flag exactly that trap class — integer on one
                # side, float on the other.  (Decimal-object vs float64 is
                # known driver-green: q04.)
                kinds = {a.dtype.kind, b.dtype.kind}
                assert not (kinds & {"i", "u"} and "f" in kinds), (
                    f"DTYPE drift in column {c}: spark {a.dtype} vs oracle {b.dtype}"
                )
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    ok = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
                else:
                    ok = (a.astype(str) == b.astype(str)).all()
                assert ok, f"values differ in column {c}"
            print(f"RESULT {name} ok rows={len(s)}")
        except Exception as e:
            bad += 1
            print(f"RESULT {name} MISMATCH: {e}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
