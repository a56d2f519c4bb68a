#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate:
run each oracle_sql.json entry in DuckDB over the sf parquet tables and
compare with the Spark results dumped by graft.Verify.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [q1,q2,...]
(the optional third arg restricts the check to the named queries — dev
iteration aid, mirrors Verify's SPARK_GRAFT_ONLY)
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Types the driver's harness serializes identically to Spark. Anything
# outside this set (HUGEINT above all — DuckDB promotes SUM(BIGINT) and
# propagates through `//`) hashes differently driver-side even when the
# values are numerically identical (the round-9 six-red root cause), and
# `str()`-canonicalization below can never catch it. Fail loudly instead.
PORTABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


def type_audit(name, duck_rel):
    bad = [f"{c}:{t}" for c, t in zip(duck_rel.columns, duck_rel.types)
           if str(t) not in PORTABLE_TYPES]
    if bad:
        print(f"FAIL {name}: non-portable oracle column types "
              f"{bad} — CAST to a portable type (e.g. BIGINT)")
    return not bad


def canon(rows, cols):
    """Sort columns by name, then rows; stringify values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet"
            # multi-file fixture dirs (sf1 documents/embeddings) need a
            # glob; single-file fixtures read the file path directly
            + ("/*.parquet'" if os.path.isdir(f"{sf_dir}/{t}.parquet")
               else "'"))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            if not type_audit(name, duck_rel):
                n_fail += 1
                continue
            d_cols, d_rows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None))
