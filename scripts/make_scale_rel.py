#!/usr/bin/env python3
"""Build an Nx relational corpus for scale measurements (SCALE.md).

Replicates customer/supplier/orders/lineitem N times with OFFSET KEYS
(replica k shifts every key family by k * 10^7), so join fan-out and
group cardinality scale linearly — "Nx more data", not "N copies of
the same keys" (colliding keys would multiply join matches N-fold and
measure a dataset no real warehouse has). Bounded dims (nation,
region, part) stay 1x, exactly as they would at 100 TB.

Each replica is written as its own row-group batch through a streaming
ParquetWriter: the output file splits into N parallel scan tasks, and
peak memory stays one replica regardless of N.

Usage: make_scale_rel.py <src_sf_dir> <dst_dir> <N>
(dev/driver-side tooling only — not part of the engine)
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000
# key columns shifted per replica, per table
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey"],
}
COPY = ["nation", "region", "part"]

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
for t in COPY:
    shutil.copyfile(os.path.join(src, f"{t}.parquet"),
                    os.path.join(dst, f"{t}.parquet"))
for t, keys in SHIFTS.items():
    tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
    out = os.path.join(dst, f"{t}.parquet")
    writer = pq.ParquetWriter(out, tab.schema)
    for k in range(n):
        r = tab
        for key in keys:
            i = r.schema.get_field_index(key)
            col = r.column(i)
            shifted = pc.cast(pc.add(col, k * OFF), col.type)
            r = r.set_column(i, r.schema.field(i), shifted)
        writer.write_table(r)
    writer.close()
    print(f"{t}: wrote {tab.num_rows * n} rows ({n}x {tab.num_rows})")
