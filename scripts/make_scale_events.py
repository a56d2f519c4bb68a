#!/usr/bin/env python3
"""Build an Nx `events` stream table for streaming scale measurements
(SCALE.md round 6: st02/st06 at 100x).

Replica k offsets user_id by k * 10^7 and event_id by k * 10^9, keeping
the TIME RANGE identical — so the scaled stream has Nx the user
population at Nx the event rate, which is how a production stream
actually grows (more concurrent users, not a longer history). Session
state (st02) therefore scales with open sessions (users), and
stream-stream join state (st06) stays bounded by rate x interval —
exactly the two behaviors the measurement is after.

Nanosecond timestamps survive because the columns never leave pyarrow
(pandas would coerce to datetime64 and events.parquet is TIMESTAMP
(NANOS) — the reason sources.Events exists).

Each replica is its own row-group batch through a streaming
ParquetWriter: the file splits into parallel scan tasks and peak
memory stays one replica.

Usage: make_scale_events.py <src_sf_dir> <dst_dir> <N>
(dev/driver-side tooling only — not part of the engine)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

U_OFF = 10_000_000
E_OFF = 1_000_000_000

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
t = pq.read_table(os.path.join(src, "events.parquet"))
out = os.path.join(dst, "events.parquet")
writer = pq.ParquetWriter(out, t.schema)
for k in range(n):
    cols = []
    for name in t.schema.names:
        c = t.column(name)
        if name == "user_id":
            c = pc.add(c, pa.scalar(k * U_OFF, pa.int64()))
        elif name == "event_id":
            c = pc.add(c, pa.scalar(k * E_OFF, pa.int64()))
        cols.append(c)
    writer.write_table(pa.Table.from_arrays(cols, schema=t.schema))
writer.close()
print(f"wrote {t.num_rows * n} events ({n}x {t.num_rows}) to {out}")
