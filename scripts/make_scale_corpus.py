#!/usr/bin/env python3
"""Build an Nx `documents` corpus for scale measurements (SCALE.md).

Replicates <src_sf_dir>/documents.parquet N times with a DISTINCT token
vocabulary per replica (every token prefixed `r<k>_`) and offset doc_ids,
so document-frequency distributions, shingle hashes and the true
near-dup pair structure scale linearly — "Nx more data", not "N copies
of the same data" (N copies would make every shingle's df explode and
measure a corpus no real pipeline has).

Output layout (round 12, VERDICT r11 #6): `documents.parquet` and
`embeddings.parquet` are written as DIRECTORIES of part files — four
parts per replica — the multi-file layout a real corpus has. The old
single compact file capped document scans at its row-group count
(4 tasks at sf1), polluting per-query scale ratios with a file-layout
ceiling instead of plan cost; Spark assigns at most one task per
row group, but file count is what guarantees split opportunities at
ANY reader setting. Spark and DuckDB both read the directory
transparently (oracle_check.py globs `dir/*.parquet`).

Usage: make_scale_corpus.py <src_sf_dir> <dst_dir> <N>
(dev/driver-side tooling only — not part of the engine)
"""
import os
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)

PARTS_PER_REPLICA = 4


def write_parts(frames, out_dir, row_group_size):
    """frames: list of per-replica DataFrames → dir of part files."""
    if os.path.isfile(out_dir):
        os.remove(out_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    part = 0
    for r in frames:
        step = max(1, -(-len(r) // PARTS_PER_REPLICA))
        for lo in range(0, len(r), step):
            chunk = r.iloc[lo:lo + step]
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                os.path.join(out_dir, f"part-{part:05d}.parquet"),
                row_group_size=row_group_size,
            )
            part += 1
    return part


df = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
replicas = []
for k in range(n):
    r = df.copy()
    r["doc_id"] = r["doc_id"] + k * 10_000_000
    pref = f"r{k}_"
    r["text"] = [" ".join(pref + w for w in s.split(" ")) for s in r["text"]]
    replicas.append(r)
nparts = write_parts(replicas, os.path.join(dst, "documents.parquet"),
                     row_group_size=4096)
print(f"wrote {n}x {len(df)} docs in {nparts} files to "
      f"{dst}/documents.parquet/")

# Embeddings: replica k rotates each vector by k positions (preserves
# intra-replica cosine/pair structure) and gets a DISTINCT label block
# (label + k*1000) — semantic-cluster population stays constant while
# the codebook grows with the corpus, which is exactly the SemDeDup /
# IVF scaling regime (colliding labels would grow every cluster N-fold
# and measure quadratic pair blowup no trained codebook has).
emb_src = os.path.join(src, "embeddings.parquet")
if os.path.exists(emb_src):
    edf = pq.read_table(emb_src).to_pandas()
    ereps = []
    for k in range(n):
        r = edf.copy()
        r["vec_id"] = r["vec_id"] + k * 10_000_000
        r["label"] = r["label"] + k * 1000
        if k:
            r["embedding"] = [
                list(v[k % len(v):]) + list(v[: k % len(v)])
                for v in r["embedding"]
            ]
        ereps.append(r)
    nparts = write_parts(ereps, os.path.join(dst, "embeddings.parquet"),
                         row_group_size=1024)
    print(f"wrote {n}x {len(edf)} vecs in {nparts} files to "
          f"{dst}/embeddings.parquet/")
