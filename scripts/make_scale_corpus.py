#!/usr/bin/env python3
"""Build an Nx `documents` corpus for scale measurements (SCALE.md).

Replicates <src_sf_dir>/documents.parquet N times with a DISTINCT token
vocabulary per replica (every token prefixed `r<k>_`) and offset doc_ids,
so document-frequency distributions, shingle hashes and the true
near-dup pair structure scale linearly — "Nx more data", not "N copies
of the same data" (N copies would make every shingle's df explode and
measure a corpus no real pipeline has).

Output is written with bounded row groups so Spark can split the scan
into parallel tasks (a single-row-group file pins the whole scan to one
core regardless of maxPartitionBytes).

Usage: make_scale_corpus.py <src_sf_dir> <dst_dir> <N>
(dev/driver-side tooling only — not part of the engine)
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
df = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
replicas = []
for k in range(n):
    r = df.copy()
    r["doc_id"] = r["doc_id"] + k * 10_000_000
    pref = f"r{k}_"
    r["text"] = [" ".join(pref + w for w in s.split(" ")) for s in r["text"]]
    replicas.append(r)
big = pd.concat(replicas, ignore_index=True)
pq.write_table(
    pa.Table.from_pandas(big, preserve_index=False),
    os.path.join(dst, "documents.parquet"),
    row_group_size=16384,
)
print(f"wrote {len(big)} docs ({n}x {len(df)}) to {dst}/documents.parquet")

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
    ebig = pd.concat(ereps, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(ebig, preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
        row_group_size=4096,
    )
    print(f"wrote {len(ebig)} vecs ({n}x {len(edf)}) to {dst}/embeddings.parquet")
