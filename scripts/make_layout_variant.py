#!/usr/bin/env python3
"""Build a layout-variant copy of a testdata sf dir for the
layout-invariance sweep: same rows per table, adversarially different
physical layout — seeded row shuffle, uneven multi-file split, small row
groups. Every gated query must produce the identical result multiset on
the variant (check.py compares vs the DuckDB oracle over the SAME
variant files, so any divergence is engine layout-sensitivity, not data
drift).

NOT part of the shipped library — driver-side python (pyarrow/numpy) is
allowed for the dev loop only (same license as check.py).

Usage: python3 scripts/make_layout_variant.py SRC_DIR DST_DIR [SEED]
"""
import os, sys, shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    src, dst = sys.argv[1], sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1013
    rng = np.random.default_rng(seed)
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        sp = f"{src}/{t}.parquet"
        dp = f"{dst}/{t}.parquet"
        tbl = pq.read_table(sp)
        n = tbl.num_rows
        perm = rng.permutation(n)
        tbl = tbl.take(pa.array(perm))
        if os.path.isdir(dp):
            shutil.rmtree(dp)
        # Tiny tables stay single-file; bigger ones get an UNEVEN split
        # (a near-empty shard + a dominant shard stress first/limit/
        # partition-count assumptions harder than an even split).
        if n < 64:
            os.makedirs(dp, exist_ok=True)
            pq.write_table(tbl, f"{dp}/part-00000.parquet",
                           row_group_size=max(1, n))
        else:
            nparts = 7
            # uneven cut points: weights 1,1,2,3,5,8,13 (fibonacci-ish)
            w = np.array([1, 1, 2, 3, 5, 8, 13], dtype=float)
            cuts = (np.cumsum(w / w.sum()) * n).astype(int)[:-1]
            os.makedirs(dp, exist_ok=True)
            for i, part in enumerate(np.split(np.arange(n), cuts)):
                sub = tbl.take(pa.array(part))
                pq.write_table(sub, f"{dp}/part-{i:05d}.parquet",
                               row_group_size=max(1, min(997, len(part))))
        print(f"{t}: {n} rows -> {dp} ({len(os.listdir(dp))} files)")

if __name__ == "__main__":
    main()
