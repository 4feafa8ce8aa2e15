#!/usr/bin/env python3
"""Build a hostile-VALUES copy of a testdata sf dir: same schema, same
keys (join/group structure preserved), but attribute columns injected
with the value classes the benign gate corpus never contains — NULLs,
zeros, negatives, magnitude extremes, boundary dates/timestamps, empty
and whitespace strings, malformed JSON, zero/empty/NaN/Inf embedding
vectors. The numeric analog of the r13 unicode probe: run Verify +
check.py against this dir and every divergence is a byte-level
null/extreme contract gap between the engine and its oracle, invisible
on the clean corpus.

Injection is seeded and per-row sparse (most rows stay benign) so query
outputs remain non-trivial. Key columns are never touched.

NOT part of the shipped library — driver-side python (pyarrow/numpy)
for the dev loop only (same license as check.py).

Usage: python3 scripts/gen_hostile_sf.py SRC_DIR DST_DIR [SEED]
"""
import os, sys, shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# columns that are identity/join/time structure: never injected
PROTECTED = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "ts", "doc_id", "vec_id",
    # date columns drive window/cohort/band-join structure AND parquet
    # date32 vs timestamp footers differ across engines at extremes —
    # covered separately if ever needed; keep time structure benign
    "o_orderdate", "l_shipdate",
}

HOSTILE_STR = [None, "", " ", "\t", "a" * 4000, "null", "NULL", "'",
               '"', "0", "-1", "NaN"]
HOSTILE_JSON = [None, "", "{", "not json", "[]", "{}",
                '{"k":null}', '{"k":"v"', '{"k": 1e309}']


def main():
    src, dst = sys.argv[1], sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 424242
    rng = np.random.default_rng(seed)
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in PROTECTED or n == 0:
                cols[name] = col
                continue
            typ = col.type
            vals = col.to_pylist()
            # ~12% of rows per column get a hostile value, drawn per class
            hit = rng.random(n) < 0.12
            if pa.types.is_floating(typ) or pa.types.is_decimal(typ):
                # magnitude/sign/null hostility INSIDE the engine's
                # documented precision domain (monetary doubles carry <=4
                # fractional digits — Exact.dec's scaladoc): >4-decimal
                # doubles round to the scale-4 grid through engine-specific
                # paths that may land one quantum apart on print-ties, a
                # documented non-gated boundary
                choices = [None, 0.0, -0.0, -1.5, 0.0001, -987654.3219,
                           12345678.9876, 1e9]
                for i in np.flatnonzero(hit):
                    vals[i] = choices[rng.integers(len(choices))]
            elif pa.types.is_integer(typ):
                choices = [None, 0, -1, -999999, 2**31 - 1]
                for i in np.flatnonzero(hit):
                    vals[i] = choices[rng.integers(len(choices))]
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                pool = HOSTILE_JSON if name == "props" else HOSTILE_STR
                for i in np.flatnonzero(hit):
                    vals[i] = pool[rng.integers(len(pool))]
            elif pa.types.is_list(typ) and pa.types.is_floating(typ.value_type):
                dim = len(vals[0]) if vals and vals[0] is not None else 0
                for i in np.flatnonzero(hit):
                    k = rng.integers(6)
                    if k == 0:
                        vals[i] = None
                    elif k == 1:
                        vals[i] = []                       # empty vector
                    elif k == 2:
                        vals[i] = [0.0] * dim              # zero vector
                    elif k == 3:
                        v = list(vals[i]); v[0] = float("nan"); vals[i] = v
                    elif k == 4:
                        v = list(vals[i]); v[0] = float("inf")
                        v[-1] = float("-inf"); vals[i] = v
                    else:
                        vals[i] = list(vals[i])[: max(1, dim // 2)]  # jagged
            else:
                cols[name] = col
                continue
            cols[name] = pa.array(vals, type=typ)
        out = pa.table({c: cols[c] for c in tbl.column_names})
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {n} rows hostile-injected")


if __name__ == "__main__":
    main()
