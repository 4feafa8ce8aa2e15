#!/usr/bin/env python3
"""Composed adversarial corpus (r14 verdict item 1): ONE sf dir that
stacks all three independently-proven adversarial axes so their
INTERACTIONS get swept —

  1. hostile VALUES  (gen_hostile_sf.py: NULLs, extremes, malformed
     JSON, NaN/Inf vectors, whitespace strings — keys protected),
  2. multilingual DOCUMENTS (gen_unicode_docs.py corpus UNIONed into
     the hostile documents table with offset doc_ids, so one table
     carries null/whitespace/4000-char hostile rows AND CJK/RTL/emoji/
     combining-mark rows at once),
  3. adversarial LAYOUT (make_layout_variant.py: seeded row shuffle +
     uneven multi-file split + small row groups, applied LAST so the
     composed values land in the hostile physical layout).

Each lane passed alone in r13; the composed sweep is where contract
interactions break (e.g. null-text exclusion meeting the one-part
streaming staging rewrite under a shuffled multi-file arrival).

check.py runs the DuckDB oracles over the SAME composed files, so any
divergence is an engine contract gap, not data drift.

NOT part of the shipped library — driver-side python for the dev loop
only (same license as check.py).

Usage: python3 scripts/gen_composed_sf.py SRC_DIR DST_DIR [SEED]
"""
import os, subprocess, sys, tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
UNI_DOC_ID_OFFSET = 100000  # far beyond any sf doc_id; keeps ids unique


def main():
    src, dst = sys.argv[1], sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 151515
    with tempfile.TemporaryDirectory(prefix="graft_composed_") as work:
        stage = os.path.join(work, "stage")
        unidir = os.path.join(work, "uni")
        # axis 1: hostile values over every table (keys protected)
        subprocess.run([sys.executable, os.path.join(HERE, "gen_hostile_sf.py"),
                        src, stage, str(seed)], check=True)
        # axis 2: union the multilingual probe corpus into documents
        subprocess.run([sys.executable, os.path.join(HERE, "gen_unicode_docs.py"),
                        unidir], check=True)
        hostile_docs = pq.read_table(os.path.join(stage, "documents.parquet"))
        uni = pq.read_table(os.path.join(unidir, "documents.parquet"))
        uni = uni.set_column(
            uni.schema.get_field_index("doc_id"), "doc_id",
            pa.compute.add(uni.column("doc_id"), UNI_DOC_ID_OFFSET))
        merged = pa.concat_tables(
            [hostile_docs, uni.cast(hostile_docs.schema)])
        pq.write_table(merged, os.path.join(stage, "documents.parquet"))
        # axis 3: adversarial physical layout over the composed values
        subprocess.run([sys.executable, os.path.join(HERE, "make_layout_variant.py"),
                        stage, dst, str(seed + 1)], check=True)
    print(f"composed corpus at {dst}: hostile seed {seed}, "
          f"{merged.num_rows} documents ({uni.num_rows} multilingual), "
          f"layout seed {seed + 1}")


if __name__ == "__main__":
    main()
