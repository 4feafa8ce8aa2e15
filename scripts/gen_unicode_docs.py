#!/usr/bin/env python3
"""Unicode parity probe corpus (dev loop; driver-side python is allowed).

Writes <outdir>/documents.parquet (default /tmp/unisf) with ~415 seeded
multilingual/adversarial documents in the driver's documents schema:
CJK, Cyrillic, Greek, Hebrew, combining marks, astral-plane emoji,
exotic whitespace, ligatures, Turkish dotted/dotless i, plus seeded
random mixtures. The driver's own corpus is 100% ASCII, so
byte/character/codepoint confusions hash-green on the normal gate and
only surface here.

Probe procedure (the r13 unicode parity probe):
  python3 scripts/gen_unicode_docs.py
  for t in region nation customer supplier part orders lineitem events \
      embeddings; do ln -sf /root/testdata/sf0.001/$t.parquet /tmp/unisf/; done
  SPARK_GRAFT_ONLY=<documents-consuming queries> \
    sbt -batch "runMain graft.Verify /tmp/unisf /tmp/verify_uni"
  python3 scripts/check.py /tmp/unisf /tmp/verify_uni <same queries>
Expected: all hash-green. The in-suite half is UnicodeParitySpec.
"""
import sys
import pyarrow as pa, pyarrow.parquet as pq, random, os
rnd = random.Random(20260815)
alphabets = [
    list("abcdefghijklmnopqrstuvwxyz ") ,
    list("äöüßéèñçøå "),
    list("абвгдежзийкл "),
    list("一二三四五六七八九十汉字测试 "),
    list("αβγδεζηθικλμ "),
    ["\U0001F600", "\U0001F389", "\U0001F680", "\U0001F9EA",
     "\U0001F44D\U0001F3FD", "\U0001F1FA\U0001F1F3", " "],
    list("אבגדהוזחטיכל "),
    [" ", "\t", "\n", " ", " ", "x"],
]
structured = ["", " ", "a", "a"*3000,
              "\U0001F600"*5, "一二三四五", "é"*5,
              "mixed 汉字 and ascii with emoji \U0001F680 and rtl אבגד end",
              "Turkish İstanbul ı I dotless",
              "ﬃ ligature ﬄ", "ǅungla titlecase",
              "nbsp separated words",
              "zero\u200Bwidth\u200Bjoined",
              "CRLF\r\nline\r\nends",
              "combining á é ó marks"]
texts = list(structured)
for i in range(400):
    alpha = rnd.choice(alphabets)
    n = rnd.randrange(0, 300)
    texts.append("".join(rnd.choice(alpha) for _ in range(n)))
langs = ["en","de","ru","zh","el","xx","he"]
rows = {
    "doc_id": list(range(1, len(texts)+1)),
    "text": texts,
    "lang": [langs[i % len(langs)] for i in range(len(texts))],
    "source": ["uni-probe" if i%3 else "web" for i in range(len(texts))],
    "n_chars": [len(t) for t in texts],
}
outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unisf"
os.makedirs(outdir, exist_ok=True)
schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                    ("lang", pa.string()), ("source", pa.string()), ("n_chars", pa.int64())])
pq.write_table(pa.table(rows, schema=schema), outdir + "/documents.parquet")
print("wrote", len(texts), "docs")
