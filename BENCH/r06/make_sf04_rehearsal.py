"""Build the 4x-scale rehearsal dataset used by bench_sf04_rehearsal.json.

The driver's round-end measurement may use a larger driver-generated
scale factor than the committed sf0.1, so this rehearses the full
frozen bench at 4x: four key-shifted copies of every sf0.1 table
(deterministic; key offset 10M per copy). Texts get a one-token per-copy
prefix and embeddings per-copy Gaussian jitter (seed=copy) so exact-dup
clusters do not multiply; interior shingles still repeat across copies,
which makes the rehearsal a dup-HEAVY stress shape for the near-dup
family (every doc gains 3 near-exact copies) rather than a faithful
independent 4x corpus — see OPTIMIZATION_r06.md for the reading.

Usage: python BENCH/r06/make_sf04_rehearsal.py [K]  # default K=4 → /tmp/sfbig/sf0.4
       K=16 writes /tmp/sfbig/sf1.6 and switches the text perturbation
       to a per-WORD copy suffix (every shingle differs across copies —
       an independent-corpus shape; the K=4 one-token prefix leaves
       interior shingles shared, a dup-heavy stress shape).
Then:  SPARK_GRAFT_SF_DIR=/tmp/sfbig/sf0.4 python bench.py
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
DST = f"/tmp/sfbig/sf{K / 10:g}"
OFF = 10_000_000


def shift(tbl, cols, k):
    out = {}
    for name in tbl.column_names:
        col = tbl[name]
        if name in cols and k > 0:
            col = pc.add(col, pa.scalar(k * OFF, type=col.type))
        out[name] = col
    return pa.table(out)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    plain = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
    }
    for t, cols in plain.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(pa.concat_tables([shift(src, cols, k) for k in range(K)]), f"{DST}/{t}.parquet")
    for t in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs["text"].to_pylist()
    parts = []
    for k in range(K):
        t = shift(docs, ["doc_id"], k)
        if k > 0:
            if K > 4:  # per-word suffix: every shingle differs across copies
                suf = f"v{k}"
                newt = [" ".join(w + suf for w in s.split(" ")) if s else s for s in texts]
                txt = pa.array(newt, type=pa.string())
            else:  # one-token prefix: interior shingles shared (dup-heavy)
                txt = pc.binary_join_element_wise(
                    pa.scalar(f"v{k}"), t["text"].combine_chunks().cast(pa.string()), " "
                )
            t = t.set_column(t.column_names.index("text"), "text", txt)
        nch = pc.utf8_length(t["text"]).cast(pa.int64())
        parts.append(t.set_column(t.column_names.index("n_chars"), "n_chars", nch))
    pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb["embedding"].combine_chunks().to_pylist(), dtype=np.float32)
    parts = []
    for k in range(K):
        t = shift(emb, ["vec_id"], k)
        v = vecs.copy()
        if k > 0:
            v = v + np.random.default_rng(k).normal(0, 0.05, v.shape).astype(np.float32)
        arr = pa.array(list(v), type=pa.list_(pa.float32()))
        parts.append(t.set_column(t.column_names.index("embedding"), "embedding", arr))
    pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet")


if __name__ == "__main__":
    main()
