"""Generate a larger scale-factor slice by key-shifted replication of the
driver's sf0.1 testdata, so SCALING.md can cover a second decade
(sf0.01 -> sf0.1 -> sf1) for the most expensive bench queries.

Replication rules (k = replica index, 0..factor-1; replica 0 is the
original rows unchanged):

- Fact/dim tables (customer/supplier/part/orders/lineitem/events): every
  surrogate key shifts by k * STRIDE on BOTH sides of each FK, so joins
  stay consistent and per-key cardinalities (orders per customer, lines
  per order, events per user) match the original — the same growth law as
  raising the TPC-H scale factor. STRIDE is a multiple of 15 so existing
  `key % 3` / `% 5` bucketing rules keep their selectivity.
- documents: doc_id shifts; the text of replica k>0 is the same words
  dealt into (k+2) interleaved piles (a deterministic permutation). This
  preserves corpus statistics (vocabulary, lengths, word frequencies) but
  destroys shingle adjacency, so replicas are NOT near-duplicates of the
  original — replicating text verbatim would grow LSH candidate pairs
  quadratically and corrupt the slope measurement with a data artifact.
- embeddings: vec_id shifts; the vector of replica k is np.roll(v, k)
  (norm-preserving direction change), so the ANN corpus grows 10x without
  creating 10 identical copies in every LSH bucket.
- region/nation: fixed-size dims, copied as-is.

Output: <repo>/.scale/sf1/*.parquet (gitignored). Run:
    python tools/make_scale_slice.py [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
STRIDE = 15_000_000  # > any key in sf0.1; divisible by 3 and 5


def replicate_numeric(con, factor: int, out_dir: str) -> None:
    shifted = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in shifted.items():
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"({c} + k.k * {STRIDE})::BIGINT AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"""COPY (
              SELECT {sel}
              FROM '{SRC}/{t}.parquet', (SELECT UNNEST(range({factor})) AS k) k
            ) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"""
        )
        print(f"{t}: x{factor}")


def _deal(words: list[str], piles: int) -> list[str]:
    out: list[str] = []
    for j in range(piles):
        out.extend(words[j::piles])
    return out


def replicate_documents(factor: int, out_dir: str) -> None:
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = tbl["doc_id"].to_pylist()
    text = tbl["text"].to_pylist()
    lang = tbl["lang"].to_pylist()
    source = tbl["source"].to_pylist()
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for k in range(factor):
        for i in range(len(doc_id)):
            ids.append(doc_id[i] + k * STRIDE)
            t = text[i] if k == 0 else " ".join(_deal((text[i] or "").split(" "), k + 2))
            texts.append(t)
            langs.append(lang[i])
            sources.append(source[i])
            n_chars.append(len(t or ""))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(out, f"{out_dir}/documents.parquet")
    print(f"documents: x{factor}")


def replicate_embeddings(factor: int, out_dir: str) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = tbl["vec_id"].to_pylist()
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    label = tbl["label"].to_pylist()
    ids, vecs, labels = [], [], []
    for k in range(factor):
        rolled = np.roll(emb, k, axis=1)
        for i in range(len(vec_id)):
            ids.append(vec_id[i] + k * STRIDE)
            vecs.append(rolled[i].tolist())
            labels.append(label[i])
    out = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(out, f"{out_dir}/embeddings.parquet")
    print(f"embeddings: x{factor}")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = os.path.join(ROOT, ".scale", "sf1")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    replicate_numeric(con, factor, out_dir)
    replicate_documents(factor, out_dir)
    replicate_embeddings(factor, out_dir)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
