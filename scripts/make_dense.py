"""Materialize the DENSE-GRAPH variant: real-volume evidence that the
graph/cluster local-finish caps flip to their DISTRIBUTED paths naturally
(VERDICT r12 directive 3).

The ~sf1 replica (scripts/make_sf1.py) verified values for the whole
registry, but its mutual-kNN graph (27,610 edges) and minhash-pair edge set
(139,407) sit far under the 1M local-finish caps, so dd_cluster / gr_kcore /
gr_bfs / gr_linkpred / gr_label_prop only ever ran their bounded driver
finishes there; the distributed paths had caps-forced-OFF equality evidence
only. This variant pushes BOTH edge sets past 1M so the distributed paths
run because the data demands it:

- lineitem: {R_LI} isomorphic offset-copies of sf0.1's (l_orderkey,
  l_suppkey) projection. The mutual-kNN build is degree-bounded (top-{{TRI_K}}
  per node before the mutuality filter), so edge count scales ONLY with
  node count — sf0.1 yields exactly 2,761 mutual edges per copy, giving
  {R_LI} x 2,761 = {EDGES} > 1,000,000. Only the two graph columns are
  written ({R_LI} x 600k = 240M rows); the graph queries prune to exactly
  these, and no other query runs against this dir.
- documents: {R_DOC} copies of sf0.1's docs with a LIGHT perturbation (a
  per-replica suffix token) instead of make_sf1's full word shuffle: 5-char
  shingle sets stay near-identical, so every replica family is a genuine
  minhash near-dup clique and the LSH pair set multiplies combinatorially
  (measured ~2M edges at R_DOC=12) instead of linearly.
- every other table: copied from sf0.1 verbatim (load_table safety; the
  dense dir is only ever read by the graph/cluster queries).

The dir is IMMUTABLE once generated (deterministic, seedless — pure
offsets + a constant suffix), so plan/count memos may treat it like
/root/testdata (scripts/dense_graph_check.py opts in explicitly).

Usage: python scripts/make_dense.py [out_dir]   (default /tmp/orc_dense)
Skips generation when out_dir already holds the expected row counts.
"""

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
R_LI = 400  # lineitem copies: 400 x 2,761 mutual edges = 1,104,400 > 1M cap
R_DOC = 16  # document copies: identical cliques + near-dup families — at 12
# the >=0.5-filtered LSH edge set measured 562k (sym rows ~1.18M, an 18%
# margin over the CC cap); 16 raises the identical cliques alone to
# 5k x C(16,2) = 600k and the measured edge set comfortably past 1M

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "events", "embeddings",
]


def _expected(out_dir: str) -> bool:
    try:
        li = pq.read_metadata(os.path.join(out_dir, "lineitem.parquet")).num_rows
        dc = pq.read_metadata(os.path.join(out_dir, "documents.parquet")).num_rows
        src_li = pq.read_metadata(os.path.join(SRC, "lineitem.parquet")).num_rows
        src_dc = pq.read_metadata(os.path.join(SRC, "documents.parquet")).num_rows
        return li == R_LI * src_li and dc == R_DOC * src_dc
    except Exception:  # noqa: BLE001 — any unreadable state → regenerate
        return False


def make_dense(out_dir: str = "/tmp/orc_dense") -> str:
    if _expected(out_dir):
        print(f"{out_dir} already materialized; skipping")
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # --- lineitem: R_LI offset-copies of the 2-column graph projection ---
    li = pq.read_table(
        os.path.join(SRC, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey"],
    )
    ok = li["l_orderkey"].to_numpy().astype(np.int64)
    sk = li["l_suppkey"].to_numpy().astype(np.int64)
    ok_span = int(ok.max()) + 1
    sk_span = int(sk.max()) + 1
    schema = pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())])
    with pq.ParquetWriter(
        os.path.join(out_dir, "lineitem.parquet"), schema
    ) as w:
        # 20 copies per row group: 12M rows/group keeps groups scan-sized
        for base in range(0, R_LI, 20):
            chunk_o, chunk_s = [], []
            for rep in range(base, min(base + 20, R_LI)):
                chunk_o.append(ok + rep * ok_span)
                chunk_s.append(sk + rep * sk_span)
            w.write_table(
                pa.table(
                    {
                        "l_orderkey": np.concatenate(chunk_o),
                        "l_suppkey": np.concatenate(chunk_s),
                    },
                    schema=schema,
                )
            )
    print(f"lineitem: {R_LI} x {len(ok)} rows written")

    # --- documents: R_DOC lightly-perturbed copies ---
    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    did_span = int(docs["doc_id"].max()) + 1
    out = []
    for rep in range(R_DOC):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + rep * did_span
        suffix = f" qq{rep:02d}"
        d["text"] = d["text"].map(
            lambda t, s=suffix: (t + s) if isinstance(t, str) else t
        )
        d["n_chars"] = d["text"].map(
            lambda t: len(t) if isinstance(t, str) else 0
        )
        out.append(d)
    import pandas as pd

    dense_docs = pd.concat(out, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(dense_docs, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
    )
    print(f"documents: {R_DOC} x {len(docs)} rows written")

    for t in COPY_TABLES:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    print(f"copied {len(COPY_TABLES)} unscaled tables")
    return out_dir


if __name__ == "__main__":
    make_dense(sys.argv[1] if len(sys.argv) > 1 else "/tmp/orc_dense")
