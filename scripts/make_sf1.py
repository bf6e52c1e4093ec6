"""Materialize a ~sf1 replica: 10 decorrelated copies of sf0.1
(VERDICT r10 directive 5 — third scale anchor).

Two scale points (sf0.01 → sf0.1) give one ratio; a third (~sf1) gives a
SLOPE, which is what actually distinguishes a linear plan from a
super-linear one before a 100× bill does. No generator for real sf1
exists in this environment, so we build a replica whose per-table row
counts are exactly 10× sf0.1 and whose JOIN integrity holds:

- every scaled key space (custkey, orderkey, partkey, suppkey, user_id,
  event_id, doc_id, vec_id) gets a per-replica offset of
  rep * (max_key + 1), applied consistently to every table referencing
  it — so orders still join customers, lineitem still joins orders/part/
  supplier, all within the same replica;
- region/nation stay fixed (they are constant-size dimensions at every
  TPC-H scale factor);
- documents.text is WORD-SHUFFLED per replica (numpy RandomState(rep)
  permutation): length / vocabulary / language statistics are preserved.
  Cross-replica similarity then depends on the gram size (measured r13):
  5-char shingles span word boundaries, so cross-replica Jaccard falls
  below the 0.5 minhash threshold and that family sees ~10x independent
  docs (139k pairs at sf1 = 10 x sf0.1's); 3-char grams are mostly
  intra-word and SURVIVE the shuffle, so dd_ngram_jaccard's true pair set
  multiplies combinatorially (631,739 -> 63,418,724 pairs, ~100x) — its
  sf1 timings measure ~100x the output work, not a 10x scale-up;
- embeddings are DIMENSION-PERMUTED per replica (seeded permutation):
  norms and within-replica geometry are exactly preserved, cross-replica
  near-duplicates are destroyed;
- events keep their timestamps (series per user are what scale);
  replica users are new user_ids with identical series shapes.

Timestamps / floats are otherwise untouched — the replica is
deterministic (seeded permutations only), so two generations are
bit-identical and timing runs are comparable.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/orc_sf1)
Skips generation when out_dir already holds the expected row counts.
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPS = 10

# key column -> key space (columns sharing a space share an offset)
KEY_SPACES = {
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "user_id": "user",
    "event_id": "event",
    "doc_id": "doc",
    "vec_id": "vec",
}
FIXED_TABLES = {"region", "nation"}
SCALED_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def _space_offsets(tables: dict[str, pa.Table]) -> dict[str, int]:
    offs: dict[str, int] = {}
    for t in tables.values():
        for col, space in KEY_SPACES.items():
            if col in t.column_names:
                m = int(pa.compute.max(t[col]).as_py() or 0)
                offs[space] = max(offs.get(space, 0), m + 1)
    return offs


def _shuffle_words(texts: list, rep: int) -> list:
    rs = np.random.RandomState(1000 + rep)
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        w = s.split(" ")
        out.append(" ".join(np.array(w, dtype=object)[rs.permutation(len(w))]))
    return out


def _permute_dims(embs: list, rep: int) -> list:
    rs = np.random.RandomState(2000 + rep)
    perm_cache: dict[int, np.ndarray] = {}
    out = []
    for v in embs:
        if v is None:
            out.append(None)
            continue
        a = np.asarray(v, dtype=np.float32)
        p = perm_cache.get(len(a))
        if p is None:
            p = rs.permutation(len(a))
            perm_cache[len(a)] = p
        out.append(a[p])
    return out


def _replicate(name: str, t: pa.Table, offs: dict[str, int], out_dir: str) -> None:
    parts = []
    for rep in range(REPS):
        cols = {}
        for col in t.column_names:
            arr = t[col]
            space = KEY_SPACES.get(col)
            if space is not None and rep > 0:
                arr = pa.compute.add(arr, rep * offs[space])
            cols[col] = arr
        if rep > 0 and name == "documents":
            cols["text"] = pa.array(
                _shuffle_words(t["text"].to_pylist(), rep), type=pa.string()
            )
        if rep > 0 and name == "embeddings":
            cols["embedding"] = pa.array(
                _permute_dims(t["embedding"].to_pylist(), rep),
                type=t.schema.field("embedding").type,
            )
        parts.append(pa.table(cols, schema=None))
    big = pa.concat_tables(parts)
    # cast back to the source schema (compute.add may widen)
    big = big.cast(t.schema)
    pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"))


def main(out_dir: str | None = None) -> None:
    # callable with an explicit out_dir (bench.py's sc1 scaling anchors
    # auto-materialize the replica); CLI argv is the fallback
    if out_dir is None:
        out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orc_sf1"
    os.makedirs(out_dir, exist_ok=True)
    src = {
        name: pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        for name in FIXED_TABLES | set(SCALED_TABLES)
    }
    # skip when already generated (deterministic, so counts are the check)
    done = True
    for name, t in src.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        want = len(t) if name in FIXED_TABLES else len(t) * REPS
        if not (os.path.exists(p) and pq.read_metadata(p).num_rows == want):
            done = False
            break
    if done:
        print(f"{out_dir} already generated", file=sys.stderr)
        return
    offs = _space_offsets(src)
    for name in FIXED_TABLES:
        pq.write_table(src[name], os.path.join(out_dir, f"{name}.parquet"))
    for name in SCALED_TABLES:
        _replicate(name, src[name], offs, out_dir)
        print(f"{name}: {len(src[name])} -> {len(src[name]) * REPS}", file=sys.stderr)
    print(f"wrote {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
