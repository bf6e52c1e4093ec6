"""Independent verification of dd_ngram_jaccard at the ~sf1 replica.

The driver-style DuckDB oracle for dd_ngram_jaccard joins the exploded
gram stream to itself on gram value (dedup_q.py DD_NGRAM_SQL) — quadratic
in docs-per-hot-gram. At 50k docs (~5k docs per length bucket, 123M
in-bucket pairs, hot trigrams shared by nearly every doc in a bucket) that
join exceeded 100 GB RSS and was killed; the oracle formulation, not the
query, is what cannot scale. This script closes the gap with two
independent numpy checks against the RAW STRINGS (no xxhash64 — so it also
independently validates the kernel's hash-injectivity assumption):

- PRECISION, sampled: a deterministic ~0.5% hash-sample of the pairs the
  Spark query emits at sf1 (it emits millions — word-shuffled replicas
  keep trigram-set jaccard above threshold even though their MinHash
  shingles decorrelate, so every cross-replica copy pair qualifies; the
  result is written to parquet, not collected) is recomputed from the two
  documents' Python trigram SETS; jaccard must match to 9 significant
  digits (the gate's comparator), doc_a < doc_b must hold, and both docs
  must share a length bucket.
- PRECISION + RECALL, exhaustive on a bucket sample: for a deterministic
  bucket sample (bucket % 5 == 2, ~10.5k docs / ~28M pairs), ALL
  in-bucket pairwise jaccards are computed with a float32 doc×gram
  matmul (counts ≤ ~600 are exact in float32) and compared BOTH ways:
  every qualifying matmul pair must appear in the Spark output with the
  identical rounded value, and every Spark pair in those buckets must
  appear in the matmul qualifying set.

Usage: python scripts/sf1_ngram_check.py [sf_dir]   (default /tmp/orc_sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from orc_spark import get_spark
from orc_spark.plans.dedup_q import (
    JACCARD_THRESHOLD,
    LEN_BUCKET,
    NGRAM_N,
    dd_ngram_jaccard,
)


def _grams(text: str) -> set[str]:
    """The query's gram semantics: distinct trigrams of lower(text);
    docs shorter than NGRAM_N yield the single short substring."""
    t = text.lower()
    if len(t) < NGRAM_N:
        return {t[:NGRAM_N]}
    return {t[i : i + NGRAM_N] for i in range(len(t) - (NGRAM_N - 1))}


def _round9(x: float) -> float:
    """The gate comparator's 9-significant-digit rounding."""
    return float(f"{x:.9g}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orc_sf1"
    spark = get_spark(
        "sf1_ngram_check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )

    out_dir = f"/tmp/orc_sf1_ngram_{os.getpid()}"
    t0 = time.perf_counter()
    dd_ngram_jaccard(spark, sf).write.mode("overwrite").parquet(out_dir)
    t_spark = time.perf_counter() - t0
    got = pq.read_table(out_dir).to_pandas()

    docs = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    bucket_of = {
        int(d): len(t) // LEN_BUCKET for d, t in text_of.items() if t is not None
    }

    gram_cache: dict[int, set[str]] = {}

    def grams_of(doc_id: int) -> set[str]:
        g = gram_cache.get(doc_id)
        if g is None:
            g = gram_cache[doc_id] = _grams(text_of[doc_id])
        return g

    # --- precision: deterministic ~0.5% hash-sample of emitted pairs ---------
    t1 = time.perf_counter()
    da_all = got["doc_a"].to_numpy()
    db_all = got["doc_b"].to_numpy()
    j_all = got["jaccard"].to_numpy()
    pick = ((da_all * 2654435761 + db_all) % 199) == 0
    bad = 0
    n_checked = int(pick.sum())
    for da, db, j in zip(da_all[pick], db_all[pick], j_all[pick]):
        da, db = int(da), int(db)
        want = float("nan")
        # .get(): a Spark-emitted pair referencing a doc absent from
        # bucket_of (e.g. NULL text, excluded at build) must COUNT as a
        # precision mismatch, not crash the checker (r12 ADVICE).
        ok = da < db and bucket_of.get(da) is not None and (
            bucket_of.get(da) == bucket_of.get(db)
        )
        if ok:
            a, b = grams_of(da), grams_of(db)
            inter = len(a & b)
            want = inter / (len(a) + len(b) - inter)
            ok = _round9(want) == _round9(float(j)) and want >= JACCARD_THRESHOLD
        if not ok:
            bad += 1
            if bad <= 5:
                print(f"PRECISION MISMATCH ({da},{db}): spark={j} want={want}")
    t_prec = time.perf_counter() - t1

    # --- both directions, exhaustive, on a deterministic bucket sample -------
    t2 = time.perf_counter()
    sample_buckets = sorted({b for b in bucket_of.values() if b % 5 == 2})
    in_sample = np.array([bucket_of.get(int(d), -1) % 5 == 2 for d in da_all])
    got_pairs = {
        (int(a), int(b)): _round9(float(j))
        for a, b, j in zip(da_all[in_sample], db_all[in_sample], j_all[in_sample])
    }
    missing = 0
    n_sample_pairs = 0
    for bk in sample_buckets:
        ids = np.array(sorted(d for d, b in bucket_of.items() if b == bk))
        sets = [grams_of(int(d)) for d in ids]
        vocab: dict[str, int] = {}
        for s in sets:
            for g in s:
                vocab.setdefault(g, len(vocab))
        m = np.zeros((len(ids), len(vocab)), dtype=np.float32)
        for i, s in enumerate(sets):
            m[i, [vocab[g] for g in s]] = 1.0
        sizes = m.sum(axis=1)
        inter = m @ m.T  # counts ≤ ~600: exact in float32
        union = sizes[:, None] + sizes[None, :] - inter
        jac = inter / union
        # float32 candidate select with epsilon slack; the authoritative
        # threshold test and the compared value both use the float64
        # division (the engines' op) — a float32 ratio differs in the 8th
        # significant digit and would fail the 9-sig-fig comparator
        ri, ci = np.where(np.triu(jac >= JACCARD_THRESHOLD - 1e-6, k=1))
        for i, jx in zip(ri, ci):
            da, db = int(ids[i]), int(ids[jx])
            want64 = float(inter[i, jx]) / float(union[i, jx])
            if want64 < JACCARD_THRESHOLD:
                continue
            n_sample_pairs += 1
            if got_pairs.pop((da, db), None) != _round9(want64):
                missing += 1
                if missing <= 5:
                    print(f"RECALL MISS ({da},{db}): want {_round9(want64)}")
    # got_pairs now holds Spark pairs in sampled buckets the matmul did NOT
    # qualify — false positives
    extra = len(got_pairs)
    for (da, db) in list(got_pairs)[:5]:
        print(f"FALSE POSITIVE ({da},{db}): spark={got_pairs[(da, db)]}")
    t_rec = time.perf_counter() - t2

    status = "OK" if bad == 0 and missing == 0 and extra == 0 else "FAILED"
    print(
        f"dd_ngram_jaccard @ {sf}: {status} — {len(got)} emitted pairs; "
        f"precision sample {n_checked}, {bad} bad ({t_prec:.1f}s); "
        f"buckets {sample_buckets}: {n_sample_pairs} qualifying pairs, "
        f"{missing} missing, {extra} false-positive ({t_rec:.1f}s); "
        f"spark {t_spark:.1f}s"
    )
    sys.exit(1 if bad or missing or extra else 0)


if __name__ == "__main__":
    main()
