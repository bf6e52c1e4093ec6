"""Scalable similarity search over embedding columns.

Three tiers (SURVEY §7.1 M6):
- brute-force cosine top-k via a broadcast numpy matmul (the exactness
  baseline; queries broadcast, corpus streamed through mapInPandas — scales
  linearly with corpus size, no shuffle);
- IVF (inverted-file) ANN: k-means-style coarse centroids → cluster
  assignment (one narrow map) → probe the nearest `nprobe` centroids only;
  at 100 TB the centroid table is broadcast and the candidate scan prunes
  (1 - nprobe/k) of the corpus;
- random-hyperplane LSH bucketing: sign-bit sketches give hamming-bucketed
  candidates (cheap recall-oriented blocking, same shape as the MinHash
  band join).

The SQL-oracle-checked exact variants live in plans/dedup_q.py; these
operators are the production path (Arrow-batched, vectorized) and are tested
for recall against the exact baseline.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


def _to_matrix(pdf: pd.DataFrame, col: str) -> np.ndarray:
    return np.vstack(pdf[col].map(np.asarray).to_numpy()).astype(np.float64)


def _indexable_rows(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(keep_mask, unit_rows): rows whose L2 norm is ZERO or NON-FINITE are
    NOT INDEXABLE — they have no direction, so cosine against them is
    undefined. Masking BEFORE the divide guarantees no NaN/inf ever enters
    a kernel (r14, closing the r13 RuntimeWarning: zero-norm vectors used
    to normalize to NaN and survive only by top-k tie-break accident).
    A norm that is NaN/inf also covers NaN/inf ELEMENTS (the norm of any
    non-finite vector is non-finite), so one check suffices."""
    norms = np.linalg.norm(m, axis=1)
    ok = np.isfinite(norms) & (norms > 0)
    return ok, m[ok] / norms[ok, None]


def _drop_unindexable_pdf(queries_pdf: pd.DataFrame, vec_col: str) -> pd.DataFrame:
    """Driver-side query set: drop NULL, zero-norm and non-finite vectors
    (NOT INDEXABLE / NOT SEARCHABLE — same contract as the corpus side)."""
    qp = queries_pdf[queries_pdf[vec_col].notna()].reset_index(drop=True)
    if len(qp) == 0:
        return qp
    ok, _ = _indexable_rows(_to_matrix(qp, vec_col))
    return qp[ok].reset_index(drop=True)


def _drop_null_vectors(
    corpus: DataFrame, queries_pdf: pd.DataFrame, vec_col: str
) -> tuple[DataFrame, pd.DataFrame]:
    """NULL / zero-norm / non-finite embedding = NOT INDEXABLE: excluded
    from both the corpus and the query set. A failed encoder emits exactly
    these shapes (r13 NULL-heavy sweep: np.vstack over a None crashed the
    driver; r13 constant sweep: all-zero vectors normalized to NaN with a
    RuntimeWarning). Corpus side: the NULL predicate is pushed to the scan
    here; the zero/non-finite-norm mask is applied inside each Arrow kernel
    via _indexable_rows — the norms are computed there anyway, so the mask
    is free and needs no slow-path higher-order-function plan predicate.
    At /root/testdata embeddings are never NULL/zero/non-finite, so all of
    this is a no-op there and oracle parity is unchanged."""
    return (
        corpus.where(F.col(vec_col).isNotNull()),
        _drop_unindexable_pdf(queries_pdf, vec_col),
    )


def _empty_topk(spark_from: DataFrame, k: int) -> DataFrame:
    w0 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        spark_from.sparkSession.createDataFrame([], TOPK_SCHEMA)
        .withColumn("rank", F.row_number().over(w0))
        .where(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k: queries (small) broadcast as numpy; corpus partitions
    stream through one matmul each; per-partition top-k then a global top-k
    (tiny shuffle of |queries|·k·n_partitions rows).

    ``round_to`` rounds similarities before ranking (with per-partition
    headroom so rounded ties survive the cut) — the cross-engine-stable
    ordering a SQL oracle can reproduce; None keeps full-precision order.

    An empty query set (empty/degenerate corpus) short-circuits to an
    empty result — np.vstack of zero arrays would otherwise crash on the
    driver before any Spark job."""
    corpus, queries_pdf = _drop_null_vectors(corpus, queries_pdf, vec_col)
    if len(queries_pdf) == 0:
        return _empty_topk(corpus, k)
    qids = queries_pdf[id_col].to_numpy()
    qm = _to_matrix(queries_pdf, vec_col)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ok, m = _indexable_rows(_to_matrix(pdf, vec_col))
            if not ok.any():
                continue
            ids = pdf[id_col].to_numpy()[ok]
            sims = qm @ m.T  # (n_q, n_corpus_batch)
            if round_to is not None:
                sims = np.round(sims, round_to)
            kk = min(k + (9 if round_to is not None else 1), sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(qm.shape[0]):
                for j in idx[qi]:
                    if ids[j] == qids[qi]:
                        continue
                    rows.append(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": ids[j],
                            "cos_sim": float(sims[qi, j]),
                            "rank": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in TOPK_SCHEMA])

    partial = corpus.mapInPandas(part, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_build_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Lloyd's k-means on the driver over a sample (centroid table is tiny and
    broadcast everywhere; at scale the sample stays bounded)."""
    sample = (
        corpus.where(F.col(vec_col).isNotNull())  # NULL = not indexable
        .select(id_col, vec_col)
        .limit(20000)
        .toPandas()
    )
    if len(sample) == 0:
        return pd.DataFrame({"centroid_id": [], "centroid": []})
    _, m = _indexable_rows(_to_matrix(sample, vec_col))
    if m.shape[0] == 0:  # no indexable vectors (e.g. all-zero corpus)
        return pd.DataFrame({"centroid_id": [], "centroid": []})
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(m.shape[0], size=min(n_centroids, m.shape[0]), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:  # antipodal members can mean to zero: keep old
                    cent[c] = v / nv
    return pd.DataFrame(
        {"centroid_id": np.arange(cent.shape[0]), "centroid": list(cent)}
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: pd.DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Narrow map: nearest centroid per vector (broadcast centroid matrix).
    NULL / zero-norm / non-finite vectors are not indexable and never enter
    the assignment table."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
            T.StructField("centroid_id", T.IntegerType()),
        ]
    )
    if len(centroids) == 0:  # degenerate corpus: nothing was indexable
        return corpus.sparkSession.createDataFrame([], schema)
    cm = np.vstack(centroids["centroid"].to_numpy())

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ok, m = _indexable_rows(_to_matrix(pdf, vec_col))
            if not ok.any():
                continue
            pdf = pdf[[id_col, vec_col]][ok].copy()
            pdf["centroid_id"] = np.argmax(m @ cm.T, axis=1).astype(np.int32)
            yield pdf

    return corpus.select(id_col, vec_col).mapInPandas(part, schema)


def ivf_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: pd.DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: search only the `nprobe` nearest clusters per query.
    The candidate scan is a partition-pruned semi-join: assignment table
    filtered by the probed centroid ids (broadcast), then exact rerank.

    ``centroids``: a pre-trained centroid table (as returned by
    ``ivf_build_centroids`` on the same corpus/params) skips the in-call
    training — the build-once/query-many production shape; None trains
    inline as before."""
    corpus, queries_pdf = _drop_null_vectors(corpus, queries_pdf, vec_col)
    if len(queries_pdf) == 0:
        return _empty_topk(corpus, k)
    if centroids is None:
        centroids = ivf_build_centroids(
            corpus, n_centroids, id_col=id_col, vec_col=vec_col
        )
    if len(centroids) == 0:  # degenerate corpus: nothing was indexable
        return _empty_topk(corpus, k)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    cm = np.vstack(centroids["centroid"].to_numpy())
    qm = _to_matrix(queries_pdf, vec_col)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probes = np.argsort(-(qm @ cm.T), axis=1)[:, :nprobe]
    qids = queries_pdf[id_col].to_numpy()
    qvec = {int(qids[i]): qm[i] for i in range(qm.shape[0])}
    # (query_id, centroid_id) probe pairs — broadcast join fans each corpus
    # vector out ONLY to the queries that probe its cluster
    probe_rows = [
        (int(qids[qi]), int(c)) for qi in range(qm.shape[0]) for c in probes[qi]
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id bigint, centroid_id int")
    cand = assigned.join(F.broadcast(probe_df), "centroid_id").select(
        "query_id", id_col, vec_col
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        q = qvec[qid]
        ids = pdf[id_col].to_numpy()
        m = _to_matrix(pdf, vec_col)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q
        order = np.lexsort((ids, -sims))
        rows = []
        rank = 0
        for j in order:
            if int(ids[j]) == qid:
                continue
            rank += 1
            if rank > k:
                break
            rows.append(
                {
                    "query_id": qid,
                    "neighbor_id": int(ids[j]),
                    "cos_sim": float(sims[j]),
                    "rank": rank,
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in TOPK_SCHEMA])

    # per-query exact rerank over the pruned candidate set; one group per
    # query (candidates ≈ corpus·nprobe/k rows — bounded by construction)
    return cand.groupBy("query_id").applyInPandas(per_query, TOPK_SCHEMA)


# --- materialized IVF index (build once, query many) -------------------------

def ivf_write_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: a tiny centroid table plus the assignment
    table PARTITIONED BY centroid_id — so a query probing `nprobe` clusters
    reads only nprobe/n_centroids of the corpus files (directory-level
    partition pruning, asserted in tests). This is the production ANN shape:
    the k-means/assignment cost amortizes across every query batch."""
    centroids = ivf_build_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col
    )
    cent_rows = [
        (int(r.centroid_id), [float(x) for x in r.centroid])
        for r in centroids.itertuples()
    ]
    spark.createDataFrame(
        cent_rows, "centroid_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/assignments"
    )


def ivf_query_index(
    spark: SparkSession,
    path: str,
    queries_pdf: pd.DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized IVF index: broadcast the (tiny) centroid table,
    pick `nprobe` clusters per query, scan ONLY those partitions of the
    assignment table (the isin predicate on the partition column prunes at
    the directory level), exact-rerank per query. Same result as the inline
    ivf_topk for the same centroids."""
    # NULL / zero-norm / non-finite query vector = not searchable
    queries_pdf = _drop_unindexable_pdf(queries_pdf, vec_col)
    cent = (
        spark.read.parquet(f"{path}/centroids")
        .orderBy("centroid_id")
        .toPandas()
    )
    if len(queries_pdf) == 0 or len(cent) == 0:
        w0 = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            spark.createDataFrame([], TOPK_SCHEMA)
            .withColumn("rank", F.row_number().over(w0))
            .where(F.col("rank") <= k)
        )
    cm = np.vstack(cent["centroid"].map(np.asarray).to_numpy())
    qm = _to_matrix(queries_pdf, vec_col)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probes = np.argsort(-(qm @ cm.T), axis=1)[:, :nprobe]
    qids = queries_pdf[id_col].to_numpy()
    qvec = {int(qids[i]): qm[i] for i in range(qm.shape[0])}
    probe_rows = [
        (int(qids[qi]), int(c)) for qi in range(qm.shape[0]) for c in probes[qi]
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id bigint, centroid_id int")
    probed_cids = sorted({c for _, c in probe_rows})
    assigned = spark.read.parquet(f"{path}/assignments").where(
        F.col("centroid_id").isin(probed_cids)
    )
    cand = assigned.join(F.broadcast(probe_df), "centroid_id").select(
        "query_id", id_col, vec_col
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        q = qvec[qid]
        ids = pdf[id_col].to_numpy()
        m = _to_matrix(pdf, vec_col)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q
        order = np.lexsort((ids, -sims))
        rows = []
        rank = 0
        for j in order:
            if int(ids[j]) == qid:
                continue
            rank += 1
            if rank > k:
                break
            rows.append(
                {
                    "query_id": qid,
                    "neighbor_id": int(ids[j]),
                    "cos_sim": float(sims[j]),
                    "rank": rank,
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in TOPK_SCHEMA])

    return cand.groupBy("query_id").applyInPandas(per_query, TOPK_SCHEMA)


# --- product quantization (PQ) ANN -------------------------------------------

def pq_train_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks: split the (normalized) vector into `m` subspaces
    and run Lloyd's k-means with `ksub` centroids in each — the classic
    Jégou et al. product-quantization compressor. Returns (m, ksub, dsub),
    or None when the corpus has no indexable vectors (all NULL / zero-norm
    / non-finite — a degenerate corpus cannot train codebooks).
    Training runs on a bounded driver-side sample (codebooks are tiny and
    broadcast); at 100 TB the sample stays 20k rows like the IVF trainer."""
    sample = (
        corpus.where(F.col(vec_col).isNotNull())  # NULL = not indexable
        .select(vec_col)
        .limit(20000)
        .toPandas()
    )
    if len(sample) == 0:
        return None
    _, mtx = _indexable_rows(_to_matrix(sample, vec_col))
    if mtx.shape[0] == 0:  # no indexable vectors (e.g. all-zero corpus)
        return None
    d = mtx.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for sub in range(m):
        x = mtx[:, sub * dsub : (sub + 1) * dsub]
        # with-replacement fallback keeps the codebook exactly ksub rows on
        # tiny corpora (books[sub] assignment requires the full shape)
        cent = x[
            rng.choice(x.shape[0], size=ksub, replace=x.shape[0] < ksub)
        ].copy()
        for _ in range(n_iter):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(cent.shape[0]):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        books[sub] = cent
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Narrow map: 8-bit code per subspace (nearest codebook entry by L2 on
    the normalized vector). 64 floats -> 8 bytes: the 32x compression that
    makes a 100 TB corpus scannable from memory. NULL vectors are not
    indexable and are never encoded."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    m, ksub, dsub = codebooks.shape
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ok, mtx = _indexable_rows(_to_matrix(pdf, vec_col))
            if not ok.any():
                continue
            codes = np.empty((mtx.shape[0], m), dtype=np.int32)
            for sub in range(m):
                x = mtx[:, sub * dsub : (sub + 1) * dsub]
                d2 = ((x[:, None, :] - codebooks[sub][None, :, :]) ** 2).sum(axis=2)
                codes[:, sub] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[ok], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(part, schema)


def pq_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    r_cand: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC ANN: scan the 8-byte codes with per-query lookup tables
    (LUT[sub][code] = q_sub . centroid — the asymmetric distance
    computation), keep the top `r_cand` ADC candidates per query, then
    exact-rerank only those against the full vectors. At scale the codes
    table is ~1/32 the corpus bytes, the LUTs are broadcast, and the rerank
    touches r_cand rows per query — no all-pairs stage anywhere.

    ``books``: pre-trained codebooks (as returned by ``pq_train_codebooks``
    on the same corpus/params) skip the in-call training — the
    build-once/query-many production shape; None trains inline as before."""
    corpus, queries_pdf = _drop_null_vectors(corpus, queries_pdf, vec_col)
    if len(queries_pdf) == 0:
        return _empty_topk(corpus, k)
    if books is None:
        books = pq_train_codebooks(corpus, m=m, ksub=ksub, vec_col=vec_col)
    if books is None:  # degenerate corpus: nothing was indexable
        return _empty_topk(corpus, k)
    encoded = pq_encode(corpus, books, id_col, vec_col)
    qm = _to_matrix(queries_pdf, vec_col)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qids = queries_pdf[id_col].to_numpy()
    dsub = books.shape[2]
    # LUTs: (n_q, m, ksub) partial dot products
    luts = np.einsum("qmd,mkd->qmk", qm.reshape(qm.shape[0], m, dsub), books)
    qvec = {int(qids[i]): qm[i] for i in range(qm.shape[0])}

    cand_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            codes = np.vstack(pdf["codes"].map(np.asarray).to_numpy())  # (n, m)
            # ADC: sum LUT entries along subspaces -> (n_q, n)
            scores = np.zeros((qm.shape[0], codes.shape[0]))
            for sub in range(m):
                scores += luts[:, sub, codes[:, sub]]
            kk = min(r_cand, codes.shape[0])
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(qm.shape[0]):
                for j in idx[qi]:
                    if ids[j] == qids[qi]:
                        continue
                    rows.append(
                        {
                            "query_id": int(qids[qi]),
                            "neighbor_id": int(ids[j]),
                            "adc": float(scores[qi, j]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "adc"])

    partial = encoded.mapInPandas(scan, cand_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = (
        partial.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= r_cand)
        .select("query_id", "neighbor_id")
    )
    # exact rerank: fan the full vectors out only to the candidate pairs
    full = cand.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col),
        "neighbor_id",
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        q = qvec[qid]
        ids = pdf["neighbor_id"].to_numpy()
        mm_ = _to_matrix(pdf, vec_col)
        mm_ = mm_ / np.linalg.norm(mm_, axis=1, keepdims=True)
        sims = mm_ @ q
        order = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame(
            {
                "query_id": qid,
                "neighbor_id": ids[order].astype(np.int64),
                "cos_sim": sims[order],
                "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            }
        )

    return full.groupBy("query_id").applyInPandas(per_query, TOPK_SCHEMA)
