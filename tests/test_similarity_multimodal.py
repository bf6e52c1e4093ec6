"""Tests for the production similarity operators (brute-force/IVF ANN) and
the multimodal binary-column plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from orc_spark.operators.multimodal import (
    image_features,
    media_from_documents,
    real_decode_stub,
    video_frame_sample,
)
from orc_spark.operators.similarity import (
    brute_force_topk,
    ivf_build_centroids,
    ivf_topk,
)
from orc_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


@pytest.fixture(scope="module")
def queries_pdf(emb):
    return emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").toPandas()


def _exact_oracle(emb_pdf, queries_pdf, k=5):
    m = np.vstack(emb_pdf["embedding"].map(np.asarray)).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb_pdf["vec_id"].to_numpy()
    out = {}
    for _, q in queries_pdf.iterrows():
        qv = np.asarray(q["embedding"], dtype=np.float64)
        qv /= np.linalg.norm(qv)
        sims = m @ qv
        order = np.lexsort((ids, -sims))
        neigh = [int(ids[j]) for j in order if ids[j] != q["vec_id"]][:k]
        out[int(q["vec_id"])] = neigh
    return out


def test_brute_force_topk_exact(spark, emb, queries_pdf):
    got = brute_force_topk(emb, queries_pdf, k=5).orderBy("query_id", "rank").toPandas()
    oracle = _exact_oracle(emb.toPandas(), queries_pdf, k=5)
    for qid, neigh in oracle.items():
        sub = got[got.query_id == qid].sort_values("rank")
        assert list(sub["neighbor_id"]) == neigh


def test_ivf_recall(spark, emb, queries_pdf):
    """IVF with nprobe=8/16 recovers most of the exact top-5 (recall ≥ 0.6 on
    this unclustered random data; real clustered embeddings do far better)."""
    got = ivf_topk(spark, emb, queries_pdf, k=5, n_centroids=16, nprobe=8)
    gpdf = got.toPandas()
    oracle = _exact_oracle(emb.toPandas(), queries_pdf, k=5)
    hits = total = 0
    for qid, neigh in oracle.items():
        sub = set(gpdf[gpdf.query_id == qid]["neighbor_id"])
        hits += len(sub & set(neigh))
        total += len(neigh)
    assert hits / total >= 0.6


def test_ivf_centroids_normalized(spark, emb):
    cents = ivf_build_centroids(emb, n_centroids=8)
    m = np.vstack(cents["centroid"].to_numpy())
    np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, rtol=1e-9)


def test_image_features_plumbing(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    media = media_from_documents(docs)
    feats = image_features(media).toPandas()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(feats) == n_images
    assert (feats["n_bytes"] > 0).all()
    assert feats["thumb8"].map(len).eq(64).all()
    assert feats["mean_luma"].between(0, 255).all()
    # determinism: same payload → same features
    feats2 = image_features(media).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )


def test_video_frame_sampling(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    media = media_from_documents(docs)
    frames = video_frame_sample(media, every_ms=1000).toPandas()
    vids = media.where(F.col("kind") == "video").select("media_id", "meta.duration_ms").toPandas()
    exp = int((vids["duration_ms"] // 1000).clip(lower=0).sum())
    assert len(frames) == exp
    assert (frames.groupby("media_id")["frame_idx"].apply(lambda s: (s.sort_values().diff().dropna() == 1).all())).all()


def test_real_decoder_stub_raises(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(3)
    media = media_from_documents(docs)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        image_features(media, decoder=real_decode_stub).collect()


def test_srp_lsh_recall_on_planted_near_dups(spark, tmp_path):
    """ann_srp_pairs must recover planted near-duplicates: 30 vectors get a
    jittered copy (cos ≈ 0.95+); at 64 planes / 8x8-bit bands the analytic
    miss probability per planted pair is < 2%, so recall ≥ 0.9 is a safe
    hard gate (the driver's testdata has no true near-dups — max pair cos
    ≈ 0.51 — so this planted-corpus test is the recall evidence)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark.plans.dedup_q import ann_srp_pairs

    rng = np.random.default_rng(42)
    base = rng.normal(size=(100, 64)).astype(np.float32)
    dup_of = np.arange(30)
    dups = base[dup_of] + rng.normal(scale=0.08, size=(30, 64)).astype(np.float32)
    vecs = np.vstack([base, dups.astype(np.float32)])
    cos = [
        float(
            np.dot(base[i], dups[k])
            / (np.linalg.norm(base[i]) * np.linalg.norm(dups[k]))
        )
        for k, i in enumerate(dup_of)
    ]
    assert min(cos) > 0.9, "fixture must actually contain near-dups"
    table = pa.table(
        {
            "vec_id": pa.array(range(130), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 130, pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    found = {
        (r.vec_a, r.vec_b)
        for r in ann_srp_pairs(spark, str(tmp_path)).collect()
    }
    planted = {(int(i), int(100 + k)) for k, i in enumerate(dup_of)}
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, f"SRP recall {recall} on planted near-dups"


def test_ivf_index_matches_inline_and_prunes_partitions(spark, sf_mid, tmp_path):
    """The materialized index path returns the SAME neighbors as the inline
    ivf_topk (same centroid sample/seed), and the probe scan carries a
    PartitionFilters predicate on centroid_id (directory-level pruning — the
    reason the index exists)."""
    from orc_spark.operators.similarity import (
        ivf_query_index,
        ivf_topk,
        ivf_write_index,
    )
    from orc_spark.plans.explain import formatted_plan
    from orc_spark.sources.tables import load_table

    emb = load_table(spark, sf_mid, "embeddings")
    queries = emb.where("vec_id < 8").select("vec_id", "embedding").toPandas()
    path = str(tmp_path / "ivf")
    ivf_write_index(spark, emb, path, n_centroids=16)
    idx = ivf_query_index(spark, path, queries, k=5, nprobe=4)
    plan = formatted_plan(idx)
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    inline = ivf_topk(spark, emb, queries, k=5, n_centroids=16, nprobe=4)
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in idx.collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in inline.collect()
    )
    assert got == want


def test_pq_recall_and_compression(spark, emb, queries_pdf):
    """PQ-ADC with 64-entry codebooks + top-192 rerank holds recall ≥ 0.6 on
    this unclustered random data (the ann_pq gate's margin source), and the
    codes really are m=8 small ints — the 32× compression contract."""
    from orc_spark.operators.similarity import pq_encode, pq_topk, pq_train_codebooks

    books = pq_train_codebooks(emb, m=8, ksub=64)
    assert books.shape == (8, 64, 8)
    codes = pq_encode(emb, books).toPandas()
    assert codes["codes"].map(len).eq(8).all()
    flat = np.concatenate(codes["codes"].to_numpy())
    assert flat.min() >= 0 and flat.max() < 64
    got = pq_topk(spark, emb, queries_pdf, k=5, m=8, ksub=64, r_cand=192).toPandas()
    oracle = _exact_oracle(emb.toPandas(), queries_pdf, k=5)
    hits = total = 0
    for qid, neigh in oracle.items():
        sub = set(got[got.query_id == qid]["neighbor_id"])
        hits += len(sub & set(neigh))
        total += len(neigh)
    assert hits / total >= 0.6
    # ranks are contiguous from 1 and ordered by descending exact cosine
    for qid, sub in got.groupby("query_id"):
        sub = sub.sort_values("rank")
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        assert (np.diff(sub["cos_sim"].to_numpy()) <= 1e-12).all()


def test_semdedup_drops_planted_within_cluster_dups(spark, tmp_path):
    """dd_semdedup on a planted corpus: jittered copies inside a cluster
    (cos >= 0.9 >> tau) must be dropped; an identical copy placed in a
    DIFFERENT cluster must survive (clustering bounds the candidates);
    orthogonal-ish base vectors (random normals, cos ~ 0.12 expected)
    must all survive."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark.plans.dedup_q import dd_semdedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64)).astype(np.float32)  # cluster 0
    dups = base[:10] + rng.normal(scale=0.05, size=(10, 64)).astype(
        np.float32
    )  # near-copies of vecs 0..9, same cluster
    cross = base[10:15]  # exact copies, but planted in cluster 1
    vecs = np.vstack([base, dups.astype(np.float32), cross])
    labels = [0] * 50 + [1] * 5
    table = pa.table(
        {
            "vec_id": pa.array(range(55), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))

    rows = {r.label: r for r in dd_semdedup(spark, str(tmp_path)).collect()}

    # brute-force replay of the dominated-by-earlier rule per cluster
    # (round-6 cosines, same as both engines)
    norm = vecs.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    sims = np.round(norm @ norm.T, 6)
    dropped_by_label: dict[int, set[int]] = {0: set(), 1: set()}
    for v in range(55):
        for u in range(v):
            if labels[u] == labels[v] and sims[u, v] >= 0.3:
                dropped_by_label[labels[v]].add(v)
                break
    # every planted jittered copy (ids 40..49) is dominated by its original
    assert set(range(40, 50)) <= dropped_by_label[0]
    # cross-cluster exact copies are NOT dominated by their cluster-0
    # originals (clustering bounds the candidates)
    for lab, total in ((0, 50), (1, 5)):
        assert rows[lab]["n_vecs"] == total
        assert rows[lab]["n_dropped"] == len(dropped_by_label[lab])
        assert rows[lab]["n_kept"] == total - len(dropped_by_label[lab])
        # dominated-by-earlier can never drop a cluster's minimum vec_id, so
        # every non-empty label keeps >=1 survivor — the invariant that makes
        # the engine's left-join groupBy equivalent to the oracle's inner
        # join (ADVICE r15; comment at the aggregate in dedup_q.py)
        assert rows[lab]["n_kept"] >= 1 and rows[lab]["survivor_digest"] is not None


def test_ann_recall_eval_sampled_mode_matches_replay(spark, tmp_path):
    """The stratified sampled-truth estimator (corpus > ANN_RECALL_EXACT_MAX
    triggers sampled mode) replayed end-to-end in plain Python/numpy,
    independent of both engines: probe selection (per-label h60 rank),
    exact probe-touching truth pairs (float64 raw-dot/norm-product, round
    6), the full SRP sketch -> bands -> probe-touching candidates ->
    rounded-cosine rerank (signs recomputed from md5, all band math exact
    integers). n_probes / n_truth / n_retrieved / recall must match
    exactly. Deterministic planted-cluster corpus: 700 vectors in 40 tight
    clusters so probe-touching truth is plentiful."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark.plans.dedup_q import (
        ANN_RECALL_EXACT_MAX,
        ANN_RECALL_Q,
        COS_THRESHOLD,
        SRP_BAND_BITS,
        SRP_EMB_DIM,
        SRP_N_BANDS,
        SRP_PLANES,
        SRP_QUANT,
        ann_recall_eval,
    )

    rng = np.random.default_rng(7)
    n, dim = 700, SRP_EMB_DIM
    assert n > ANN_RECALL_EXACT_MAX
    centers = rng.normal(size=(40, dim))
    member_of = rng.integers(0, 40, size=n)
    vecs = (
        centers[member_of] + rng.normal(scale=0.35, size=(n, dim))
    ).astype(np.float32)
    labels = (np.arange(n) % 10).astype(np.int32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # probe selection: per label, ANN_RECALL_Q smallest (h60(id), id)
    probes = set()
    for lab in range(10):
        ids = [i for i in range(n) if labels[i] == lab]
        ids.sort(key=lambda i: (h60(str(i)), i))
        probes.update(ids[:ANN_RECALL_Q])

    m = vecs.astype(np.float64)
    nrm = np.sqrt((m * m).sum(axis=1))
    sims = np.round((m @ m.T) / (nrm[:, None] * nrm[None, :]), 6)
    truth = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if sims[a, b] >= COS_THRESHOLD and (a in probes or b in probes)
    }
    assert len(truth) > 50, "fixture must plant plenty of truth pairs"

    # SRP replay: integer sketch, exact
    signs = np.array(
        [
            [1 if h60(f"srp:{p}:{i}") % 2 == 1 else -1 for i in range(dim)]
            for p in range(SRP_PLANES)
        ],
        dtype=np.int64,
    )
    qm = np.floor(m * SRP_QUANT).astype(np.int64)
    bits = (qm @ signs.T >= 0).astype(np.int64)
    pow2 = 1 << np.arange(SRP_BAND_BITS, dtype=np.int64)
    bv = bits.reshape(n, SRP_N_BANDS, SRP_BAND_BITS) @ pow2
    buckets: dict = {}
    for i in range(n):
        for band in range(SRP_N_BANDS):
            buckets.setdefault((band, int(bv[i, band])), []).append(i)
    cand = set()
    for ids in buckets.values():
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                if a in probes or b in probes:
                    cand.add((a, b))
    retrieved = {(a, b) for a, b in cand if sims[a, b] >= COS_THRESHOLD}
    assert retrieved <= truth  # same threshold on both sides

    row = ann_recall_eval(spark, str(tmp_path)).collect()[0]
    assert row["n_probes"] == len(probes)
    assert row["n_truth"] == len(truth)
    assert row["n_retrieved"] == len(retrieved)
    assert row["recall"] == round(len(retrieved) / len(truth), 6)


def test_ann_ivf_and_index_match_planted_structure_replay(spark, tmp_path):
    """Planted-structure replay of the full IVF path, independent of Spark:
    re-derive the seeded Lloyd's k-means (default_rng(42), argmax assign,
    5 iters, mean-renormalize), cid assignment, per-query probe sets,
    pruned-candidate exact rerank, and the round-6 exact top-k — all in
    plain numpy from the written float32 values — then assert ivf_topk
    emits exactly the replayed (query_id, neighbor_id, rank) rows, the
    materialized-index path (ivf_query_index) emits the same, and the two
    registry queries ann_ivf / ann_ivf_index emit exactly the replayed
    per-query recall_ok decisions (not assumed all-true)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark.operators.similarity import ivf_query_index, ivf_topk
    from orc_spark.plans.mm_q import (
        ANN_N_Q,
        IVF_RECALL_MIN,
        ann_ivf,
        ann_ivf_index,
    )

    rng = np.random.default_rng(3)
    n, dim, n_cent, nprobe, k = 500, 16, 16, 12, 5
    centers = rng.normal(size=(20, dim)) * 3.0
    member_of = rng.integers(0, 20, size=n)
    vecs = (
        centers[member_of] + rng.normal(scale=0.6, size=(n, dim))
    ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([int(i % 3) for i in range(n)], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    # --- numpy replay (same float64 path as _to_matrix: float32 -> float64)
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    # k-means exactly as ivf_build_centroids: seeded init over file order
    krng = np.random.default_rng(42)
    cent = m[krng.choice(n, size=n_cent, replace=False)].copy()
    for _ in range(5):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_cent):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    assign = np.argmax(m @ cent.T, axis=1)
    qm = m[:ANN_N_Q]
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]

    def topk_from(cand_ids, q, qid):
        sims = m[cand_ids] @ q
        order = np.lexsort((cand_ids, -sims))
        out = []
        for j in order:
            if int(cand_ids[j]) == qid:
                continue
            out.append(int(cand_ids[j]))
            if len(out) == k:
                break
        return out

    want_ivf, want_exact = {}, {}
    all_ids = np.arange(n)
    for qid in range(ANN_N_Q):
        cand = all_ids[np.isin(assign, probes[qid])]
        want_ivf[qid] = topk_from(cand, qm[qid], qid)
        # exact side: round-6 sims, rank by (-sim, id) — brute_force_topk
        es = np.round(m @ qm[qid], 6)
        order = np.lexsort((all_ids, -es))
        want_exact[qid] = [int(i) for i in order if i != qid][:k]
    want_ok = {
        qid: len(set(want_ivf[qid]) & set(want_exact[qid])) / k
        >= IVF_RECALL_MIN
        for qid in range(ANN_N_Q)
    }
    # the gate must not be vacuously decided by construction
    assert any(want_ok.values())

    queries_pdf = pd.DataFrame(
        {
            "vec_id": np.arange(ANN_N_Q, dtype=np.int64),
            "embedding": [list(map(float, vecs[i])) for i in range(ANN_N_Q)],
        }
    )
    emb = load_table(spark, str(tmp_path), "embeddings")
    got_ivf = {}
    for r in ivf_topk(
        spark, emb, queries_pdf, k=k, n_centroids=n_cent, nprobe=nprobe
    ).collect():
        got_ivf.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    assert {
        q: [ns[i] for i in sorted(ns)] for q, ns in got_ivf.items()
    } == want_ivf

    got_ann = {r["query_id"]: r["recall_ok"] for r in ann_ivf(spark, str(tmp_path)).collect()}
    assert got_ann == want_ok

    got_idx = {r["query_id"]: r["recall_ok"] for r in ann_ivf_index(spark, str(tmp_path)).collect()}
    assert got_idx == want_ok

    # the materialized index returns the same pruned top-k as the replay
    from orc_spark.plans.mm_q import _ivf_index_path

    got_q = {}
    for r in ivf_query_index(
        spark, _ivf_index_path(spark, str(tmp_path)), queries_pdf, k=k, nprobe=nprobe
    ).collect():
        got_q.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    assert {
        q: [ns[i] for i in sorted(ns)] for q, ns in got_q.items()
    } == want_ivf


def test_zero_norm_and_nonfinite_vectors_not_indexable(spark, tmp_path):
    """r14 contract (r13 VERDICT directive 4): NULL, zero-norm and
    non-finite vectors are NOT INDEXABLE — dropped at every similarity/ANN
    entry point BEFORE any normalization, so no NaN ever enters a kernel
    and no RuntimeWarning is emitted driver-side (zero-norm queries used to
    normalize to NaN and survive only by top-k tie-break accident)."""
    import os
    import warnings

    rng = np.random.default_rng(7)
    n, dim = 20, 64
    vecs = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(n)]
    bad = {
        100: [0.0] * dim,                       # zero norm
        101: [float("nan")] * 2 + [1.0] * (dim - 2),  # NaN elements
        102: [float("inf")] + [1.0] * (dim - 1),      # inf element
    }
    rows += [(vid, v, 0) for vid, v in bad.items()]
    rows.append((103, None, 0))                  # NULL embedding
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    emb = load_table(spark, str(tmp_path), "embeddings")
    queries = pd.DataFrame(
        {
            "vec_id": [0, 1, 100, 101, 103],
            "embedding": [
                [float(x) for x in vecs[0]],
                [float(x) for x in vecs[1]],
                bad[100],
                bad[101],
                None,
            ],
        }
    )

    from orc_spark.operators.similarity import pq_topk
    from orc_spark.plans.dedup_q import ann_topk, dd_embcos

    with warnings.catch_warnings():
        # driver-side guarantee: masking happens BEFORE the divide
        warnings.simplefilter("error", RuntimeWarning)
        results = {
            "brute": brute_force_topk(emb, queries, k=5).toPandas(),
            "ivf": ivf_topk(
                spark, emb, queries, k=5, n_centroids=4, nprobe=4
            ).toPandas(),
            "pq": pq_topk(
                spark, emb, queries, k=5, m=8, ksub=4, r_cand=16
            ).toPandas(),
            "plan_topk": ann_topk(spark, str(tmp_path)).toPandas(),
        }
    unindexable = {100, 101, 102, 103}
    for name, pdf in results.items():
        assert not pdf.empty, name  # the healthy queries still answer
        assert not (set(pdf["query_id"]) & unindexable), name
        assert not (set(pdf["neighbor_id"]) & unindexable), name
        assert np.isfinite(pdf["cos_sim"].to_numpy()).all(), name

    pairs = dd_embcos(spark, str(tmp_path)).toPandas()
    touched = set(pairs["vec_a"]) | set(pairs["vec_b"])
    assert not (touched & unindexable)
    assert np.isfinite(pairs["cos_sim"].to_numpy()).all()
