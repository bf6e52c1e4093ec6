"""Multimodal + production-ANN queries (rows-only driver checks: fake-decode
digests and driver-side k-means aren't SQL-expressible; exact semantics are
covered by tests/test_similarity_multimodal.py against numpy oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_spark.operators.multimodal import (
    image_features,
    media_from_documents,
    video_frame_sample,
)
from orc_spark.operators.similarity import brute_force_topk, ivf_topk
from orc_spark.plans import Query
from orc_spark.sources.tables import load_table


def mm_image_features(spark: SparkSession, sf: str) -> DataFrame:
    media = media_from_documents(load_table(spark, sf, "documents"))
    return image_features(media)


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    media = media_from_documents(load_table(spark, sf, "documents"))
    return video_frame_sample(media, every_ms=1000)


def ann_bruteforce_fast(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").toPandas()
    return brute_force_topk(emb, queries, k=5)


def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").toPandas()
    return ivf_topk(spark, emb, queries, k=5, n_centroids=16, nprobe=8)


QUERIES = [
    Query("mm_image_features", mm_image_features, None, "binary decode → luma stats + 8x8 thumbnail (stubbed codec)"),
    Query("mm_frame_sample", mm_frame_sample, None, "video frame-sampling plumbing"),
    Query("ann_bruteforce_fast", ann_bruteforce_fast, None, "broadcast-matmul exact top-k (production path)"),
    Query("ann_ivf", ann_ivf, None, "IVF ANN: coarse centroids + nprobe pruning"),
]
