"""Multimodal column support: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched iterator UDFs (mapInPandas).

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``decoder=`` (a deterministic fake by default; raises
NotImplementedError for real codecs) — the Spark-side plumbing (schema,
batch iteration, partition sizing, metadata propagation) is real and tested.

Scale design: binary payloads ride the same parquet row groups as their
metadata; `spark.sql.files.maxPartitionBytes` bounds per-task memory; the
mapInPandas iterator yields one output batch per input batch so no batch is
ever fully materialized twice. Feature extraction is a narrow map — no
shuffle — and column pruning means metadata-only queries never read payload
bytes (parquet column split).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def fake_decode_image(payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: an (h, w, c) uint8
    array from a MINSTD (Lehmer 48271 mod 2^31-1) stream seeded by the
    payload's md5. Chosen over an opaque RNG because the pixel stream is
    pure int64 modular arithmetic, so the SAME pixels are reproducible in
    ANSI SQL and the whole decode→features path hash-checks against the
    DuckDB oracle (plans/mm_q.py MM_IMAGE_SQL). Replace with a real codec
    (PIL/libjpeg) in production."""
    h = meta["height"] or 8
    w = meta["width"] or 8
    c = meta["n_channels"] or 3
    seed = int(hashlib.md5(payload or b"").hexdigest()[:15], 16) % 2147483647
    t = np.arange(h * w * c, dtype=np.int64)
    v = ((seed + 1 + t) * 48271) % 2147483647 % 256
    return v.astype(np.uint8).reshape(h, w, c)


def real_decode_stub(payload: bytes, meta) -> np.ndarray:
    raise NotImplementedError(
        "real media codecs are not available in this environment; "
        "plug a decoder with the same (payload, meta) -> ndarray signature"
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
        T.StructField("aspect_ratio", T.DoubleType()),
        T.StructField("thumb8", T.ArrayType(T.DoubleType())),
        # integer-exact companions to the float stats: channel-sum pixel
        # values (3·luma is integral) summed / squared-summed over the image,
        # plus an md5 over the 64 integer 8×8 block sums. These are what the
        # cross-engine oracle hash-checks — no float-comparison hazard.
        T.StructField("luma_sum3", T.LongType()),
        T.StructField("luma_sumsq3", T.LongType()),
        T.StructField("thumb_digest", T.StringType()),
    ]
)


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], np.ndarray] = fake_decode_image,
) -> DataFrame:
    """Decode → luma stats + an 8×8 average-pooled thumbnail vector (the
    embedding-ish feature a dedup/similarity stage consumes downstream)."""

    cols = [f.name for f in IMAGE_FEATURES_SCHEMA]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            # columnar batch access; the only per-item step left is the
            # decode itself (images are variable-shape, so the pixel kernels
            # can't stack across rows without padding — each per-image stat
            # below is a single vectorized numpy op)
            payloads = pdf["payload"].tolist()
            metas = pdf["meta"].tolist()
            n_bytes = np.fromiter(
                (len(p or b"") for p in payloads), dtype=np.int64, count=n
            )
            mean_l = np.empty(n)
            std_l = np.empty(n)
            aspect = np.empty(n)
            width = np.empty(n, dtype=np.int32)
            height = np.empty(n, dtype=np.int32)
            sum3 = np.empty(n, dtype=np.int64)
            sumsq3 = np.empty(n, dtype=np.int64)
            thumbs: list[list[float]] = []
            digests: list[str] = []
            for i in range(n):
                raw = decoder(payloads[i], metas[i])
                img = raw.astype(np.float64)
                luma = img.mean(axis=2)
                hh, ww = luma.shape
                # integer channel-sum image (3·luma): exact int64 domain for
                # the cross-engine-checkable stats and block sums
                l3 = raw.astype(np.int64).sum(axis=2)
                # 8x8 average pool via reshape-block mean (pad to mult. of 8)
                ph, pw = -hh % 8, -ww % 8
                lp = np.pad(luma, ((0, ph), (0, pw)), mode="edge")
                t8 = lp.reshape(
                    8, lp.shape[0] // 8, 8, lp.shape[1] // 8
                ).mean(axis=(1, 3))
                lp3 = np.pad(l3, ((0, ph), (0, pw)), mode="edge")
                bs = lp3.reshape(
                    8, lp3.shape[0] // 8, 8, lp3.shape[1] // 8
                ).sum(axis=(1, 3))
                mean_l[i] = luma.mean()
                std_l[i] = luma.std()
                aspect[i] = ww / hh
                width[i] = ww
                height[i] = hh
                sum3[i] = l3.sum()
                sumsq3[i] = (l3 * l3).sum()
                thumbs.append(t8.ravel().tolist())
                digests.append(
                    hashlib.md5(
                        ",".join(str(int(x)) for x in bs.ravel()).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": n_bytes.astype(np.int32),
                    "width": width,
                    "height": height,
                    "mean_luma": mean_l,
                    "std_luma": std_l,
                    "aspect_ratio": aspect,
                    "thumb8": thumbs,
                    "luma_sum3": sum3,
                    "luma_sumsq3": sumsq3,
                    "thumb_digest": digests,
                },
                columns=cols,
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def video_frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per sampled
    timestamp (decode stubbed as a payload-slice digest). Row explosion is
    declarative so Catalyst sizes partitions before the Python stage."""

    cols = [f.name for f in FRAME_SAMPLE_SCHEMA]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            # vectorized frame-grid expansion: repeat/arange build every
            # (media_id, frame_idx, t_ms) row in numpy; only the digest (the
            # stub "decode frame at t") touches Python per frame
            metas = pdf["meta"].tolist()
            durs = np.fromiter(
                (
                    (m["duration_ms"] or 0) if m is not None else 0
                    for m in metas
                ),
                dtype=np.int64,
                count=n,
            )
            counts = -(-durs // every_ms)  # ceil; 0 frames for dur <= 0
            counts = np.maximum(counts, 0)
            ids = np.repeat(pdf["media_id"].to_numpy(), counts)
            frame_idx = (
                np.concatenate([np.arange(c) for c in counts if c > 0])
                if counts.sum() > 0
                else np.array([], dtype=np.int64)
            )
            t_ms = frame_idx * every_ms
            payloads = np.repeat(
                np.asarray(pdf["payload"].tolist(), dtype=object), counts
            )
            # digest is md5 over the lowercase HEX of a 64-byte slice at a
            # payload-dependent offset — hex-string domain keeps the stub
            # reproducible in ANSI SQL (md5 of raw bytes isn't portable:
            # DuckDB's md5 only accepts VARCHAR)
            def _digest(p, t: int) -> str:
                p = p or b""
                lo = (t * 7919) % max(len(p), 1)
                s = p.hex()[2 * lo : 2 * lo + 128]
                return hashlib.md5((s or "00").encode()).hexdigest()

            digests = [_digest(p, t) for p, t in zip(payloads, t_ms.tolist())]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "t_ms": t_ms.astype(np.int32),
                    "frame_digest": digests,
                },
                columns=cols,
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("t_ms", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy_h60", T.LongType()),
    ]
)


def audio_window_features(media: DataFrame, win_ms: int = 500) -> DataFrame:
    """Audio windowing plumbing: one row per win_ms analysis window with the
    sample count that window covers (sample-rate-aware — the real contract a
    feature extractor needs) and a deterministic 60-bit energy proxy derived
    from a payload hex slice (the stubbed 'decode + RMS' step; the h60
    domain keeps it reproducible in ANSI SQL, so the whole plumbing is
    hash-checked). Same iterator shape as video_frame_sample: vectorized
    window-grid expansion, Python only per emitted window."""

    cols = [f.name for f in AUDIO_WINDOW_SCHEMA]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            metas = pdf["meta"].tolist()
            durs = np.fromiter(
                ((m["duration_ms"] or 0) if m is not None else 0 for m in metas),
                dtype=np.int64,
                count=n,
            )
            rates = np.fromiter(
                ((m["sample_rate"] or 0) if m is not None else 0 for m in metas),
                dtype=np.int64,
                count=n,
            )
            counts = np.maximum(-(-durs // win_ms), 0)
            ids = np.repeat(pdf["media_id"].to_numpy(), counts)
            win_idx = (
                np.concatenate([np.arange(c) for c in counts if c > 0])
                if counts.sum() > 0
                else np.array([], dtype=np.int64)
            )
            t_ms = win_idx * win_ms
            rate_rep = np.repeat(rates, counts)
            dur_rep = np.repeat(durs, counts)
            # last window may be short: samples = rate * min(win, dur-t) / 1000
            span = np.minimum(win_ms, dur_rep - t_ms)
            n_samples = rate_rep * span // 1000
            payloads = np.repeat(
                np.asarray(pdf["payload"].tolist(), dtype=object), counts
            )

            def _energy(p, t: int) -> int:
                p = p or b""
                lo = (t * 6151) % max(len(p), 1)
                s = p.hex()[2 * lo : 2 * lo + 64]
                return int(hashlib.md5((s or "00").encode()).hexdigest()[:15], 16)

            energy = [_energy(p, t) for p, t in zip(payloads, t_ms.tolist())]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_idx": win_idx.astype(np.int32),
                    "t_ms": t_ms.astype(np.int32),
                    "n_samples": n_samples.astype(np.int32),
                    "energy_h60": np.asarray(energy, dtype=np.int64),
                },
                columns=cols,
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        batches, AUDIO_WINDOW_SCHEMA
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from the documents testdata (text bytes as
    payload) — lets the multimodal plumbing run against driver-provided
    inputs without synthesizing external data.

    A document with NULL text or NULL n_chars yields NO media row (a failed
    upload/enrichment has no payload to decode) — found by the r13
    NULL-heavy robustness sweep, where a NULL payload crashed the decode
    kernel worker-side."""
    docs = docs.where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            (F.col("n_chars") % 32 + 8).cast("int").alias("width"),
            (F.col("n_chars") % 24 + 8).cast("int").alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(16000).alias("sample_rate"),
            ((F.col("n_chars") % 10 + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
