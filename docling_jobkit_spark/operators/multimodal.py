"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a metadata
struct — the same row-shape discipline as the html payload (and as the
reference's page-image bytes in its parquet sink,
``convert/results_processor.py:289-370``: ``page_images: list<bytes>``,
``features: list<int>``).

The actual codec decode is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless a
deterministic fake is requested. Everything Spark-side is real and
tested — schema, Arrow batch shape, mapInPandas plumbing, partitioning —
so swapping in a real decoder is a one-function change.

The deterministic fake derives metadata purely from the bytes (length,
sha-256 prefix ints) so it has an exact SQL oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Real decode is unavailable in this environment — STUB.

    With ``fake=True`` returns deterministic byte-derived pseudo-metadata
    (the shape a real decoder would produce)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library not present in "
            "this environment; use fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "content_hash": h[:16],
        "width": int(h[:4], 16) % 4096,
        "height": int(h[4:8], 16) % 4096,
        "n_frames": 1,
        # 8-dim byte-histogram-ish feature, deterministic
        "feature": [float(int(h[i * 2 : i * 2 + 2], 16)) / 255.0 for i in range(8)],
    }


def _media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "n_bytes", "content_hash", "width", "height",
            "n_frames", "feature",
        )}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            meta = decode_image(bytes(payload), fake=True)
            out["media_id"].append(mid)
            for k in ("n_bytes", "content_hash", "width", "height", "n_frames", "feature"):
                out[k].append(meta[k])
        yield pd.DataFrame(out)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """media(media_id, payload binary) → metadata rows. Same Arrow-batched
    shape as the text extraction operator; payload column pruned to the
    two needed columns before the Python boundary."""
    return media.select("media_id", "payload").mapInPandas(
        _media_batches, schema=MEDIA_META_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sample_frames(payload: bytes, every_ms: int, fake: bool = False) -> list[dict]:
    """Video frame sampling — STUB (no codec libs in this container).

    The deterministic fake derives a frame count from the payload hash
    and emits byte-slice 'frames', so the Spark-side 1→N explode shape,
    schema, and batch behavior are fully real and tested."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires a codec library not present in this "
            "environment; use fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).hexdigest()
    n_frames = 1 + int(h[8:10], 16) % 8
    w, h_px = int(h[:4], 16) % 1920, int(h[4:8], 16) % 1080
    step = max(1, len(payload) // max(n_frames, 1))
    return [
        {
            "frame_index": i,
            "frame_ts_ms": i * every_ms,
            "frame": payload[i * step : i * step + min(64, step)],
            "width": w,
            "height": h_px,
        }
        for i in range(n_frames)
    ]


def _frame_batches(batches: Iterator[pd.DataFrame], every_ms: int) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "media_id", "frame_index", "frame_ts_ms", "frame", "width", "height",
        )}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            for fr in sample_frames(bytes(payload), every_ms, fake=True):
                out["media_id"].append(mid)
                for k in ("frame_index", "frame_ts_ms", "frame", "width", "height"):
                    out[k].append(fr[k])
        if out["media_id"]:
            yield pd.DataFrame(out)


def explode_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """media(media_id, payload) → one row per sampled frame (the 1→N
    multimodal explode; at scale the heavy frame bytes never leave the
    task that decoded them — downstream feature extraction fuses in)."""
    return media.select("media_id", "payload").mapInPandas(
        lambda it: _frame_batches(it, every_ms), schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image(
    payload: bytes, max_side: int, fake: bool = False
) -> dict:
    """Image resize — STUB (no codec libs in this container).

    The deterministic fake reads the fake-decoded dimensions, applies
    the real aspect-preserving max-side arithmetic (the part a real
    resizer shares verbatim), and emits a byte-slice stand-in whose
    length scales with the target area — so batch memory behavior is
    shaped like a real thumbnailer's."""
    if not fake:
        raise NotImplementedError(
            "image resizing requires an image codec library not present in "
            "this environment; use fake=True for the deterministic stub"
        )
    meta = decode_image(payload, fake=True)
    w, h = max(meta["width"], 1), max(meta["height"], 1)
    scale = min(1.0, max_side / float(max(w, h)))
    tw, th = max(1, int(w * scale)), max(1, int(h * scale))
    n_out = min(len(payload), max(1, (tw * th) // 64))
    return {
        "src_width": w,
        "src_height": h,
        "width": tw,
        "height": th,
        "resized": payload[:n_out],
    }


def _resize_batches(
    batches: Iterator[pd.DataFrame], max_side: int
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            k: []
            for k in ("media_id", "src_width", "src_height", "width", "height", "resized")
        }
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            r = resize_image(bytes(payload), max_side, fake=True)
            out["media_id"].append(mid)
            for k in ("src_width", "src_height", "width", "height", "resized"):
                out[k].append(r[k])
        yield pd.DataFrame(out)


def resize_images(media: DataFrame, max_side: int = 512) -> DataFrame:
    """media(media_id, payload) → aspect-preserving resized payloads
    (the thumbnail/normalize pass a vision-training pipeline runs before
    feature extraction). Same fusion posture as explode_frames: the
    heavy bytes stay inside the task that decoded them — resize chains
    onto the decode batch, nothing multimodal ever shuffles."""
    return media.select("media_id", "payload").mapInPandas(
        lambda it: _resize_batches(it, max_side), schema=RESIZED_SCHEMA
    )


def media_metadata_relational(media: DataFrame) -> DataFrame:
    """The deterministic-fake metadata expressed RELATIONALLY (no Python)
    — bit-identical to the fake decoder, and SQL-oracle-checkable. At
    scale this is the admission/statistics pass that runs before any real
    decode; the real decode only ever sees admitted rows."""
    h = F.sha2(F.col("payload"), 256)
    return media.select(
        F.col("media_id"),
        F.length("payload").cast("long").alias("n_bytes"),
        F.substring(h, 1, 16).alias("content_hash"),
        F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(4096))
        .cast("int")
        .alias("width"),
        F.pmod(F.conv(F.substring(h, 5, 4), 16, 10).cast("long"), F.lit(4096))
        .cast("int")
        .alias("height"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("media_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def image_features(payload: bytes, dim: int = 64, fake: bool = False) -> list[float]:
    """Image feature extraction (the embedding pass a vision-training
    pipeline runs after decode/resize) — STUB (no model runtime in this
    container).

    The deterministic fake stretches sha256(payload || block) over
    ``dim`` floats in [-1, 1] and L2-normalizes, so the output is a
    REAL unit-norm embedding: cosine ANN, IVF assignment, SemDeDup, and
    PQ all compose on it exactly as they would on a model's output.
    Swapping in a real encoder changes this one function."""
    if not fake:
        raise NotImplementedError(
            "image feature extraction requires a vision model runtime not "
            "present in this environment; use fake=True for the "
            "deterministic stub"
        )
    vals: list[float] = []
    block = 0
    while len(vals) < dim:
        h = hashlib.sha256(payload + block.to_bytes(4, "big")).digest()
        vals.extend(b / 127.5 - 1.0 for b in h)
        block += 1
    vals = vals[:dim]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def _feature_batches(
    batches: Iterator[pd.DataFrame], dim: int
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"vec_id": [], "media_id": [], "embedding": []}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            p = bytes(payload)
            # 56-bit id: the stable_hash64 posture (inside a signed long
            # in every engine), derived from the payload so re-extraction
            # is idempotent
            out["vec_id"].append(
                int(hashlib.sha256(p).hexdigest()[:14], 16)
            )
            out["media_id"].append(mid)
            out["embedding"].append(image_features(p, dim=dim, fake=True))
        yield pd.DataFrame(out)


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """media(media_id, payload) → (vec_id, media_id, embedding) — the
    multimodal→vector bridge. The output shape IS the embeddings-table
    contract (``vec_id``, unit-norm ``embedding``), so everything in the
    vector family — ``ann_cosine_topk``, ``ivf_assign`` +
    ``write_ivf_index``, ``semdedup``, ``pq_encode`` — runs on it
    unchanged (composition pinned in tests). Same fusion posture as the
    other multimodal passes: heavy payload bytes never leave the task
    that read them; only (id, dim-float vector) rows emerge."""
    return media.select("media_id", "payload").mapInPandas(
        lambda it: _feature_batches(it, dim), schema=FEATURE_SCHEMA
    )
