"""Multimodal (image/audio/video) columns for training-data pipelines.

Media rides through the engine as opaque ``binary`` columns plus typed
metadata, exactly like a parquet-native lakehouse layout: the bytes
are never parsed by Spark's row machinery, only by vectorized Arrow
UDF stages.  Everything Spark-side here is real and tested — schema,
partition-safe batch shapes, JVM-side type sniffing, vectorized
byte-level features; the codec-dependent steps (JPEG decode, audio
resample, video frame extraction) are gated behind import-tries of the
optional libraries (PIL / soundfile / av are NOT in this container)
with a deterministic fake decoder provided so downstream plumbing can
be exercised end-to-end.

Scale notes (100 TB): media bytes dominate row size, so every operator
here is a narrow map over the existing partitioning — no shuffles, no
driver collection; feature extraction emits small fixed-width vectors
that ARE shuffle-safe.  Batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for multi-MB media rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "sniff_media_type",
    "media_stats",
    "byte_histogram_features",
    "decode_images",
    "fake_decode_images",
    "sample_frames",
]

# magic-number prefixes, matched JVM-side (no Python in the plan)
_MAGIC = [
    ("image/png", "89504E47"),
    ("image/jpeg", "FFD8FF"),
    ("image/gif", "47494638"),
    ("audio/wav", "52494646"),   # RIFF
    ("audio/mpeg", "494433"),    # ID3
    ("video/mp4", "000000"),     # ISO BMFF size prefix (weak; ftyp checked below)
]


def sniff_media_type(
    docs: DataFrame, media_col: str = "media", out_col: str = "media_type"
) -> DataFrame:
    """Magic-number media-type detection, entirely JVM-side
    (hex(substring(bytes)) prefix compare — whole-stage codegen)."""
    head = F.upper(F.hex(F.expr(f"substring({media_col}, 1, 12)")))
    expr = F.lit("application/octet-stream")
    # ISO BMFF: bytes 5-8 spell 'ftyp'
    expr = F.when(
        F.upper(F.hex(F.expr(f"substring({media_col}, 5, 4)"))) == "66747970",
        F.lit("video/mp4"),
    ).otherwise(expr)
    for mtype, magic in _MAGIC[:-1]:
        expr = F.when(head.startswith(magic), F.lit(mtype)).otherwise(expr)
    return docs.withColumn(out_col, expr)


def media_stats(docs: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap JVM-side integrity/size stats: byte length + crc32."""
    return docs.withColumn("media_bytes", F.length(F.col(media_col))).withColumn(
        "media_crc32", F.crc32(F.col(media_col))
    )


def byte_histogram_features(
    docs: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    bins: int = 64,
) -> DataFrame:
    """Content-based features without any codec: an L1-normalized
    byte-value histogram (float32[bins]) per media blob — enough for
    near-dup detection / clustering of raw media, and the exact shape
    a learned-embedding stage would emit.  Whole-batch vectorized: the
    batch's blobs concatenate into ONE buffer and a single bincount
    over (row_index * bins + bucket) produces every histogram."""
    assert 256 % bins == 0
    shift = 256 // bins

    def feats(batches):
        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf[media_col]]
            lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
            buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            row_of_byte = np.repeat(np.arange(len(blobs), dtype=np.int64), lens)
            flat = np.bincount(
                row_of_byte * bins + (buf // shift),
                minlength=len(blobs) * bins,
            ).reshape(len(blobs), bins)
            denom = np.maximum(lens, 1)[:, None]
            hist = (flat / denom).astype(np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "features": [h.tolist() for h in hist],
                }
            )

    return docs.select(id_col, media_col).mapInPandas(
        feats, schema="doc_id bigint, features array<float>"
    )


def _pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_images(
    docs: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    size: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Real image decode + resize -> grayscale pixel array.

    Requires PIL, which is NOT installed in this container: the Spark
    plumbing (schema, Arrow batch shape, per-row null safety) is real
    and identical to fake_decode_images; only the pixel source differs.
    """
    if _pil() is None:
        raise NotImplementedError(
            "image decode requires PIL (not available in this environment); "
            "use fake_decode_images for plumbing tests"
        )
    Image = _pil()
    import io

    def dec(batches):
        for pdf in batches:
            out = []
            for b in pdf[media_col]:
                img = Image.open(io.BytesIO(bytes(b))).convert("L").resize(size)
                out.append(np.asarray(img, dtype=np.float32).ravel().tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(dtype=np.int64), "pixels": out}
            )

    return docs.select(id_col, media_col).mapInPandas(
        dec, schema="doc_id bigint, pixels array<float>"
    )


def fake_decode_images(
    docs: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    size: tuple[int, int] = (32, 32),
) -> DataFrame:
    """DETERMINISTIC FAKE decoder (clearly marked): pixels are a
    content-seeded pseudo-random field, so the full decode -> feature
    -> train pipeline can run and be asserted on without image libs.
    Batch shape, schema and null handling match decode_images exactly."""
    h, w = size

    def dec(batches):
        for pdf in batches:
            out = []
            for b in pdf[media_col]:
                b = bytes(b) if b is not None else b""
                seed = np.frombuffer(b[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
                rng = np.random.default_rng(int(seed))
                out.append(
                    rng.random(h * w, dtype=np.float32).astype(np.float32).tolist()
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(dtype=np.int64), "pixels": out}
            )

    return docs.select(id_col, media_col).mapInPandas(
        dec, schema="doc_id bigint, pixels array<float>"
    )


def sample_frames(
    docs: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    frame_bytes: int = 4096,
    every_n: int = 8,
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame with
    (doc_id, frame_index, frame binary).  A real container demuxer (av)
    is not available here, so frames are fixed-size byte windows — the
    partitioning/explosion shape is exactly what a demuxer stage
    produces: the row count multiplies by frames-per-video, which is
    why this runs BEFORE any shuffle and emits bounded-size frames."""

    def frames(batches):
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for did, b in zip(pdf[id_col], pdf[media_col]):
                b = bytes(b) if b is not None else b""
                n_frames = max(len(b) // frame_bytes, 0)
                for fi in range(0, n_frames, every_n):
                    ids.append(did)
                    idxs.append(fi)
                    blobs.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "frame": blobs}
            )

    return docs.select(id_col, media_col).mapInPandas(
        frames, schema="doc_id bigint, frame_index int, frame binary"
    )
