"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Design (per the 100 TB training-data-pipeline brief): media lives in
a ``binary`` column next to a metadata struct; decode / feature
extraction / frame sampling are per-partition Pandas iterators so a
task streams Arrow batches without materializing a partition of
blobs in memory at once. The Spark-side plumbing — schemas,
partitioning, UDF signatures, batch shapes — is real and tested; the
actual codec step is pluggable:

  * ``decoder="fake"`` (default here): a deterministic stand-in that
    parses the synthetic payload header written by
    ``attach_fake_media`` — the image/audio libs are not in this
    container.
  * ``decoder="pil"``: real decode via Pillow, import-gated; raises
    NotImplementedError with guidance when Pillow is absent.

Scale notes: all ops are map-side — at scale blobs never pass
through a shuffle (the only exception is the explicit spread of a
single-small-file source in local testing, where the scan gives one
partition); feature outputs are narrow (id + floats) so downstream
joins/aggregations shuffle only vectors, not media. Partition sizing
is the scan's job — keep ``spark.sql.files.maxPartitionBytes`` small
enough that a batch of blobs fits the Arrow budget.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media binary, media_type string, width int, height int, n_frames int"
)

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, feature array<float>"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, duration_s double, feature array<float>"
)

_MAGIC = b"FAKEMEDIA1"


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", kind: str = "image"
) -> DataFrame:
    """Deterministically synthesize a binary media column per row:
    payload = MAGIC | width | height | n_frames | pseudo-pixels derived
    from the id. Gives tests a real binary column with parseable
    structure and no external data."""
    n_frames = 8 if kind == "video" else 1
    idc = F.col(id_col).cast("long")
    width = (idc % 16 + 4).cast("int")
    height = (idc % 12 + 4).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.unhex(F.lpad(F.hex(width), 8, "0")),
        F.unhex(F.lpad(F.hex(height), 8, "0")),
        F.unhex(F.lpad(F.hex(F.lit(n_frames)), 8, "0")),
    )
    # pseudo-pixel body: md5 bytes of the id, repeated
    body = F.unhex(F.repeat(F.md5(idc.cast("string")), 4))
    return df.withColumn("media", F.concat(header, body)).withColumn(
        "media_type", F.lit(kind)
    )


def _parse_fake(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a FAKEMEDIA payload")
    off = len(_MAGIC)
    w, h, nf = _struct.unpack(">III", payload[off : off + 12])
    return w, h, nf, payload[off + 12 :]


from ..operators.dedup import spread  # canonical narrow-source spread helper


def _require_pil() -> None:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "decoder='pil' needs Pillow on the executors; this "
            "container ships without image libs — use decoder='fake'"
        ) from e


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    feature_dim: int = 8,
    decoder: str = "fake",
    repartition: int | bool | None = None,
) -> DataFrame:
    """(id, width, height, feature[feature_dim]) via mapInPandas.

    The fake decoder derives a deterministic feature vector from the
    payload bytes (byte-histogram moments) — stable across runs and
    partitionings. The 'pil' decoder is the real path: decode, resize
    to 32x32, mean-pool channels (import-gated).
    """

    df = spread(df, repartition)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pil":
            _require_pil()
        for pdf in batches:
            ids, ws, hs, feats = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[media_col]):
                if decoder == "fake":
                    w, h, _nf, body = _parse_fake(bytes(payload))
                    arr = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                    chunks = np.array_split(arr, feature_dim)
                    feat = np.array([c.mean() / 255.0 for c in chunks], dtype=np.float32)
                else:  # pragma: no cover - real decode path
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(payload)).convert("L").resize((32, 32))
                    px = np.asarray(img, dtype=np.float64)
                    chunks = np.array_split(px.ravel(), feature_dim)
                    w, h = img.size
                    feat = np.array([c.mean() / 255.0 for c in chunks], dtype=np.float32)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                feats.append(feat.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "feature": feats}
            )

    return df.select(id_col, media_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Video frame sampling: emit every n-th frame's bytes as its own
    row (fake codec: the payload body is split evenly into n_frames
    chunks). One input row fans out to ceil(n_frames / every_n) rows —
    mapInPandas handles the 1->N shape naturally."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf[id_col], pdf[media_col]):
                _w, _h, nf, body = _parse_fake(bytes(payload))
                if nf <= 0:
                    continue
                size = max(1, len(body) // nf)
                for fi in range(0, nf, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(body[fi * size : (fi + 1) * size])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, media_col).mapInPandas(run, FRAME_SCHEMA)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    sample_rate: int = 16_000,
    feature_dim: int = 8,
) -> DataFrame:
    """Audio stub: the payload body stands in for 8-bit PCM samples;
    emits (id, sample_rate, duration_s, chunked-energy feature). A
    real build swaps the body parse for soundfile/librosa decode
    (import-gated like the PIL path) — the Spark plumbing (binary in,
    typed metadata + vector out, map-side only) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, durs, feats = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[media_col]):
                _w, _h, _nf, body = _parse_fake(bytes(payload))
                samples = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                samples = (samples - 128.0) / 128.0  # center like PCM
                chunks = np.array_split(samples, feature_dim)
                rms = np.array(
                    [float(np.sqrt(np.mean(c**2))) if len(c) else 0.0 for c in chunks],
                    dtype=np.float32,
                )
                ids.append(i)
                srs.append(sample_rate)
                durs.append(len(samples) / sample_rate)
                feats.append(rms.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": srs,
                    "duration_s": durs,
                    "feature": feats,
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


PHASH_SCHEMA = "doc_id long, width int, height int, phash long"
PHASH_PIXELS = 48  # fake-decoder hash width (md5-derived body is 48
# oracle-replayable bytes); the pil path uses the standard 64-pixel
# 8x8 aHash, wrapped into the same signed-long column


def image_phash(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    decoder: str = "fake",
    repartition: int | bool | None = None,
) -> DataFrame:
    """Perceptual average-hash over the decoded image: bit i is set
    iff pixel_i exceeds the mean pixel — the classic aHash visual
    near-dup fingerprint (image dedup for multimodal training data).

    Integer-exact by construction: bit_i = (pixel_i * N > sum), no
    division — so the 48-bit hash replays identically on any engine,
    which is what lets a SQL oracle verify this mapInPandas decode
    path end-to-end (q101). The fake decoder hashes the 48 synthetic
    body bytes; the 'pil' decoder is the standard 64-bit aHash (8x8
    luminance resize; width/height report the ORIGINAL image dims)
    and is import-gated — this container has no image libs.

    Near-dup pairs over the hash: operators.dedup.banded_hamming_pairs.
    """

    df = spread(df, repartition)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pil":  # pragma: no cover - real decode path
            _require_pil()
        for pdf in batches:
            ids, ws, hs, phs = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[media_col]):
                if decoder == "fake":
                    w, h, _nf, body = _parse_fake(bytes(payload))
                    px = np.frombuffer(
                        body[:PHASH_PIXELS], dtype=np.uint8
                    ).astype(np.int64)
                else:  # pragma: no cover
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(payload)).convert("L")
                    w, h = img.size  # original dims, before the 8x8 resize
                    px = np.asarray(img.resize((8, 8)), dtype=np.int64).ravel()
                n = len(px)
                total = int(px.sum())
                ph = 0
                for j, pxj in enumerate(px.tolist()):
                    if pxj * n > total:
                        ph |= 1 << j
                if ph >= 1 << 63:  # 64-bit hashes: wrap into signed long
                    ph -= 1 << 64
                ids.append(i)
                ws.append(w)
                hs.append(h)
                phs.append(ph)
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "phash": phs}
            )

    return df.select(id_col, media_col).mapInPandas(run, PHASH_SCHEMA)
