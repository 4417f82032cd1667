"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

The Spark side is real and tested — schema, partition-friendly batch
shape, mapInPandas signatures, explode of frame samples. The *codec*
layer is stubbed: this container has no image/audio libraries, so
``decode_media`` understands only the deterministic synthetic container
format below and raises ``NotImplementedError`` for real formats
(PNG/JPEG/WAV/...) at the exact point where cv2/PIL/soundfile would be
invoked on a real cluster (the reference's decode point:
cv.imdecode(np.frombuffer(image_byte)) at
/root/reference/mocov1/data/dataset.py:271).

Synthetic container format (deterministic, self-describing):
  magic b'SYNM' | kind u8 (0=image,1=audio,2=video) | dims: for image
  (h u16, w u16) raw uint8 gray pixels; for audio (n u32) int16 samples;
  for video (n_frames u16, h u16, w u16) frames of raw uint8 gray.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<height:int,width:int,n_frames:int,sample_rate:int,format:string>"
)

_MAGIC = b"SYNM"
_KINDS = ("image", "audio", "video")


# ------------------------------------------------------------ synth encode
def encode_image(h: int, w: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=h * w, dtype=np.uint16).astype(np.uint8)
    return _MAGIC + struct.pack("<BHH", 0, h, w) + px.tobytes()


def encode_audio(n: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    samples = (rng.standard_normal(n) * 8000).astype(np.int16)
    return _MAGIC + struct.pack("<BI", 1, n) + samples.tobytes()


def encode_video(n_frames: int, h: int, w: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=n_frames * h * w, dtype=np.uint16).astype(
        np.uint8
    )
    return _MAGIC + struct.pack("<BHHH", 2, n_frames, h, w) + px.tobytes()


def synth_media(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic media table covering all three kinds."""
    rows = []
    for i in range(n):
        kind = _KINDS[i % 3]
        if kind == "image":
            h, w = 16 + (i % 5) * 8, 24 + (i % 7) * 8
            rows.append(
                (i, kind, encode_image(h, w, i),
                 {"height": h, "width": w, "n_frames": None,
                  "sample_rate": None, "format": "synm"})
            )
        elif kind == "audio":
            ns = 1000 + (i % 9) * 500
            rows.append(
                (i, kind, encode_audio(ns, i),
                 {"height": None, "width": None, "n_frames": None,
                  "sample_rate": 16000, "format": "synm"})
            )
        else:
            nf, h, w = 4 + i % 5, 16, 16
            rows.append(
                (i, kind, encode_video(nf, h, w, i),
                 {"height": h, "width": w, "n_frames": nf,
                  "sample_rate": None, "format": "synm"})
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------------------------ decode
def decode_media(content: bytes):
    """Synthetic-container decode. REAL-FORMAT STUB: anything that is not
    the SYNM container raises — replace this branch with
    cv2.imdecode / soundfile.read / pyav on a real cluster."""
    if content[:4] != _MAGIC:
        raise NotImplementedError(
            "real media codecs (PNG/JPEG/WAV/MP4) are not available in "
            "this environment; only the SYNM synthetic container decodes"
        )
    kind = content[4]
    if kind == 0:
        h, w = struct.unpack_from("<HH", content, 5)
        px = np.frombuffer(content, np.uint8, h * w, 9).reshape(h, w)
        return "image", px
    if kind == 1:
        (n,) = struct.unpack_from("<I", content, 5)
        return "audio", np.frombuffer(content, np.int16, n, 9)
    nf, h, w = struct.unpack_from("<HHH", content, 5)
    px = np.frombuffer(content, np.uint8, nf * h * w, 11).reshape(nf, h, w)
    return "video", px


# ------------------------------------------------------- feature extraction
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "mean double, std double, p_low double, p_high double, "
    "h int, w int, n_units int"
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Per-item decoded features (mean/std/extremes + shape) in Arrow
    batches. Binary payloads stream through Arrow — one decode+reduce per
    item, all numpy."""

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "n_bytes", "mean", "std",
                "p_low", "p_high", "h", "w", "n_units")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, arr = decode_media(bytes(content))
                a = arr.astype(np.float64)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(content))
                out["mean"].append(round(float(a.mean()), 6))
                out["std"].append(round(float(a.std()), 6))
                out["p_low"].append(float(np.percentile(a, 1)))
                out["p_high"].append(float(np.percentile(a, 99)))
                if kind == "image":
                    out["h"].append(arr.shape[0]); out["w"].append(arr.shape[1])
                    out["n_units"].append(arr.size)
                elif kind == "video":
                    out["h"].append(arr.shape[1]); out["w"].append(arr.shape[2])
                    out["n_units"].append(arr.shape[0])
                else:
                    out["h"].append(0); out["w"].append(0)
                    out["n_units"].append(arr.size)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "media_id bigint, h int, w int, content binary"


def resize_images(media: DataFrame, out_h: int = 16, out_w: int = 16) -> DataFrame:
    """Nearest-neighbor resize of image payloads (pure numpy indexing —
    the cv2.resize stand-in), re-encoded to the synthetic container."""

    def run(batches):
        for pdf in batches:
            ids, hs, ws, outs = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, arr = decode_media(bytes(content))
                if kind != "image":
                    continue
                yi = (np.arange(out_h) * arr.shape[0] // out_h)
                xi = (np.arange(out_w) * arr.shape[1] // out_w)
                small = arr[np.ix_(yi, xi)]
                ids.append(int(mid)); hs.append(out_h); ws.append(out_w)
                outs.append(
                    _MAGIC + struct.pack("<BHH", 0, out_h, out_w)
                    + small.tobytes()
                )
            yield pd.DataFrame(
                {"media_id": ids, "h": hs, "w": ws, "content": outs}
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = "media_id bigint, frame_idx int, mean double"


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: every ``stride``-th frame of each video exploded to
    one row with a per-frame statistic (the sliding-window slicer shape,
    /root/reference/mocov1/data/dataset.py:37-51)."""

    def run(batches):
        for pdf in batches:
            ids, idxs, means = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, arr = decode_media(bytes(content))
                if kind != "video":
                    continue
                for fi in range(0, arr.shape[0], stride):
                    ids.append(int(mid))
                    idxs.append(fi)
                    means.append(round(float(arr[fi].mean()), 6))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "mean": means}
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
