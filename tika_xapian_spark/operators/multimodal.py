"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata columns beside them. The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested. Image decode is
PIL-OPTIONAL, probed lazily at call time (``_pil_image``): on a cluster
whose Python env ships Pillow, ``use_fake=False`` runs the real decode /
histogram-features / resize with identical schemas; in this environment
(no image libraries) the real path raises ``NotImplementedError`` loudly
and the deterministic-fake mode — features from the payload's md5, exactly
reproducible in SQL — remains the oracle-gated default. Video decode stays
a documented stub (no av/cv2 anywhere).

At scale: binary payloads dominate bytes — the metadata pass reads only the
bytes it needs (mapInPandas streams Arrow batches; no payload ever reaches
the driver), and feature tables are written separately from payload tables so
downstream jobs never rescan media bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("n_bytes", LongType()),
        StructField("md5_hex", StringType()),
        StructField("magic", StringType()),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"%PDF", "pdf"),
    (b"RIFF", "riff"),
    (b"OggS", "ogg"),
]


def sniff_magic(payload: bytes) -> str:
    for sig, name in _MAGIC:
        if payload.startswith(sig):
            return name
    return "bin"


def _pil_image():
    """PIL detection, resolved lazily AT CALL TIME (inside the executor's
    Arrow batch, not at module import): the same code runs real decode on a
    cluster whose Python env ships Pillow and stays a loud stub here."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency probe

        return Image
    except ImportError:
        return None


def has_pil() -> bool:
    return _pil_image() is not None


def decode_image(payload: bytes):
    """Real image decode via PIL when available (returns a PIL.Image);
    raises NotImplementedError otherwise. The Spark plumbing around it is
    identical in both modes — only the per-batch body changes."""
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "environment (pip install Pillow enables the real path)"
        )
    import io

    return Image.open(io.BytesIO(payload))


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a feature extractor: bytes of md5(payload)
    scaled to [0, 1]. Exactly reproducible in SQL for the oracle."""
    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def real_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real feature extractor (PIL path): normalized ``dim``-bin grayscale
    histogram — deterministic given the decoder, same schema as the fake."""
    img = decode_image(payload).convert("L")
    counts = [0] * dim
    for px in img.tobytes():
        counts[min(px * dim // 256, dim - 1)] += 1
    total = sum(counts) or 1
    return [c / total for c in counts]


def binary_metadata(df: DataFrame, key: str, payload_col: str) -> DataFrame:
    """(doc, n_bytes, md5_hex, magic) via mapInPandas over Arrow batches —
    the payload bytes never leave the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc": pdf[key],
                "n_bytes": [len(b) for b in pdf[payload_col]],
                "md5_hex": [hashlib.md5(b).hexdigest() for b in pdf[payload_col]],
                "magic": [sniff_magic(bytes(b)) for b in pdf[payload_col]],
            }
            yield pd.DataFrame(out)

    return df.select(F.col(key), F.col(payload_col)).mapInPandas(run, META_SCHEMA)


def extract_features(
    df: DataFrame, key: str, payload_col: str, use_fake: bool = True
) -> DataFrame:
    """(doc, features float[FEATURE_DIM]) via mapInPandas. ``use_fake=False``
    calls the real decoder (NotImplementedError here — see module doc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield features_batch(pdf, key, payload_col, use_fake)

    return df.select(F.col(key), F.col(payload_col)).mapInPandas(run, FEATURE_SCHEMA)


def features_batch(
    pdf: pd.DataFrame, key: str, payload_col: str, use_fake: bool
) -> pd.DataFrame:
    """One Arrow batch of the feature pass — factored out so the real-PIL
    body is testable at the pandas level (the env ships no Pillow; tests
    inject a fake PIL module and drive this directly)."""
    fn = fake_features if use_fake else real_features
    feats = [fn(bytes(b)) for b in pdf[payload_col]]
    return pd.DataFrame({"doc": pdf[key], "features": feats})


def decode_video_frame(payload: bytes, frame_idx: int):
    """Real video frame decode — unavailable in this environment (no av/cv2).
    Swap this body for PyAV/OpenCV on a cluster that has it."""
    raise NotImplementedError(
        "video decode requires a media library not present in this environment"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    key: str,
    payload_col: str,
    frame_size: int = 64,
    stride: int = 2,
    use_fake: bool = True,
) -> DataFrame:
    """One payload row in -> N sampled-frame rows out (the UDTF-shaped
    multimodal op) via mapInPandas. The deterministic fake treats the payload
    as a sequence of ``frame_size``-byte frames and keeps every ``stride``-th
    one; ``use_fake=False`` routes each kept index through the (stubbed)
    real decoder. The fan-out shape, Arrow batching and schema are the real
    plumbing either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, idxs, md5s, lens = [], [], [], []
            for d, b in zip(pdf[key], pdf[payload_col]):
                b = bytes(b)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_size : (i + 1) * frame_size]
                    if not use_fake:
                        fr = decode_video_frame(b, i)
                    docs.append(d)
                    idxs.append(i)
                    md5s.append(hashlib.md5(fr).hexdigest())
                    lens.append(len(fr))
            yield pd.DataFrame(
                {"doc": docs, "frame_idx": idxs, "frame_md5": md5s,
                 "frame_bytes": lens}
            )

    return df.select(F.col(key), F.col(payload_col)).mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized_md5", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_image(
    df: DataFrame,
    key: str,
    payload_col: str,
    width: int = 8,
    height: int = 8,
    use_fake: bool = True,
) -> DataFrame:
    """(doc, width, height, resized_md5, n_bytes) via mapInPandas. The fake
    'resize' fingerprints payload+target-size deterministically (md5 of
    payload || ':WxH'); ``use_fake=False`` decodes with PIL (when present),
    resizes to WxH single-channel and fingerprints the real pixel bytes —
    same schema, n_bytes = w*h in both modes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield resize_batch(pdf, key, payload_col, width, height, use_fake)

    return df.select(F.col(key), F.col(payload_col)).mapInPandas(run, RESIZE_SCHEMA)


def resize_batch(
    pdf: pd.DataFrame,
    key: str,
    payload_col: str,
    width: int,
    height: int,
    use_fake: bool,
) -> pd.DataFrame:
    """One Arrow batch of the resize pass (pandas-testable, like
    features_batch)."""
    suffix = f":{width}x{height}".encode()
    md5s = []
    for b in pdf[payload_col]:
        if use_fake:
            md5s.append(hashlib.md5(bytes(b) + suffix).hexdigest())
        else:
            rb = (
                decode_image(bytes(b))
                .convert("L")
                .resize((width, height))
                .tobytes()
            )
            md5s.append(hashlib.md5(rb).hexdigest())
    return pd.DataFrame(
        {
            "doc": pdf[key],
            "width": width,
            "height": height,
            "resized_md5": md5s,
            "n_bytes": width * height,
        }
    )


def decode_audio(payload: bytes):
    """Real audio decode — unavailable in this environment (no librosa/
    soundfile/av). Swap this body in on a cluster that ships one."""
    raise NotImplementedError(
        "audio decode requires a media library not present in this environment"
    )


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("win_idx", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("window_md5", StringType()),
    ]
)


def window_audio(
    df: DataFrame,
    key: str,
    payload_col: str,
    sample_rate: int = 8000,
    win_ms: int = 25,
    hop_ms: int = 10,
    use_fake: bool = True,
) -> DataFrame:
    """Overlapped audio framing (the 25ms/10ms STFT windowing every speech
    pipeline starts with): one payload row -> one row per FULL window, via
    mapInPandas — the 1->N Arrow fan-out with OVERLAPPING slices (hop <
    window), which distinguishes it from the strided video-frame sampler.
    The deterministic fake treats the payload as s16le mono PCM at
    ``sample_rate``; ``use_fake=False`` routes through the (stubbed) real
    decoder. Schema, batching and fan-out are the real plumbing either
    way — the same discipline as sample_frames/decode_image."""
    win_samples = sample_rate * win_ms // 1000
    hop_samples = sample_rate * hop_ms // 1000
    if win_samples <= 0 or hop_samples <= 0:
        # hop truncating to 0 would spin the per-row while loop forever
        # on an executor (k never advances) — fail loudly at plan time
        raise ValueError(
            f"window/hop must cover >= 1 sample at {sample_rate} Hz "
            f"(win {win_ms}ms -> {win_samples}, hop {hop_ms}ms -> {hop_samples})"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, idxs, starts, ends, md5s = [], [], [], [], []
            for d, b in zip(pdf[key], pdf[payload_col]):
                b = bytes(b)
                if not use_fake:
                    b = decode_audio(b)
                n_samples = len(b) // 2  # s16le mono
                k = 0
                while k * hop_samples + win_samples <= n_samples:
                    lo = k * hop_samples * 2
                    fr = b[lo : lo + win_samples * 2]
                    docs.append(d)
                    idxs.append(k)
                    starts.append(k * hop_ms)
                    ends.append(k * hop_ms + win_ms)
                    md5s.append(hashlib.md5(fr).hexdigest())
                    k += 1
            yield pd.DataFrame(
                {
                    "doc": docs,
                    "win_idx": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "window_md5": md5s,
                }
            )

    return df.select(F.col(key), F.col(payload_col)).mapInPandas(
        run, AUDIO_WINDOW_SCHEMA
    )
