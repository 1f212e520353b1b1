"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star).

Decode kernels are import-guarded (scipy-shim pattern,
``sources/matfiles.py``): when PIL is importable the image decode/resize
kernels are REAL (Image.open / resize, PIL-gated pytest); in codec-less
containers a deterministic fake takes over. Either way the Spark-side
plumbing is identical and tested: binary schema, Arrow batch shape through
mapInPandas, per-partition bounded memory, metadata pushdown.

At 100 TB the pattern is: binary payloads live in parquet alongside typed
metadata columns; filters run on metadata (pushed to the scan, payloads
never deserialized); decode/feature-extract runs as Arrow-batched Python
only on the filtered survivors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder if available (not in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_binary_payload(df: DataFrame, src_col: str, out: str = "payload") -> DataFrame:
    """Treat a column's bytes as an opaque binary payload (for testdata we
    encode the text column; real data carries image/audio bytes)."""
    return df.withColumn(out, F.encode(F.col(src_col), "UTF-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata extraction — no Python, scan-shaped: byte length
    and content digest. This is the filter layer that runs BEFORE any
    decode at scale."""
    return df.withColumn("n_bytes", F.octet_length(payload_col).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def _pil_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Real image decode (runs when PIL is importable — not in this
    container, covered by a PIL-gated pytest elsewhere): dimensions,
    channel count, and grayscale mean intensity in [0, 1]."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        n_channels = len(im.getbands())
        gray = im.convert("L")
        data = gray.tobytes()
        mean_intensity = (sum(data) / max(len(data), 1)) / 255.0
    return width, height, n_channels, mean_intensity


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake 'image' decode for containers without a codec:
    dimensions and mean intensity derived from the bytes — clearly marked
    stub per the brief; the PIL kernel takes over when importable."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, 3, mean_intensity


_decode_kernel = _pil_decode if _HAS_PIL else _fake_decode


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kernel=None,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas: the real production shape —
    batches of binary payloads stream through Python workers, output is a
    typed metadata frame. The default kernel is PIL when importable, the
    deterministic fake otherwise — the plan is identical either way; pass
    ``kernel=`` explicitly to pin one (the catalog face pins the fake,
    since testdata payloads are utf8 text, not images)."""
    kern = kernel or _decode_kernel

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [kern(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(rows, columns=["width", "height", "n_channels", "mean_intensity"])
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(decode, schema=_DECODE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling stub: emits (id, frame_idx) rows for frames
    0, n, 2n, ... where the fake frame count derives from payload length.
    Real implementation would demux with pyav — gated the same way."""
    n_frames = (F.octet_length(payload_col) % 100 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def fake_resize_kernel(target_w: int, target_h: int):
    """Deterministic codec-less resize kernel factory: emits a byte buffer
    of the true target size (w*h*3) derived from the payload."""
    n_out = target_w * target_h * 3

    def _resize_one(p: bytes) -> bytes:
        return ((p or b"\x00") * (n_out // max(len(p), 1) + 1))[:n_out]

    return _resize_one


def pil_resize_kernel(target_w: int, target_h: int):
    """Real resize kernel factory (requires PIL): decode, resize, raw RGB."""

    def _resize_one(p: bytes) -> bytes:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(p)) as im:
            return im.convert("RGB").resize((target_w, target_h)).tobytes()

    return _resize_one


def resize_images(
    df: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kernel=None,
) -> DataFrame:
    """Resize with real Arrow plumbing: batches of binary payloads in,
    batches of (id, w, h, resized binary) out via mapInPandas. The default
    kernel is PIL when importable (decode → resize → raw RGB bytes), the
    deterministic fake otherwise; pass ``kernel=`` (a bytes→bytes callable,
    e.g. ``fake_resize_kernel(w, h)``) to pin one — mirrors
    :func:`decode_images`, needed when payloads aren't real images."""
    _resize_one = kernel or (
        pil_resize_kernel(target_w, target_h)
        if _HAS_PIL
        else fake_resize_kernel(target_w, target_h)
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": target_w,
                    "height": target_h,
                    "resized": [_resize_one(bytes(p)) for p in pdf[payload_col]],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(resize, schema=_RESIZE_SCHEMA)


_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    frame_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature-extract stub (audio → per-frame RMS energy): payload is
    chopped into fixed-byte frames, one output row per frame. The fake
    kernel computes RMS over raw bytes; a real one would decode PCM via
    soundfile/librosa behind the same mapInPandas signature. Row-expanding
    UDF output (1 payload → N frames) is the part worth testing: the
    iterator contract allows output batches longer than input batches."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rms = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                for i in range(0, max(len(b), 1), frame_bytes):
                    frame = b[i : i + frame_bytes] or b"\x00"
                    ids.append(doc_id)
                    idxs.append(i // frame_bytes)
                    rms.append((sum(x * x for x in frame) / len(frame)) ** 0.5)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "rms": rms})

    return df.select(id_col, payload_col).mapInPandas(feats, schema=_AUDIO_FEAT_SCHEMA)
