"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (BASELINE north-star extension).

Design for 100 TB: media bytes ride in a ``binary`` column next to a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes stream through
workers without driver involvement, and the *metadata* (small) is
what shuffles. The image/audio codec libraries are NOT in this
container (environment contract), so the decode kernels are stubbed:
:func:`decode_image` raises ``NotImplementedError`` where a real
codec would run, while :func:`media_features` uses a deterministic
byte-level extractor so the full Spark plumbing — schema, batch
shape, partitioning — is real and testable (and oracle-checkable:
byte length + a rolling byte checksum are engine-independent).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col

#: schema of the typed metadata struct carried beside media bytes
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, checksum bigint"


def as_media(
    df: DataFrame,
    bytes_col: ColumnLike,
    media_type: str,
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Wrap a binary column as a media column with a metadata struct
    (unknown dims until decode → nulls)."""
    return df.select(
        _col(id_col).alias("doc_id"),
        _col(bytes_col).cast("binary").alias("media"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(raw: bytes) -> "object":
    """Real image decode — requires a codec library (PIL/opencv), not
    present in this container by contract. The mapInPandas plumbing
    around it is exercised with :func:`media_features` instead."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "plug PIL/cv2 here in a full deployment"
    )


def media_features(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Deterministic byte-level feature extraction via ``mapInPandas``
    — the stand-in for decode+featurize with identical plumbing.

    Features: payload size and a base-257 rolling checksum mod
    2^31−1 (both reproducible in SQL from the source text, so the
    whole multimodal path is oracle-checkable)."""
    import numpy as np
    import pandas as pd

    P = (1 << 31) - 1

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            datas = [bytes(r) if r is not None else b"" for r in b[media_col]]
            texts = [d.decode("utf-8") for d in datas]
            n = len(texts)
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            maxlen = int(lens.max()) if n else 0
            # code-point matrix via utf-32 reinterpretation (no per-char
            # Python); Horner fold vectorized ACROSS docs, sequential
            # only over positions. acc·257 + cp < 2^41 — exact in int64.
            mat = np.zeros((n, maxlen), dtype=np.int64)
            for i, t in enumerate(texts):
                if t:
                    mat[i, : len(t)] = np.frombuffer(
                        t.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
            acc = np.zeros(n, dtype=np.int64)
            for j in range(maxlen):
                stepped = (acc * 257 + mat[:, j]) % P
                acc = np.where(j < lens, stepped, acc)
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].to_numpy(),
                    "n_bytes": np.array([len(d) for d in datas], dtype=np.int32),
                    "checksum": acc,
                }
            )

    return df.select(id_col, media_col).mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int, id_col: ColumnLike = "doc_id"
) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame index
    based on metadata (``n_frames``), without decoding — the shape of
    a video pipeline stage where the decode kernel is pluggable.
    Rows explode JVM-side; the stub keeps frames as (doc_id, frame_idx)."""
    return df.select(
        _col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_plan(
    df: DataFrame,
    target_w: int,
    target_h: int,
    keep_aspect: bool = True,
) -> DataFrame:
    """Resize *plan*: per-image output dimensions + scale factor from
    METADATA only (no decode, pure Column math). With ``keep_aspect``
    the image letterboxes into the target (scale = min of the two
    ratios, rounded output dims); otherwise dims are exactly the
    target. Unknown source dims (null width/height) pass through as
    nulls — the decode stage resolves them at kernel time.

    This is the JVM half of a resize stage; pair with
    :func:`resize_images` for the (pluggable) pixel kernel.
    """
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    if keep_aspect:
        scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
        out_w = F.round(w * scale).cast("int")
        out_h = F.round(h * scale).cast("int")
    else:
        scale = F.lit(None).cast("double")
        out_w, out_h = F.lit(target_w), F.lit(target_h)
    return df.withColumn(
        "resize",
        F.struct(
            out_w.alias("out_w"), out_h.alias("out_h"), scale.alias("scale")
        ),
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    kernel=None,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Arrow-batched resize stage: bytes → ``kernel(raw, w, h)`` →
    resized bytes. The default kernel is :func:`decode_image` (raises
    — codec libs absent by environment contract); tests inject a
    deterministic fake. Output schema ``(doc_id, media binary)``;
    bytes stay executor-side, only metadata shuffles downstream.
    """
    import pandas as pd

    k = kernel if kernel is not None else (
        lambda raw, w, h: decode_image(raw)
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = [k(bytes(b), target_w, target_h) for b in pdf[media_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col], "media": out})

    return df.select(id_col, media_col).mapInPandas(
        run, schema="doc_id bigint, media binary"
    )


def audio_chunk_plan(
    df: DataFrame,
    window_s: float,
    hop_s: float,
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Audio windowing *plan*: one row per (doc, chunk start-sample)
    from metadata (``sample_rate`` × assumed duration from
    ``n_frames``), no decode. Mirrors :func:`frame_sample_plan` for
    the audio modality; the sample-extraction kernel is pluggable."""
    sr = F.coalesce(F.col("meta.sample_rate"), F.lit(16000))
    total = F.coalesce(F.col("meta.n_frames"), F.lit(1)).cast("long")
    win = (sr.cast("double") * window_s).cast("long")
    hop = (sr.cast("double") * hop_s).cast("long")
    return df.select(
        _col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(total - win, F.lit(0).cast("long")),
                hop,
            )
        ).alias("start_sample"),
        win.alias("window_samples"),
    )
