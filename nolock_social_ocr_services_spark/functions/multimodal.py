"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark-side architecture here is real and tested — schemas,
partition-preserving batch iteration, UDF signatures, batch shapes. The
codec step itself is STUBBED (this container has no image/audio libs):
``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded pure function of the
payload bytes produces stable metadata + features, which is what the
tests pin down. Swapping the fake for Pillow/ffmpeg is a one-function
change; nothing in the Spark plan moves.

The reference treats payloads the same way: opaque byte streams with a
sniffed MIME (OcrRequestHandler.cs:69-82) handed to an external decoder.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for a real image decoder: dims + a feature
    vector derived from the payload digest. Stable across runs/hosts.

    The digest hashes the UPPERCASE HEX of the payload (not the raw
    bytes) so an independent SQL oracle can recompute it — DuckDB's
    ``md5`` only accepts VARCHAR, and ``md5(hex(blob))`` is its exact
    equivalent (see the decode_image_meta oracle in queries.py)."""
    d = hashlib.md5(payload.hex().upper().encode("ascii")).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + (d[2] % 2) * 2  # 1 or 3
    rng = np.frombuffer(d, dtype=np.uint8).astype(np.float64)
    feats = np.resize(rng, FEATURE_DIM) / 255.0
    return width, height, channels, feats


def decode_image_batch(
    payloads: pd.Series, deterministic_fake: bool = False
) -> pd.DataFrame:
    """One Arrow batch: binary payloads -> (width,height,channels,
    decode_ok, features). Real decoder NOT available in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires Pillow/libvips (not in this container); "
            "pass deterministic_fake=True for the seeded stand-in"
        )
    metas = []
    feats = []
    for p in payloads:
        if p is None or len(p) == 0:
            metas.append((None, None, None, False))
            feats.append(None)
        else:
            w, h, c, f = _fake_decode(bytes(p))
            metas.append((w, h, c, True))
            feats.append(f.tolist())
    out = pd.DataFrame(metas, columns=["width", "height", "channels", "decode_ok"])
    out["features"] = feats
    return out


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    deterministic_fake: bool = False,
) -> DataFrame:
    """mapInPandas stage: append image metadata + feature vector columns.

    Batch shape contract: output rows == input rows per batch, original
    columns preserved, so the stage composes anywhere in a pipeline
    without realignment joins.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_image_batch(
                pdf[payload_col], deterministic_fake=deterministic_fake
            )
            yield pd.concat(
                [pdf.reset_index(drop=True), decoded.reset_index(drop=True)], axis=1
            )

    return df.mapInPandas(process, schema=out_schema)


def frame_sample_offsets(
    duration_ms: F.Column, every_ms: int = 1000
) -> F.Column:
    """Video frame-sampling plan: offsets [0, every_ms, ...] < duration.
    Pure built-ins; the decode of each offset would be another
    mapInPandas stage over (payload, offset)."""
    return F.sequence(
        F.lit(0), F.greatest(duration_ms - 1, F.lit(0)), F.lit(every_ms)
    )


def resize_dims(
    width: F.Column, height: F.Column, max_side: int = 256
) -> F.Column:
    """Aspect-preserving fit-in-box target dims, pure built-ins (stays
    in whole-stage codegen): struct(target_w, target_h). Images already
    inside the box keep their dims (no upscaling)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(width, height).cast("double"),
    )
    return F.struct(
        F.greatest(F.floor(width * scale), F.lit(1)).cast("int").alias("target_w"),
        F.greatest(F.floor(height * scale), F.lit(1)).cast("int").alias("target_h"),
    )


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    max_side: int = 256,
    deterministic_fake: bool = False,
) -> DataFrame:
    """mapInPandas resize stage. Target dims are computed JVM-side by
    ``resize_dims`` (so the plan prunes to only the needed columns); the
    pixel resample itself is the stubbed codec step — the fake emits a
    payload-digest token as the "resized" payload so tests can pin
    row alignment and schema without an image library.
    """
    with_dims = df.withColumn(
        "_target", resize_dims(F.col(width_col), F.col(height_col), max_side)
    )
    # `_target` is a stage-internal helper: it must not leak into the
    # output schema (downstream selects / written schemas).
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("resized", T.BinaryType(), True)]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "pixel resample requires Pillow/libvips; pass "
                    "deterministic_fake=True for the seeded stand-in"
                )
            resized = []
            for p, t in zip(pdf[payload_col], pdf["_target"]):
                if p is None or t is None or t.get("target_w") is None:
                    resized.append(None)
                else:
                    token = hashlib.md5(
                        bytes(p) + b"|%dx%d" % (t["target_w"], t["target_h"])
                    ).digest()
                    resized.append(token)
            out = pdf.reset_index(drop=True).drop(columns=["_target"])
            out["resized"] = resized
            yield out

    return with_dims.mapInPandas(process, schema=out_schema)
