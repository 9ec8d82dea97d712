"""Span MIME classification as a DataFrame stage.

Vectorized re-creation of the reference's classify step
(``OcrRequestHandler.DetectMimeType``, OcrRequestHandler.cs:115-118, and
``PipelineNodeImageToUrl``, PipelineNodeImageToUrl.cs:22-48): a compiled
trie is broadcast and applied to Arrow batches inside a pandas UDF.

Scale notes (SURVEY.md §4 O1):
  * only a ``PREFIX_LEN``-byte slice of each payload crosses the
    JVM->Python Arrow boundary — the slice happens JVM-side via
    ``substring`` on the binary / base64 string column, so full payloads
    never ship to the Python worker;
  * the trie tables are compiled once on the driver and broadcast; the
    UDF does ``max_depth`` (<= 8) vectorized NumPy steps per batch, no
    per-row Python.
"""

from __future__ import annotations

import base64 as _b64

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..trie import OCTET_STREAM, PREFIX_LEN, CompiledTrie, lenient_trie

# base64 chars needed to decode PREFIX_LEN bytes (4 chars per 3 bytes).
_B64_PREFIX_CHARS = ((PREFIX_LEN + 2) // 3) * 4


def decode_data_url_prefix(media_ref: Column) -> Column:
    """JVM-side: data-URL string -> first PREFIX_LEN payload bytes.

    The reference receives raw streams and *builds* data URLs
    (PipelineNodeImageToUrl.cs:30-32); our corpus stores the data URL, so
    classification first recovers the leading payload bytes. Everything
    here is built-in (codegen'd): locate ';base64,', slice just enough
    base64 chars to cover PREFIX_LEN bytes, unbase64.
    """
    b64_part = F.substring_index(media_ref, ";base64,", -1)
    # try_to_binary, not unbase64: under ANSI mode (Spark 4 default)
    # unbase64 THROWS on malformed base64, so one corrupt media_ref
    # would abort the whole job — at 10^12 docs that is a guaranteed
    # multi-hour-job killer. try_to_binary yields NULL instead, which
    # classifies as unknown payload -> octet-stream -> per-row
    # extract_error (errors stay data, ST6). The slice length is % 4 ==
    # 0 so valid prefixes are never cut mid-unit.
    return F.try_to_binary(
        F.substring(b64_part, 1, _B64_PREFIX_CHARS), F.lit("base64")
    )


def _make_classifier_udf(spark: SparkSession, compiled: CompiledTrie, fallback: str | None):
    bc = spark.sparkContext.broadcast(compiled)

    @pandas_udf("string")
    def classify_prefix(prefix: pd.Series) -> pd.Series:
        trie: CompiledTrie = bc.value
        n = len(prefix)
        L = max(trie.max_depth, 1)
        mat = np.zeros((n, L), dtype=np.uint8)
        lengths = np.zeros(n, dtype=np.int64)
        vals = prefix.to_numpy(dtype=object)
        # one tight loop to unpack variable-length byte strings into the
        # fixed matrix; all classification below is fully vectorized.
        for i, p in enumerate(vals):
            if p is not None and len(p) > 0:
                lengths[i] = len(p)
                head = p[:L]
                mat[i, : len(head)] = np.frombuffer(head, dtype=np.uint8)
        ids = trie.classify_batch(mat, lengths)
        lut = np.array(list(trie.mimes) + [fallback], dtype=object)
        out = lut[ids]  # ids == -1 -> last element == fallback
        return pd.Series(out)

    return classify_prefix


def trie_match_expr(
    prefix: Column, trie=None, fallback: str | None = OCTET_STREAM
) -> Column:
    """The trie compiled to a pure JVM expression (whole-stage codegen).

    Longest-prefix match as a ``when`` chain over ``hex(prefix)``:
    signatures are tested longest-first (built innermost-out, so the
    longest ends up outermost), which is exactly the deepest-node-wins
    rule of ``MimeTypeTrie.search`` (MimeTypeTrie.cs:36-58). Semantics
    are identical to the compiled-NumPy UDF (property-tested); NULL /
    empty / unmatched prefixes yield ``fallback``.

    This is the measured fast path (see classify_mime(engine=...)):
    the signature table is static and tiny, so a codegen'd branch chain
    beats shipping prefixes over Arrow to a Python worker — and at
    cluster scale it removes one whole Python-worker stage.
    """
    sigs = (trie or lenient_trie()).signatures()
    hexcol = F.hex(prefix)
    expr = F.lit(fallback).cast("string")
    for sig, mime in sorted(sigs, key=lambda s: len(s[0])):
        expr = F.when(hexcol.startswith(sig.hex().upper()), F.lit(mime)).otherwise(
            expr
        )
    return expr


def classify_mime(
    df: DataFrame,
    payload_col: str = "payload_prefix",
    out_col: str = "mime",
    *,
    data_url_col: str | None = None,
    strict: bool = False,
    trie=None,
    engine: str = "udf",
) -> DataFrame:
    """Add ``out_col`` with the trie-detected MIME of each row's payload.

    Args:
        payload_col: binary column holding (at least) the payload head.
        data_url_col: if given, derive the payload prefix JVM-side from a
            data-URL string column instead of ``payload_col``.
        strict: strict mode maps unknown signatures to NULL (callers
            quarantine; the reference throws NotSupportedException,
            PipelineNodeImageToUrl.cs:38-48); lenient mode (default) falls
            back to application/octet-stream (OcrRequestHandler.cs:115-118).
        engine: ``"udf"`` (default) = broadcast compiled-NumPy trie in a
            pandas UDF (the north-star architecture); ``"expr"`` = the
            same trie compiled to a codegen'd ``when`` chain
            (:func:`trie_match_expr`) — identical outputs, no Python
            stage. Both are kept: the UDF shape is where a *learned*
            classifier would slot in; the expr shape is the fast path
            for the fixed signature table.
    """
    spark = df.sparkSession
    fallback = None if strict else OCTET_STREAM
    if data_url_col is not None:
        prefix = decode_data_url_prefix(F.col(data_url_col))
    else:
        prefix = F.substring(F.col(payload_col), 1, PREFIX_LEN)
    if engine == "expr":
        matched = trie_match_expr(prefix, trie=trie, fallback=fallback)
    elif engine == "udf":
        compiled = (trie or lenient_trie()).compile()
        matched = _make_classifier_udf(spark, compiled, fallback)(prefix)
    else:
        raise ValueError(f"unknown classify engine {engine!r}")
    # NULL payload stays NULL mime in both modes (nothing to classify).
    src = F.col(data_url_col) if data_url_col is not None else F.col(payload_col)
    return df.withColumn(
        out_col,
        F.when(src.isNull(), F.lit(None).cast("string")).otherwise(matched),
    )


# -- S4: extension -> MIME fallback (URL sources) -----------------------------

# Mirrors the reference's MimeTypeMap (ImageUrlToDataUrlTransformer.cs:21-36)
# and DetectMimeTypeFromUrl (:217-236): extension of the URL *path* (query/
# fragment excluded), lowercased; unknown/missing -> "image/jpeg".
EXT_MIME: dict[str, str] = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "webp": "image/webp",
    "svg": "image/svg+xml",
    "ico": "image/x-icon",
    "tiff": "image/tiff",
    "tif": "image/tiff",
    "pdf": "application/pdf",
}
EXT_MIME_DEFAULT = "image/jpeg"


def mime_from_url(url: Column) -> Column:
    """MIME type from a URL's file extension — pure built-ins (codegen'd).

    Re-creation of ``DetectMimeTypeFromUrl``
    (ImageUrlToDataUrlTransformer.cs:217-236): take the extension of the
    URL path (``Uri.LocalPath`` semantics -> strip query/fragment first),
    case-insensitive map, default ``image/jpeg``.
    """
    path = F.regexp_replace(url, r"[?#].*$", "")
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    expr = F.lit(EXT_MIME_DEFAULT)
    for e, m in EXT_MIME.items():
        expr = F.when(ext == e, F.lit(m)).otherwise(expr)
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(expr)


def classify_with_url_fallback(
    df: DataFrame,
    payload_col: str = "payload_prefix",
    url_col: str = "url",
    out_col: str = "mime",
) -> DataFrame:
    """Trie classification with S4 URL-extension fallback: magic bytes
    win; unknown payloads (octet-stream) defer to the URL extension —
    the combined behavior of OcrRequestHandler.DetectMimeType +
    DetectMimeTypeFromUrl when a source URL is available."""
    classified = classify_mime(df, payload_col=payload_col, out_col="__trie_mime")
    return classified.withColumn(
        out_col,
        F.when(
            F.col("__trie_mime").isNotNull() & (F.col("__trie_mime") != OCTET_STREAM),
            F.col("__trie_mime"),
        ).otherwise(mime_from_url(F.col(url_col))),
    ).drop("__trie_mime")
