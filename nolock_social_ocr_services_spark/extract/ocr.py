"""Deterministic synthetic OCR: media payload -> ordered markdown pages.

Architectural stand-in for the reference's external OCR call
(MistralOcrApiService.SendRequestAsync, MistralOcrApiService.cs:127-192):
a *batched* ``mapInPandas`` stage, exactly where a real engine would put
the network call — batches arrive via Arrow, results leave via Arrow, no
per-row Python beyond vectorized pandas ops. The OCR text is a pure
function of ``md5(media_ref)`` (computed JVM-side with the built-in
``md5`` before the UDF), so goldens are stable, the pipeline has zero
network dependencies, and the DuckDB oracle can recompute every field.

Output shape mirrors the reference's page model
(OcrPageObject {index, markdown}, OcrModels.cs:131-144): an array of
(index, markdown) structs **emitted in reversed order** so the
downstream order-by-index concat (T3, MistralOcrApiService.cs:164 —
``concat_pages`` here) is genuinely exercised. Unknown media
(octet-stream) yields zero pages -> empty text, hitting the empty-OCR
guard (OcrRequestHandler.cs:53-56).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import DUCK, SPARK, Dialect

OCR_MODEL = "synth-ocr-v1"

PAGE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("index", T.IntegerType(), False),
            T.StructField("markdown", T.StringType(), True),
        ]
    )
)

_H = "__ocr_h"  # internal md5 column, computed JVM-side


# -- shared deterministic rules (python + sql forms) -------------------------
#
# h      = md5(media_ref)                       (32 hex chars)
# digits = first 20 of (strip non-digits from h, right-padded with '0')
#
# receipt (mime image/*):          check (mime application/pdf):
#   merchant = 'M-' + h[0:8]         number = digits[0:6]
#   mm = 1 + int(digits[0:2]) % 12   payee  = 'P-' + h[8:16]
#   dd = 1 + int(digits[2:4]) % 28   amount = money(digits[6:12])
#   total = money(digits[4:10])      bank   = 'B-' + h[16:24]
#   tax   = money(digits[10:14])     signed = int(digits[12]) % 2 == 1
#   payment = cycle[int(digits[14]) % 3]
#   items   = 1 + int(digits[15]) % 9
# n_pages  = 1 + int(digits[16]) % 3; appendix page p: 'Page {p} appendix {h[24:28]}'
# money(c) = int(c) rendered as dollars.cents with no float math

PAYMENT_CYCLE = ("cash", "card", "check")
ACCOUNT_TYPE_CYCLE = ("checking", "savings")

# Full-schema block selector: d19 = int(digits[19]); d19 % 4 == 0 emits
# ONLY the simple fields (no Address/Subtotal/Items for receipts, no
# Routing/Account for checks) so the full->simple fallback
# (OcrExtractionService.cs:51-56) has real rows to fall back ON;
# d19 % 4 == 1 emits the full block but with an out-of-domain enum value
# (Payment: crypto / Account Type: bitcoin) so enum validation has real
# rows to quarantine (ReceiptModels.cs:11-192, CheckModels.cs:11-57).
INVALID_PAYMENT = "crypto"
INVALID_ACCOUNT_TYPE = "bitcoin"


def _money(c: int) -> str:
    """int cents -> 'dollars.cc' with no float math (== str(c).zfill(3)
    split before the last two digits, the reference's money rendering)."""
    return f"{c // 100}.{c % 100:02d}"


def _digit_matrix(h_list: "list[str] | np.ndarray") -> np.ndarray:
    """(n, 20) uint8 digit values: per row, the digits of the 32-char md5
    hex in order, right-padded with 0 — the NumPy form of ``digits_of``.

    One frombuffer + one stable argsort replaces the per-batch pandas
    regex strip (profiled 2.8 µs/row -> ~0.1 µs/row): sorting the boolean
    'is not a digit' stably moves the digit characters to the front of
    each row without reordering them.
    """
    n = len(h_list)
    if n == 0:
        return np.zeros((0, 20), dtype=np.uint8)
    try:
        joined = "".join(h_list).encode("ascii")
    except UnicodeEncodeError:
        # arbitrary text reaches the public helper; non-ASCII chars are
        # non-digits (the old regex stripped them) — take the ragged
        # path with replacement, never abort the batch.
        joined = None
    if joined is None or len(joined) != n * 32:  # not all md5 hex
        lens = np.fromiter((len(s) for s in h_list), dtype=np.int64, count=n)
        if joined is not None and bool(np.all((lens == 0) | (lens == 32))):
            # the _ocr_batch shape: md5 or '' (non-media row) — compute
            # the nonempty block and scatter (empty row -> all-'0' row,
            # matching the old strip+pad semantics)
            nonempty = lens == 32
            out = np.zeros((n, 20), dtype=np.uint8)
            out[nonempty] = _digit_matrix(
                [h_list[i] for i in np.flatnonzero(nonempty)]
            )
            return out
        rows = [  # fully ragged — per-row slow path
            bytes(
                c for c in s.encode("ascii", "replace") if 48 <= c <= 57
            )[:20].ljust(20, b"0")
            for s in h_list
        ]
        return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(n, 20) - ord("0")
    b = np.frombuffer(joined, dtype=np.uint8).reshape(n, 32).copy()
    not_digit = (b < 48) | (b > 57)
    order = np.argsort(not_digit, axis=1, kind="stable")
    b = np.take_along_axis(b, order, axis=1)
    n_digits = 32 - not_digit.sum(axis=1)
    b[np.arange(32)[None, :] >= n_digits[:, None]] = ord("0")
    return b[:, :20] - ord("0")


def _matrix_of(h: pd.Series, digits: pd.Series | None) -> np.ndarray:
    """Digit matrix from the md5 series, or from a precomputed
    ``digits_of`` string series (already exactly 20 chars/row)."""
    if digits is None:
        return _digit_matrix(h.astype(object).to_numpy())
    n = len(digits)
    if n == 0:
        return np.zeros((0, 20), dtype=np.uint8)
    joined = "".join(digits.astype(object).to_numpy()).encode("ascii")
    return np.frombuffer(joined, dtype=np.uint8).reshape(n, 20) - ord("0")


_P6 = np.array([100000, 10000, 1000, 100, 10, 1], dtype=np.int64)


def full_mode_of(digits: pd.Series) -> pd.Series:
    """0 = simple-only markdown, 1 = full block w/ invalid enum,
    2/3 = full block valid."""
    return digits.str.slice(19, 20).astype(int) % 4


def digits_of(h: pd.Series) -> pd.Series:
    """First 20 of (strip non-digits from md5 hex, right-pad '0') — the
    shared derivation, as a string series (the markdown builders consume
    the uint8 matrix directly; this form feeds tests and callers)."""
    dig = _digit_matrix(h.astype(object).to_numpy())
    out = np.frombuffer((dig + ord("0")).tobytes(), dtype="S20").astype("U20")
    return pd.Series(out, index=h.index, dtype="string")


def receipt_item_fields(
    digits: pd.Series, i: int
) -> tuple[pd.Series, pd.Series]:
    """(quantity, unit_price_cents) for line item ``i`` (1-based)."""
    qty = 1 + (digits.str.slice(0, 2).astype(int) + 3 * i) % 9
    unit = 100 + (digits.str.slice(4, 8).astype(int) + 137 * i) % 9900
    return qty, unit


def receipt_markdown(h: pd.Series, digits: pd.Series | None = None) -> pd.Series:
    """Row-at-a-time f-string assembly over vectorized NumPy fields.

    The original all-pandas form built the markdown in ~50 whole-series
    string-concat passes (9 item lines x ~6 ops each); at 4096-row Arrow
    batches that was 80% of the OCR stage's Python time (54 µs/row,
    tools/profile_ocr_batch.py). One f-string per row over precomputed
    int arrays is ~8x cheaper and byte-identical (mirrors the independent
    pure-python oracle, tests/pandas_oracle.py:_ocr_text).
    """
    dig = _matrix_of(h, digits)
    d = dig.astype(np.int64)  # uint8 arithmetic would wrap (e.g. *100)
    hv = h.astype(object).to_numpy()
    # .tolist() once: indexing a Python list of ints in the row loop is
    # ~3x cheaper than pulling np.int64 scalars out per row
    mm = (1 + (d[:, 0] * 10 + d[:, 1]) % 12).tolist()
    dd = (1 + (d[:, 2] * 10 + d[:, 3]) % 28).tolist()
    total_c = (d[:, 4:10] @ _P6).tolist()
    tax_c = (d[:, 10:14] @ _P6[2:]).tolist()
    mode = (d[:, 19] % 4).tolist()
    pay_i = (d[:, 14] % 3).tolist()
    n_items = (1 + d[:, 15] % 9).tolist()
    addr = (100 + (d[:, 2] * 100 + d[:, 3] * 10 + d[:, 4]) % 900).tolist()
    sub_c = np.maximum(d[:, 4:10] @ _P6 - (d[:, 10:14] @ _P6[2:]), 0).tolist()
    d0_2 = (d[:, 0] * 10 + d[:, 1]).tolist()
    d4_8 = (d[:, 4:8] @ _P6[2:]).tolist()
    phone = _digit_str(dig[:, 6:10]).tolist()
    out = []
    for r in range(len(hv)):
        hx = hv[r]
        m = mode[r]
        pay = INVALID_PAYMENT if m == 1 else PAYMENT_CYCLE[pay_i[r]]
        ni = n_items[r]
        md = (
            f"# Receipt\n\nMerchant: M-{hx[0:8]}"
            f"\nDate: 2024-{mm[r]:02d}-{dd[r]:02d}"
            f"\nTotal: {_money(total_c[r])}\nTax: {_money(tax_c[r])}"
            f"\nPayment: {pay}\nItems: {ni}"
        )
        if m != 0:
            md += (
                f"\nAddress: {addr[r]} Main St\nPhone: 555-{phone[r]}"
                f"\nSubtotal: {_money(sub_c[r])}"
            )
            a, b = d0_2[r], d4_8[r]
            for i in range(1, ni + 1):
                qty = 1 + (a + 3 * i) % 9
                unit = 100 + (b + 137 * i) % 9900
                s = (2 * i) % 24
                md += (
                    f"\nItem {i}: I-{hx[s:s + 4]} x{qty}"
                    f" @ {_money(unit)} = {_money(qty * unit)}"
                )
        out.append(md)
    return pd.Series(out, index=h.index, dtype="string")


def check_markdown(h: pd.Series, digits: pd.Series | None = None) -> pd.Series:
    dig = _matrix_of(h, digits)
    d = dig.astype(np.int64)  # uint8 arithmetic would wrap
    hv = h.astype(object).to_numpy()
    amount_c = (d[:, 6:12] @ _P6).tolist()
    signed = (d[:, 12] % 2).tolist()
    mode = (d[:, 19] % 4).tolist()
    mm = (1 + (d[:, 13] * 10 + d[:, 14]) % 12).tolist()
    dd = (1 + (d[:, 14] * 10 + d[:, 15]) % 28).tolist()
    acct_i = (d[:, 15] % 2).tolist()
    number = _digit_str(dig[:, 0:6]).tolist()
    routing = _digit_str(dig[:, 0:9]).tolist()
    account = _digit_str(dig[:, 10:18]).tolist()
    out = []
    for r in range(len(hv)):
        hx = hv[r]
        m = mode[r]
        md = (
            f"# Check\n\nCheck Number: {number[r]}\nPayee: P-{hx[8:16]}"
            f"\nAmount: {_money(amount_c[r])}\nBank: B-{hx[16:24]}"
            f"\nSigned: {'yes' if signed[r] else 'no'}"
        )
        if m != 0:
            acct = INVALID_ACCOUNT_TYPE if m == 1 else ACCOUNT_TYPE_CYCLE[acct_i[r]]
            md += (
                f"\nDate: 2024-{mm[r]:02d}-{dd[r]:02d}"
                f"\nRouting: {routing[r]}\nAccount: {account[r]}"
                f"\nAccount Type: {acct}\nMemo: memo-{hx[28:32]}"
            )
        out.append(md)
    return pd.Series(out, index=h.index, dtype="string")


def _digit_str(cols: np.ndarray) -> np.ndarray:
    """(n, k) uint8 digit values -> array of k-char strings."""
    k = cols.shape[1]
    return np.frombuffer(
        np.ascontiguousarray(cols + ord("0")).tobytes(), dtype=f"S{k}"
    ).astype(f"U{k}")


def n_pages_of(h: pd.Series, digits: pd.Series | None = None) -> pd.Series:
    if digits is None:
        digits = digits_of(h)
    return 1 + digits.str.slice(16, 17).astype(int) % 3


def appendix_markdown(h: pd.Series, page: int) -> pd.Series:
    return f"Page {page} appendix " + h.str.slice(24, 28)


OCR_RESULT_SCHEMA = T.StructType(
    [
        # flat page markdowns: the UDF ships plain strings; the nested
        # array<struct> page model is assembled JVM-side in run_ocr
        # (building per-row lists of dicts in Python and converting them
        # to Arrow nested arrays costs more than the OCR itself).
        T.StructField("main_md", T.StringType(), True),
        T.StructField("app1_md", T.StringType(), True),
        T.StructField("app2_md", T.StringType(), True),
        T.StructField("npages", T.IntegerType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("tokens", T.IntegerType(), True),
    ]
)


def _ocr_batch(h: pd.Series, mime: pd.Series) -> pd.DataFrame:
    """One Arrow batch of synthetic OCR. ``h`` = md5(media_ref) or NULL
    for non-media rows (the Arrow transfer then carries only nulls for
    those rows — see run_ocr). Returns FLAT columns only; see
    OCR_RESULT_SCHEMA."""
    hs = h.astype("string").fillna("")
    mime = mime.astype("string")
    is_receipt = mime.str.startswith("image/").fillna(False) & (hs != "")
    is_check = (mime == "application/pdf").fillna(False) & (hs != "")
    known = (is_receipt | is_check).to_numpy()
    is_media = (hs != "").to_numpy()
    n = len(hs)

    digits = digits_of(hs)
    main = pd.Series([""] * n, dtype="string")
    if is_receipt.any():
        main[is_receipt] = receipt_markdown(hs[is_receipt], digits[is_receipt])
    if is_check.any():
        main[is_check] = check_markdown(hs[is_check], digits[is_check])
    npages = np.zeros(n, dtype="int32")
    app1 = pd.Series([""] * n, dtype="string")
    app2 = pd.Series([""] * n, dtype="string")
    tokvals = np.zeros(n, dtype="int32")
    if known.any():
        kn_idx = pd.Series(known)
        npages[known] = n_pages_of(hs[kn_idx], digits[kn_idx]).to_numpy()
        app1[kn_idx] = appendix_markdown(hs[kn_idx], 1)
        app2[kn_idx] = appendix_markdown(hs[kn_idx], 2)
        tokvals[known] = (100 + digits[kn_idx].str.slice(17, 19).astype(int)).to_numpy()
    tokens = pd.Series(pd.array(tokvals, dtype="Int32"))
    tokens[~known] = pd.NA
    # media + unknown payload -> npages 0 (MistralOcrResult.Empty
    # sentinel, MistralOcrResult.cs:11); non-media rows -> NULL npages.
    np_out = pd.Series(pd.array(npages, dtype="Int32"))
    np_out[~is_media] = pd.NA
    return pd.DataFrame(
        {
            "main_md": main.where(pd.Series(known), None),
            "app1_md": app1.where(pd.Series(known), None),
            "app2_md": app2.where(pd.Series(known), None),
            "npages": np_out,
            "model": pd.Series(np.where(known, OCR_MODEL, None), dtype=object),
            "tokens": tokens,
        }
    )


@F.pandas_udf(OCR_RESULT_SCHEMA)
def _ocr_udf(h: pd.Series, mime: pd.Series) -> pd.DataFrame:
    return _ocr_batch(h, mime)


# Semantically the UDF IS deterministic (pure hash of its inputs), but
# marking it nondeterministic stops Catalyst from inlining it into
# success filters (`receipt.isNotNull()`) and pushing the copy below the
# salted exchange — which materialized as TWO ArrowEvalPython stages and
# ran the (expensive-in-real-life) OCR twice per media row. With the
# flag, the filter stays above the single OCR projection.
# Pinned by tests/test_plans.py::test_filtered_extract_single_ocr_stage.
_ocr_udf = _ocr_udf.asNondeterministic()


def run_ocr(
    df: DataFrame, media_ref_col: str = "media_ref", mime_col: str = "mime"
) -> DataFrame:
    """Append ``ocr_pages`` (unordered page structs), ``ocr_model``,
    ``ocr_tokens`` to rows with a media payload; non-media rows get NULLs.

    Scale design: a *scalar* Arrow-vectorized struct UDF over just
    ``(md5(media_ref), mime)`` — unlike mapInPandas, only those two thin
    columns cross the JVM->Python boundary (never the span text), and
    non-media rows contribute NULLs, which Arrow encodes for free. The
    md5 is computed JVM-side with the built-in. The UDF returns FLAT
    page markdowns; the reference-shaped ``array<struct<index,markdown>>``
    (OcrPageObject, OcrModels.cs:131-144) is assembled here with
    codegen'd ``array``/``slice`` — pages highest-index-first, so the
    downstream order-by-index concat (T3) is genuinely exercised.
    """
    res = _ocr_udf(F.md5(F.col(media_ref_col)), F.col(mime_col))
    tmp = df.withColumn(_H, res)
    r = F.col(_H)
    # reversed full page array [idx2, idx1, idx0]; slice keeps the LAST
    # npages entries (npages=2 -> [{1,app1},{0,main}]), npages=0 -> [].
    full = F.array(
        F.struct(F.lit(2).alias("index"), r["app2_md"].alias("markdown")),
        F.struct(F.lit(1).alias("index"), r["app1_md"].alias("markdown")),
        F.struct(F.lit(0).alias("index"), r["main_md"].alias("markdown")),
    )
    npages = r["npages"]
    pages = F.when(npages.isNull(), F.lit(None).cast(PAGE_SCHEMA)).otherwise(
        F.slice(full, F.lit(4) - npages, npages)
    )
    return (
        tmp.withColumn("ocr_pages", pages)
        .withColumn("ocr_model", r["model"])
        .withColumn("ocr_tokens", r["tokens"])
        .drop(_H)
    )


def concat_pages(df: DataFrame, pages_col: str = "ocr_pages", out_col: str = "ocr_text") -> DataFrame:
    """T3 page concat, pure built-ins: sort pages by index, join markdown
    with blank lines (MistralOcrApiService.cs:164). Empty/NULL page
    arrays yield '' for media rows (empty-OCR guard input) and NULL for
    non-media rows.
    """
    pages = F.col(pages_col)
    ordered = F.array_sort(
        pages,
        lambda a, b: F.when(a["index"] < b["index"], -1)
        .when(a["index"] > b["index"], 1)
        .otherwise(0),
    )
    joined = F.array_join(F.transform(ordered, lambda p: p["markdown"]), "\n\n")
    return df.withColumn(
        out_col, F.when(pages.isNull(), F.lit(None).cast("string")).otherwise(joined)
    )


# -- OCR result metadata: page regions, dimensions, meta map, timing ---------

OCTET_STREAM_MIME = "application/octet-stream"

IMAGE_REGION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("index", T.IntegerType(), False),
            T.StructField(
                "bbox",
                T.StructType(
                    [
                        T.StructField("x", T.IntegerType(), False),
                        T.StructField("y", T.IntegerType(), False),
                        T.StructField("width", T.IntegerType(), False),
                        T.StructField("height", T.IntegerType(), False),
                    ]
                ),
                False,
            ),
        ]
    )
)

DIMS_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def with_ocr_metadata(
    df: DataFrame, media_ref_col: str = "media_ref", mime_col: str = "mime"
) -> DataFrame:
    """Append the reference's OCR result metadata, all pure built-ins
    (zero Python stages — every value is a rule over md5(media_ref)):

      * ``ocr_images``  — array<struct<index, bbox struct<x,y,width,height>>>
        per-page image regions (OcrImageObject, OcrModels.cs:146-172)
      * ``ocr_dims``    — struct<width,height> page dimensions
        (OcrModels.cs page ``dimensions``)
      * ``ocr_meta``    — map<string,string> result metadata
        (MistralOcrResult.Metadata, MistralOcrResult.cs:3-11)
      * ``processing_ms`` — synthetic duration (MistralOcrResult.ProcessingTime)

    Unknown payloads (octet-stream) and non-media rows carry NULLs — the
    Empty-result sentinel (MistralOcrResult.cs:11).
    """
    mime = F.col(mime_col)
    known = (
        F.col(media_ref_col).isNotNull()
        & mime.isNotNull()
        & (mime != OCTET_STREAM_MIME)
    )
    stripped = F.regexp_replace(F.md5(F.col(media_ref_col)), "[^0-9]", "")
    dgc = F.substring(F.concat(stripped, F.lit("0" * 20)), 1, 20)

    def di(pos: int, ln: int) -> F.Column:
        return F.substring(dgc, pos, ln).cast("int")

    width = (F.lit(512) + di(1, 3) % 512).cast("int")
    height = (F.lit(512) + di(4, 3) % 768).cast("int")
    n_images = di(19, 1) % 3

    def region(i: F.Column) -> F.Column:
        return F.struct(
            i.cast("int").alias("index"),
            F.struct(
                ((di(5, 3) + 97 * i) % 400).cast("int").alias("x"),
                ((di(8, 3) + 131 * i) % 600).cast("int").alias("y"),
                (32 + (di(11, 2) + 7 * i) % 200).cast("int").alias("width"),
                (32 + (di(13, 2) + 11 * i) % 200).cast("int").alias("height"),
            ).alias("bbox"),
        )

    images = (
        F.when(
            known & (n_images >= 1),
            F.transform(F.sequence(F.lit(0), n_images - 1), region),
        )
        .when(known, F.array().cast(IMAGE_REGION_SCHEMA))
        .otherwise(F.lit(None).cast(IMAGE_REGION_SCHEMA))
    )
    n_pages = (F.lit(1) + di(17, 1) % 3).cast("int")
    meta = F.when(
        known,
        F.create_map(
            F.lit("model"), F.lit(OCR_MODEL),
            F.lit("pages"), n_pages.cast("string"),
            F.lit("mime"), mime,
        ),
    )
    return (
        df.withColumn("ocr_images", images)
        .withColumn(
            "ocr_dims",
            F.when(known, F.struct(width.alias("width"), height.alias("height"))),
        )
        .withColumn("ocr_meta", meta)
        .withColumn(
            "processing_ms", F.when(known, (F.lit(50) + 3 * di(18, 2)).cast("int"))
        )
    )


# -- oracle SQL fragments (DuckDB + Spark SQL) -------------------------------


def _sql_digits(d: Dialect, href: str) -> str:
    stripped = d.re_strip(href, "[^0-9]")
    return f"substr(concat({stripped}, '00000000000000000000'), 1, 20)"


def _sql_money(cents: str) -> str:
    s = f"CAST(CAST({cents} AS BIGINT) AS STRING)"
    padded = f"(CASE WHEN length({s}) < 3 THEN lpad({s}, 3, '0') ELSE {s} END)"
    return (
        f"concat(substr({padded}, 1, length({padded}) - 2), '.', "
        f"substr({padded}, length({padded}) - 1, 2))"
    )


def sql_money(cents: str) -> str:
    """Public alias for the shared money-rendering SQL fragment."""
    return _sql_money(cents)


def ocr_field_exprs(d: Dialect, h: str = "h") -> dict[str, str]:
    """SQL expressions (dialect d) for every synthetic-OCR-derived field,
    given ``h`` = md5(media_ref). Used to build DuckDB oracles that
    recompute what the Spark pipeline must extract.

    ``payment_method`` / ``account_type`` carry the VALIDATED value (NULL
    for the out-of-domain variant, mirroring the simple-parse regex /
    enum-domain gate); ``payment_method_raw`` / ``account_type_raw`` are
    the literal markdown values including the invalid ones.
    """
    dg = _sql_digits(d, h)
    pay = " ".join(f"WHEN {i} THEN '{p}'" for i, p in enumerate(PAYMENT_CYCLE))
    acct = " ".join(
        f"WHEN {i} THEN '{a}'" for i, a in enumerate(ACCOUNT_TYPE_CYCLE)
    )
    mode = f"(CAST(substr({dg}, 20, 1) AS INT) % 4)"
    pay_valid = f"CASE CAST(substr({dg}, 15, 1) AS INT) % 3 {pay} END"
    acct_valid = f"CASE CAST(substr({dg}, 16, 1) AS INT) % 2 {acct} END"
    total_c = f"CAST(substr({dg}, 5, 6) AS BIGINT)"
    tax_c = f"CAST(substr({dg}, 11, 4) AS BIGINT)"
    return {
        "merchant_name": f"concat('M-', substr({h}, 1, 8))",
        "receipt_date": (
            f"concat('2024-', lpad(CAST(1 + CAST(substr({dg}, 1, 2) AS INT) % 12 AS STRING), 2, '0'),"
            f" '-', lpad(CAST(1 + CAST(substr({dg}, 3, 2) AS INT) % 28 AS STRING), 2, '0'))"
        ),
        "total_amount": _sql_money(f"substr({dg}, 5, 6)"),
        "tax_amount": _sql_money(f"substr({dg}, 11, 4)"),
        "payment_method": (
            f"CASE WHEN {mode} = 1 THEN NULL ELSE {pay_valid} END"
        ),
        "payment_method_raw": (
            f"CASE WHEN {mode} = 1 THEN '{INVALID_PAYMENT}' ELSE {pay_valid} END"
        ),
        "items_count": f"1 + CAST(substr({dg}, 16, 1) AS INT) % 9",
        "check_number": f"substr({dg}, 1, 6)",
        "payee": f"concat('P-', substr({h}, 9, 8))",
        "check_amount": _sql_money(f"substr({dg}, 7, 6)"),
        "bank_name": f"concat('B-', substr({h}, 17, 8))",
        "is_signed": f"CAST(substr({dg}, 13, 1) AS INT) % 2 = 1",
        "n_pages": f"1 + CAST(substr({dg}, 17, 1) AS INT) % 3",
        "appendix_1": f"concat('Page 1 appendix ', substr({h}, 25, 4))",
        "appendix_2": f"concat('Page 2 appendix ', substr({h}, 25, 4))",
        "ocr_tokens": f"100 + CAST(substr({dg}, 18, 2) AS INT)",
        # -- full-schema block (present iff full_mode != 0) -------------
        "full_mode": mode,
        "has_full": f"{mode} <> 0",
        "merchant_address": (
            f"concat(CAST(100 + CAST(substr({dg}, 3, 3) AS INT) % 900 AS STRING),"
            f" ' Main St')"
        ),
        "merchant_phone": f"concat('555-', substr({dg}, 7, 4))",
        "subtotal": _sql_money(f"greatest({total_c} - {tax_c}, 0)"),
        "subtotal_cents": f"greatest({total_c} - {tax_c}, 0)",
        "item_qty": f"(1 + (CAST(substr({dg}, 1, 2) AS INT) + 3 * i) % 9)",
        "item_unit_cents": (
            f"(100 + (CAST(substr({dg}, 5, 4) AS INT) + 137 * i) % 9900)"
        ),
        "item_desc": f"substr({h}, 1 + ((2 * i) % 24), 4)",
        "check_date": (
            f"concat('2024-', lpad(CAST(1 + CAST(substr({dg}, 14, 2) AS INT) % 12 AS STRING), 2, '0'),"
            f" '-', lpad(CAST(1 + CAST(substr({dg}, 15, 2) AS INT) % 28 AS STRING), 2, '0'))"
        ),
        "routing_number": f"substr({dg}, 1, 9)",
        "account_number": f"substr({dg}, 11, 8)",
        "account_type": f"CASE WHEN {mode} = 1 THEN NULL ELSE {acct_valid} END",
        "account_type_raw": (
            f"CASE WHEN {mode} = 1 THEN '{INVALID_ACCOUNT_TYPE}' ELSE {acct_valid} END"
        ),
        "memo": f"concat('memo-', substr({h}, 29, 4))",
        # -- OCR metadata rules (with_ocr_metadata twins) ----------------
        "page_width": f"512 + CAST(substr({dg}, 1, 3) AS INT) % 512",
        "page_height": f"512 + CAST(substr({dg}, 4, 3) AS INT) % 768",
        "n_images": f"CAST(substr({dg}, 19, 1) AS INT) % 3",
        "img_x": f"((CAST(substr({dg}, 5, 3) AS INT) + 97 * i) % 400)",
        "img_y": f"((CAST(substr({dg}, 8, 3) AS INT) + 131 * i) % 600)",
        "img_w": f"(32 + (CAST(substr({dg}, 11, 2) AS INT) + 7 * i) % 200)",
        "img_h": f"(32 + (CAST(substr({dg}, 13, 2) AS INT) + 11 * i) % 200)",
        "processing_ms": f"50 + 3 * CAST(substr({dg}, 18, 2) AS INT)",
    }


def sql_receipt_item_line(d: Dialect, e: dict[str, str]) -> str:
    """SQL for one receipt item markdown line (lambda var ``i``)."""
    qty, unit = e["item_qty"], e["item_unit_cents"]
    return (
        f"concat(chr(10), 'Item ', CAST(i AS STRING), ': I-', {e['item_desc']},"
        f" ' x', CAST({qty} AS STRING), ' @ ', {_sql_money(unit)},"
        f" ' = ', {_sql_money(f'{qty} * {unit}')})"
    )


def oracle_ocr_text_sql(d: Dialect, mime: str = "mime", h: str = "h") -> str:
    """SQL expression for the FULL concatenated OCR text (pages in index
    order) given mime + h = md5(media_ref). Lets the DuckDB oracle verify
    the mapInPandas OCR stage + ordered page concat end to end."""
    e = ocr_field_exprs(d, h)
    nl = "chr(10)"
    item_lines = d.concat_over_series(
        e["items_count"], sql_receipt_item_line(d, e)
    )
    receipt_full = (
        f"concat({nl}, 'Address: ', {e['merchant_address']}, "
        f"{nl}, 'Phone: ', {e['merchant_phone']}, "
        f"{nl}, 'Subtotal: ', {e['subtotal']}, {item_lines})"
    )
    receipt_md = (
        f"concat('# Receipt', {nl}, {nl}, 'Merchant: ', {e['merchant_name']}, {nl}, "
        f"'Date: ', {e['receipt_date']}, {nl}, 'Total: ', {e['total_amount']}, {nl}, "
        f"'Tax: ', {e['tax_amount']}, {nl}, 'Payment: ', {e['payment_method_raw']}, {nl}, "
        f"'Items: ', CAST({e['items_count']} AS STRING), "
        f"CASE WHEN {e['has_full']} THEN {receipt_full} ELSE '' END)"
    )
    check_full = (
        f"concat({nl}, 'Date: ', {e['check_date']}, "
        f"{nl}, 'Routing: ', {e['routing_number']}, "
        f"{nl}, 'Account: ', {e['account_number']}, "
        f"{nl}, 'Account Type: ', {e['account_type_raw']}, "
        f"{nl}, 'Memo: ', {e['memo']})"
    )
    check_md = (
        f"concat('# Check', {nl}, {nl}, 'Check Number: ', {e['check_number']}, {nl}, "
        f"'Payee: ', {e['payee']}, {nl}, 'Amount: ', {e['check_amount']}, {nl}, "
        f"'Bank: ', {e['bank_name']}, {nl}, "
        f"'Signed: ', CASE WHEN {e['is_signed']} THEN 'yes' ELSE 'no' END, "
        f"CASE WHEN {e['has_full']} THEN {check_full} ELSE '' END)"
    )
    main = (
        f"CASE WHEN {mime} = 'application/octet-stream' THEN '' "
        f"WHEN {mime} LIKE 'image/%' THEN {receipt_md} ELSE {check_md} END"
    )
    return (
        f"CASE WHEN {mime} = 'application/octet-stream' THEN '' "
        f"WHEN {e['n_pages']} = 1 THEN {main} "
        f"WHEN {e['n_pages']} = 2 THEN concat({main}, {nl}, {nl}, {e['appendix_1']}) "
        f"ELSE concat({main}, {nl}, {nl}, {e['appendix_1']}, {nl}, {nl}, {e['appendix_2']}) END"
    )


__all__ = [
    "run_ocr",
    "concat_pages",
    "receipt_markdown",
    "check_markdown",
    "receipt_item_fields",
    "full_mode_of",
    "ocr_field_exprs",
    "sql_receipt_item_line",
    "sql_money",
    "OCR_MODEL",
    "PAYMENT_CYCLE",
    "ACCOUNT_TYPE_CYCLE",
    "INVALID_PAYMENT",
    "INVALID_ACCOUNT_TYPE",
    "SPARK",
    "DUCK",
]


# -- fused classify + OCR (one Python stage) ----------------------------------

FUSED_SCHEMA = T.StructType(
    [T.StructField("mime", T.StringType(), True)] + list(OCR_RESULT_SCHEMA.fields)
)


def make_fused_classify_ocr_udf(spark, compiled_trie, fallback: str):
    """Single scalar Arrow UDF: (payload_prefix, md5) -> (mime + flat OCR).

    Fuses the trie classification and the synthetic OCR into ONE
    ArrowEvalPython stage: the classifier's mime output feeds the OCR
    routing inside the same batch, saving one JVM<->Python Arrow round
    trip per row versus two chained scalar UDFs.

    Measured (paired A/B, local[16], 1.5M docs): byte-identical output,
    ~1.03x at best — the chained-UDF Arrow boundary pipelines well, so
    fusion is NOT the default (pipeline.extract_spans(fused=False));
    it exists as the measured option for deployments where the Python
    worker pool, not the boundary, is the constraint.
    """
    bc = spark.sparkContext.broadcast(compiled_trie)

    @F.pandas_udf(FUSED_SCHEMA)
    def fused(prefix: pd.Series, h: pd.Series) -> pd.DataFrame:
        trie = bc.value
        n = len(prefix)
        L = max(trie.max_depth, 1)
        mat = np.zeros((n, L), dtype=np.uint8)
        lengths = np.zeros(n, dtype=np.int64)
        vals = prefix.to_numpy(dtype=object)
        for i, p in enumerate(vals):
            if p is not None and len(p) > 0:
                lengths[i] = len(p)
                head = p[:L]
                mat[i, : len(head)] = np.frombuffer(head, dtype=np.uint8)
        ids = trie.classify_batch(mat, lengths)
        lut = np.array(list(trie.mimes) + [fallback], dtype=object)
        mime_arr = lut[ids]
        # classify_mime semantics: NULL media_ref (h NULL, non-media row)
        # -> NULL mime; media row with undecodable/NULL prefix -> the
        # lenient fallback (ids already -1 for empty prefixes).
        mime_arr[h.isna().to_numpy()] = None
        mime = pd.Series(mime_arr, dtype=object)
        out = _ocr_batch(h, mime)
        out.insert(0, "mime", mime)
        return out

    # same rationale as _ocr_udf: keep success filters from duplicating
    # the Python stage (the fused UDF carries the OCR cost too).
    return fused.asNondeterministic()
