"""No-JVM unit tests for the synthetic-OCR batch generators.

The markdown builders were rewritten from whole-series pandas ops to a
NumPy digit matrix + per-row f-strings (extract/ocr.py); these tests pin
them DIRECTLY against the independent pure-python oracle
(tests/pandas_oracle.py:_ocr_text) and exercise the _digit_matrix fast /
scatter / ragged paths, without paying for a SparkSession.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from nolock_social_ocr_services_spark.extract import ocr

from tests.pandas_oracle import _ocr_text


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _pages_joined(row_main, row_app1, row_app2, npages) -> str:
    pages = [row_main] + [row_app1, row_app2][: max(npages - 1, 0)]
    return "\n\n".join(pages)


def test_ocr_batch_matches_pure_python_oracle():
    """Every (mime, md5) combination the pipeline produces, vs _ocr_text."""
    refs = [f"ref-{i}" for i in range(500)]
    cases = []
    for i, r in enumerate(refs):
        mime = ["image/png", "application/pdf", "image/jpeg"][i % 3]
        cases.append((_md5(r), mime, r))
    h = pd.Series([c[0] for c in cases], dtype="string")
    mime = pd.Series([c[1] for c in cases], dtype="string")
    out = ocr._ocr_batch(h, mime)
    for r, (hx, m, ref) in enumerate(cases):
        got = _pages_joined(
            out["main_md"][r], out["app1_md"][r], out["app2_md"][r],
            int(out["npages"][r]),
        )
        assert got == _ocr_text(ref, m), (ref, m)


def test_ocr_batch_null_and_unknown_rows():
    h = pd.Series([None, _md5("x"), _md5("y")], dtype="string")
    mime = pd.Series([None, "application/octet-stream", "image/png"],
                     dtype="string")
    out = ocr._ocr_batch(h, mime)
    # non-media row: everything NULL
    assert pd.isna(out["main_md"][0]) and pd.isna(out["npages"][0])
    # media + unknown payload: npages 0 sentinel, no markdown
    assert pd.isna(out["main_md"][1]) and out["npages"][1] == 0
    assert out["main_md"][2].startswith("# Receipt")


def test_digit_matrix_paths_agree():
    """fast (all 32-char), scatter (md5-or-empty), ragged — same digits."""
    hxs = [_md5(f"r{i}") for i in range(64)]

    def ref_digits(s: str) -> list[int]:
        d = [int(c) for c in s if c.isdigit()][:20]
        return d + [0] * (20 - len(d))

    fast = ocr._digit_matrix(hxs)
    assert fast.shape == (64, 20)
    assert fast.tolist() == [ref_digits(s) for s in hxs]

    mixed = ["", hxs[0], "", hxs[1]]
    scatter = ocr._digit_matrix(mixed)
    assert scatter.tolist() == [ref_digits(s) for s in mixed]

    ragged = ["abc123", "", "9" * 40, hxs[2]]
    slow = ocr._digit_matrix(ragged)
    assert slow.tolist() == [ref_digits(s) for s in ragged]


def test_digits_of_series_roundtrip():
    h = pd.Series([_md5("a"), "", _md5("b")], dtype="string",
                  index=[5, 7, 9])  # non-default index must survive
    d = ocr.digits_of(h)
    assert list(d.index) == [5, 7, 9]
    assert d[7] == "0" * 20
    assert len(d[5]) == 20 and d[5].isdigit()


def test_markdown_builders_accept_precomputed_digits():
    h = pd.Series([_md5(f"q{i}") for i in range(32)], dtype="string")
    digits = ocr.digits_of(h)
    assert ocr.receipt_markdown(h).equals(ocr.receipt_markdown(h, digits))
    assert ocr.check_markdown(h).equals(ocr.check_markdown(h, digits))


def test_money_rendering_no_float():
    assert ocr._money(0) == "0.00"
    assert ocr._money(5) == "0.05"
    assert ocr._money(99) == "0.99"
    assert ocr._money(100) == "1.00"
    assert ocr._money(12345) == "123.45"


def test_digit_str_blocks():
    dig = np.array([[1, 2, 3], [9, 0, 7]], dtype=np.uint8)
    assert ocr._digit_str(dig).tolist() == ["123", "907"]
    # non-contiguous slice (the builders pass strided views)
    wide = np.arange(40, dtype=np.uint8).reshape(2, 20) % 10
    assert ocr._digit_str(wide[:, 3:6]).tolist() == ["345", "345"]


def test_digit_matrix_non_ascii_degrades_not_crashes():
    """Arbitrary text can reach the public helper: non-ASCII chars are
    non-digits (the regex form stripped them) — one accented row must
    not UnicodeEncodeError the whole Arrow batch."""

    def ref_digits(s: str) -> list[int]:
        d = [int(c) for c in s if c.isdigit() and c.isascii()][:20]
        return d + [0] * (20 - len(d))

    rows = ["café123", "", "résumé", "42", "é" * 32]
    out = ocr._digit_matrix(rows)
    assert out.tolist() == [ref_digits(s) for s in rows]
    # and through the public Series API
    d = ocr.digits_of(pd.Series(rows, dtype="string"))
    assert d[0].startswith("123")
