"""Microbenchmark the synthetic-OCR pandas batch (no Spark): where does
the ArrowEvalPython stage's Python time actually go? Run on a quiet host
(between scaling-campaign runs)."""

from __future__ import annotations

import hashlib
import sys
import time

import pandas as pd

sys.path.insert(0, "/root/repo")

from nolock_social_ocr_services_spark.extract import ocr  # noqa: E402


def mk_batch(n: int) -> tuple[pd.Series, pd.Series]:
    hs = [hashlib.md5(f"ref-{i}".encode()).hexdigest() for i in range(n)]
    mimes = ["image/png", "application/pdf", None, "image/jpeg"] * (n // 4 + 1)
    mime = pd.Series(mimes[:n], dtype="string")
    h = pd.Series(hs, dtype="string").where(mime.notna(), None)
    return h, mime


def timeit(label: str, fn, reps: int = 5) -> float:
    best = min(_time_once(fn) for _ in range(reps))
    print(f"{label:28s} {best * 1e3:8.1f} ms")
    return best


def _time_once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    h, mime = mk_batch(n)
    print(f"batch n={n}")
    timeit("full _ocr_batch", lambda: ocr._ocr_batch(h, mime))

    hs = h.astype("string").fillna("")
    timeit("digits_of", lambda: ocr.digits_of(hs))
    digits = ocr.digits_of(hs)
    is_r = mime.astype("string").str.startswith("image/").fillna(False) & (hs != "")
    hr, dr = hs[is_r], digits[is_r]
    timeit("receipt_markdown", lambda: ocr.receipt_markdown(hr, dr))
    is_c = (mime.astype("string") == "application/pdf").fillna(False) & (hs != "")
    hc, dc = hs[is_c], digits[is_c]
    timeit("check_markdown", lambda: ocr.check_markdown(hc, dc))
    timeit("n_pages_of", lambda: ocr.n_pages_of(hs, digits))
    timeit("appendix x2", lambda: (ocr.appendix_markdown(hs, 1),
                                   ocr.appendix_markdown(hs, 2)))
    # breakdown: matrix build vs f-string assembly
    timeit("_digit_matrix", lambda: ocr._digit_matrix(hr.astype(object).to_numpy()))


if __name__ == "__main__":
    main()
