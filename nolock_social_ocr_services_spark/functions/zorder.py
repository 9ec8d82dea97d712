"""Z-order (Morton) keys for multi-dimensional clustering.

1-D range clustering (``SnapTable.append(cluster_by=...)``) gives tight
per-file bounds on ONE column; a selective filter on any other column
still scans every file. Interleaving the bits of several columns into
one Morton key and range-clustering on THAT gives every interleaved
column locality at once: a file covering a contiguous Z-key range
covers a small hyper-rectangle of the original space, so its recorded
per-column min/max bounds are tight in EVERY dimension and
``read(between=...)`` skips files for filters on any of them. This is
the Z-ORDER clustering of Delta/Iceberg (`OPTIMIZE ... ZORDER BY`),
built from the published Morton-code construction.

The bit interleave is UNROLLED at plan-build time into literal
shift/mask terms (``bits`` is a Python int), so the whole key is one
codegen'd long expression — no UDF, no shuffle beyond the range
partition the caller asked for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 21) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column.

    Inputs must be non-negative integers (bucket ids, epoch seconds,
    quantized values); values >= 2**bits fold into the top of the
    range (their low bits still interleave — ordering degrades
    gracefully, never errors). ``len(cols) * bits`` must fit a long.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key
