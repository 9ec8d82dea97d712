"""Layout parse: reading-order reconstruction for OCR page regions.

The reference's OCR result carries per-page image regions with pixel
bounding boxes and page dimensions (``OcrImageObject`` /
``OcrPageDimensions``, MistralOcr/Models/OcrModels.cs:146-172) but
leaves them unordered; the north rule's "PDF/layout parse" stage is
what turns the region soup back into a readable sequence. This module
implements the classic two-column layout heuristic:

  1. a region belongs to the RIGHT column iff its horizontal center
     crosses the page midline (``x + width/2 >= page_width/2``);
  2. reading order is (column, y, x, original index) ascending —
     left column top-to-bottom, then right column top-to-bottom.

Scale design: the whole operator is per-row array math — a
``transform`` to key each region, one ``array_sort`` (lexicographic on
struct fields), and a ``transform`` to stamp ranks. No explode, no
window, NO SHUFFLE of any kind: each page orders its own regions inside
whole-stage codegen, so the operator scans at input speed regardless of
cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_regions(
    images: Column, dims: Column, out_name: str = "ordered_regions"
) -> Column:
    """array<struct<reading_rank, region_index, col_idx, x, y>> in
    reading order, NULL iff ``images`` is NULL."""
    midline = dims["width"].cast("double") / F.lit(2.0)

    def key(r: Column) -> Column:
        center = r["bbox"]["x"].cast("double") + r["bbox"]["width"].cast(
            "double"
        ) / F.lit(2.0)
        return F.struct(
            F.when(center >= midline, F.lit(1))
            .otherwise(F.lit(0))
            .alias("col_idx"),
            r["bbox"]["y"].alias("y"),
            r["bbox"]["x"].alias("x"),
            r["index"].alias("region_index"),
        )

    # array_sort on struct arrays is lexicographic over the fields in
    # declaration order — exactly the (column, y, x, index) comparator.
    ordered = F.array_sort(F.transform(images, key))
    ranked = F.transform(
        ordered,
        lambda s, i: F.struct(
            i.cast("int").alias("reading_rank"),
            s["region_index"].alias("region_index"),
            s["col_idx"].alias("col_idx"),
            s["x"].alias("x"),
            s["y"].alias("y"),
        ),
    )
    return F.when(images.isNull(), F.lit(None)).otherwise(ranked).alias(out_name)


def with_reading_order(
    df: DataFrame,
    images_col: str = "ocr_images",
    dims_col: str = "ocr_dims",
    out_col: str = "ordered_regions",
) -> DataFrame:
    return df.withColumn(
        out_col, ordered_regions(F.col(images_col), F.col(dims_col))
    )
