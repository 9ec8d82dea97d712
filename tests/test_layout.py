"""Layout parse (reading order) + main-content block scoring."""

from pyspark.sql import Row, functions as F

from nolock_social_ocr_services_spark.extract.html import main_content
from nolock_social_ocr_services_spark.operators.layout import (
    with_reading_order,
)


def _region(idx, x, y, w=50, h=20):
    return Row(index=idx, bbox=Row(x=x, y=y, width=w, height=h))


def test_reading_order_two_columns(spark):
    """Left column top-to-bottom first, then right column; ties on
    (col, y) break by x then original index."""
    df = spark.createDataFrame(
        [
            Row(
                doc_id="d1",
                ocr_images=[
                    _region(0, 400, 10),   # right col (center 425 >= 300)
                    _region(1, 10, 500),   # left col, bottom
                    _region(2, 10, 5),     # left col, top
                    _region(3, 350, 5),    # right col, top
                ],
                ocr_dims=Row(width=600, height=800),
            )
        ]
    )
    out = with_reading_order(df).select(
        F.explode("ordered_regions").alias("r")
    )
    got = [
        (r.r.reading_rank, r.r.region_index, r.r.col_idx)
        for r in out.collect()
    ]
    assert got == [(0, 2, 0), (1, 1, 0), (2, 3, 1), (3, 0, 1)]


def test_reading_order_straddling_region_goes_right(spark):
    """A region whose center sits exactly on the midline is RIGHT
    column (>= comparison), matching the oracle's CASE."""
    df = spark.createDataFrame(
        [
            Row(
                doc_id="d1",
                ocr_images=[_region(0, 250, 10, w=100)],  # center == 300
                ocr_dims=Row(width=600, height=800),
            ),
            Row(doc_id="d2", ocr_images=None, ocr_dims=None),
        ]
    )
    rows = {r.doc_id: r.ordered_regions for r in with_reading_order(df).collect()}
    assert rows["d1"][0].col_idx == 1
    assert rows["d2"] is None


def test_main_content_picks_body_over_nav_and_footer(spark):
    html = (
        '<html><body><nav><a href="/">home</a> <a href="/x">about</a></nav>'
        "<div><p>the actual article text, long enough to win</p></div>"
        '<footer>(c) corp <a href="/p">privacy</a></footer></body></html>'
    )
    short = (
        '<html><body><nav><a href="/">home</a></nav>'
        "<div><p>tiny</p></div>"
        '<footer>a very long footer boilerplate message here '
        '<a href="/p">privacy</a></footer></body></html>'
    )
    df = spark.createDataFrame(
        [("a", html), ("b", short), ("c", "no blocks at all"), ("d", None)],
        "id string, html string",
    )
    got = {
        r.id: r.mc
        for r in df.select("id", main_content(F.col("html")).alias("mc")).collect()
    }
    assert got["a"].main_text == "the actual article text, long enough to win"
    assert got["a"].n_blocks == 3
    assert got["a"].main_score == len(got["a"].main_text)
    # link-farm footer outweighs a tiny body: heuristic picks footer's
    # non-anchor text (boilerpipe behaves the same on degenerate pages)
    assert got["b"].main_text.startswith("a very long footer")
    assert got["c"] is None and got["d"] is None


def test_main_content_tie_breaks_earliest_block(spark):
    html = "<div>aaaa</div><section>bbbb</section>"
    df = spark.createDataFrame([(html,)], "html string")
    mc = df.select(main_content(F.col("html")).alias("mc")).first().mc
    assert mc.main_text == "aaaa" and mc.main_score == 4 and mc.n_blocks == 2
