"""Main-content extraction for text/HTML spans — DOM-heuristic
boilerplate stripping (north_rule: "HTML boilerplate strip, PDF/layout
parse, DOM heuristics").

The reference delegates text cleanup to its OCR provider's markdown and
to ``CleanJsonText`` (JsonExtractionService.cs:193-243); our engine owns
the text path, so this module implements the classic boilerplate
heuristics directly, fully vectorized (pandas ``.str`` regex ops run in
C over the whole Arrow batch — no per-row Python):

  1. drop non-content DOM regions: <script> <style> <head> <nav>
     <header> <footer> <aside> <form> (tag-block removal);
  2. strip comments and remaining tags;
  3. unescape the common HTML entities;
  4. trim.

``link_density`` exposes the anchor-text ratio heuristic as a quality
signal column (boilerplate-heavy pages score high); callers can filter
on it, which is the classic content/boilerplate discriminator.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_BLOCK_TAGS = ("script", "style", "head", "nav", "header", "footer", "aside", "form")
_BLOCK_RE = re.compile(
    r"(?is)<(" + "|".join(_BLOCK_TAGS) + r")\b[^>]*>.*?</\1\s*>"
)
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; doesn't double-decode
)


def strip_boilerplate_series(html: pd.Series) -> pd.Series:
    """Vectorized boilerplate strip over a pandas string Series (the
    pandas-oracle twin of :func:`strip_boilerplate`; tests compare the
    two)."""
    s = html.astype("string")
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_BLOCK_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.strip()


def strip_boilerplate(col: Column) -> Column:
    """NULL-safe boilerplate strip — pure built-ins (JVM regexp, inside
    whole-stage codegen; no Python worker in this stage).

    Same rule chain as :func:`strip_boilerplate_series`: comments out,
    non-content DOM blocks out (backreferenced close tag), remaining
    tags out, common entities unescaped (&amp; last so &amp;lt; does
    not double-decode), trim.
    """
    c = F.regexp_replace(col, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(
        c, r"(?is)<(" + "|".join(_BLOCK_TAGS) + r")\b[^>]*>.*?</\1\s*>", ""
    )
    c = F.regexp_replace(c, r"(?s)<[^>]+>", "")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(c)


_CONTENT_BLOCK_RE = (
    r"(?is)<(nav|main|article|section|header|footer|aside|div)\b[^>]*>"
    r"(.*?)</\1\s*>"
)


def _block_text(b: Column) -> Column:
    return F.trim(F.regexp_replace(b, r"(?s)<[^>]+>", ""))


def _anchor_chars(b: Column) -> Column:
    return F.length(
        F.array_join(
            F.transform(
                F.split(b, "<a\\b"),
                lambda seg: F.regexp_extract(seg, "(?s)[^>]*>(.*?)</a", 1),
            ),
            "",
        )
    )


def main_content(col: Column) -> Column:
    """Readability-style main-content selection over candidate DOM
    blocks — struct<main_text, main_score, n_blocks>.

    The classic content heuristic (Readability/boilerpipe family):
    candidate blocks are the sectioning elements; each is scored by its
    NON-ANCHOR text length (``len(text) - len(anchor text)`` — the
    integer-exact form of ``text_len * (1 - link_density)``, chosen so
    scores compare identically on every engine with no float ties);
    the highest-scoring block wins, earliest block on ties. Nav bars
    and footer link farms score near zero, body copy scores its length.

    Scale design: like :func:`strip_boilerplate` this is pure per-row
    built-ins — regexp block extraction, a ``transform`` to score, one
    per-row ``array_sort`` — zero Python stages, zero shuffles; the
    operator runs at scan speed inside whole-stage codegen.
    """
    blocks = F.regexp_extract_all(col, F.lit(_CONTENT_BLOCK_RE), F.lit(2))
    scored = F.transform(
        blocks,
        lambda b, i: F.struct(
            (
                -F.greatest(
                    F.length(_block_text(b)) - _anchor_chars(b), F.lit(0)
                )
            ).alias("neg_score"),
            i.alias("pos"),
            _block_text(b).alias("btext"),
        ),
    )
    best = F.element_at(F.array_sort(scored), 1)
    return F.when(
        col.isNull() | (F.size(blocks) == 0), F.lit(None)
    ).otherwise(
        F.struct(
            best["btext"].alias("main_text"),
            (-best["neg_score"]).alias("main_score"),
            F.size(blocks).alias("n_blocks"),
        )
    )


def link_density(col: Column) -> Column:
    """Anchor-text chars / total text chars — pure built-ins (JVM-side).

    High values flag boilerplate-dominated spans (nav/footer link farms).
    """
    anchor_text = F.array_join(
        F.transform(
            F.split(col, "<a\\b"),
            lambda seg: F.regexp_extract(seg, "(?s)[^>]*>(.*?)</a", 1),
        ),
        "",
    )
    total = F.length(F.regexp_replace(col, "<[^>]+>", ""))
    return F.when(
        col.isNull() | (total == 0), F.lit(None).cast("double")
    ).otherwise(F.length(anchor_text) / total)
