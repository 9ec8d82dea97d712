"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure built-in expressions (JVM-side, codegen'd) —
no UDFs — so they run at full scan speed over 100 TB and push down
column pruning to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# token that a BPE-ish tokenizer would emit: word runs or single punctuation
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# tiny per-language stopword marker sets (heuristic language ID)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
}


def token_count(col: Column) -> Column:
    """Whitespace tokenization count; 0 for empty/blank/NULL-safe."""
    trimmed = F.trim(col)
    return F.when(
        col.isNull() | (trimmed == ""), F.lit(0)
    ).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token estimate: word runs + individual punctuation marks."""
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))
    )


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (NULL for empty)."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(col.isNull() | (total == 0), F.lit(None).cast("double")).otherwise(
        punct.cast("double") / total
    )


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of marker-stopword occurrences (word-boundary matches)."""
    words = "|".join(LANG_MARKERS[lang])
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(F.lower(col), F.lit(rf"\b({words})\b"), F.lit(0)))
    )


def quality_score(col: Column) -> Column:
    """Composite 0..1 quality heuristic: length band + stopword presence
    - punctuation excess. Deterministic, monotone in the usual document-
    quality signals; thresholds follow common web-corpus filters."""
    n_tok = token_count(col)
    len_ok = F.when(n_tok.between(5, 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_hits(col, "en") >= 2, F.lit(0.4)).otherwise(F.lit(0.0))
    pr = F.coalesce(punct_ratio(col), F.lit(0.0))
    punct_ok = F.when(pr <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    return F.when(col.isNull(), F.lit(None).cast("double")).otherwise(
        len_ok + stop_ok + punct_ok
    )


def predict_lang(col: Column) -> Column:
    """Argmax of marker hits across LANG_MARKERS; 'und' when all zero.
    Ties break by language-key order (deterministic)."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = tie-break order
        hits = stopword_hits(col, lang)
        take = hits > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best_lang


def shingle_fingerprint(col: Column, k: int = 8) -> Column:
    """Document fingerprint: lexicographic-min md5 over all k-char
    shingles (rolling-hash family; md5-of-window stands in for the
    polynomial hash so the DuckDB oracle can recompute it exactly).
    Short documents (< k chars) hash the whole text."""
    n = F.length(col)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(col.isNull() | (n == 0), F.lit(None).cast("string")).otherwise(
        F.array_min(F.transform(starts, lambda i: F.md5(col.substr(i, F.lit(k)))))
    )


def dup_word_ratio(col: Column) -> Column:
    """Within-document repetition signal (Gopher-style quality rule):
    1 - distinct_words / total_words over whitespace tokens, lowercased.
    0.0 = no repetition; high values flag boilerplate/spam. NULL/empty
    text -> NULL. Pure built-ins, no explode — the token arrays live
    inside one row. Tokenization delegates to the shared
    ``corpus_ops.words`` contract (lowercased input) so it cannot drift
    from the cross-engine oracle tokenizer."""
    from .corpus_ops import words as _words

    words = _words(F.lower(col))
    n = F.size(words)
    return F.when(col.isNull() | (n == 0), F.lit(None).cast("double")).otherwise(
        1.0 - F.size(F.array_distinct(words)) / n
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def redact_pii(col: Column) -> Column:
    """Replace email addresses and phone-number-shaped runs with typed
    placeholder tokens. Both patterns are dialect-portable (valid and
    equivalent in Java regex and RE2/DuckDB), so an oracle can re-run
    the same redaction."""
    no_email = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")


def pii_counts(col: Column) -> Column:
    """struct(n_emails, n_phones) found in the text (count before any
    redaction; phones counted on the email-redacted text so an email's
    digits never double-count)."""
    no_email = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.struct(
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(
            F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0))
        ).alias("n_phones"),
    )


# -- normalization (ftfy-lite) -------------------------------------------------
# The cleanup pass a web pipeline runs before any hashing or scoring:
# mojibake repair (the frequent UTF-8-decoded-as-cp1252 digraphs), NBSP
# -> space, newline unification, control-char strip, whitespace-run
# collapse. Pure literal-replace + regexp chain: codegen'd, scan-speed,
# and reproducible verbatim in the DuckDB oracle (queries.py generates
# the oracle's replace chain from the SAME table below).

#: (broken, fixed) pairs applied IN ORDER, each a global literal
#: replace — the usual UTF-8-bytes-decoded-as-cp1252 victims: accented
#: Latin letters (2-char sequences led by U+00C3) and cp1252 smart
#: punctuation (3-char sequences led by U+00E2 U+20AC). Escaped so the
#: source file stays ASCII.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = (
    ("Ã©", "é"),  # e-acute
    ("Ã¨", "è"),  # e-grave
    ("Ã¤", "ä"),  # a-umlaut
    ("Ã¶", "ö"),  # o-umlaut
    ("Ã¼", "ü"),  # u-umlaut
    ("Ã±", "ñ"),  # n-tilde
    ("Ã§", "ç"),  # c-cedilla
    ("â€™", "’"),  # right single quote
    ("â€œ", "“"),  # left double quote
    ("â€", "”"),  # right double quote
    ("â€“", "–"),  # en dash
    ("â€”", "—"),  # em dash
    ("â€¦", "…"),  # ellipsis
)

#: control chars stripped (keeps tab and LF; CR is unified to LF
#: first). Escaped-hex pattern text so the SAME string parses in Java
#: regex (Spark) and RE2 (DuckDB).
CONTROL_RE = r"[\x00-\x08\x0B-\x1F\x7F]"


def normalize_text(col: Column) -> Column:
    """ftfy-lite normalization: mojibake table, NBSP -> space,
    CRLF/CR -> LF, control-char strip, [ \\t]+ collapse, space-around-
    newline strip, outer trim. Deterministic literal order — the
    DuckDB oracle replays the identical chain from the same table."""
    out = col
    for broken, fixed in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(broken), F.lit(fixed))
    out = F.replace(out, F.lit(" "), F.lit(" "))
    out = F.replace(out, F.lit("\r\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\n"))
    out = F.regexp_replace(out, CONTROL_RE, "")
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" *\n *", "\n")
    return F.trim(out)
def winnow_fingerprints(
    df, text_col: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 4
):
    """Winnowing fingerprint set (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS algorithm): hash every k-char gram, slide a w-hash window,
    keep each window's MINIMUM hash; the distinct kept values are the
    document's fingerprints, returned sorted in ``fps``. Winnowing
    guarantees any shared substring of length >= w + k - 1 contributes
    at least one SHARED fingerprint while keeping only ~2/(w+1) of the
    gram hashes — the classic robust fingerprint for copy detection
    (fingerprints are join keys; docs sharing >= m are candidates).

    The paper's rightmost-minimum tie rule only affects which POSITION
    is kept, never the kept VALUE, so a value-set fingerprint is
    tie-free and bit-identical across engines. Hash = 60-bit md5 prefix
    of the gram (the repo-wide hash60 rule).

    Shape: a DataFrame-level operator (not a Column fn) on purpose —
    the gram-hash array must be MATERIALIZED per row before the window
    pass references it from inside a lambda; higher-order functions
    re-evaluate their body's non-lambda subtrees per element, so an
    inlined gram expression would cost O(n^2) md5 per doc. The guard
    references ``_grams`` twice, which keeps CollapseProject from
    re-inlining it. Still zero exchanges, zero Python; O(n * w)
    comparisons per doc. Docs shorter than w + k - 1 chars yield an
    empty array; NULL text yields NULL."""
    col = F.col(text_col)
    n = F.length(col)
    grams = F.when(
        col.isNull() | (n < k), F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.conv(
                F.substring(F.md5(col.substr(i, F.lit(k))), 1, 15), 16, 10
            ).cast("long"),
        )
    )
    windows = F.transform(
        F.sequence(F.lit(1), F.size("_grams") - (w - 1)),
        lambda i: F.array_min(F.slice(F.col("_grams"), i, w)),
    )
    return (
        df.withColumn("_grams", grams)
        .withColumn(
            "fps",
            F.when(col.isNull(), F.lit(None).cast("array<bigint>"))
            .when(F.size("_grams") < w, F.array().cast("array<bigint>"))
            .otherwise(F.array_sort(F.array_distinct(windows))),
        )
        .drop("_grams")
    )
