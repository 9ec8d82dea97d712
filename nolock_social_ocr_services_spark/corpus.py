"""Deterministic interleaved-document corpus, derived from the driver's
flat ``documents`` parquet (TESTDATA.md) — no external data, seed-free
(every value is a pure function of ``doc_id`` + the driver table).

Produces the BASELINE.json ``input_hint`` shape::

    documents(doc_id: string,
              spans: array<struct<kind: string, text: string,
                                  media_ref: string, offset: int>>)

Reference parity: each media span's ``media_ref`` is a data URL
("data:<mime>;base64,<payload>") exactly as built by the reference's
encode node (PipelineNodeImageToUrl.cs:30-32); payload bytes open with
the real magic signatures from the reference's trie tables
(OcrRequestHandler.cs:125-137), and a fixed fraction carries an unknown
signature (AB CD EF) to exercise the octet-stream fallback
(OcrRequestHandler.cs:115-118). A small tail of "giant" documents
(GIANT_SPANS spans vs a 2-7 median) exercises salted repartitioning.
Spans are stored in md5-shuffled physical order so offset-order
reconstruction is genuinely tested (FIXTURES.md §1).

Every rule is expressed as SQL valid in BOTH Spark SQL and DuckDB (via a
tiny dialect shim), so the driver's DuckDB oracle can recompute expected
outputs independently: the Spark side decodes real bytes and runs the
real trie; the oracle recomputes the *intended* MIME/fields from the
construction rules. Agreement means the pipeline actually works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# -- construction rules (shared by generator and oracle) ---------------------

GIANT_EVERY = 53  # every 53rd doc is giant
GIANT_SPANS = 48
MAX_SPANS = GIANT_SPANS  # upper bound used by the series cross-join

# mime cycle for media spans; index = (doc_id + 3*offset) % 8; 7 = unknown
IMAGE_MIME_CYCLE = (
    "image/jpeg",
    "image/png",
    "image/gif",
    "image/webp",
    "image/bmp",
    "image/tiff",
    "image/x-icon",
)

SIG_HEX = {
    "image/jpeg": "FFD8FFE0",
    "image/png": "89504E470D0A1A0A",
    "image/gif": "474946383961",
    "image/webp": "52494646",
    "image/bmp": "424D",
    "image/tiff": "49492A00",
    "image/x-icon": "00000100",
    "application/pdf": "25504446",
    "application/octet-stream": "ABCDEF",  # unknown signature -> fallback
}

HTML_PREFIX = (
    '<html><head><title>synthetic page</title></head><body>'
    '<nav><a href="/">home</a> <a href="/about">about</a></nav>'
    '<div id="main"><p>'
)
HTML_SUFFIX = (
    "</p></div>"
    '<footer>(c) 2024 corp - <a href="/privacy">privacy</a></footer>'
    "</body></html>"
)


class Dialect:
    """Minimal shim over Spark SQL vs DuckDB differences."""

    def __init__(self, name: str):
        self.name = name

    def enc(self, expr: str) -> str:
        """string -> utf-8 binary/blob"""
        return f"encode({expr}, 'utf-8')" if self.name == "spark" else f"encode({expr})"

    def series_0_to(self, n_minus_1: int) -> str:
        """one-column table t(i) of 0..n_minus_1 inclusive"""
        if self.name == "spark":
            return f"(SELECT explode(sequence(0, {n_minus_1})) AS i) t"
        return f"(SELECT unnest(generate_series(0, {n_minus_1})) AS i) t"

    def re_strip(self, expr: str, pat: str) -> str:
        """remove ALL matches of pat"""
        if self.name == "spark":
            return f"regexp_replace({expr}, '{pat}', '')"
        return f"regexp_replace({expr}, '{pat}', '', 'g')"

    def ident(self, name: str) -> str:
        """identifier quoting (OFFSET is reserved in DuckDB)"""
        return name if self.name == "spark" else f'"{name}"'

    def concat_over_series(self, n_expr: str, elem_expr: str) -> str:
        """Concatenate ``elem_expr`` (may reference lambda var ``i``)
        for i in 1..n_expr. Empty string when n_expr < 1."""
        if self.name == "spark":
            # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard n < 1
            return (
                f"(CASE WHEN {n_expr} >= 1 THEN array_join("
                f"transform(sequence(1, {n_expr}), i -> {elem_expr}), '') "
                f"ELSE '' END)"
            )
        return (
            f"array_to_string(list_transform("
            f"generate_series(1, greatest(CAST({n_expr} AS BIGINT), 0)),"
            f" i -> {elem_expr}), '')"
        )


SPARK = Dialect("spark")
DUCK = Dialect("duckdb")


def _mime_case(d: Dialect) -> str:
    """Intended MIME per media span (the construction rule)."""
    img = " ".join(
        f"WHEN {i} THEN '{m}'" for i, m in enumerate(IMAGE_MIME_CYCLE)
    )
    return f"""
      CASE WHEN kind = 'image' THEN
             CASE mime_variant {img} ELSE 'application/octet-stream' END
           WHEN kind = 'pdf' THEN
             CASE WHEN mime_variant < 7 THEN 'application/pdf'
                  ELSE 'application/octet-stream' END
           ELSE NULL END
    """


def _sig_hex_case() -> str:
    whens = " ".join(f"WHEN '{m}' THEN '{h}'" for m, h in SIG_HEX.items())
    return f"CASE mime {whens} END"


def flat_spans_sql(d: Dialect, documents_rel: str = "documents") -> str:
    """SELECT producing one row per span with the construction rules.

    Columns: doc_id (string key), offset, kind, text, media_ref, plus
    rule-internal mime (the *intended* MIME — what the trie must detect).
    Valid in both dialects; ``documents_rel`` is the flat driver table.
    """
    sq = HTML_PREFIX.replace("'", "''")
    sx = HTML_SUFFIX.replace("'", "''")
    off_ident = d.ident("offset")
    return f"""
    WITH base AS (
      SELECT
        concat('doc-', lpad(CAST(d.doc_id AS STRING), 8, '0')) AS doc_id,
        t.i AS span_off,
        CASE WHEN (d.doc_id * 31 + t.i * 7) % 10 < 4 THEN 'text'
             WHEN (d.doc_id * 31 + t.i * 7) % 10 < 7 THEN 'html'
             WHEN (d.doc_id * 31 + t.i * 7) % 10 < 9 THEN 'image'
             ELSE 'pdf' END AS kind,
        (d.doc_id + 3 * t.i) % 8 AS mime_variant,
        substr(d.text,
               CAST(1 + (d.doc_id + t.i * 13) % greatest(d.n_chars - 60, 1) AS INT),
               60) AS content,
        concat('doc-', lpad(CAST(d.doc_id AS STRING), 8, '0'),
               ':', CAST(t.i AS STRING)) AS payload_tag
      FROM {documents_rel} d
      CROSS JOIN {d.series_0_to(MAX_SPANS - 1)}
      WHERE t.i < (CASE WHEN d.doc_id % {GIANT_EVERY} = 0
                        THEN {GIANT_SPANS} ELSE 2 + d.doc_id % 6 END)
    ),
    with_mime AS (
      SELECT doc_id, span_off, kind, content, payload_tag,
             {_mime_case(d)} AS mime
      FROM base
    )
    SELECT
      doc_id, span_off AS {off_ident}, kind, mime,
      CASE WHEN kind = 'text' THEN content
           WHEN kind = 'html' THEN concat('{sq}', content, '{sx}')
           ELSE NULL END AS text,
      CASE WHEN kind IN ('image', 'pdf') THEN
        concat('data:', mime, ';base64,',
               base64(unhex({_sig_hex_case()}) || {d.enc("payload_tag")}))
      ELSE NULL END AS media_ref
    FROM with_mime
    """


def oracle_flat_spans_sql() -> str:
    """DuckDB form of the flat-span derivation (oracle building block)."""
    return flat_spans_sql(DUCK)


# doc_id shift per replica; keeps ids within the 8-digit zero-pad width.
# Base tables must have ids < REPLICA_SHIFT (driver testdata: sf0.001/
# 0.01/0.1 have 50/500/5000 docs), so <= 999 replicas fit in 8 digits.
REPLICA_SHIFT = 100_000


def flat_spans(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Spark: flat (doc_id, offset, kind, mime, text, media_ref) spans.

    ``replicate`` > 1 unions ``replicate`` deterministic copies of the
    base table with shifted doc_ids — a pure bench/scale knob (the
    oracle-checked path always runs replicate=1). The copies diverge in
    every derived value because all rules key on doc_id.
    """
    if not 1 <= replicate <= 999:
        # ids are zero-padded to 8 digits; >999 replicas at shift 1e5
        # would overflow the pad width and collide doc_ids.
        raise ValueError("replicate must be in [1, 999]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        from pyspark.sql import functions as F

        # bench-only path: one parquet-stats scan to enforce the id
        # contract instead of silently colliding replica doc_ids.
        max_id = docs.agg(F.max("doc_id")).first()[0]
        if max_id is not None and max_id >= REPLICA_SHIFT:
            raise ValueError(
                f"base doc_id {max_id} >= REPLICA_SHIFT {REPLICA_SHIFT}; "
                "replicated ids would collide"
            )
        reps = spark.range(replicate).withColumnRenamed("id", "__rep")
        docs = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * REPLICA_SHIFT)
            .drop("__rep")
        )
    docs.createOrReplaceTempView("__corpus_base_documents")
    return spark.sql(flat_spans_sql(SPARK, "__corpus_base_documents"))


def synthesize_documents(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """Nested input_hint-shaped corpus: (doc_id, spans array<struct<...>>).

    Spans are packed in md5-shuffled physical order (offset order must be
    *reconstructed*, never assumed). One hash-aggregate on doc_id; at
    scale this is the only shuffle of corpus construction.
    """
    flat = flat_spans(spark, sf_dir, replicate=replicate)
    flat.createOrReplaceTempView("__corpus_flat_spans")
    # array_sort on struct arrays orders by fields left-to-right, so a
    # leading md5 shuffle-key pseudo-randomizes physical order; transform
    # then drops the key.
    return spark.sql(
        """
        SELECT doc_id,
               transform(
                 array_sort(collect_list(named_struct(
                   'shuf', md5(concat(doc_id, '#', CAST(offset AS STRING))),
                   'kind', kind, 'text', text,
                   'media_ref', media_ref, 'offset', offset))),
                 s -> named_struct('kind', s.kind, 'text', s.text,
                                   'media_ref', s.media_ref,
                                   'offset', s.offset)) AS spans
        FROM __corpus_flat_spans
        GROUP BY doc_id
        """
    )


def write_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    partitions: int = 32,
    replicate: int = 1,
) -> None:
    """Materialize the nested corpus as parquet (test/bench fixture)."""
    synthesize_documents(spark, sf_dir, replicate=replicate).repartition(
        partitions
    ).write.mode("overwrite").parquet(out_path)


def materialized_documents(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """Deterministic staging cache for the synthesized nested corpus.

    The pipeline's real input is a TABLE SCAN (input_hint: an Iceberg
    table of documents) — so queries should read one materialized table
    rather than re-running the nest shuffle per query. Synthesizes once
    per (sf_dir, documents.parquet mtime, replicate) into tmpfs, then
    serves the parquet scan; concurrent writers race safely via
    write-to-tmp + atomic rename (first one wins, losers read the
    winner's table).
    """
    import hashlib
    import os
    import shutil
    import tempfile

    src = f"{sf_dir}/documents.parquet"
    try:
        # ns-resolution mtime + size: a regenerated source within the
        # same second (or an equal-mtime swap) must not serve a stale
        # cached corpus.
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        stamp = "absent"
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{stamp}|{replicate}".encode()
    ).hexdigest()[:12]
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    path = f"{base}/spark_graft_corpus_{key}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        tmp = f"{path}.tmp_{os.getpid()}"
        parts = max(8, spark.sparkContext.defaultParallelism)
        write_corpus(spark, sf_dir, tmp, partitions=parts, replicate=replicate)
        try:
            os.rename(tmp, path)
        except OSError:
            # Expected cause: a concurrent winner already created
            # ``path``. But on OTHER failures (EXDEV, permissions) there
            # is no winner — fall back to the freshly written tmp table
            # rather than rmtree'ing it and reading a nonexistent path.
            if not os.path.exists(f"{path}/_SUCCESS"):
                return spark.read.parquet(tmp)
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
