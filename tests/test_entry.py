"""Driver-contract smoke: entry() produces rows with a stable schema;
every oracle key has a query; queries run at sf0.001."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "doc_id", "n_spans", "n_receipts", "n_checks", "n_errors", "sum_tokens"
    }


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_each_query_runs_smoke(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name


def test_no_complex_output_columns(spark, sf_dir):
    """Driver-canonicalization contract: the round driver sorts the raw
    pandas result (``sort_values`` over all columns) before hashing, and
    list/dict/struct cells are unhashable there — how postings_index and
    jl_project errored in r4 despite passing the (then laxer) local
    gate. EVERY registered query must therefore emit only scalar
    top-level columns; library functions keep their array outputs, the
    registered query serializes (array_join / to_json) at the edge."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        cx = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if cx:
            bad[name] = cx
    assert not bad, f"complex top-level output columns (driver-unhashable): {bad}"
