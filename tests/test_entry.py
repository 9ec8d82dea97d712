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
