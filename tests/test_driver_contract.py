"""Driver-contract smoke: the three __spark_entry__ hooks behave as the
harness expects (entry runs, every query has an oracle, schemas stable)."""


def test_entry_runs_and_has_stable_schema(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns == ["doc_id", "score"]
    assert df.count() >= 0


def test_every_query_has_matching_oracle(spark):
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o)
    assert len(q) >= 50


def test_query_callables_are_lazy_plans(spark):
    """queries() entries must build plans, not collect — the driver does
    the collecting. Building all 50 plans must not launch a job that
    materializes results (count of jobs not directly observable here, but
    plan construction must at least succeed for every entry)."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    for name, fn in e.queries().items():
        df = fn(spark, sf)
        assert df.schema is not None, name
