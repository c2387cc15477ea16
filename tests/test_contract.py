"""Driver-contract shape: queries()/oracle_sql() stay consistent."""

import re

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))


def test_query_names_and_callables():
    qs = entry.queries()
    assert len(qs) >= 50
    for name, fn in qs.items():
        assert re.fullmatch(r"[a-z][a-z0-9_]+", name), name
        assert callable(fn), name


def test_oracle_sql_is_nonempty_select():
    for name, sql in entry.oracle_sql().items():
        s = sql.strip().upper()
        assert s.startswith(("SELECT", "WITH")), name


def test_entry_is_callable():
    assert callable(entry.entry)
