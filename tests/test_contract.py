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


def test_every_query_is_oracle_backed():
    """Since round 4 EVERY queries() entry has a value-hash oracle (zero
    rows-only), and the driver's ~50-entry grading budget goes to
    queries that were NEVER driver-graded. Round 5 promoted the entire
    round-4 staged wave (exactly 50 queries) into positions 1-50, so
    anything past position 50 must already be hash-green in a committed
    driver artifact — CORRECTNESS_r03.json OR CORRECTNESS_r04.json (its
    driver evidence lives in history)."""
    import json
    import os

    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())
    assert set(qs) == oracles, sorted(set(qs) ^ oracles)
    # slots 1-50 are exactly the promoted round-4 staged wave
    graded = set(qs[:50])
    assert graded == set(entry._R5_PROMOTED_QUERIES), sorted(
        graded ^ set(entry._R5_PROMOTED_QUERIES)
    )
    assert len(entry._R5_PROMOTED_QUERIES) == 50
    assert {"r23_grouping_sets", "h10_skyline", "h16_gini",
            "g24_morton_blocks", "g32_morans_i", "m08_video_frame_stats",
            "s13_hamming_histogram", "t26_word_length_profile",
            "d13_cluster_size_histogram", "r37_array_functions"} <= graded
    # staged queries (round-6 wave) must not collide with registered
    # ones, and each staged query needs its oracle (they're graded by
    # check_oracles.py)
    assert set(entry.STAGED_QUERIES) == set(entry.STAGED_ORACLE_SQL)
    assert not set(entry.STAGED_QUERIES) & set(qs)
    repo = os.path.join(os.path.dirname(__file__), "..")
    green = set()
    for artifact in ("CORRECTNESS_r03.json", "CORRECTNESS_r04.json"):
        rec = json.load(open(os.path.join(repo, artifact)))
        green |= {k for k, v in rec.items() if v.get("hash_match")}
    # the budget invariant: a query may fall past the cut ONLY if its
    # hash-green driver row is already committed in a past CORRECTNESS
    cut = set(qs[50:])
    assert cut <= green, sorted(cut - green)
    assert entry.SF001_ONLY_ORACLES <= set(qs)


def test_oracle_sql_is_nonempty_select():
    for name, sql in entry.oracle_sql().items():
        s = sql.strip().upper()
        assert s.startswith(("SELECT", "WITH")), name


def test_entry_is_callable():
    assert callable(entry.entry)


def _value_hash(rows, columns):
    """Same order-insensitive hash as scripts/check_oracles.py."""
    import hashlib

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x1f".join(repr(row[i]) for row in [r] for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def test_zero_vector_oracle_parity(spark, tmp_path):
    """A degenerate embedding must NOT diverge the similarity oracles:
    Spark's _cosine maps zero-norm AND non-finite similarities to NULL
    (similarity.py) and the DuckDB oracles carry the same CASE guard
    (_cos_sql) — without it DuckDB's list_cosine_similarity yields NaN,
    which sorts FIRST under DESC and passes no threshold the same way
    (and Spark's non-IEEE NaN > 0.0 = TRUE defeats the denom guard
    alone). Injects an all-zero vector (vec_id 1 query / 11 corpus), a
    NaN-component vector (2 / 12), an inf-component vector (3 / 13),
    and a large-finite ~1e30-component vector (4 / 14 — DuckDB's
    FLOAT[] accumulation would overflow to inf where Spark's double
    fold stays finite, hence the DOUBLE[] cast in _cos_sql) and
    requires the full value-hash to still match for s01/s04/s05."""
    import duckdb
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        if i in (1, 11):
            vec = [0.0] * 64
        elif i in (2, 12):
            vec = [float(x) for x in rng.standard_normal(64).astype("float32")]
            vec[7] = float("nan")
        elif i in (3, 13):
            vec = [float(x) for x in rng.standard_normal(64).astype("float32")]
            vec[5] = float("inf")
        elif i in (4, 14):
            vec = [float(x) for x in rng.standard_normal(64).astype("float32")]
            vec[9] = 1e30
        else:
            vec = [float(x) for x in rng.standard_normal(64).astype("float32")]
        rows.append((i, vec, i % 5))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM parquet_scan('{path}/*.parquet')")
    oracles = entry.oracle_sql()
    qs = entry.queries()
    for name in ("s01_cosine_topk", "s04_ivf_topk", "s05_neardup_exact"):
        sdf = qs[name](spark, str(tmp_path))
        cols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        assert sorted(cols) == sorted(ocols), name
        assert len(srows) == len(orows), (name, len(srows), len(orows))
        assert _value_hash(srows, cols) == _value_hash(orows, ocols), name
