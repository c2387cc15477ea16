"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: dot products via built-in higher-order
  functions (zip_with + aggregate) — stays JVM-side, no Python in the hot
  path; per-query top-k via window row_number.
- LSH-bucketed variant (random hyperplane signs): candidates only probe
  matching buckets — the scale path when the corpus is too big for a full
  scan per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Brute-force cosine top-k: every query against the full corpus.

    Queries are broadcast (small side); similarity is computed by
    whole-stage-codegen'd array expressions; one shuffle for per-query
    top-k. Ties broken by id for determinism.
    """
    crossed = embeddings.crossJoin(F.broadcast(queries))
    cos = _dot(F.col(vec_col), F.col(qvec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        crossed.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 12, vec_col: str = "embedding", seed: int = 7
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign bits packed into a long)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            arr = np.asarray(v, dtype=np.float64)
            signs = (planes @ arr) > 0
            b = 0
            for j, s in enumerate(signs):
                if s:
                    b |= 1 << j
            out[i] = b
        return pd.Series(out)

    return df.withColumn("lsh_bucket", bucket_udf(F.col(vec_col)))


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Bucketed ANN: candidates share the query's LSH bucket (equi-join on
    bucket id instead of a full cross join), then exact cosine + top-k.
    Recall < 1 by construction; n_planes trades recall for candidate count.
    """
    emb_b = with_lsh_bucket(embeddings, dim, n_planes, vec_col)
    qry_b = with_lsh_bucket(queries, dim, n_planes, qvec_col)
    cand = emb_b.join(F.broadcast(qry_b), on="lsh_bucket")
    cos = _dot(F.col(vec_col), F.col(qvec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join + verify."""
    b = with_lsh_bucket(embeddings, dim, n_planes, vec_col)
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "lsh_bucket")
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "lsh_bucket")
    pairs = left.join(right, on="lsh_bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("vec_a"), F.col("vec_b")) / (_norm(F.col("vec_a")) * _norm(F.col("vec_b")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
