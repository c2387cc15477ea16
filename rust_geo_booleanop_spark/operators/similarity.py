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
from pyspark.sql.types import ArrayType, LongType
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


def _cosine(a, b):
    """Cosine similarity, NULL (not NaN) for zero-norm vectors AND for
    vectors with non-finite components.

    0.0/0.0 is NaN in Spark's IEEE double division, and Spark sorts NaN
    GREATER than every number — an unguarded all-zero embedding would rank
    #1 for every query and pass every >= threshold filter. The same holds
    for a NaN component (real at scale: fp blowups during embedding
    training), which even defeats the denom > 0 guard because Spark's
    non-IEEE comparison makes NaN > 0.0 TRUE. NULL instead sorts last
    under desc() and fails threshold comparisons. The oracle twin is
    `_cos_sql` (__spark_entry__.py) — keep the guards in lockstep."""
    # try_divide is the ANSI-safe zero-norm guard (NULL divisor result,
    # no DIVIDE_BY_ZERO); the when() nulls the non-finite similarities.
    # A finite dot over an inf denom stays 0.0 on BOTH engines (DuckDB's
    # isfinite(0.0) keeps it too) — only NaN/inf similarities become NULL.
    sim = F.try_divide(_dot(a, b), _norm(a) * _norm(b))
    return F.when(~F.isnan(sim) & (F.abs(sim) != F.lit(float("inf"))), sim)


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
    cos = _cosine(F.col(vec_col), F.col(qvec_col))
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


def _fold_dots(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, n_planes) dot products as an explicit LEFT FOLD over dimensions:
    acc_j := p_j0*v_0; acc_j += p_jk*v_k for k = 1..dim-1.

    Deliberately NOT a BLAS matmul: BLAS reorders the FP summation
    (blocking/SIMD), while the left fold has one fixed operation order —
    the same order a chained `p0*v0 + p1*v1 + ...` SQL expression
    evaluates in — so bucket signs are reproducible bit-for-bit across
    engines and library builds."""
    acc = np.ascontiguousarray(mat[:, 0:1] * planes[:, 0][None, :])
    for k in range(1, planes.shape[1]):
        acc += mat[:, k : k + 1] * planes[:, k][None, :]
    return acc


def _pack_sign_bits(dots: np.ndarray) -> np.ndarray:
    """Pack per-plane sign bits (dot > 0 -> bit j) into int64 bucket ids."""
    signs = (dots > 0.0).astype(np.int64)
    weights = np.int64(1) << np.arange(dots.shape[1], dtype=np.int64)
    return (signs * weights[None, :]).sum(axis=1)


def _stack_vecs(vecs: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 12, vec_col: str = "embedding", seed: int = 7
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign bits packed into a long).
    The whole Arrow batch is one stacked matrix — no per-vector Python."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int64)
        return pd.Series(_pack_sign_bits(_fold_dots(_stack_vecs(vecs), planes)))

    return df.withColumn("lsh_bucket", bucket_udf(F.col(vec_col)))


def with_lsh_tables(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Multi-table LSH (OR-amplification): one EXPLODED row per (vector,
    table) with the table's bucket id. A single sign-signature's recall
    for similarity s is p^b with p = 1 - arccos(s)/pi — tiny for moderate
    thresholds; candidates sharing a bucket in ANY of L tables recover
    recall 1 - (1 - p^b)^L. Table index rides in the bucket's high bits so
    a plain equi-join on lsh_bucket never crosses tables."""
    # all tables' planes stacked into ONE (n_tables*n_planes, dim) matrix:
    # a single vectorized fold computes every table's signs for the whole
    # Arrow batch (no per-vector, per-table Python loops)
    all_planes = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )
    table_tag = np.arange(n_tables, dtype=np.int64) << np.int64(48)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        dots = _fold_dots(_stack_vecs(vecs), all_planes)  # (n, T*b)
        signs = (dots > 0.0).astype(np.int64).reshape(len(vecs), n_tables, n_planes)
        weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)
        buckets = (signs * weights[None, None, :]).sum(axis=2) | table_tag[None, :]
        return pd.Series(list(buckets))

    return df.withColumn("lsh_bucket", F.explode(buckets_udf(F.col(vec_col))))


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
    cos = _cosine(F.col(vec_col), F.col(qvec_col))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def cosine_near_dup_exact(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT near-duplicate pairs (cosine >= threshold, id_a < id_b) by a
    full self cross join — the recall-1 baseline the LSH/IVF variants are
    measured against. Quadratic by definition; at corpus scale use
    `embedding_near_dup_pairs` (LSH-blocked) and sample-audit recall
    against this."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", _cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

def ivf_pivots(
    embeddings: DataFrame, stride: int = 37, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse quantizer: every stride-th vector by id is a
    pivot (centroid). Id-stride sampling instead of k-means keeps the
    index reproducible run-to-run (and oracle-checkable); at cluster
    scale you'd swap in sampled k-means pivots without touching the rest
    of the pipeline."""
    return embeddings.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("pivot_id"), F.col(vec_col).alias("pivot_vec")
    )


def assign_ivf_lists(
    embeddings: DataFrame,
    pivots: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest pivot's inverted list (max cosine,
    smallest-pivot-id tiebreak).

    One broadcast of the pivot set + a map-side `max_by` aggregation —
    no window shuffle over the corpus, so the assignment pass scales
    linearly with corpus size and the only exchange is the final
    hash-aggregate on vec_id (already unique per row group)."""
    crossed = embeddings.crossJoin(F.broadcast(pivots))
    cos = _cosine(F.col(vec_col), F.col("pivot_vec"))
    best = F.max_by(
        "pivot_id", F.struct(F.col("pivot_cos"), (-F.col("pivot_id")).alias("neg_id"))
    )
    return (
        crossed.withColumn("pivot_cos", cos)
        .groupBy(id_col)
        .agg(best.alias("list_id"))
    )


def kmeans_pivots(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means for IVF centroids.

    Init = the k lowest-id vectors. Each iteration: assign every vector to
    its nearest centroid by cosine (broadcast + map-side max_by — the same
    pass `assign_ivf_lists` uses at query time), then recompute each
    list's mean with a SORTED-by-id fold inside one applyInPandas group —
    the FP summation order is fixed, so centroids are bit-identical
    run-to-run regardless of partitioning. Lists that go empty keep their
    previous centroid. Output schema matches `ivf_pivots`
    (pivot_id, pivot_vec) and plugs straight into `ivf_cosine_topk`."""
    import pandas as pd  # noqa: F811

    pivots = (
        embeddings.orderBy(F.asc(id_col))
        .limit(k)
        .select(F.col(id_col).alias("pivot_id"), F.col(vec_col).alias("pivot_vec"))
    )
    # stable 0..k-1 pivot ids so lists keep identity across iterations.
    # Renumber via one k-row aggregate (collect_list -> array_sort ->
    # posexplode): ids are unique so the struct sort orders by pivot_id
    # alone, and pos is the dense 0..k-1 rank. No WindowExec involved, so
    # re-evaluating this lineage prefix each iteration stays warning-free
    # and never funnels through a single-partition window.
    pivots = (
        pivots.agg(
            F.array_sort(F.collect_list(F.struct("pivot_id", "pivot_vec"))).alias("_ps")
        )
        .select(F.posexplode("_ps").alias("pivot_id", "_s"))
        .select("pivot_id", F.col("_s.pivot_vec").alias("pivot_vec"))
    )

    def mean_fn(key, pdf):
        (list_id,) = key
        order = np.argsort(pdf["_mid"].to_numpy(), kind="stable")
        vecs = [np.asarray(pdf["_mvec"].iloc[i], dtype=np.float64) for i in order]
        acc = vecs[0].copy()
        for v in vecs[1:]:
            acc += v
        acc /= float(len(vecs))
        nrm = float(np.sqrt(np.dot(acc, acc)))
        if nrm > 0.0:
            acc /= nrm
        return pd.DataFrame(
            {"pivot_id": [list_id], "pivot_vec": [[float(x) for x in acc]]}
        )

    for _ in range(max(1, iters)):
        assigned = assign_ivf_lists(
            embeddings.select(F.col(id_col).alias("_mid"), F.col(vec_col).alias("_mvec")),
            pivots,
            id_col="_mid",
            vec_col="_mvec",
        ).join(
            embeddings.select(F.col(id_col).alias("_mid"), F.col(vec_col).alias("_mvec")),
            on="_mid",
        )
        new_pivots = assigned.groupBy("list_id").applyInPandas(
            mean_fn, schema="pivot_id long, pivot_vec array<float>"
        )
        # empty lists keep their previous centroid
        pivots = (
            pivots.alias("old")
            .join(new_pivots.alias("new"), on="pivot_id", how="left")
            .select(
                "pivot_id",
                F.coalesce(F.col("new.pivot_vec"), F.col("old.pivot_vec")).alias(
                    "pivot_vec"
                ),
            )
        )
        # cut the recursive lineage each round (dedup_clusters does the
        # same): pivots_i appears TWICE in pivots_{i+1}'s plan (assign +
        # the empty-list join), so without the checkpoint the final plan
        # re-evaluates the init subtree ~2^iters times and re-scans the
        # embeddings table once per copy. k rows — the checkpoint is free.
        pivots = pivots.localCheckpoint(eager=True)
    return pivots


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    stride: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
    pivots: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest inverted lists per query, exact
    cosine top-k within the probed lists only.

    Complement to `lsh_cosine_topk`: IVF partitions the corpus into
    disjoint lists (each vector scanned by at most the queries probing
    its list) where LSH buckets by hash signs. Candidate volume ≈
    corpus * nprobe / n_pivots instead of the full cross join. Recall < 1
    by construction; nprobe trades recall for candidate count.

    `pivots` defaults to the deterministic stride quantizer (oracle-
    checkable); pass `kmeans_pivots(...)` for real centroids — measured
    recall@10 at sf0.01 (14 lists): stride 0.28/0.40/0.55 vs k-means
    0.63/0.70/0.81 at nprobe 1/2/4."""
    if pivots is None:
        pivots = ivf_pivots(embeddings, stride, id_col, vec_col)
    lists = assign_ivf_lists(embeddings, pivots, id_col, vec_col).join(
        embeddings, on=id_col
    )
    qcross = queries.crossJoin(F.broadcast(pivots))
    qcos = _cosine(F.col(qvec_col), F.col("pivot_vec"))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("probe_cos"), F.asc("pivot_id"))
    probes = (
        qcross.withColumn("probe_cos", qcos)
        .withColumn("probe_rank", F.row_number().over(wq))
        .filter(F.col("probe_rank") <= nprobe)
        .select(qid_col, qvec_col, F.col("pivot_id").alias("list_id"))
    )
    cand = lists.join(F.broadcast(probes), on="list_id")
    cos = _cosine(F.col(vec_col), F.col(qvec_col))
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
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH self-join
    + exact verify. Precision is 1 (every emitted pair passes the exact
    cosine test); recall ≈ 1 - (1 - p^n_planes)^n_tables with
    p = 1 - arccos(threshold)/pi — size n_planes to the threshold (lower
    thresholds need fewer planes per table) and n_tables to the recall
    target. Candidate volume per table is bounded by bucket collisions;
    the distinct() dedups pairs found in multiple tables before verify.

    Precondition: `id_col` must be UNIQUE in `embeddings`. Candidates are
    deduplicated on ids only (see shuffle note below) and vectors
    re-attached by id join — duplicate ids would multiply candidate rows
    where the pre-round-2 (id, vec)-tuple dedup collapsed them."""
    b = with_lsh_tables(embeddings, dim, n_planes, n_tables, vec_col)
    left = b.select(F.col(id_col).alias("id_a"), "lsh_bucket")
    right = b.select(F.col(id_col).alias("id_b"), "lsh_bucket")
    # Dedup multi-table candidate pairs on (id_a, id_b) ONLY — carrying the
    # embeddings through the distinct would shuffle two full vectors per
    # candidate row and compare arrays in the exchange; the id-only
    # distinct cuts shuffle bytes by ~the embedding width. Vectors are
    # re-attached afterwards with two joins against the (already shuffled
    # by id) base table.
    pairs = (
        left.join(right, on="lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    cos = _cosine(F.col("vec_a"), F.col("vec_b"))
    return (
        pairs.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    dim: int,
    threshold: float,
    n_planes: int = 3,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    LSH near-dup pairs -> connected components -> keep one representative
    (the min id) per semantic cluster.

    Output: one row per input vector — (id_col, cluster_rep, keep), where
    singletons are their own representative and keep = (id == rep).

    Composition of two proven stages: `embedding_near_dup_pairs` (OR-
    amplified multi-table LSH, bucket equi-join — never all-pairs) and
    `dedup_clusters` (min-label + pointer doubling, O(log n) rounds).
    The final representative attach is one equi-join on the id. At 100 TB
    every stage is bucketed or key-partitioned; nothing quadratic.
    """
    from .dedup import dedup_clusters

    pairs = embedding_near_dup_pairs(
        embeddings, dim=dim, threshold=threshold,
        n_planes=n_planes, n_tables=n_tables, id_col=id_col, vec_col=vec_col,
    )
    clusters = dedup_clusters(pairs).withColumnRenamed("doc_id", id_col)
    rep = F.coalesce(F.col("cluster_rep"), F.col(id_col))
    return (
        embeddings.select(id_col)
        .join(clusters, on=id_col, how="left")
        .select(
            id_col,
            rep.alias("cluster_rep"),
            (rep == F.col(id_col)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization ANN (built-in functions only)
# ---------------------------------------------------------------------------

def _sub_l2sq(a_col, b_col, start: int, width: int):
    """L2^2 between two array<float> slices [start, start+width) (0-based)
    as a pure-JVM LEFT FOLD in element order: acc + (a-b)*(a-b), every
    element cast to double BEFORE any arithmetic (float ops would round
    at binary32 and diverge from a double-arithmetic oracle). Matches a
    chained `(CAST..-CAST..)*(..) + ...` SQL expression operation for
    operation; `(a-b)*(a-b)` never pow."""
    diffs = F.zip_with(
        F.slice(a_col, start + 1, width),
        F.slice(b_col, start + 1, width),
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    stride: int = 31,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN top-k (Jegou et al., PAMI 2011):
    split each vector into `m` subspaces, quantize every subspace to its
    nearest codebook centroid, and rank candidates by the asymmetric
    (ADC) distance — the sum over subspaces of the exact query-to-
    centroid distance. The memory-bound ANN shape: at 100 TB the corpus
    is stored as m small codes (here m pivot ids), the codebooks are a
    tiny
    broadcast, and query scoring never touches the raw corpus vectors.

    Codebooks: deterministic stride pivots (the s04 convention) — the
    sub-vectors of every id `% stride == 0` row. Encoding is one scan ×
    broadcast-pivot pass with map-side-partial min(struct(dist, pivot))
    argmins — the shuffle carries one row per vector. ADC re-uses the
    same fold (`_sub_l2sq`, exact element-order double arithmetic), so a
    SQL oracle reproduces every distance bit for bit; output is the
    integer relation (query_id, vec_id, pq_rank) ranked by
    (adc ASC, vec_id ASC) — a total order.

    Engine requirement; no reference counterpart.
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    width = dim // m
    pivots = embeddings.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("pivot_id"), F.col(vec_col).alias("pivot_vec")
    )
    dists = [
        _sub_l2sq(F.col(vec_col), F.col("pivot_vec"), s * width, width).alias(
            f"d{s}"
        )
        for s in range(m)
    ]
    enc = (
        embeddings.crossJoin(F.broadcast(pivots))
        .select(F.col(id_col).alias("vec_id"), F.col("pivot_id"), *dists)
        .groupBy("vec_id")
        .agg(
            *[
                F.min(F.struct(F.col(f"d{s}"), F.col("pivot_id"))).alias(f"m{s}")
                for s in range(m)
            ]
        )
        .select(
            "vec_id",
            *[F.col(f"m{s}.pivot_id").alias(f"code{s}") for s in range(m)],
        )
    )
    qd = queries.crossJoin(F.broadcast(pivots)).select(
        F.col("query_id"),
        F.col("pivot_id"),
        *[
            _sub_l2sq(F.col("query_vec"), F.col("pivot_vec"), s * width, width).alias(
                f"qd{s}"
            )
            for s in range(m)
        ],
    )
    cand = enc.crossJoin(F.broadcast(queries.select("query_id")))
    for s in range(m):
        cand = cand.join(
            F.broadcast(
                qd.select(
                    "query_id",
                    F.col("pivot_id").alias(f"code{s}"),
                    F.col(f"qd{s}"),
                )
            ),
            on=["query_id", f"code{s}"],
        )
    adc = F.col("qd0")
    for s in range(1, m):
        adc = adc + F.col(f"qd{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    return (
        cand.select("query_id", "vec_id", adc.alias("adc"))
        .withColumn("pq_rank", F.row_number().over(w))
        .filter(F.col("pq_rank") <= k)
        .select("query_id", "vec_id", "pq_rank")
    )


def binary_signature_cols(vec_col: str = "embedding", dim: int = 64):
    """(sig_lo, sig_hi) Columns: the vector's sign bits packed into two
    int64 halves — bit j of sig_lo is set iff component j (0-based,
    j < 32) is strictly positive; sig_hi covers components 32..dim-1.

    This is binary quantization (the 1-bit embedding compression used by
    retrieval systems): 64 floats become 8 bytes, and similarity becomes
    a Hamming distance — two XORs + two POPCNTs per candidate instead of
    a 64-float dot product. Exact integer arithmetic end-to-end (distinct
    powers of two summed — order-free), so an ANSI-SQL oracle reproduces
    the signatures byte-for-byte. -0.0 and NULL components clear the
    strict `> 0` test to bit 0 on both engines; NaN SETS the bit on both
    (Spark SQL and DuckDB order NaN greater than every number, so
    `NaN > 0` is true — IEEE-Python intuition says false, which is why
    the twin tests model the engines, not Python).

    Two 32-bit halves rather than one 64-bit word: bit 63 would need the
    int64 sign bit, and a SUM reaching 2**63 overflows BIGINT on the
    oracle side — the halves keep every intermediate comfortably inside
    int64 on both engines."""
    if not (1 <= dim <= 64):
        raise ValueError(f"dim must be in 1..64: {dim}")
    v = F.col(vec_col)

    def half(lo: int, hi: int):
        acc = F.lit(0).cast("long")
        for i in range(lo, min(hi, dim)):
            acc = acc + F.when(
                v[i] > F.lit(0.0), F.lit(1 << (i - lo)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc

    return half(0, 32).alias("sig_lo"), half(32, 64).alias("sig_hi")


def hamming_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Top-k nearest corpus vectors per query under Hamming distance of
    sign-quantized signatures (binary-quantization ANN).

    Plan shape mirrors cosine_topk — broadcast the (tiny) query
    signatures, score map-side, ONE shuffle for the per-query top-k — but
    the per-candidate cost is two XOR+POPCNT int ops instead of a
    dim-float dot product, which is the whole point of the quantization:
    at 100 TB the scoring stage is memory-bandwidth-bound, not FPU-bound.
    Distances are exact integers; ties break on id, so the result is
    deterministic and byte-reproducible by the SQL oracle.
    """
    lo, hi = binary_signature_cols(vec_col, dim)
    # Materialization barrier (round-5 fix): without the exchange the
    # 64-term sign-fold Project fuses into the BroadcastNestedLoopJoin
    # stage and is re-evaluated once per JOINED row instead of once per
    # corpus row — measured 12.3 s vs 0.5 s on an 800k-pair probe. The
    # exchange ships 16-byte signature rows (not vectors), so its cost
    # is negligible at any corpus size.
    corpus = embeddings.select(F.col(id_col), lo, hi).repartition(F.col(id_col))
    qlo, qhi = binary_signature_cols(qvec_col, dim)
    qsig = queries.select(F.col(qid_col), qlo.alias("q_lo"), qhi.alias("q_hi"))
    crossed = corpus.crossJoin(F.broadcast(qsig))
    hamming = (
        F.bit_count(F.col("sig_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("sig_hi").bitwiseXOR(F.col("q_hi")))
    ).cast("int")
    w = Window.partitionBy(qid_col).orderBy(F.asc("hamming"), F.asc(id_col))
    return (
        crossed.withColumn("hamming", hamming)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "hamming", "rank")
    )


def hamming_histogram(
    embeddings: DataFrame,
    sample_mod: int = 5,
    sample_rem: int = 0,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Histogram of pairwise Hamming distances between the sign-bit
    signatures of a deterministic id-sample — the corpus-geometry
    profile that calibrates binary-quantization thresholds (how many
    bits apart are random pairs vs near-duplicates?).

    The sample is id-hash deterministic (id % sample_mod == sample_rem),
    signatures come from the same `binary_signature_cols` layout as
    hamming_topk/s09, and every distance is an exact integer — so the
    whole histogram is byte-reproducible by an ANSI-SQL oracle.

    Scale shape: all-pairs over the SAMPLE by construction (a distance
    histogram is a property of the pair distribution; sampling the ids
    samples the pairs uniformly). The sampled signature table is tiny
    (8 bytes a row at any corpus size once sample_mod is scaled to the
    corpus), one side broadcasts, and the scoring is two XOR+POPCNTs a
    pair — at 100 TB you widen sample_mod, never the join.
    """
    lo, hi = binary_signature_cols(vec_col, dim)
    # same materialization barrier as hamming_topk: keep the sign-fold
    # out of the nested-loop join stage (once per sampled row, never
    # once per pair)
    sig = (
        embeddings.filter(F.col(id_col) % sample_mod == sample_rem)
        .select(F.col(id_col), lo, hi)
        .repartition(F.col(id_col))
    )
    b = sig.select(
        F.col(id_col).alias("_bid"),
        F.col("sig_lo").alias("_blo"),
        F.col("sig_hi").alias("_bhi"),
    )
    pairs = sig.crossJoin(F.broadcast(b)).filter(F.col(id_col) < F.col("_bid"))
    hamming = (
        F.bit_count(F.col("sig_lo").bitwiseXOR(F.col("_blo")))
        + F.bit_count(F.col("sig_hi").bitwiseXOR(F.col("_bhi")))
    ).cast("int")
    return (
        pairs.select(hamming.alias("hamming"))
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
