"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the training-data-pipeline mandate:

- **brute-force cosine top-k** (the correctness baseline, DuckDB-verified):
  broadcast the query set, one pass over the vectors, per-row dot products
  in whole-stage codegen (``zip_with`` + ``aggregate`` — no UDF), window
  top-k. Cost O(|Q|·N·d); right answer, exact.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (hyperplanes derived deterministically from md5 so executors need no
  shared state), candidates = vectors sharing the signature prefix bucket
  with the query, exact re-rank inside the bucket. Sub-linear candidate
  sets at 100 TB; recall tunable via planes/bands. IVF (k-means coarse
  quantizer) is the other standard scale path; LSH chosen here because it
  is stateless and needs no training pass.

All similarity math is done in double precision and rounded to 4 decimals
before ranking so results are stable across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for the first ``num_queries`` vectors
    (query set = vec_id < num_queries; self-matches excluded).

    Returns (query_id, neighbor_id, rank, cosine)."""
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    queries = (
        embeddings.filter(F.col(id_col) < num_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _norm(F.col(vec_col)).alias("qnrm"),
        )
    )
    sims = (
        base.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")), 4),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk_sql(table: str, num_queries: int = 10, k: int = 5, dim: int = 64) -> str:
    """DuckDB oracle: same query set, double-precision dot products via
    positional unnest, same rounded-cosine ranking."""
    return f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS dot,
               SQRT(SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) AS qn,
               SQRT(SUM(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))) AS vn
        FROM {table} q, {table} v, UNNEST(range(1, {dim + 1})) AS t(i)
        WHERE q.vec_id < {num_queries} AND v.vec_id <> q.vec_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY round(dot / (qn * vn), 4) DESC, neighbor_id) AS rank,
               round(dot / (qn * vn), 4) AS cosine
        FROM pairs
    )
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; Spark-only, rows-only correctness check)
# ---------------------------------------------------------------------------


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[i] = ±1 derived from
    md5(plane:i) parity — deterministic, stateless, identical on every
    executor."""
    import hashlib

    signs = [
        1 if int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest(), 16) % 2 == 0 else -1
        for i in range(dim)
    ]
    terms = F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: x.cast("double") * s.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(terms >= 0, F.lit("1")).otherwise(F.lit("0"))


def ann_lsh_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact re-rank.

    ``num_tables`` independent hash tables (each ``planes`` hyperplanes);
    candidates = union of the query's buckets across tables, the standard
    recall amplifier (P[collide in ≥1 table] = 1-(1-p^planes)^tables).
    Vectors sharing no bucket with the query are never compared — the
    candidate set is Σ|bucket| instead of N."""
    tables = []
    for t in range(num_tables):
        sig = F.concat(
            F.lit(f"{t}#"),
            *[
                _hyperplane_sign(F.col(vec_col), t * planes + p, dim)
                for p in range(planes)
            ],
        )
        tables.append(sig)
    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(F.array(*tables)).alias("bucket"),
    )
    queries = (
        bucketed.filter(F.col(id_col) < num_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("bucket"),
        )
    )
    cands = (
        bucketed.join(F.broadcast(queries), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(id_col, vec_col, "query_id", "qvec")
        .dropDuplicates([id_col, "query_id"])
    )
    sims = cands.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col(vec_col))
            / (_norm(F.col("qvec")) * _norm(F.col(vec_col))),
            4,
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cosine")
    )
