"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the training-data-pipeline mandate:

- **brute-force cosine top-k** (the correctness baseline, DuckDB-verified):
  broadcast the query set, one pass over the vectors, per-row dot products
  in whole-stage codegen (``zip_with`` + ``aggregate`` — no UDF), window
  top-k. Cost O(|Q|·N·d); right answer, exact.
- **LSH-bucketed ANN** (scale path #1): random-hyperplane signatures
  (hyperplanes derived deterministically from md5 so executors need no
  shared state), candidates = vectors sharing the signature prefix bucket
  with the query, exact re-rank inside the bucket. Stateless — no training
  pass; recall tunable via planes/tables.
- **IVF ANN** (scale path #2): MLlib k-means coarse quantizer + nprobe
  cluster-probed search. Needs a training pass but adapts to the data
  distribution (measured: recall 0.46→0.80 as nprobe goes 2→8 of 16
  clusters on the synthetic vectors).

All similarity math is done in double precision and rounded to 4 decimals
before ranking so results are stable across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from wcdimportbot_spark.functions.partitioning import fan_out


def two_phase_topk(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per key WITHOUT funnelling the whole relation into
    |keys| reducers.

    ``row_number().over(partitionBy(key))`` on a corpus-sized relation
    with a handful of keys (10 ANN query points) shuffles EVERY scored
    row into |keys| partitions and fully sorts each — a straggler
    machine at 100×. Two phases instead:

    1. partial top-k per (key, input-slice): ``_slice`` =
       ``spark_partition_id()`` stamped before the exchange, so the
       phase-1 window's groups are bounded by the input partition size
       and the sort parallelism is #slices × |keys|, not |keys|;
    2. global top-k over the survivors — at most #slices × k rows per
       key, a tiny relation.

    Same answer as the single window for any ``order_cols`` that total-
    order rows within a key (all call sites carry an id tiebreaker, so
    the final ranking is deterministic regardless of slicing)."""
    sliced = df.withColumn("_slice", F.spark_partition_id())
    w1 = W.partitionBy(*key_cols, "_slice").orderBy(*order_cols)
    survivors = (
        sliced.withColumn("_pr", F.row_number().over(w1))
        .filter(F.col("_pr") <= k)
        .drop("_pr", "_slice")
    )
    w2 = W.partitionBy(*key_cols).orderBy(*order_cols)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


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
    embeddings = fan_out(embeddings, id_col)
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
    return two_phase_topk(
        sims,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id")],
        k,
    ).select("query_id", "neighbor_id", "rank", "cosine")


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


def ann_recall_report(
    embeddings: DataFrame,
    approx_topk: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    epsilon: float = 0.05,
    recall_floor: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin_floor: float | None = None,
) -> DataFrame:
    """Verifiable accuracy contract for an ANN result (the a11-sketch
    pattern applied to similarity search).

    An approximate top-k cannot hash-match a SQL oracle — the candidate set
    depends on LSH buckets / k-means clusters no SQL engine reproduces. What
    CAN be verified in closed form is (a) the exact side of the contract and
    (b) a tolerance assertion. Per query point this emits the *exact*
    nearest neighbour (id + rounded cosine, which DuckDB computes by brute
    force), the *exact* k-th-best cosine, the contract constants, and
    ``recall_within_tolerance`` = (ε-recall@k >= recall_floor), where
    ε-recall@k is the fraction of the ANN's k results whose cosine is
    within ``epsilon`` of the exact k-th cosine — the standard
    ann-benchmarks quality metric, robust to ties at the k boundary (on
    near-random vectors set-intersection recall punishes neighbours that
    are equally good to 4 decimals). The oracle predicts the exact values
    and all-true flags; any query point whose ANN quality dips below the
    floor flips its flag and breaks the value hash, and an ANN that returns
    fewer than the expected query points breaks the row count. The numeric
    recall itself is deliberately NOT emitted — it is exactly the quantity
    no closed-form oracle can predict; the flag is its hashable projection.

    With ``margin_floor`` set, the row additionally carries the TIGHTER
    flag ``recall_margin_ok`` = (per-query recall margin >=
    margin_floor), where the margin is how far the flag-deciding ANN
    cosine — the ``ceil(recall_floor·k)``-th best the ANN returned —
    sits ABOVE the ε-floor (``exact_kth_cosine − epsilon``). The margin
    itself is exactly as oracle-unpredictable as the recall, so the row
    hashes its floored projection instead (same trick as the flag);
    the raw numeric margins are exposed to tests via
    :func:`ann_recall_margins`. This is the early-warning contract: data
    or seed drift erodes the margin and flips the strict flag while the
    real recall flag still holds, turning a future red driver cell into
    a present test failure.

    Plan shape: the O(|Q|·N·d) brute-force scan appears ONCE (collapsed to
    a 10-row per-query aggregate, broadcast onto the ANN output), then one
    tiny groupBy computes the ε-good counts. At 100 TB this verification
    runs over a sampled slice next to the production ANN path, not over the
    full corpus — it is the accuracy monitor, not the serving query."""
    exact = cosine_topk_bruteforce(
        embeddings, num_queries=num_queries, k=k, id_col=id_col, vec_col=vec_col
    )
    ex_agg = exact.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("exact_top1_id"),
        F.max(F.when(F.col("rank") == 1, F.col("cosine"))).alias("exact_top1_cosine"),
        F.max(F.when(F.col("rank") == k, F.col("cosine"))).alias("exact_kth_cosine"),
    )
    import math

    good = (F.col("cosine") >= F.col("exact_kth_cosine") - epsilon).cast("int")
    need = max(1, math.ceil(recall_floor * k))
    report = (
        approx_topk.select("query_id", "cosine")
        .join(F.broadcast(ex_agg), "query_id")
        .groupBy("query_id")
        .agg(
            F.max("exact_top1_id").alias("exact_top1_id"),
            F.max("exact_top1_cosine").alias("exact_top1_cosine"),
            F.max("exact_kth_cosine").alias("exact_kth_cosine"),
            F.sum(good).alias("_good"),
            # the need-th best ANN cosine decides the recall flag; its
            # height above the ε-floor is the per-query margin
            F.element_at(
                F.sort_array(F.collect_list("cosine"), asc=False), need
            ).alias("_deciding"),
        )
    )
    cols = [
        F.col("query_id"),
        F.col("exact_top1_id"),
        F.round("exact_top1_cosine", 4).alias("exact_top1_cosine"),
        F.round("exact_kth_cosine", 4).alias("exact_kth_cosine"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(float(recall_floor)).alias("recall_floor"),
        (F.col("_good") / float(k) >= recall_floor).alias("recall_within_tolerance"),
    ]
    if margin_floor is not None:
        cols.extend(
            [
                F.lit(float(margin_floor)).alias("margin_floor"),
                # coalesce: an ANN result with FEWER than the deciding
                # `need` rows for a query leaves `_deciding` NULL
                # (element_at past the array end) — that is a degenerate
                # output and must FAIL the strict contract, not pass it
                # as NULL (which the driver's value hash would not flag)
                F.coalesce(
                    F.col("_deciding")
                    >= F.col("exact_kth_cosine") - epsilon + margin_floor,
                    F.lit(False),
                ).alias("recall_margin_ok"),
            ]
        )
    return report.select(*cols)


def ann_recall_margins(
    embeddings: DataFrame,
    approx_topk: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    epsilon: float = 0.05,
    recall_floor: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, float]:
    """Raw per-query recall margins for an ANN result: how far the
    flag-deciding ANN cosine (the ``ceil(recall_floor·k)``-th best
    returned) sits above the ε-floor (``exact_kth_cosine − epsilon``).
    Positive = the ε-recall contract holds with that much headroom;
    the tests pin ``min(margins)`` per sf so erosion is visible long
    before the driver's hashed flag flips. Diagnostic (bounded |Q|-row
    collect) — the hashable projection lives in
    :func:`ann_recall_report`'s ``recall_margin_ok``."""
    import math

    exact = cosine_topk_bruteforce(
        embeddings, num_queries=num_queries, k=k, id_col=id_col, vec_col=vec_col
    )
    kth = exact.filter(F.col("rank") == k).select(
        "query_id", F.col("cosine").alias("_kth")
    )
    need = max(1, math.ceil(recall_floor * k))
    rows = (
        approx_topk.select("query_id", "cosine")
        .join(F.broadcast(kth), "query_id")
        .groupBy("query_id")
        .agg(
            F.max("_kth").alias("_kth"),
            F.element_at(
                F.sort_array(F.collect_list("cosine"), asc=False), need
            ).alias("_deciding"),
        )
        .collect()
    )
    # a NULL _deciding (ANN returned fewer than `need` rows) is the
    # worst possible margin, not a missing data point — report -inf so
    # a min(margins) pin fails loudly instead of skipping the query
    return {
        int(r["query_id"]): (
            float(r["_deciding"]) - (float(r["_kth"]) - epsilon)
            if r["_deciding"] is not None
            else float("-inf")
        )
        for r in rows
    }


def ann_recall_report_sql(
    table: str,
    num_queries: int = 10,
    k: int = 5,
    epsilon: float = 0.05,
    recall_floor: float = 0.6,
    dim: int = 64,
    margin_floor: float | None = None,
    exclude_sql: str | None = None,
    prelude_ctes: str | None = None,
) -> str:
    """Closed-form DuckDB oracle for :func:`ann_recall_report`: exact top-1
    and k-th cosine per query point by brute force, the contract constants,
    and all-true tolerance flags (including the strict margin flag when
    ``margin_floor`` is set). ``exclude_sql`` is an extra predicate on the
    NEIGHBOR side (alias ``v``) — the delete-propagation row's oracle
    computes exact top-k over the corpus MINUS the deleted ids.
    ``prelude_ctes`` injects extra CTEs ahead of the report (e.g. a
    ``refreshed`` relation the upsert-propagation row passes as
    ``table`` — the corpus AFTER replacing the upserted vectors)."""
    margin_cols = (
        f""",
           CAST({margin_floor} AS DOUBLE) AS margin_floor,
           TRUE AS recall_margin_ok"""
        if margin_floor is not None
        else ""
    )
    prelude = f"{prelude_ctes.rstrip().rstrip(',')}," if prelude_ctes else ""
    return f"""
    WITH {prelude}
    pairs AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS dot,
               SQRT(SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) AS qn,
               SQRT(SUM(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))) AS vn
        FROM {table} q, {table} v, UNNEST(range(1, {dim + 1})) AS t(i)
        WHERE q.vec_id < {num_queries} AND v.vec_id <> q.vec_id
          {f"AND ({exclude_sql})" if exclude_sql else ""}
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY round(dot / (qn * vn), 4) DESC, neighbor_id) AS rank,
               round(dot / (qn * vn), 4) AS cosine
        FROM pairs
    )
    SELECT query_id,
           MAX(CASE WHEN rank = 1 THEN neighbor_id END) AS exact_top1_id,
           MAX(CASE WHEN rank = 1 THEN cosine END) AS exact_top1_cosine,
           MAX(CASE WHEN rank = {k} THEN cosine END) AS exact_kth_cosine,
           CAST({epsilon} AS DOUBLE) AS epsilon,
           CAST({recall_floor} AS DOUBLE) AS recall_floor,
           TRUE AS recall_within_tolerance{margin_cols}
    FROM ranked WHERE rank IN (1, {k})
    GROUP BY query_id
    """


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; Spark-only, rows-only correctness check)
# ---------------------------------------------------------------------------


def _plane_signs(plane: int, dim: int) -> list[int]:
    """±1 hyperplane components derived from md5(plane:i) parity —
    deterministic, stateless, identical on every executor."""
    import hashlib

    return [
        1 if int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest(), 16) % 2 == 0 else -1
        for i in range(dim)
    ]


def _plane_matrix_df(spark, planes: int, num_tables: int, dim: int):
    """The full ±1 hyperplane matrix as a ONE-ROW DataFrame for a
    broadcast cross join. Keeping the matrix out of the projection
    expression matters twice at scale: as inline literals it is re-planned
    and shipped inside every task binary and grows with ``dim`` (a
    1024-dim × 32-plane matrix is ~32k literal nodes); as a broadcast
    local relation it ships to each executor once and the plan stays O(1)
    in dimensionality. (An earlier variant with per-plane inlined
    zip_with/aggregate trees also paid ~7 s of Janino JIT per session —
    higher-order functions over one matrix column keep the expression tree
    tiny.)"""
    from pyspark.sql import types as T

    matrix = [
        [float(s) for s in _plane_signs(p, dim)] for p in range(num_tables * planes)
    ]
    schema = T.StructType(
        [T.StructField("_planes", T.ArrayType(T.ArrayType(T.DoubleType())))]
    )
    return spark.createDataFrame([(matrix,)], schema)


def _signs_against(vec: Column, matrix: Column) -> Column:
    """Sign bits of <vec, h> for every hyperplane row of ``matrix``."""
    return F.transform(
        matrix,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(vec, plane, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )


def _buckets_from_signs(signs: Column, planes: int, num_tables: int) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_tables - 1)),
        lambda t: F.concat(
            t.cast("string"),
            F.lit("#"),
            F.array_join(F.slice(signs, t * planes + F.lit(1), planes), ""),
        ),
    )


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
    planes_df = _plane_matrix_df(
        embeddings.sparkSession, planes, num_tables, dim
    )
    bucketed = (
        fan_out(embeddings, id_col)
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            F.col(vec_col),
            # materialize signs before slicing them into buckets (no CSE
            # inside lambda bodies)
            _signs_against(F.col(vec_col), F.col("_planes")).alias("_signs"),
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(
                _buckets_from_signs(F.col("_signs"), planes, num_tables)
            ).alias("bucket"),
        )
    )
    queries = (
        bucketed.filter(F.col(id_col) < num_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("bucket"),
        )
    )
    # candidate dedup stays NARROW — only (id, query_id) pairs flow
    # through the multi-table dedup shuffle; the vectors join back after
    # (same rationale as embedding_near_dup_ann's join-back)
    cand_ids = (
        bucketed.select(id_col, "bucket")
        .join(F.broadcast(queries.select("query_id", "bucket")), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .dropDuplicates([id_col, "query_id"])
        .select(id_col, "query_id")
    )
    qvecs = queries.select("query_id", "qvec").dropDuplicates(["query_id"])
    sims = (
        cand_ids.join(embeddings.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(qvecs), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col(vec_col))
                / (_norm(F.col("qvec")) * _norm(F.col(vec_col))),
                4,
            ),
        )
    )
    return two_phase_topk(
        sims, ["query_id"], [F.col("cosine").desc(), F.col(id_col)], k
    ).select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cosine")


def _split_salt(bucket: Column, vid: Column, nsplit: Column) -> Column:
    """Deterministic sub-bucket salt in ``[0, nsplit)``: first 8 md5 hex
    digits of ``bucket#id`` as an unsigned int, mod the split count —
    md5-derived like the hyperplanes, so DuckDB reproduces it exactly."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(bucket, F.lit("#"), vid.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % nsplit
    )


def embedding_ann_bucket_stats(
    embeddings: DataFrame,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    max_bucket_size: int | None = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The "no silent caps" companion to :func:`embedding_near_dup_ann`:
    per OVERSIZED bucket (size > max_bucket_size), its size, the split
    count applied, and the pair-work bound — so a pipeline can log what
    the guard forwent instead of silently under-reporting near-dups.
    Empty result == the guard was a no-op (byte-identical output)."""
    if max_bucket_size is None:
        raise ValueError("bucket stats need a max_bucket_size")
    planes_df = _plane_matrix_df(embeddings.sparkSession, planes, num_tables, dim)
    bucketed = (
        fan_out(embeddings, id_col)
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            _signs_against(F.col(vec_col), F.col("_planes")).alias("_signs"),
        )
        .select(
            F.col(id_col),
            F.explode(
                _buckets_from_signs(F.col("_signs"), planes, num_tables)
            ).alias("bucket"),
        )
    )
    return (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
        .withColumn(
            "nsplit",
            F.ceil(F.col("bucket_size") / F.lit(float(max_bucket_size))).cast("long"),
        )
        .withColumn(
            "uncapped_pairs",
            (F.col("bucket_size") * (F.col("bucket_size") - 1) / 2).cast("long"),
        )
        .withColumn(
            "capped_pairs_bound",
            (F.col("bucket_size") * F.lit(max_bucket_size) / 2).cast("long"),
        )
    )


def lsh_bucket_assignment(
    embeddings: DataFrame,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The narrow (id, bucket) multi-table hyperplane-LSH assignment —
    one row per (vector, table). This is the stored-index artifact of
    the LSH family: at 100 TB it is built once per corpus version (one
    narrow corpus pass, no shuffle) and persisted; the near-dup self-join
    (:func:`embedding_near_dup_ann`) and the semantic decontamination
    probe (:func:`semantic_decontaminate`) both consume it, the same way
    the IVF assignment and PQ codes tables serve their search rows."""
    planes_df = _plane_matrix_df(
        embeddings.sparkSession, planes, num_tables, dim
    )
    return (
        fan_out(embeddings, id_col)
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            _signs_against(F.col(vec_col), F.col("_planes")).alias("_signs"),
        )
        .select(
            F.col(id_col),
            F.explode(
                _buckets_from_signs(F.col("_signs"), planes, num_tables)
            ).alias("bucket"),
        )
    )


def embedding_near_dup_ann(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 1024,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs via LSH candidate generation — the
    scale path the blocked-crossJoin baseline
    (``dedup_embedding_cosine``) documents.

    Pair generation is a self-EQUI-join on the LSH bucket (never a
    cartesian): each vector lands in ``num_tables`` buckets of expected
    size N/2^planes, so candidate work is Σ|bucket|² over buckets —
    tunable via ``planes`` — instead of N². Candidates are exact-cosine
    scored and thresholded, so every emitted pair is a TRUE near-dup;
    approximation only loses pairs whose vectors share no bucket
    (P[miss] = (1-p^planes)^tables at angle-collision prob p). The
    hyperplanes are md5-derived (:func:`_plane_signs`), hence
    deterministic — a DuckDB oracle reproduces the bucketing bit-for-bit
    (:func:`embedding_near_dup_ann_sql`), making this ANN operator fully
    hash-verifiable, unlike top-k ANN whose quality needs the ε-recall
    contract.

    ``max_bucket_size`` is the bounded-posting-list guard (the df-cap
    pattern from text_dedup heavy n-grams) — ON BY DEFAULT (1024, like
    ``semantic_dedup``'s cluster cap; r9 ADVICE restored the guarded
    default after a round with opt-in semantics, because an external
    caller relying on the default must get the degenerate-bucket
    quadratic protection, not silently lose it). Pass
    ``max_bucket_size=None`` to opt OUT explicitly — the exact unguarded
    form for callers who know their corpus has no degenerate regions and
    want pre-guard recall (pairs split across salt sub-buckets in every
    table are deliberately forgone work). Pair work is Σ|bucket|², and
    ``planes`` only controls the EXPECTED bucket size — a degenerate
    corpus region (many identical vectors, exactly what dedup input
    contains) piles into ONE bucket and goes quadratic regardless of the
    knob. Oversized buckets are SPLIT, not dropped: each member gets a
    deterministic md5-derived salt in ``[0, ceil(|bucket|/cap))`` keyed
    on (bucket, id), and pairs join on (bucket, salt) — per-bucket work
    drops from |b|² to ~|b|·cap, linear in |b|. Because the salt hash
    includes the (per-table) bucket string, the split permutation
    differs across the ``num_tables`` tables, so a pair separated by the
    split in one table can still collide in another — for identical
    vectors (all tables agree on the bucket) the downstream connected-
    components pass reunites the overlapping sub-cliques into one
    cluster. The salt is md5-derived like the planes, so the DuckDB
    oracle reproduces the split bit-for-bit; what the cap forgoes is
    visible via :func:`embedding_ann_bucket_stats` (no silent caps).
    Buckets at or under the cap get salt 0 — byte-identical output to
    the unguarded form.

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b. Pass ``bucketed``
    (a prebuilt :func:`lsh_bucket_assignment` relation, e.g. a stored or
    session-memoized index) to skip the bucketing pass."""
    # candidate generation stays NARROW: only (id, bucket) flows through
    # the self-join and the multi-table dedup shuffle (16 B/row, not
    # 2 × dim floats); the vectors join back afterwards keyed on id —
    # at scale |pairs| dominates N, so shuffling id pairs + 2 passes of
    # the vector table beats dragging both arrays through every collision
    if bucketed is None:
        bucketed = lsh_bucket_assignment(
            embeddings, planes, num_tables, dim, id_col, vec_col
        )
    ids = bucketed.select(F.col(id_col), "bucket")
    if max_bucket_size is not None:
        # the guard adds a third consumer of the (id, bucket) relation
        # (sizes agg + both pair sides); a LAZY localCheckpoint computes
        # the hyperplane signs once per action and serves all three from
        # the materialized narrow relation instead of three corpus-scan
        # re-derivations (measured: removes the guard's extra pass at
        # sf0.1). Lazy, so plan-analysis-only callers execute nothing.
        ids = ids.localCheckpoint(eager=False)
        # one narrow groupBy over (id, bucket) sizes the buckets; the
        # salt is 0 (identity) for in-cap buckets, so the guard costs
        # one map-combinable agg + broadcast-sized join on healthy data
        sizes = ids.groupBy("bucket").agg(F.count("*").alias("_bn"))
        ids = (
            ids.join(sizes, "bucket")
            .withColumn(
                "_nsplit",
                F.ceil(F.col("_bn") / F.lit(float(max_bucket_size))).cast("long"),
            )
            .withColumn(
                "salt",
                _split_salt(F.col("bucket"), F.col(id_col), F.col("_nsplit")),
            )
            .select(F.col(id_col), "bucket", F.col("salt"))
        )
    else:
        ids = ids.withColumn("salt", F.lit(0).cast("long"))
    cand = (
        ids.select(F.col(id_col).alias("vec_a"), "bucket", "salt")
        .join(
            ids.select(F.col(id_col).alias("vec_b"), "bucket", "salt"),
            ["bucket", "salt"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        # a pair colliding in several tables must be scored once
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vv"),
        _norm(F.col(vec_col)).alias("_vn"),
    )
    sims = (
        cand.join(vecs, F.col("vec_a") == F.col("_vid"))
        .select("vec_a", "vec_b", F.col("_vv").alias("ea"), F.col("_vn").alias("na"))
        .join(vecs, F.col("vec_b") == F.col("_vid"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("_vv")) / (F.col("na") * F.col("_vn")), 4
            ).alias("cosine"),
        )
    )
    return sims.filter(F.col("cosine") >= threshold)


def embedding_near_dup_ann_sql(
    table: str,
    threshold: float = 0.4,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    max_bucket_size: int | None = 1024,
) -> str:
    """DuckDB oracle for :func:`embedding_near_dup_ann`: the SAME
    md5-parity hyperplane signs (last hex digit of md5('plane:i') even
    → +1), the same per-table sign-bit signatures, the same md5-derived
    oversized-bucket split salt, the same (bucket, salt)-equality
    candidate pairs, the same rounded exact cosine."""
    n_planes = num_tables * planes
    if max_bucket_size is None:
        salt_expr = "CAST(0 AS BIGINT)"
        nsplit_cte = ""
    else:
        salt_expr = (
            "('0x' || substring(md5(b.bkt || '#' || CAST(b.vec_id AS VARCHAR)), 1, 8))"
            "::BIGINT % s.nsplit"
        )
        nsplit_cte = f"""
    bsizes AS (
        SELECT bkt,
               CAST(CEIL(COUNT(*) / CAST({max_bucket_size} AS DOUBLE)) AS BIGINT)
                   AS nsplit
        FROM buckets GROUP BY bkt
    ),"""
    return f"""
    WITH plane AS (
        SELECT p.p AS p, i.i AS i,
               CASE WHEN ('0x' || substring(md5(CAST(p.p AS VARCHAR) || ':' ||
                          CAST(i.i AS VARCHAR)), 32, 1))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM UNNEST(range(0, {n_planes})) p(p), UNNEST(range(0, {dim})) i(i)
    ),
    sigs AS (
        SELECT e.vec_id, pl.p,
               CASE WHEN SUM(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.s) >= 0
                    THEN '1' ELSE '0' END AS bit
        FROM {table} e, plane pl
        GROUP BY 1, 2
    ),
    buckets AS (
        SELECT vec_id,
               CAST(p // {planes} AS VARCHAR) || '#'
                   || string_agg(bit, '' ORDER BY p) AS bkt
        FROM sigs GROUP BY vec_id, p // {planes}
    ),{nsplit_cte}
    salted AS (
        SELECT b.vec_id, b.bkt, {salt_expr} AS salt
        FROM buckets b{" JOIN bsizes s ON s.bkt = b.bkt" if max_bucket_size is not None else ""}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM salted a
        JOIN salted b ON a.bkt = b.bkt AND a.salt = b.salt
                      AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT c.vec_a, c.vec_b,
               SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) AS dot,
               SQRT(SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))) AS na,
               SQRT(SUM(CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))) AS nb
        FROM cand c
        JOIN {table} ea ON ea.vec_id = c.vec_a
        JOIN {table} eb ON eb.vec_id = c.vec_b,
             UNNEST(range(1, {dim + 1})) t(i)
        GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, round(dot / (na * nb), 4) AS cosine
    FROM pairs WHERE round(dot / (na * nb), 4) >= {threshold}
    """


def semantic_dedup_cluster_stats(
    embeddings: DataFrame,
    planes: int = 4,
    dim: int = 64,
    max_cluster_size: int | None = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The "no silent caps" companion to :func:`semantic_dedup` (r8
    verdict #6 — the embedding_ann_bucket_stats treatment for the
    semantic row): per OVERSIZED cluster, its size, the salt-split
    count, and the pair-work bounds. Unlike the near-dup ANN guard
    there is no multi-table redundancy here — a pair separated into
    different salts of its (single) cluster is never compared, so both
    members can survive. ``forgone_pairs`` = uncapped − bound is the
    upper bound on such unexamined pairs; a pipeline logs it (or
    re-runs the oversized clusters with more planes) instead of
    silently under-deduplicating. Empty result == the guard was a
    no-op (byte-identical dedup output)."""
    if max_cluster_size is None:
        raise ValueError("cluster stats need a max_cluster_size")
    planes_df = _plane_matrix_df(embeddings.sparkSession, planes, 1, dim)
    clustered = (
        fan_out(embeddings, id_col)
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            F.element_at(
                _buckets_from_signs(
                    _signs_against(F.col(vec_col), F.col("_planes")), planes, 1
                ),
                1,
            ).alias("cluster"),
        )
    )
    return (
        clustered.groupBy("cluster")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") > max_cluster_size)
        .withColumn(
            "nsplit",
            F.ceil(
                F.col("cluster_size") / F.lit(float(max_cluster_size))
            ).cast("long"),
        )
        .withColumn(
            "uncapped_pairs",
            (F.col("cluster_size") * (F.col("cluster_size") - 1) / 2).cast(
                "long"
            ),
        )
        .withColumn(
            "capped_pairs_bound",
            (F.col("cluster_size") * F.lit(max_cluster_size) / 2).cast("long"),
        )
        .withColumn(
            "forgone_pairs",
            F.col("uncapped_pairs") - F.col("capped_pairs_bound"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 1024,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, and within each
    cluster drop every document that is ``threshold``-similar to a
    cluster-mate sitting CLOSER to the cluster centroid — the
    cluster-representative keep policy that makes semantic dedup
    near-linear, versus pairwise ANN dedup's corpus-wide candidate
    generation. The complement to MinHash in production pipelines:
    MinHash catches lexical near-dups, this catches semantically
    redundant documents whose wording differs.

    Spark-first decomposition, all Catalyst (no UDF):

    - **clusters**: one deterministic random-hyperplane table
      (``planes`` md5-derived sign vectors, :func:`_plane_signs`) — the
      stateless stand-in for SemDeDup's k-means that a SQL oracle can
      reproduce bit-for-bit (the :func:`ivf_index` k-means is the
      drop-in alternative when oracle determinism is not needed; at
      100 TB ``planes`` grows like log2(N/target_cluster_size), keeping
      cluster size — and therefore per-cluster pair work — constant);
    - **centroids**: posexplode → per-(cluster, dim) mean → regrouped
      array; 2^planes rows, broadcast back onto the corpus;
    - **keep policy**: within-cluster pairs ≥ threshold (narrow
      (id, cluster) self-equi-join with vectors joined back — the
      embedding_near_dup_ann shuffle shape), each pair dropping its
      member with the LOWER rounded centroid-cosine (tie: larger id),
      then one distinct + anti-join. ``max_cluster_size`` applies the
      same md5 salt-split guard as :func:`embedding_near_dup_ann`
      (centroids always aggregate the FULL cluster — only the
      quadratic pair stage is bounded). Unlike the near-dup ANN there
      is no cross-table redundancy and no CC reunite downstream: a
      similar pair split across salts of one degenerate cluster is
      never compared and BOTH members survive — a deterministic,
      bounded trade (≤ ``forgone_pairs`` unexamined pairs, reported by
      :func:`semantic_dedup_cluster_stats`; pinned by the
      degenerate-cluster test). Pipelines log those stats — or grow
      ``planes`` for the oversized regions — instead of silently
      under-deduplicating.

    Returns (vec_id, cluster, centroid_cosine, kept) for EVERY input
    vector — the annotation form, so the registry row hash-verifies the
    clustering, the centroid geometry, and the verdicts in one relation.
    Reference scope: beyond-reference (training-data curation mandate);
    cites the reference only for the documents surface it feeds
    (src/models/wikimedia/enums.py language gates)."""
    spark = embeddings.sparkSession
    planes_df = _plane_matrix_df(spark, planes, 1, dim)
    clustered = (
        fan_out(embeddings, id_col)
        .crossJoin(F.broadcast(planes_df))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.element_at(
                _buckets_from_signs(
                    _signs_against(F.col(vec_col), F.col("_planes")), planes, 1
                ),
                1,
            ).alias("cluster"),
        )
    )
    cent = (
        clustered.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        .groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("_centroid")
        )
    )
    scored = (
        clustered.join(F.broadcast(cent), "cluster")
        .withColumn(
            "centroid_cosine",
            F.round(
                _dot(F.col(vec_col), F.col("_centroid"))
                / (_norm(F.col(vec_col)) * _norm(F.col("_centroid"))),
                4,
            ),
        )
        .select(F.col(id_col), F.col(vec_col), "cluster", "centroid_cosine")
        .localCheckpoint(eager=False)
    )
    ids = scored.select(F.col(id_col), "cluster", "centroid_cosine")
    if max_cluster_size is not None:
        sizes = ids.groupBy("cluster").agg(F.count("*").alias("_cn"))
        ids = (
            ids.join(sizes, "cluster")
            .withColumn(
                "_nsplit",
                F.ceil(F.col("_cn") / F.lit(float(max_cluster_size))).cast("long"),
            )
            .withColumn(
                "salt",
                _split_salt(F.col("cluster"), F.col(id_col), F.col("_nsplit")),
            )
            .select(F.col(id_col), "cluster", "centroid_cosine", "salt")
        )
    else:
        ids = ids.withColumn("salt", F.lit(0).cast("long"))
    a = ids.select(
        F.col(id_col).alias("_ia"),
        "cluster",
        "salt",
        F.col("centroid_cosine").alias("_ca"),
    )
    b = ids.select(
        F.col(id_col).alias("_ib"),
        "cluster",
        "salt",
        F.col("centroid_cosine").alias("_cb"),
    )
    cand = a.join(b, ["cluster", "salt"]).filter(F.col("_ia") < F.col("_ib"))
    vecs = scored.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv"),
                         _norm(F.col(vec_col)).alias("_vn"))
    sims = (
        cand.join(vecs, F.col("_ia") == F.col("_vid"))
        .select("_ia", "_ib", "_ca", "_cb", F.col("_vv").alias("_va"), F.col("_vn").alias("_na"))
        .join(vecs, F.col("_ib") == F.col("_vid"))
        .select(
            "_ia",
            "_ib",
            "_ca",
            "_cb",
            F.round(
                _dot(F.col("_va"), F.col("_vv")) / (F.col("_na") * F.col("_vn")), 4
            ).alias("_cos"),
        )
        .filter(F.col("_cos") >= threshold)
    )
    # per similar pair, the member farther from the centroid loses
    # (lower rounded centroid-cosine; tie -> the larger id)
    dropped = (
        sims.select(
            F.when(F.col("_ca") > F.col("_cb"), F.col("_ib"))
            .when(F.col("_cb") > F.col("_ca"), F.col("_ia"))
            .otherwise(F.greatest(F.col("_ia"), F.col("_ib")))
            .alias(id_col)
        )
        .distinct()
    )
    return (
        scored.select(F.col(id_col), "cluster", "centroid_cosine")
        .join(dropped.withColumn("_d", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.col("centroid_cosine"),
            F.coalesce(~F.col("_d"), F.lit(True)).alias("kept"),
        )
    )


def semantic_dedup_sql(
    table: str,
    threshold: float = 0.4,
    planes: int = 4,
    dim: int = 64,
    max_cluster_size: int | None = 1024,
) -> str:
    """DuckDB oracle for :func:`semantic_dedup`: the SAME md5-parity
    hyperplane cluster assignment, per-(cluster, dim) AVG centroids,
    rounded centroid cosines, salt-split in-cluster pairs, and the
    farther-from-centroid drop rule."""
    if max_cluster_size is None:
        salt_expr = "CAST(0 AS BIGINT)"
        size_join = ""
        size_cte = ""
    else:
        salt_expr = (
            "('0x' || substring(md5(c.cluster || '#' || CAST(c.vec_id AS VARCHAR)), 1, 8))"
            "::BIGINT % s.nsplit"
        )
        size_join = " JOIN csizes s ON s.cluster = c.cluster"
        size_cte = f"""
    csizes AS (
        SELECT cluster,
               CAST(CEIL(COUNT(*) / CAST({max_cluster_size} AS DOUBLE)) AS BIGINT)
                   AS nsplit
        FROM clus GROUP BY cluster
    ),"""
    return f"""
    WITH plane AS (
        SELECT p.p AS p, i.i AS i,
               CASE WHEN ('0x' || substring(md5(CAST(p.p AS VARCHAR) || ':' ||
                          CAST(i.i AS VARCHAR)), 32, 1))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM UNNEST(range(0, {planes})) p(p), UNNEST(range(0, {dim})) i(i)
    ),
    sigs AS (
        SELECT e.vec_id, pl.p,
               CASE WHEN SUM(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.s) >= 0
                    THEN '1' ELSE '0' END AS bit
        FROM {table} e, plane pl
        GROUP BY 1, 2
    ),
    clus AS (
        SELECT vec_id, '0#' || string_agg(bit, '' ORDER BY p) AS cluster
        FROM sigs GROUP BY vec_id
    ),{size_cte}
    cmean AS (
        SELECT c.cluster, i.i AS i, AVG(CAST(e.embedding[i.i] AS DOUBLE)) AS m
        FROM clus c
        JOIN {table} e ON e.vec_id = c.vec_id,
             UNNEST(range(1, {dim + 1})) i(i)
        GROUP BY 1, 2
    ),
    ccos AS (
        SELECT c.vec_id, c.cluster,
               round(SUM(CAST(e.embedding[cm.i] AS DOUBLE) * cm.m)
                     / (SQRT(SUM(CAST(e.embedding[cm.i] AS DOUBLE)
                                 * CAST(e.embedding[cm.i] AS DOUBLE)))
                        * SQRT(SUM(cm.m * cm.m))), 4) AS centroid_cosine
        FROM clus c
        JOIN {table} e ON e.vec_id = c.vec_id
        JOIN cmean cm ON cm.cluster = c.cluster
        GROUP BY 1, 2
    ),
    salted AS (
        SELECT c.vec_id, c.cluster, cc.centroid_cosine, {salt_expr} AS salt
        FROM clus c
        JOIN ccos cc ON cc.vec_id = c.vec_id{size_join}
    ),
    pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               a.centroid_cosine AS ca, b.centroid_cosine AS cb,
               round(SUM(CAST(ea.embedding[i] AS DOUBLE)
                         * CAST(eb.embedding[i] AS DOUBLE))
                     / (SQRT(SUM(CAST(ea.embedding[i] AS DOUBLE)
                                 * CAST(ea.embedding[i] AS DOUBLE)))
                        * SQRT(SUM(CAST(eb.embedding[i] AS DOUBLE)
                                   * CAST(eb.embedding[i] AS DOUBLE)))), 4) AS cos
        FROM salted a
        JOIN salted b ON a.cluster = b.cluster AND a.salt = b.salt
                      AND a.vec_id < b.vec_id
        JOIN {table} ea ON ea.vec_id = a.vec_id
        JOIN {table} eb ON eb.vec_id = b.vec_id,
             UNNEST(range(1, {dim + 1})) t(i)
        GROUP BY 1, 2, 3, 4
    ),
    dropped AS (
        SELECT DISTINCT CASE WHEN ca > cb THEN ib
                             WHEN cb > ca THEN ia
                             ELSE GREATEST(ia, ib) END AS vec_id
        FROM pairs WHERE cos >= {threshold}
    )
    SELECT cc.vec_id, cc.cluster, cc.centroid_cosine,
           cc.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
    FROM ccos cc
    """


def semantic_decontaminate(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    eval_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Semantic (embedding-level) benchmark decontamination — the
    complement to the n-gram overlap check (curation.decontaminate):
    n-grams catch verbatim eval leakage, this catches PARAPHRASED eval
    material whose wording differs but whose embedding is
    ``threshold``-close to an eval item (the contamination audits run
    on production pretraining corpora pair both).

    Output: one row per training vector sharing >= 1 LSH bucket with
    any eval vector — (vec_id, eval_candidates, max_eval_cosine,
    contaminated). ``contaminated`` is the decision bit
    (max_eval_cosine >= threshold); emitting the max cosine alongside
    keeps the threshold auditable instead of baked in, mirroring the
    n-gram report's overlap_ratio.

    Scale shape: the eval side is a benchmark suite — thousands of
    vectors, not billions — so its (bucket, eval_id) relation and its
    vectors are explicitly ``F.broadcast``; the corpus side does one
    narrow (id, bucket) pass and two broadcast-hash joins, and never
    shuffles on the bucket. Candidate work is
    Σ_b |bucket_b ∩ train| · |bucket_b ∩ eval| — linear in the corpus
    because the eval factor is bounded by the suite size, so the
    oversized-bucket salt-split guard the self-join near-dup needs
    (:func:`embedding_near_dup_ann`) is unnecessary here. Buckets are
    the same md5-derived hyperplanes (:func:`_plane_signs`), hence
    deterministic and bit-for-bit reproducible by the DuckDB oracle
    (:func:`semantic_decontaminate_sql`).

    Reference scope: none — the bot has no embedding surface; this is
    the training-data-pipeline pack (SURVEY §6). Pass ``bucketed`` (a
    prebuilt :func:`lsh_bucket_assignment` relation, e.g. a stored or
    session-memoized index shared with the near-dup row) to skip the
    bucketing pass."""
    if bucketed is None:
        bucketed = lsh_bucket_assignment(
            embeddings, planes, num_tables, dim, id_col, vec_col
        )
    is_eval = (F.col(id_col) % eval_mod) == 0
    eval_buckets = bucketed.filter(is_eval).select(
        F.col(id_col).alias("eval_id"), "bucket"
    )
    cand = (
        bucketed.filter(~is_eval)
        .join(F.broadcast(eval_buckets), "bucket")
        # a (train, eval) pair colliding in several tables is one candidate
        .dropDuplicates([id_col, "eval_id"])
        .select(id_col, "eval_id")
    )
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vv"),
        _norm(F.col(vec_col)).alias("_vn"),
    )
    eval_vecs = F.broadcast(vecs.filter((F.col("_vid") % eval_mod) == 0))
    scored = (
        cand.join(vecs, cand[id_col] == vecs["_vid"])
        .select(id_col, "eval_id", F.col("_vv").alias("tv"), F.col("_vn").alias("tn"))
        .join(eval_vecs, F.col("eval_id") == eval_vecs["_vid"])
        .select(
            id_col,
            F.round(
                _dot(F.col("tv"), F.col("_vv")) / (F.col("tn") * F.col("_vn")), 4
            ).alias("cos"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("eval_candidates"),
            F.max("cos").alias("max_eval_cosine"),
        )
        .withColumn(
            "contaminated", F.col("max_eval_cosine") >= F.lit(threshold)
        )
    )


def semantic_decontaminate_sql(
    table: str,
    threshold: float = 0.4,
    planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    eval_mod: int = 25,
) -> str:
    """DuckDB oracle for :func:`semantic_decontaminate`: the SAME
    md5-parity hyperplane signs, per-table sign-bit buckets,
    train × eval bucket-equality candidates, and rounded exact
    cosines."""
    n_planes = num_tables * planes
    return f"""
    WITH plane AS (
        SELECT p.p AS p, i.i AS i,
               CASE WHEN ('0x' || substring(md5(CAST(p.p AS VARCHAR) || ':' ||
                          CAST(i.i AS VARCHAR)), 32, 1))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM UNNEST(range(0, {n_planes})) p(p), UNNEST(range(0, {dim})) i(i)
    ),
    sigs AS (
        SELECT e.vec_id, pl.p,
               CASE WHEN SUM(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.s) >= 0
                    THEN '1' ELSE '0' END AS bit
        FROM {table} e, plane pl
        GROUP BY 1, 2
    ),
    buckets AS (
        SELECT vec_id,
               CAST(p // {planes} AS VARCHAR) || '#'
                   || string_agg(bit, '' ORDER BY p) AS bkt
        FROM sigs GROUP BY vec_id, p // {planes}
    ),
    cand AS (
        SELECT DISTINCT t.vec_id, e.vec_id AS eval_id
        FROM buckets t
        JOIN buckets e ON t.bkt = e.bkt
        WHERE t.vec_id % {eval_mod} <> 0 AND e.vec_id % {eval_mod} = 0
    ),
    scored AS (
        SELECT c.vec_id, c.eval_id,
               round(SUM(CAST(tv.embedding[i] AS DOUBLE)
                         * CAST(ev.embedding[i] AS DOUBLE))
                     / (SQRT(SUM(CAST(tv.embedding[i] AS DOUBLE)
                                 * CAST(tv.embedding[i] AS DOUBLE)))
                        * SQRT(SUM(CAST(ev.embedding[i] AS DOUBLE)
                                   * CAST(ev.embedding[i] AS DOUBLE)))), 4) AS cos
        FROM cand c
        JOIN {table} tv ON tv.vec_id = c.vec_id
        JOIN {table} ev ON ev.vec_id = c.eval_id,
             UNNEST(range(1, {dim + 1})) t(i)
        GROUP BY 1, 2
    )
    SELECT vec_id,
           COUNT(*) AS eval_candidates,
           MAX(cos) AS max_eval_cosine,
           MAX(cos) >= {threshold} AS contaminated
    FROM scored GROUP BY vec_id
    """


# ---------------------------------------------------------------------------
# IVF ANN (scale path #2): k-means coarse quantizer + cluster-probed search
# ---------------------------------------------------------------------------


def _kmeans_train(sample: "np.ndarray", k: int, seed: int):
    """Driver-side Lloyd k-means for the IVF coarse quantizer — the
    :func:`_pq_train` discipline applied to the full-dim vectors: 20
    matmul-based iterations (:func:`_nearest_center` form, never the
    (n, k, d) cube), deterministic seeded init, empty clusters re-seeded
    from the farthest point. Runs on the bounded training sample ONLY
    (the FAISS convention — training is always capped; the distributed
    work is the assignment/scan, not the fit)."""
    import numpy as np

    n = sample.shape[0]
    rng = np.random.default_rng(seed)
    kk = min(k, n)
    x2 = (sample ** 2).sum(axis=1)
    # seeded k-means++ init (the d² sampling of Arthur & Vassilvitskii
    # 2007, the same family as MLlib's k-means||): well-separated seeds
    # measurably tighten the coarse partitioning vs uniform choice, which
    # is what the IVF probe's recall rides on
    centers = np.empty((kk, sample.shape[1]), dtype=np.float64)
    centers[0] = sample[rng.integers(n)]
    d2 = x2 + (centers[0] ** 2).sum() - 2.0 * (sample @ centers[0])
    for i in range(1, kk):
        d2 = np.maximum(d2, 0.0)
        tot = d2.sum()
        if tot <= 0:  # all points coincide with chosen seeds
            centers[i:] = centers[0]
            break
        centers[i] = sample[rng.choice(n, p=d2 / tot)]
        d2 = np.minimum(
            d2, x2 + (centers[i] ** 2).sum() - 2.0 * (sample @ centers[i])
        )
    for _ in range(20):
        c2 = (centers ** 2).sum(axis=1)
        scores = c2[None, :] - 2.0 * (sample @ centers.T)
        assign = scores.argmin(axis=1)
        d_far = None  # lazily built; only iterations with empty clusters pay
        for c in range(kk):
            mask = assign == c
            if mask.any():
                centers[c] = sample[mask].mean(axis=0)
            else:
                # true squared distance needs the ||x||² term back.
                # Knock each chosen point out of the ranking so several
                # clusters emptying in the SAME iteration reseed to
                # DISTINCT farthest points — reusing one point would
                # duplicate centroids, and argmin ties to the lowest
                # index, permanently merging those clusters (r10 ADVICE)
                if d_far is None:
                    d_far = scores.min(axis=1) + x2
                far = int(d_far.argmax())
                centers[c] = sample[far]
                d_far[far] = -np.inf
    if kk < k:  # tiny corpus: pad by repeating centers (ties pick the
        # lowest index in _nearest_center's argmin — deterministic)
        centers = np.concatenate(
            [centers, centers[np.arange(k - kk) % kk]], axis=0
        )
    return centers


def ivf_index(
    embeddings: DataFrame,
    num_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_vectors: int = 262_144,
    n_vectors: int | None = None,
):
    """Train the IVF coarse quantizer and assign every vector to its
    nearest centroid — the inverted-file partitioning.

    Returns (assigned_df with a ``cluster`` column, centroids list).
    Training is a DRIVER-SIDE seeded Lloyd fit on a bounded sample
    (≤ ``max_train_vectors`` — representative by construction; round 10
    replaced the MLlib KMeans fit here: Lloyd's over a driver-collected
    sample is the same math without ~20 driver-coordinated Spark JOBS of
    per-iteration overhead, which dominated build latency — measured
    2.8s → ~0.4s at sf0.1 — and is exactly how the PQ codebooks were
    already trained, :func:`_pq_train`). The corpus-scale ASSIGNMENT
    stays distributed: one Arrow-batched ``mapInPandas`` pass with the
    (k × d, driver-sized) centroid matrix riding the closure — the same
    frozen-model encode shape as ``ann_store._encode_with_model``. At
    100 TB that one narrow pass is the only full-corpus work."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    vecs = fan_out(embeddings, id_col)
    # the count only sizes the training-sample fraction; callers that
    # already know the corpus cardinality pass it (repartition and the
    # assign pass below are row-preserving, so one count serves the
    # whole build — r16)
    n = vecs.count() if n_vectors is None else int(n_vectors)
    train = vecs
    if n > max_train_vectors:
        train = vecs.sample(
            withReplacement=False, fraction=max_train_vectors / n, seed=seed
        )
    # canonical sample ORDER (sorted by id, driver-side on the bounded
    # sample): toPandas returns rows in partition order, which varies
    # with session config (shuffle partitions, AQE coalescing) — and the
    # seeded k-means++ picks by INDEX, so an order-dependent sample
    # would make the trained clusters (and the recall-margin flags the
    # driver hashes) differ between the test, bench, and driver
    # sessions. Sorting pins the fit to the data alone.
    pdf = train.select(id_col, vec_col).toPandas().sort_values(id_col)
    sample = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    if sample.size == 0:
        raise ValueError("ivf_index: embeddings input is empty — cannot train")
    cent = _kmeans_train(sample, num_clusters, seed)

    def assign(it):
        for pdf in it:
            vmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pdf.assign(
                cluster=pd.Series(
                    _nearest_center(vmat, cent).astype("int32"), index=pdf.index
                )
            )

    schema = T.StructType(
        vecs.schema.fields + [T.StructField("cluster", T.IntegerType())]
    )
    # materialize the assignment ONCE (lazy — the caller's first action
    # runs it): every caller consumes `assigned` from several actions
    # (ivfpq_residual_index counts it, samples it for codebook training,
    # and encodes it; the top-k paths derive queries AND candidates from
    # it), and without the checkpoint each action re-ran this full-corpus
    # Arrow mapInPandas stage — the one stage whose recompute is never
    # cheap (guide §4). Measured: 3 full Python assign passes per
    # ann_index_build/retrain → 1. The blocks are memory+disk and freed
    # on RDD GC; values are unchanged (the checkpoint pins the same
    # deterministic execution every re-run would produce).
    assigned = vecs.mapInPandas(assign, schema).localCheckpoint(eager=False)
    return assigned, cent.tolist()


def _probe_clusters(spark, queries: DataFrame, centroids, nprobe: int) -> DataFrame:
    """(query_id, qvec, cluster) for each query's ``nprobe`` nearest
    centroids by cosine — the query→probed-cluster fan-out, |Q| × nprobe
    rows, built from a broadcast cross join against the (tiny) centroid
    table."""
    import numpy as np

    centroid_rows = [
        (i, c) for i, c in enumerate(np.asarray(centroids, dtype=np.float64).tolist())
    ]
    centroid_df = spark.createDataFrame(
        centroid_rows, "cluster int, centroid array<double>"
    )
    qc = queries.crossJoin(F.broadcast(centroid_df)).withColumn(
        "c_sim",
        _dot(F.col("qvec"), F.col("centroid"))
        / (_norm(F.col("qvec")) * _norm(F.col("centroid"))),
    )
    w = W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cluster"))
    return (
        qc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qvec", "cluster")
    )


def ivf_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    num_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index=None,
) -> DataFrame:
    """Approximate top-k via IVF: each query is compared only against the
    vectors in its ``nprobe`` nearest clusters (candidates ≈ nprobe/k of N).

    The query→probed-cluster fan-out is a small broadcast join; the
    candidate set join is an equi-join on ``cluster`` — co-locatable by
    bucketing the assigned table on ``cluster`` at scale. ``index`` (an
    ``ivf_index`` result, (assigned, centroids)) lets callers reuse a
    prebuilt/stored index instead of re-fitting k-means per query — the
    production serving shape, where the index is a stored artifact and
    only the probe runs per query. The caller owns parameter consistency
    (same embeddings/num_clusters/seed as the build)."""
    if index is None:
        index = ivf_index(embeddings, num_clusters, id_col, vec_col, seed)
    assigned, centroids = index
    spark = embeddings.sparkSession

    queries = assigned.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    probes = _probe_clusters(spark, queries, centroids, nprobe)
    cands = assigned.join(F.broadcast(probes), "cluster").filter(
        F.col(id_col) != F.col("query_id")
    )
    sims = cands.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col(vec_col))
            / (_norm(F.col("qvec")) * _norm(F.col(vec_col))),
            4,
        ),
    )
    return two_phase_topk(
        sims, ["query_id"], [F.col("cosine").desc(), F.col(id_col)], k
    ).select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cosine")


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-bound ANN scale path
# ---------------------------------------------------------------------------


def _nearest_center(x: "np.ndarray", centers: "np.ndarray") -> "np.ndarray":
    """argmin_c ||x - c||² per row WITHOUT materializing the (n, k, d)
    difference cube: ||x||² is constant per row, so the argmin over
    (||c||² - 2·x·cᵀ) is identical — one (n, d)×(d, k) matmul instead of
    an n·k·d broadcast (the cube was the sf1 rehearsal's hot spot: 330 MB
    per subspace per Lloyd iteration at 20k training vectors)."""
    c2 = (centers ** 2).sum(axis=1)
    return (c2[None, :] - 2.0 * (x @ centers.T)).argmin(axis=1)


def _pq_train(sample: "np.ndarray", m: int, n_codes: int, seed: int):
    """Per-subspace Lloyd k-means codebooks: (m, n_codes, subdim) float64.

    Runs DRIVER-SIDE on a bounded sample (the FAISS convention — PQ
    training is always on a capped sample; the distributed work is the
    encode/scan, not the fit). Vectorized numpy: each iteration is one
    matmul-based assignment per subspace (see :func:`_nearest_center`).
    Empty clusters re-seed from the farthest points, deterministically."""
    import numpy as np

    n, dim = sample.shape
    subdim = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, subdim), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * subdim : (j + 1) * subdim]
        x2 = (x ** 2).sum(axis=1)
        k = min(n_codes, n)
        centers = x[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(20):
            c2 = (centers ** 2).sum(axis=1)
            scores = c2[None, :] - 2.0 * (x @ centers.T)
            assign = scores.argmin(axis=1)
            # group members by cluster with ONE stable argsort instead of
            # k boolean-mask scans (k=256 × 20 iters × m subspaces was
            # ~41k Python-loop passes over the sample per build — the
            # dominant driver cost of ann_index_build). Stable sort keeps
            # each cluster's rows in ascending index order, so the
            # per-cluster mean sees exactly the rows x[mask] produced, in
            # the same order — bit-identical centers, same codebooks.
            order = np.argsort(assign, kind="stable")
            x_sorted = x[order]
            bounds = np.searchsorted(assign[order], np.arange(k + 1))
            far = None
            for c in range(k):
                s, e = bounds[c], bounds[c + 1]
                if e > s:
                    centers[c] = x_sorted[s:e].mean(axis=0)
                else:
                    # true squared distance needs the ||x||² term back.
                    # scores is fixed within the iteration, so every empty
                    # cluster reseeds to the SAME farthest point (as the
                    # mask-loop form did) — compute it once.
                    if far is None:
                        far = x[(scores.min(axis=1) + x2).argmax()]
                    centers[c] = far
        if k < n_codes:  # tiny corpus: pad by repeating centers
            centers = np.concatenate(
                [centers, centers[np.arange(n_codes - k) % k]], axis=0
            )
        books[j] = centers
    return books


def pq_index(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_vectors: int = 65_536,
):
    """Train PQ codebooks and encode every vector to ``m`` byte codes.

    Returns (codes_df(id, codes array<int>), codebooks (m, n_codes,
    subdim) numpy). Compression: dim floats → m bytes per vector (32× at
    dim=64, m=8) — the representation that lets a 100 TB embedding
    corpus be ADC-scanned from memory. Training collects ≤
    ``max_train_vectors`` sampled vectors to the driver (bounded by
    construction; ~16 MB at the default cap × dim 64); encoding is an
    Arrow-batched ``mapInPandas`` — one vectorized argmin per subspace
    per batch, the same sanctioned Python path as the multimodal codecs."""
    import numpy as np

    vecs = fan_out(embeddings, id_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    n = vecs.count()
    train = vecs
    if n > max_train_vectors:
        # sample(fraction) is binomial — it can EXCEED the cap; the limit
        # makes the driver-side collect bound hard, not probabilistic
        train = vecs.sample(False, max_train_vectors / n, seed=seed).limit(
            max_train_vectors
        )
    # Arrow toPandas (not row-by-row py4j collect) + canonical _id order:
    # _pq_train's seeded choices are by INDEX, so an order-dependent
    # sample would tie the trained codebooks to session partitioning
    # config (shuffle partitions / AQE) — the same determinism fix as
    # ivf_index's coarse fit
    tpdf = train.select("_id", "_v").toPandas().sort_values("_id")
    sample = np.array(tpdf["_v"].tolist(), dtype=np.float64)
    if sample.size == 0:
        raise ValueError(
            "pq_index: embeddings input is empty — cannot train PQ codebooks"
        )
    books = _pq_train(sample, m, n_codes, seed)
    subdim = sample.shape[1] // m

    import pandas as pd
    from pyspark.sql import types as T

    def encode(it):
        for pdf in it:
            mat = np.array(pdf["_v"].tolist(), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                x = mat[:, j * subdim : (j + 1) * subdim]
                codes[:, j] = _nearest_center(x, books[j])
            yield pd.DataFrame({"_id": pdf["_id"], "codes": list(codes)})

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    codes_df = vecs.mapInPandas(encode, schema).withColumnsRenamed({"_id": id_col})
    return codes_df, books


def pq_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    m: int = 8,
    n_codes: int = 256,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index=None,
) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance (ADC) + exact refine.

    ``index`` (a ``pq_index`` result, (codes_df, codebooks)) lets callers
    reuse a prebuilt/stored index instead of re-training + re-encoding
    per query — the production serving shape; the caller owns parameter
    consistency with the build.

    Per query the driver precomputes the ADC lookup table
    ``lut[j][c] = <q_j, codebook[j][c]>`` and the code-dependent
    reconstruction norms (tiny: |Q| × m × n_codes doubles, broadcast).
    The scan is then ONE narrow codegen pass over the codes table —
    ``m`` array lookups + adds per (query, vector), no floats of the
    original corpus touched: the memory-bound full-scan ANN that IVF
    composes with at 100 TB. The top ``refine × k`` ADC candidates per
    query are re-scored with EXACT cosine (standard PQ refine; also what
    makes the ε-recall contract clean — emitted cosines are true values,
    approximation only affects which candidates survive)."""
    import numpy as np

    spark = embeddings.sparkSession
    if index is None:
        index = pq_index(embeddings, m, n_codes, id_col, vec_col, seed=seed)
    codes_df, books = index
    queries = (
        fan_out(embeddings, id_col)
        .filter(F.col(id_col) < num_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )
    lut_df = _pq_query_luts(spark, queries.collect(), books)
    scored = _with_adc(
        codes_df.crossJoin(F.broadcast(lut_df)).filter(
            F.col(id_col) != F.col("query_id")
        ),
        books.shape[0],
    )
    # the ADC scan scores the FULL corpus per query — the candidate cut
    # must not funnel it into |Q| reducers (two_phase_topk docstring)
    cands = two_phase_topk(
        scored,
        ["query_id"],
        [F.col("_adc").desc(), F.col(id_col)],
        refine * k,
        rank_col="_r",
    ).select("query_id", F.col(id_col).alias("neighbor_id"))
    return _exact_refine(cands, embeddings, queries, k, id_col, vec_col)


def _pq_query_luts(spark, qrows, books) -> DataFrame:
    """Per-query ADC lookup tables as a tiny broadcastable DataFrame:
    ``lut[j][c] = <q_j, codebook[j][c]>`` plus the (query-independent)
    reconstruction-norm table and the query norm. Carried as DATA rows,
    not literals — a nested-literal expression of |Q| × m × n_codes
    ``F.lit`` calls costs seconds of driver-side plan build."""
    import numpy as np

    norm2_lut = [
        [float((books[j, c] ** 2).sum()) for c in range(books.shape[1])]
        for j in range(books.shape[0])
    ]
    subdim = books.shape[2]
    lut_rows = []
    for r in qrows:
        q = np.asarray(r["qvec"], dtype=np.float64)
        lut = [
            [
                float(books[j, c] @ q[j * subdim : (j + 1) * subdim])
                for c in range(books.shape[1])
            ]
            for j in range(books.shape[0])
        ]
        lut_rows.append(
            (int(r["query_id"]), lut, norm2_lut, float(np.sqrt(q @ q)))
        )
    return spark.createDataFrame(
        lut_rows,
        "query_id long, lut array<array<double>>, "
        "_n2 array<array<double>>, qnorm double",
    )


def _with_adc(df: DataFrame, m: int) -> DataFrame:
    """Add the ADC cosine estimate ``_adc`` to a frame carrying
    ``codes`` (PQ byte codes), ``lut``, ``_n2`` and ``qnorm`` columns —
    ``m`` array lookups + adds per row, whole-stage codegen."""
    j_seq = F.sequence(F.lit(0), F.lit(m - 1))
    return (
        df.withColumn(
            "_adot",
            F.aggregate(
                j_seq,
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    F.element_at("lut", j + F.lit(1)),
                    F.element_at(F.col("codes"), j + F.lit(1)) + F.lit(1),
                ),
            ),
        )
        .withColumn(
            "_vnorm",
            F.sqrt(
                F.aggregate(
                    j_seq,
                    F.lit(0.0),
                    lambda acc, j: acc
                    + F.element_at(
                        F.element_at("_n2", j + F.lit(1)),
                        F.element_at(F.col("codes"), j + F.lit(1)) + F.lit(1),
                    ),
                )
            ),
        )
        # zero-norm guard: an all-zero query or all-zero reconstructed
        # centroid would make the denominator 0 → NULL/NaN ADC scores and
        # ill-defined ranking; the clamp leaves every nonzero norm
        # untouched and scores degenerate vectors ~0 instead
        .withColumn(
            "_adc",
            F.col("_adot")
            / F.greatest(F.lit(1e-12), F.col("qnorm") * F.col("_vnorm")),
        )
    )


def _exact_refine(
    cands: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Re-score ADC candidates (query_id, neighbor_id) with EXACT cosine
    and keep the top k — standard PQ refine. The candidate relation is
    |Q| × refine·k rows, so the final window is over a tiny input."""
    full = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    refined = (
        cands.join(full, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col("nvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                4,
            ),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivfpq_residual_index(
    embeddings: DataFrame,
    ivf,
    m: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_vectors: int = 65_536,
    n_vectors: int | None = None,
):
    """RESIDUAL-encoded PQ index over an IVF partitioning — the canonical
    IVFPQ (FAISS IndexIVFPQ): codebooks are trained on ``x − c(x)`` (the
    vector minus its assigned coarse centroid), not on raw vectors.
    Residuals have far smaller spread than the vectors themselves, so the
    same m × n_codes budget quantizes them with less distortion — the
    property that keeps recall up when clusters are coarse at 100 TB.

    Returns (codes_df(id, cluster, codes), codebooks). Same bounded
    driver-side training sample and Arrow-batched encode as
    :func:`pq_index`; the encode ships the (tiny) centroid matrix into
    the workers and subtracts per batch before the per-subspace argmin."""
    import numpy as np

    assigned, centroids = ivf
    cent = np.asarray(centroids, dtype=np.float64)
    vecs = assigned.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "cluster"
    )
    # see ivf_index: one count serves the whole build when the caller
    # knows the cardinality (the assignment is row-preserving)
    n = vecs.count() if n_vectors is None else int(n_vectors)
    train = vecs
    if n > max_train_vectors:
        train = vecs.sample(False, max_train_vectors / n, seed=seed).limit(
            max_train_vectors
        )
    # Arrow toPandas + canonical _id order (see pq_index) — codebooks
    # must depend on the data, never on session partitioning config
    tpdf = train.select("_id", "_v", "cluster").toPandas().sort_values("_id")
    if not len(tpdf):
        raise ValueError(
            "ivfpq_residual_index: embeddings input is empty — cannot train"
        )
    mat = np.array(tpdf["_v"].tolist(), dtype=np.float64)
    clus = tpdf["cluster"].to_numpy(dtype=np.int64)
    books = _pq_train(mat - cent[clus], m, n_codes, seed)
    subdim = mat.shape[1] // m

    import pandas as pd
    from pyspark.sql import types as T

    def encode(it):
        for pdf in it:
            vmat = np.array(pdf["_v"].tolist(), dtype=np.float64)
            res = vmat - cent[pdf["cluster"].to_numpy()]
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                x = res[:, j * subdim : (j + 1) * subdim]
                codes[:, j] = _nearest_center(x, books[j])
            yield pd.DataFrame(
                {"_id": pdf["_id"], "cluster": pdf["cluster"], "codes": list(codes)}
            )

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    codes_df = vecs.mapInPandas(encode, schema).withColumnsRenamed({"_id": id_col})
    return codes_df, books


def ivfpq_residual_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    num_clusters: int = 16,
    nprobe: int = 6,
    m: int = 8,
    n_codes: int = 256,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    ivf=None,
    rindex=None,
    probe_pairs=None,
) -> DataFrame:
    """Canonical IVFPQ top-k: probe ``nprobe`` clusters, ADC-scan their
    RESIDUAL byte codes, exact-refine the survivors.

    With x = c + r̂ the ADC decomposes per (query, cluster):
    ``dot(q, x) = dot(q, c) + Σ_j lut[j][code_j]`` with
    ``lut[j][k] = <q_j, rbook_j[k]>``, and
    ``‖x‖² = ‖c‖² + Σ_j cross[j][code_j]`` with
    ``cross[j][k] = 2<c_j, rbook_j[k]> + ‖rbook_j[k]‖²`` — so each probe
    row of the broadcast carries (lut, cross, dot(q,c), ‖c‖²):
    |Q| × nprobe rows × 2·m·n_codes doubles, ~2 MB at the defaults. The
    scan stays one narrow codegen pass of m lookups + adds per (probed
    query, vector); nothing per-row touches the original floats."""
    import numpy as np

    spark = embeddings.sparkSession
    if ivf is None:
        ivf = ivf_index(embeddings, num_clusters, id_col, vec_col, seed)
    assigned, centroids = ivf
    if rindex is None:
        rindex = ivfpq_residual_index(
            embeddings, ivf, m, n_codes, id_col, vec_col, seed=seed
        )
    codes, books = rindex
    cent = np.asarray(centroids, dtype=np.float64)
    subdim = books.shape[2]

    queries = assigned.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # ONE evaluation of the query->cluster fan-out: the collected
    # (query_id, cluster) pairs feed the distinct-cluster cross tables
    # AND the per-probe LUT rows below (this ran as three separate
    # Spark evaluations before — r16); ``probe_pairs`` lets
    # ann_index_probe inject the pairs it already collected for its
    # partition pruning, removing the re-evaluation entirely. Same
    # Spark-computed values either way — bit-identical results.
    if probe_pairs is None:
        probe_pairs = (
            _probe_clusters(spark, queries, centroids, nprobe)
            .select("query_id", "cluster")
            .collect()
        )
    qvecs = {
        int(r["query_id"]): np.asarray(r["qvec"], dtype=np.float64)
        for r in queries.collect()
    }
    # per-cluster cross table (query-independent): cross[c][j][k]
    cross_by_cluster = {}
    for c in {int(r["cluster"]) for r in probe_pairs}:
        cross_by_cluster[c] = [
            [
                float(
                    2.0 * (cent[c, j * subdim : (j + 1) * subdim] @ books[j, kk])
                    + books[j, kk] @ books[j, kk]
                )
                for kk in range(books.shape[1])
            ]
            for j in range(books.shape[0])
        ]
    probe_rows = []
    for r in probe_pairs:
        qid, c = int(r["query_id"]), int(r["cluster"])
        q = qvecs[qid]
        lut = [
            [
                float(books[j, kk] @ q[j * subdim : (j + 1) * subdim])
                for kk in range(books.shape[1])
            ]
            for j in range(books.shape[0])
        ]
        probe_rows.append(
            (
                qid,
                c,
                lut,
                cross_by_cluster[c],
                float(q @ cent[c]),
                float(cent[c] @ cent[c]),
                float(np.sqrt(q @ q)),
            )
        )
    probe_lut = spark.createDataFrame(
        probe_rows,
        "query_id long, cluster int, lut array<array<double>>, "
        "cross array<array<double>>, qdotc double, cnorm2 double, qnorm double",
    )
    j_seq = F.sequence(F.lit(0), F.lit(books.shape[0] - 1))

    def _sum_lookup(table: str):
        return F.aggregate(
            j_seq,
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.element_at(table, j + F.lit(1)),
                F.element_at(F.col("codes"), j + F.lit(1)) + F.lit(1),
            ),
        )

    scored = (
        codes.join(F.broadcast(probe_lut), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("_adot", F.col("qdotc") + _sum_lookup("lut"))
        .withColumn("_vnorm", F.sqrt(F.col("cnorm2") + _sum_lookup("cross")))
        .withColumn(
            "_adc",
            F.col("_adot")
            / F.greatest(F.lit(1e-12), F.col("qnorm") * F.col("_vnorm")),
        )
    )
    cands = two_phase_topk(
        scored,
        ["query_id"],
        [F.col("_adc").desc(), F.col(id_col)],
        refine * k,
        rank_col="_r",
    ).select("query_id", F.col(id_col).alias("neighbor_id"))
    return _exact_refine(cands, embeddings, queries, k, id_col, vec_col)


def ivfpq_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    num_clusters: int = 16,
    nprobe: int = 6,
    m: int = 8,
    n_codes: int = 256,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    ivf: object = None,
    pq: object = None,
) -> DataFrame:
    """IVF × PQ: the composition the PQ docstring names as the 100 TB
    shape — coarse-quantize the corpus (k-means inverted file), ADC-scan
    ONLY the ``nprobe`` probed clusters per query, exact-refine the
    survivors.

    Relative to full-scan PQ the scored-row count drops by a factor of
    ~num_clusters/nprobe (the scan fraction — measured in SCALE.md); at
    100 TB the codes+cluster table is the stored index, bucketed on
    ``cluster`` so each probe reads only its clusters' files. Codebooks
    are trained on raw vectors (not residuals): at nprobe ≥ 4 of 16 the
    extra distortion stays inside the refine budget on the synthetic
    corpus, and the ε-recall contract (ann_recall_report) is the
    regression guard that would catch it drifting. ``ivf`` / ``pq``
    accept prebuilt :func:`ivf_index` / :func:`pq_index` results so the
    serving path reuses stored indexes instead of re-fitting per query."""
    spark = embeddings.sparkSession
    if ivf is None:
        ivf = ivf_index(embeddings, num_clusters, id_col, vec_col, seed)
    assigned, centroids = ivf
    if pq is None:
        pq = pq_index(embeddings, m, n_codes, id_col, vec_col, seed=seed)
    codes_df, books = pq
    codes = codes_df.join(
        assigned.select(F.col(id_col), "cluster"), id_col
    )
    queries = assigned.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    probes = _probe_clusters(spark, queries, centroids, nprobe)
    lut_df = _pq_query_luts(spark, queries.collect(), books)
    # (cluster, query lut) fan-out: tiny (|Q| × nprobe rows), broadcast;
    # the equi-join on cluster IS the scan-fraction cut — codes outside
    # every probed cluster never reach the ADC expression
    probe_lut = probes.select("query_id", "cluster").join(lut_df, "query_id")
    scored = _with_adc(
        codes.join(F.broadcast(probe_lut), "cluster").filter(
            F.col(id_col) != F.col("query_id")
        ),
        books.shape[0],
    )
    cands = two_phase_topk(
        scored,
        ["query_id"],
        [F.col("_adc").desc(), F.col(id_col)],
        refine * k,
        rank_col="_r",
    ).select("query_id", F.col(id_col).alias("neighbor_id"))
    return _exact_refine(cands, embeddings, queries, k, id_col, vec_col)
