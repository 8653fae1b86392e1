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


def ann_recall_report(
    embeddings: DataFrame,
    approx_topk: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    epsilon: float = 0.05,
    recall_floor: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
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
    good = (F.col("cosine") >= F.col("exact_kth_cosine") - epsilon).cast("int")
    report = (
        approx_topk.select("query_id", "cosine")
        .join(F.broadcast(ex_agg), "query_id")
        .groupBy("query_id")
        .agg(
            F.max("exact_top1_id").alias("exact_top1_id"),
            F.max("exact_top1_cosine").alias("exact_top1_cosine"),
            F.max("exact_kth_cosine").alias("exact_kth_cosine"),
            F.sum(good).alias("_good"),
        )
    )
    return report.select(
        "query_id",
        "exact_top1_id",
        F.round("exact_top1_cosine", 4).alias("exact_top1_cosine"),
        F.round("exact_kth_cosine", 4).alias("exact_kth_cosine"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(float(recall_floor)).alias("recall_floor"),
        (F.col("_good") / float(k) >= recall_floor).alias("recall_within_tolerance"),
    )


def ann_recall_report_sql(
    table: str,
    num_queries: int = 10,
    k: int = 5,
    epsilon: float = 0.05,
    recall_floor: float = 0.6,
    dim: int = 64,
) -> str:
    """Closed-form DuckDB oracle for :func:`ann_recall_report`: exact top-1
    and k-th cosine per query point by brute force, the contract constants,
    and all-true tolerance flags."""
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
    SELECT query_id,
           MAX(CASE WHEN rank = 1 THEN neighbor_id END) AS exact_top1_id,
           MAX(CASE WHEN rank = 1 THEN cosine END) AS exact_top1_cosine,
           MAX(CASE WHEN rank = {k} THEN cosine END) AS exact_kth_cosine,
           CAST({epsilon} AS DOUBLE) AS epsilon,
           CAST({recall_floor} AS DOUBLE) AS recall_floor,
           TRUE AS recall_within_tolerance
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


# ---------------------------------------------------------------------------
# IVF ANN (scale path #2): k-means coarse quantizer + cluster-probed search
# ---------------------------------------------------------------------------


def ivf_index(
    embeddings: DataFrame,
    num_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_vectors: int = 262_144,
):
    """Train the IVF coarse quantizer (MLlib k-means) and assign every
    vector to its nearest centroid — the inverted-file partitioning.

    Returns (assigned_df with a ``cluster`` column, centroids list). At
    100 TB the assignment is one narrow pass; training runs on a bounded
    sample (k-means centroids from ≤ ``max_train_vectors`` vectors are
    representative — a full-table fit would shuffle the whole corpus into
    the driver-coordinated Lloyd iterations). Unlike LSH this needs a
    training pass, but probes adapt to the data distribution."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = fan_out(embeddings, id_col).withColumn(
        "_features", array_to_vector(F.col(vec_col))
    )
    train = vecs
    n = vecs.count()
    if n > max_train_vectors:
        train = vecs.sample(
            withReplacement=False, fraction=max_train_vectors / n, seed=seed
        )
    model = KMeans(
        k=num_clusters, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(train)
    assigned = model.transform(vecs).drop("_features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    num_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF: each query is compared only against the
    vectors in its ``nprobe`` nearest clusters (candidates ≈ nprobe/k of N).

    The query→probed-cluster fan-out is a small broadcast join; the
    candidate set join is an equi-join on ``cluster`` — co-locatable by
    bucketing the assigned table on ``cluster`` at scale."""
    assigned, centroids = ivf_index(embeddings, num_clusters, id_col, vec_col, seed)
    spark = embeddings.sparkSession

    centroid_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    centroid_df = spark.createDataFrame(
        centroid_rows, "cluster int, centroid array<double>"
    )

    queries = assigned.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # rank clusters per query by centroid cosine, keep nprobe
    qc = queries.crossJoin(F.broadcast(centroid_df)).withColumn(
        "c_sim",
        _dot(F.col("qvec"), F.col("centroid"))
        / (_norm(F.col("qvec")) * _norm(F.col("centroid"))),
    )
    w = W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cluster"))
    probes = (
        qc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qvec", "cluster")
    )
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
    w2 = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-bound ANN scale path
# ---------------------------------------------------------------------------


def _pq_train(sample: "np.ndarray", m: int, n_codes: int, seed: int):
    """Per-subspace Lloyd k-means codebooks: (m, n_codes, subdim) float64.

    Runs DRIVER-SIDE on a bounded sample (the FAISS convention — PQ
    training is always on a capped sample; the distributed work is the
    encode/scan, not the fit). Vectorized numpy: each iteration is one
    (n, k) distance matrix per subspace. Empty clusters re-seed from the
    farthest points, deterministically."""
    import numpy as np

    n, dim = sample.shape
    subdim = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, subdim), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * subdim : (j + 1) * subdim]
        k = min(n_codes, n)
        centers = x[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(20):
            d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    centers[c] = x[mask].mean(axis=0)
                else:
                    centers[c] = x[d2.min(axis=1).argmax()]
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
        train = vecs.sample(False, max_train_vectors / n, seed=seed)
    sample = np.array(
        [r["_v"] for r in train.select("_v").collect()], dtype=np.float64
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
                d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
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
) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance (ADC) + exact refine.

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
    codes_df, books = pq_index(
        embeddings, m, n_codes, id_col, vec_col, seed=seed
    )
    queries = (
        fan_out(embeddings, id_col)
        .filter(F.col(id_col) < num_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )
    qrows = queries.collect()  # bounded: num_queries rows
    subdim = books.shape[2]
    norm2_lut = [
        [float((books[j, c] ** 2).sum()) for c in range(books.shape[1])]
        for j in range(books.shape[0])
    ]
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
        # carry the (query-independent) reconstruction-norm table in the
        # same broadcast rows: a nested-literal expression of m*n_codes
        # F.lit calls costs seconds of driver-side plan build
        lut_rows.append(
            (int(r["query_id"]), lut, norm2_lut, float(np.sqrt(q @ q)))
        )
    lut_df = spark.createDataFrame(
        lut_rows,
        "query_id long, lut array<array<double>>, "
        "_n2 array<array<double>>, qnorm double",
    )
    j_seq = F.sequence(F.lit(0), F.lit(books.shape[0] - 1))
    scored = (
        codes_df.crossJoin(F.broadcast(lut_df))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
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
        .withColumn("_adc", F.col("_adot") / (F.col("qnorm") * F.col("_vnorm")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("_adc").desc(), F.col(id_col))
    cands = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= refine * k)
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    # exact refine of the surviving candidates
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
