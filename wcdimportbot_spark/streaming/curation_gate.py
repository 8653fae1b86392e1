"""Streaming curation gate: the batch curation pack applied to a
document STREAM (the ingest-time hygiene filter of a training-data
pipeline).

A stream of incoming documents is annotated — quality score, token
count, benchmark contamination — and split by a keep-predicate, all with
stateless per-row expressions plus ONE stream-static broadcast join:

- quality / token profile: the same Catalyst expressions as the batch
  ``document_profile`` (operators/text_analysis.py) — stateless, so they
  run unchanged inside a streaming plan;
- decontamination: the static eval-benchmark n-gram set is tiny, so the
  stream side does `explode(ngrams) → broadcast-join → per-doc count` —
  a stream-static equi-join Spark supports without watermarks because
  the static side never changes mid-query. The per-doc aggregation is
  expressed as an array intersection INSIDE the row (no streaming
  groupBy → no state store): contaminated = any shared n-gram, computed
  with ``arrays_overlap`` against the broadcast-collected eval set when
  it is small enough to inline, or the join form for larger suites.

State: ZERO. The gate is deliberately stateless — dedup/sessionization
state lives in the neighbouring operators (events.py, sessions.py); a
hygiene filter that kept per-doc state would rebuild the reference's
unbounded in-memory bookkeeping at 100 TB.

Reference scope: beyond-reference (the bot has no streaming curation);
the batch twins are oracle-verified (`decon_ngram_overlap`,
`text_profile` registry rows), and the streaming test pins flag parity
against the batch operator on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wcdimportbot_spark.operators.text_analysis import quality_score, token_count
from wcdimportbot_spark.operators.text_dedup import ngrams_from_tokens, tokens


def curate_stream(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_quality: float = 0.0,
    min_tokens: int = 1,
    text_col: str = "text",
    max_eval_ngrams: int = 2_000_000,
) -> DataFrame:
    """Annotate a streaming documents frame with the curation columns.

    Adds ``n_tokens``, ``quality``, ``contaminated`` (shares any word
    n-gram with the static ``eval_docs``), and ``keep`` (quality and
    length thresholds pass AND not contaminated). The caller filters on
    ``keep`` (or routes rejects to a side sink via ``foreachBatch``).

    ``eval_docs`` is a STATIC frame: its distinct n-gram set is collected
    once at plan time into a single-row broadcast relation and matched
    per document with ``arrays_overlap`` — no streaming join state, no
    shuffle; the stream stays a stateless projection. Benchmark suites
    are MBs even at full size; the guard below ENFORCES that assumption
    (distinct n-gram count vs ``max_eval_ngrams``) instead of trusting
    it, and points callers of oversized suites at the batch operator's
    join form (`operators/curation.py:decontaminate`), which trades the
    inline array for a streaming groupBy.

    :raises ValueError: when the eval suite's distinct n-gram count
        exceeds ``max_eval_ngrams`` (default 2,000,000 ≈ tens of MBs
        broadcast) — inlining it would risk an executor/driver OOM.
    """
    eval_gram_rel = (
        eval_docs.select(tokens(F.col(text_col)).alias("_ts"))
        .select(F.explode(ngrams_from_tokens(F.col("_ts"), n)).alias("g"))
        .distinct()
    )
    n_eval_grams = eval_gram_rel.count()
    if n_eval_grams > max_eval_ngrams:
        raise ValueError(
            f"eval suite has {n_eval_grams} distinct {n}-grams "
            f"(> max_eval_ngrams={max_eval_ngrams}); inlining would OOM the "
            "broadcast — use the batch join form "
            "(wcdimportbot_spark.operators.curation.decontaminate) or raise "
            "max_eval_ngrams explicitly"
        )
    eval_grams = eval_gram_rel.agg(F.collect_list("g").alias("gs"))
    annotated = (
        docs.withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn("quality", quality_score(text_col))
        # materialize the token array in its own projection before the
        # n-gram lambda (ngrams_from_tokens docstring: inlining the split
        # is O(len²) per doc)
        .withColumn("_ts", tokens(F.col(text_col)))
        .crossJoin(F.broadcast(eval_grams))
        .withColumn(
            "contaminated",
            F.arrays_overlap(ngrams_from_tokens(F.col("_ts"), n), F.col("gs")),
        )
        .drop("gs", "_ts")
    )
    return annotated.withColumn(
        "keep",
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & ~F.col("contaminated"),
    )
