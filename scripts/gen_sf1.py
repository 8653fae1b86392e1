"""Generate a local sf1-equivalent corpus (~6M lineitem) for the scale
rehearsal (SCALE.md §"sf0.1 → sf1 rehearsal").

The driver's generator is not in this repo. Relational fact tables
(orders/lineitem/events) are built as a DETERMINISTIC 10x replication
of the read-only sf0.1 tables with key offsets — dimension tables stay
fixed (the realistic shape of a scale-up: facts grow, dims do not).

``documents`` and ``embeddings`` are SYNTHESIZED FRESH instead of
replicated (VERDICT r7 #4): replication made every batch of the dedup
rehearsals 90% pure duplicates of batch 1, so dedup/CC numbers measured
a degenerate structure. The fresh generators mirror the sf0.1 tables'
statistics — same 31-word vocabulary, same 10-100-word length band,
same language mix, and a PLANTED low-rate duplicate structure (~1 exact
copy and ~1 near-copy per 625 docs, ~1 identical vector pair per 200) —
derived entirely from md5 hash chains, so no RNG anywhere; re-running
produces identical data.

Usage: python scripts/gen_sf1.py  (writes /root/repo/.sf1, ~0.5 GB)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wcdimportbot_spark import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.sf1"
K = 10
OFFSET = 10_000_000  # > any sf0.1 key; replicas get disjoint key ranges

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_OFFSETS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
}

#: the sf0.1 documents vocabulary (31 tokens, near-uniform + rare "dup")
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "query", "a", "scan", "batch", "join",
    "group", "filter", "order", "sort", "hash", "line", "part", "row",
    "key", "fast", "slow", "big", "agg", "customer", "the", "dup",
]
LANGS = ["en", "en", "en", "en", "en", "en", "zh", "fr", "de", "es"]

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

#: planted CHAIN-shaped near-dup clusters (r8 verdict #5): the 31-word
#: vocabulary gives every organic bigram a document frequency far above
#: ngram_jaccard's max_gram_df=50 cap, so the sf1 pair relation was
#: EMPTY and the deep-graph CC path rehearsed on nothing. Each chain c
#: gets its own rare token sequence (df <= CHAIN_LEN << 50, so its
#: bigrams SURVIVE the cap); doc j of the chain is the 8-token sliding
#: window at offset j, making consecutive docs bigram-Jaccard 0.75
#: (>= 0.5 threshold) while docs 2+ apart fall to 0.4 — a PATH graph of
#: diameter CHAIN_LEN-1 per chain, the shape min-label CC needs
#: diameter rounds for and large/small-star contracts geometrically.
N_CHAINS = 40
CHAIN_LEN = 12
CHAIN_WIN = 8


def _h(*cols):
    """Deterministic unsigned 32-bit hash of the concatenated columns —
    the same md5-prefix trick the engine's deterministic operators use,
    so the corpus is reproducible with no RNG."""
    parts = []
    for c in cols:
        parts.extend([c if isinstance(c, F.Column) else F.lit(c), F.lit(":")])
    return F.conv(
        F.substring(F.md5(F.concat(*parts[:-1])), 1, 8), 16, 10
    ).cast("long")


def _doc_text(seed):
    """Space-joined word sequence, 10-100 words, vocab index per
    position from the hash chain (the 'dup' token stays rare: index 30
    only when a second hash agrees, ≈0.1% of positions)."""
    n_words = (_h("len", seed) % 91 + 10).cast("int")
    idx = lambda j: F.when(
        (_h("w", seed, j) % 1000) < 1, F.lit(30)
    ).otherwise((_h("w", seed, j) % 30).cast("int"))
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(vocab, idx(j) + 1),
        ),
        " ",
    )


def gen_documents(spark):
    """Fresh sf1 documents with planted duplicate structure: doc i's
    text is a pure function of a SEED; most docs seed with their own id,
    one in 625 seeds with ``id-1`` (exact duplicate pair), one in 625
    reuses ``id-1``'s seed plus an appended token (near-duplicate) —
    rates matching sf0.1's organic 8-groups-per-5000."""
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    mod = F.col("doc_id") % 625
    seed = F.when(
        (mod.isin(124, 300)) & (F.col("doc_id") > 0), F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    text = _doc_text(seed)
    text = F.when(F.col("doc_id") % 625 == 300, F.concat(text, F.lit(" extra"))).otherwise(
        text
    )
    langs = F.array(*[F.lit(x) for x in LANGS])
    organic = base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(langs, (_h("lang", F.col("doc_id")) % 10).cast("int") + 1).alias(
            "lang"
        ),
        F.concat(
            F.lit("src"), (_h("src", F.col("doc_id")) % 20).cast("string")
        ).alias("source"),
    )
    return organic.unionByName(gen_chain_docs(organic.sparkSession)).withColumn(
        "n_chars", F.length("text")
    )


def _letters(n):
    """Deterministic pure-[a-z] encoding of an int column (base-26,
    3 digits) — chain tokens must survive the lowercase-alpha
    tokenizer unsplit."""
    a = F.array(*[F.lit(chr(ord("a") + i)) for i in range(26)])
    return F.concat(
        F.element_at(a, (n / 676).cast("int") % 26 + 1),
        F.element_at(a, (n / 26).cast("int") % 26 + 1),
        F.element_at(a, n.cast("int") % 26 + 1),
    )


def gen_chain_docs(spark):
    """N_CHAINS path-shaped near-dup clusters appended after the organic
    docs: doc j of chain c = the CHAIN_WIN-token window at offset j over
    chain c's private rare-token sequence ``q<c>x<pos>``."""
    rows = spark.range(N_CHAINS * CHAIN_LEN).select(
        (F.lit(N_DOCS) + F.col("id")).alias("doc_id"),
        (F.col("id") / CHAIN_LEN).cast("int").alias("_c"),
        (F.col("id") % CHAIN_LEN).cast("int").alias("_j"),
    )
    tok = lambda pos: F.concat(
        F.lit("q"), _letters(F.col("_c")), F.lit("x"), _letters(pos)
    )
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(CHAIN_WIN - 1)),
            lambda d: tok(F.col("_j") + d),
        ),
        " ",
    )
    return rows.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("chain"), F.col("_c").cast("string")).alias("source"),
    )


def gen_embeddings(spark):
    """Fresh sf1 embeddings: 64 uniform [-1, 1] components per vector
    from the hash chain; one in 200 vectors is an exact copy of its
    predecessor (the planted near-dup structure the embedding dedup
    rehearsals probe)."""
    base = spark.range(N_VECS).select(F.col("id").alias("vec_id"))
    seed = F.when(
        (F.col("vec_id") % 200 == 7) & (F.col("vec_id") > 0), F.col("vec_id") - 1
    ).otherwise(F.col("vec_id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: ((_h("e", seed, d) % 2001 - 1000) / 1000.0),
    )
    return base.select("vec_id", vec.alias("embedding"))


def main() -> None:
    spark = get_spark(app_name="gen-sf1")
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"{t}: copied", flush=True)
    for t, key_cols in FACT_OFFSETS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = None
        for i in range(K):
            d = df
            for c in key_cols:
                d = d.withColumn(c, (F.col(c) + F.lit(i * OFFSET)).cast("long"))
            out = d if out is None else out.unionByName(d)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)
    gen_documents(spark).repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )
    print(f"documents: {spark.read.parquet(DST + '/documents.parquet').count()} rows (fresh)", flush=True)
    gen_embeddings(spark).repartition(32).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )
    print(f"embeddings: {spark.read.parquet(DST + '/embeddings.parquet').count()} rows (fresh)", flush=True)


if __name__ == "__main__":
    main()
