"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions over the ``documents`` table — no UDFs, no
shuffles beyond the final aggregates; each has a DuckDB oracle twin
(generated from the same constants, so the heuristics cannot drift apart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.expr_memo import memo_expr
from wcdimportbot_spark.functions.partitioning import fan_out

from wcdimportbot_spark.operators.text_dedup import TOKEN_SPLIT_RE, tokens

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic (a real deployment swaps in fastText/CLD3 via a pandas UDF —
#: same column contract)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "para", "en"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "für", "mit", "auf"),
}

_QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def token_count(text: Column) -> Column:
    """Whitespace/punct token count (the BPE-ish proxy: alnum runs)."""
    return F.size(tokens(text))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = _QUALITY_STOPWORDS) -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return F.when(F.size(t) > 0, F.round(hits / F.size(t).cast("double"), 4)).otherwise(
        F.lit(0.0)
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.when(
        F.length(text) > 0,
        F.round(F.length(stripped) / F.length(text).cast("double"), 4),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality proxy: length band + low punctuation +
    healthy stopword density (C4/Gopher-style rule scoring, simplified).

    Pass a column NAME to memoize tree construction per (JVM, name) —
    the resulting tree is pure over ``F.col(name)`` so reuse across
    plans is safe; a Column argument (possibly bound to a specific
    DataFrame) always builds fresh (functions/expr_memo.py)."""
    if isinstance(text, str):
        return memo_expr(
            ("quality_score", text), lambda: _quality_score(F.col(text))
        )
    return _quality_score(text)


def _quality_score(text: Column) -> Column:
    n_tok = token_count(text)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + punct_ok + stop_ok, 4)


def detect_language(text: Column | str) -> Column:
    """Stopword-vote language heuristic: the language whose stopword list
    scores the most token hits wins; ties break alphabetically; zero hits →
    'und' (undetermined).

    Pass a column NAME to memoize tree construction (12+ higher-order
    filters, ~0.2-0.3s of driver py4j per call) per (JVM, name); a
    Column argument always builds fresh."""
    if isinstance(text, str):
        return memo_expr(
            ("detect_language", text), lambda: _detect_language(F.col(text))
        )
    return _detect_language(text)


def _detect_language(text: Column) -> Column:
    t = tokens(text)

    def stopword_filter(stoplist: tuple[str, ...]):
        # single-parameter lambda required: pyspark treats a second
        # (even defaulted) parameter as the array-index argument
        return lambda x: x.isin(*stoplist)

    scored = None
    for lang in sorted(LANG_STOPWORDS):
        hits = F.size(F.filter(t, stopword_filter(LANG_STOPWORDS[lang])))
        entry = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        scored = F.array(entry) if scored is None else F.concat(scored, F.array(entry))
    # max by (hits, reversed-lang): array_max on struct compares fieldwise;
    # to break ties toward the alphabetically-first lang we sort descending
    # by hits then take the first element of the sorted array
    best = F.array_sort(
        scored,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    ).getItem(0)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — canonicalization-style near-dup key (word order and
    repetition invariant)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


#: BPE-ish subword proxy: greedy ≤4-char alpha chunks, digit runs, single
#: punct — the shape of a subword tokenizer (real BPE is a pandas UDF with a
#: vocab; same column contract)
SUBWORD_RE = r"([a-z]{1,4}|[0-9]+|[^a-z0-9\s])"


def subword_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(SUBWORD_RE), 1))


def document_profile(docs: DataFrame, include_subwords: bool = False) -> DataFrame:
    """One-pass profile: (doc_id, n_tokens, quality, detected_lang,
    fingerprint[, n_subwords])."""
    text = F.col("text")
    cols = [
        token_count(text).alias("n_tokens"),
        # name form → memoized tree construction (expr_memo)
        quality_score("text").alias("quality"),
        detect_language("text").alias("detected_lang"),
        fingerprint(text).alias("fingerprint"),
    ]
    if include_subwords:
        cols.append(subword_count(text).alias("n_subwords"))
    return fan_out(docs, "doc_id").select("doc_id", *cols)


# ---------------------------------------------------------------------------
# DuckDB oracle generators (shared constants)
# ---------------------------------------------------------------------------


def _sql_tokens(col: str = "text") -> str:
    return f"list_filter(string_split_regex(lower({col}), '{TOKEN_SPLIT_RE}'), x -> x <> '')"


def _sql_stop_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter(ts, x -> x IN ({lst})))"


def document_profile_sql(table: str, include_subwords: bool = False) -> str:
    lang_cases = []
    # mirror: sort (hits desc, lang asc), take first with hits > 0
    pairs = ", ".join(
        f"{{'neg': -{_sql_stop_hits(lang)}, 'lang': '{lang}'}}" for lang in sorted(LANG_STOPWORDS)
    )
    en_stop = ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS)
    subword_col = (
        ",\n           len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]')) AS n_subwords"
        if include_subwords
        else ""
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, text, {_sql_tokens()} AS ts FROM {table}
    ),
    feat AS (
        SELECT doc_id,
               len(ts) AS n_tokens,
               CASE WHEN length(text) > 0
                    THEN round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / CAST(length(text) AS DOUBLE), 4)
                    ELSE 0.0 END AS punct,
               CASE WHEN len(ts) > 0
                    THEN round(len(list_filter(ts, x -> x IN ({en_stop}))) / CAST(len(ts) AS DOUBLE), 4)
                    ELSE 0.0 END AS stopr,
               list_sort([{pairs}]) AS scored,
               md5(list_aggregate(list_sort(list_distinct(ts)), 'string_agg', ' ')) AS fp{subword_col}
        FROM tok
    )
    SELECT doc_id, n_tokens,
           round((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END)
                 + (CASE WHEN punct < 0.2 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN stopr >= 0.05 THEN 0.3 ELSE 0.0 END), 4) AS quality,
           CASE WHEN scored[1]['neg'] < 0 THEN scored[1]['lang'] ELSE 'und' END AS detected_lang,
           fp AS fingerprint{", n_subwords" if include_subwords else ""}
    FROM feat
    """


# ---------------------------------------------------------------------------
# Intra-document repetition (the Gopher-style repetition filter)
# ---------------------------------------------------------------------------


def _rep_ratio(grams: Column) -> Column:
    """Fraction of n-gram slots occupied by grams repeated within the SAME
    document: 1 - distinct/total (0.0 for docs shorter than the n-gram)."""
    total = F.size(grams)
    return F.when(
        total > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"), 4
        ),
    ).otherwise(F.lit(0.0))


def repetition_profile(
    docs: DataFrame,
    flag_threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document intra-doc repetition report — the standard pretraining
    repetition filter (boilerplate listings, keyword stuffing, decode
    loops): duplicated-bigram and duplicated-trigram fractions, their max,
    and a ``repetitive`` decision bit at ``flag_threshold``.

    One narrow projection per document — the n-gram arrays never explode
    and nothing shuffles; the token array is materialized once and both
    gram sizes derive from it (two projections, see
    ``text_dedup.ngrams_from_tokens``)."""
    from wcdimportbot_spark.operators.text_dedup import ngrams_from_tokens

    ts = tokens(F.col(text_col))
    with_tok = fan_out(docs, id_col).select(id_col, ts.alias("_ts"))
    rep2 = _rep_ratio(ngrams_from_tokens(F.col("_ts"), 2))
    rep3 = _rep_ratio(ngrams_from_tokens(F.col("_ts"), 3))
    out = with_tok.select(
        id_col,
        F.size(F.col("_ts")).alias("n_tokens"),
        rep2.alias("rep_bigram"),
        rep3.alias("rep_trigram"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "rep_bigram",
        "rep_trigram",
        F.greatest("rep_bigram", "rep_trigram").alias("max_rep"),
        (F.greatest("rep_bigram", "rep_trigram") >= flag_threshold).alias(
            "repetitive"
        ),
    )


def repetition_profile_sql(table: str, flag_threshold: float = 0.2) -> str:
    toks = _sql_tokens()
    return f"""
    WITH tok AS (SELECT doc_id, {toks} AS ts FROM {table}),
    g AS (
        SELECT doc_id, len(ts) AS n_tokens,
               CASE WHEN len(ts) >= 2 THEN
                   list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
               ELSE []::VARCHAR[] END AS g2,
               CASE WHEN len(ts) >= 3 THEN
                   list_transform(range(1, len(ts) - 1), i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
               ELSE []::VARCHAR[] END AS g3
        FROM tok
    ),
    r AS (
        SELECT doc_id, n_tokens,
               CASE WHEN len(g2) > 0 THEN
                   round(1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE), 4)
               ELSE 0.0 END AS rep_bigram,
               CASE WHEN len(g3) > 0 THEN
                   round(1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE), 4)
               ELSE 0.0 END AS rep_trigram
        FROM g
    )
    SELECT doc_id, n_tokens, rep_bigram, rep_trigram,
           greatest(rep_bigram, rep_trigram) AS max_rep,
           greatest(rep_bigram, rep_trigram) >= {flag_threshold} AS repetitive
    FROM r
    """


#: Gopher's required-stopword list (Rae et al. 2021, A1.1 — the "stop
#: word" rule: a document must contain at least 2 of these)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Gopher quality-rule audit (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1.1) — the
    published rule set production curation stacks run next to the
    model-based gates (perplexity, classifier), emitted as the full
    metric vector rather than one composite score
    (:func:`quality_score` is the composite) so each threshold stays
    auditable downstream:

    - word count in [50, 100 000]
    - mean word length in [3, 10]
    - symbol-to-word ratio ('#' and '...') <= 0.1
    - fraction of lines starting with a bullet ('-', '*', '•') <= 0.9
    - fraction of lines ending with '...' <= 0.3
    - >= 80 % of words contain at least one alphabetic character
    - >= 2 distinct required stopwords present (GOPHER_STOPWORDS)

    One narrow projection over the corpus — no shuffle, no UDF; every
    expression is Catalyst array/string builtins inside whole-stage
    codegen, so the filter runs at scan speed at 100 TB.

    Output: (doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
    stopword_hits, passes_gopher).

    Reference scope: none — training-data pipeline pack (SURVEY §6)."""
    text = F.col(text_col)
    t = tokens(text)
    n_words = F.size(t)
    mean_len = F.when(
        n_words > 0,
        F.round(
            F.aggregate(
                t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            ).cast("double")
            / n_words,
            4,
        ),
    ).otherwise(F.lit(0.0))
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0, F.round((hash_count + ellipsis_count) / n_words, 4)
    ).otherwise(F.lit(0.0))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet_ratio = F.round(
        F.size(
            F.filter(lines, lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
        )
        / n_lines.cast("double"),
        4,
    )
    ellipsis_line_ratio = F.round(
        F.size(F.filter(lines, lambda l: l.endswith("...")))
        / n_lines.cast("double"),
        4,
    )
    alpha_ratio = F.when(
        n_words > 0,
        F.round(
            F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
            / n_words.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(t), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))
    )
    rules = [
        n_words.between(50, 100_000),
        mean_len.between(3.0, 10.0),
        symbol_ratio <= 0.1,
        bullet_ratio <= 0.9,
        ellipsis_line_ratio <= 0.3,
        alpha_ratio >= 0.8,
        stop_hits >= 2,
    ]
    passed_count = rules[0].cast("int")
    for r in rules[1:]:
        passed_count = passed_count + r.cast("int")
    n_rules_failed = (F.lit(len(rules)) - passed_count).alias("n_rules_failed")
    passes = rules[0]
    for r in rules[1:]:
        passes = passes & r
    return fan_out(docs, id_col).select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_line_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        n_rules_failed,
        passes.alias("passes_gopher"),
    )


def gopher_rules_sql(table: str) -> str:
    """DuckDB oracle for :func:`gopher_rules`: the same tokenization,
    replace-based symbol counts, line splits, and rounded ratios."""
    toks = _sql_tokens()
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    WITH tok AS (
        SELECT doc_id, text, {toks} AS ts,
               string_split(text, chr(10)) AS ls
        FROM {table}
    ),
    m AS (
        SELECT doc_id,
               len(ts) AS n_words,
               CASE WHEN len(ts) > 0 THEN
                   round(CAST(list_sum(list_transform(ts, x -> length(x))) AS DOUBLE)
                         / len(ts), 4)
               ELSE 0.0 END AS mean_word_len,
               CASE WHEN len(ts) > 0 THEN
                   round(((length(text) - length(replace(text, '#', '')))
                          + (length(text) - length(replace(text, '...', ''))) / 3.0)
                         / len(ts), 4)
               ELSE 0.0 END AS symbol_ratio,
               round(len(list_filter(ls, l -> substring(l, 1, 1) IN ('-', '*', '•')))
                     / CAST(len(ls) AS DOUBLE), 4) AS bullet_line_ratio,
               round(len(list_filter(ls, l -> l LIKE '%...'))
                     / CAST(len(ls) AS DOUBLE), 4) AS ellipsis_line_ratio,
               CASE WHEN len(ts) > 0 THEN
                   round(len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))
                         / CAST(len(ts) AS DOUBLE), 4)
               ELSE 0.0 END AS alpha_word_ratio,
               len(list_filter([{stops}], s -> list_contains(list_distinct(ts), s)))
                   AS stopword_hits
        FROM tok
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_ratio,
           ellipsis_line_ratio, alpha_word_ratio, stopword_hits,
           7 - (CAST(n_words BETWEEN 50 AND 100000 AS INT)
                + CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT)
                + CAST(symbol_ratio <= 0.1 AS INT)
                + CAST(bullet_line_ratio <= 0.9 AS INT)
                + CAST(ellipsis_line_ratio <= 0.3 AS INT)
                + CAST(alpha_word_ratio >= 0.8 AS INT)
                + CAST(stopword_hits >= 2 AS INT)) AS n_rules_failed,
           (n_words BETWEEN 50 AND 100000)
           AND (mean_word_len BETWEEN 3.0 AND 10.0)
           AND symbol_ratio <= 0.1
           AND bullet_line_ratio <= 0.9
           AND ellipsis_line_ratio <= 0.3
           AND alpha_word_ratio >= 0.8
           AND stopword_hits >= 2 AS passes_gopher
    FROM m
    """


# ---------------------------------------------------------------------------
# Unigram log-probability / perplexity filtering (CCNet-style quality gate)
# ---------------------------------------------------------------------------


def unigram_logprob(
    docs: DataFrame,
    vocab_size: int = 65_536,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the perplexity-based quality filter of a pretraining
    pipeline (CCNet-style: documents whose tokens are improbable under a
    clean reference LM are dropped or down-weighted; here the corpus
    itself is the model, the standard bootstrap).

    Model: vocab = top ``vocab_size`` tokens by corpus frequency (ties
    broken by token string, so the cut is deterministic);
    ``p(tok) = count(tok)/N`` in-vocab and ``alpha/N`` for OOV (N = all
    corpus tokens). Output per doc: ``n_tokens``, ``mean_logprob`` =
    mean ln p over its tokens, ``perplexity`` = exp(-mean_logprob), all
    rounded to 4 decimals for cross-engine hashing.

    Plan shape at 100 TB: ONE map-side-combinable groupBy over the token
    relation builds the counts; the vocab cut compiles to
    TakeOrderedAndProject (per-partition heaps, never a global sort);
    the vocab (≤ vocab_size rows) and the 1-row total BROADCAST onto the
    second token pass, so the corpus shuffles only on the final per-doc
    aggregate — and that one is map-side combinable too. No UDF, no
    driver collect."""
    tok = fan_out(docs, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").cast("double").alias("_n"))
    vocab = counts.orderBy(F.col("_c").desc(), F.col("token")).limit(vocab_size)
    lp = F.log(
        F.coalesce(F.col("_c").cast("double"), F.lit(float(alpha))) / F.col("_n")
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(lp).alias("_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("_lp") / F.col("n_tokens"), 4).alias("mean_logprob"),
            F.round(F.exp(-F.col("_lp") / F.col("n_tokens")), 4).alias("perplexity"),
        )
    )


def unigram_logprob_sql(
    table: str, vocab_size: int = 65_536, alpha: float = 1.0
) -> str:
    """DuckDB oracle for :func:`unigram_logprob`: same tokenization, same
    deterministic vocab cut, same smoothing."""
    toks = _sql_tokens()
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({toks}) AS token FROM {table}
    ),
    counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM counts),
    vocab AS (SELECT token, c FROM counts ORDER BY c DESC, token LIMIT {vocab_size}),
    scored AS (
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               SUM(LN(COALESCE(CAST(v.c AS DOUBLE), {alpha}) / tot.n)) AS lp
        FROM tok t LEFT JOIN vocab v USING (token), tot
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           round(lp / n_tokens, 4) AS mean_logprob,
           round(exp(-lp / n_tokens), 4) AS perplexity
    FROM scored
    """


def bigram_logprob(
    docs: DataFrame,
    vocab_size: int = 65_536,
    bigram_vocab_size: int = 262_144,
    lam: float = 0.7,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean log-probability under an interpolated BIGRAM
    model of the corpus — the CCNet-style perplexity filter one order up
    from :func:`unigram_logprob`:

    - first token: ``ln p_uni(w1)``;
    - position i ≥ 2: ``ln(λ·p_bi(w_i|w_{i-1}) + (1-λ)·p_uni(w_i))``,
      with ``p_bi = c(w_{i-1}w_i)/c(w_{i-1})`` for the top
      ``bigram_vocab_size`` bigrams (deterministic cut: count desc, then
      lexicographic) and 0 otherwise — the unigram term is the backoff
      floor, so the log argument is always positive;
    - ``p_uni`` exactly as the unigram model (top ``vocab_size`` cut,
      ``alpha/N`` OOV floor).

    Scale shape: the bigram relation is derived ARRAY-SIDE (zip of two
    token-array slices — no window, no self-join, no per-doc shuffle);
    both count builds are map-side-combinable groupBys with
    TakeOrdered cuts; and ``c(prev)`` is attached INTO the bigram vocab
    at build time, so the scoring pass joins only broadcast relations
    (bigram vocab, unigram vocab, the 1-row total) — the corpus shuffles
    once, on the final per-doc aggregate. Output (doc_id, n_tokens,
    mean_logprob, perplexity), rounded to 4 decimals."""
    arr = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_ts")
    ).filter(F.size("_ts") >= 1)
    uni = fan_out(arr, id_col).select(
        F.col(id_col), F.explode(F.col("_ts")).alias("token")
    )
    counts = uni.groupBy("token").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").cast("double").alias("_n"))
    vocab = counts.orderBy(F.col("_c").desc(), F.col("token")).limit(vocab_size)

    bi = fan_out(arr, id_col).select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_ts"), 1, F.size("_ts") - 1).alias("prev"),
                F.slice(F.col("_ts"), 2, F.size("_ts") - 1).alias("cur"),
            )
        ).alias("_p"),
    ).select(F.col(id_col), F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur"))
    bi_counts = bi.groupBy("prev", "cur").agg(F.count("*").alias("_c2"))
    bi_vocab = (
        bi_counts.orderBy(F.col("_c2").desc(), F.col("prev"), F.col("cur"))
        .limit(bigram_vocab_size)
        # attach c(prev) at build time: the scoring join then needs no
        # corpus-wide count relation, only this broadcast
        .join(counts.select(F.col("token").alias("prev"), F.col("_c").alias("_cprev")), "prev")
    )

    p_uni_cur = F.coalesce(F.col("_c").cast("double"), F.lit(float(alpha))) / F.col("_n")
    p_bi = F.coalesce(
        F.col("_c2").cast("double") / F.col("_cprev").cast("double"), F.lit(0.0)
    )
    bi_terms = (
        bi.join(F.broadcast(bi_vocab), ["prev", "cur"], "left")
        .join(
            F.broadcast(vocab.select(F.col("token").alias("cur"), "_c")), "cur", "left"
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.log(F.lit(float(lam)) * p_bi + F.lit(1.0 - float(lam)) * p_uni_cur).alias(
                "_term"
            ),
        )
    )
    first_terms = (
        arr.select(F.col(id_col), F.element_at("_ts", 1).alias("token"))
        .join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.log(
                F.coalesce(F.col("_c").cast("double"), F.lit(float(alpha))) / F.col("_n")
            ).alias("_term"),
        )
    )
    sums = (
        first_terms.unionByName(bi_terms)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("_term").alias("_lp"))
    )
    return sums.select(
        id_col,
        "n_tokens",
        F.round(F.col("_lp") / F.col("n_tokens"), 4).alias("mean_logprob"),
        F.round(F.exp(-F.col("_lp") / F.col("n_tokens")), 4).alias("perplexity"),
    )


def bigram_logprob_sql(
    table: str,
    vocab_size: int = 65_536,
    bigram_vocab_size: int = 262_144,
    lam: float = 0.7,
    alpha: float = 1.0,
) -> str:
    """DuckDB oracle for :func:`bigram_logprob`: same tokenization, same
    deterministic cuts, same interpolation."""
    toks = _sql_tokens()
    return f"""
    WITH arr AS (
        SELECT doc_id, {toks} AS ts FROM {table}
    ),
    tok AS (SELECT doc_id, unnest(ts) AS token FROM arr WHERE len(ts) >= 1),
    counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM counts),
    vocab AS (SELECT token, c FROM counts ORDER BY c DESC, token LIMIT {vocab_size}),
    bi AS (
        SELECT doc_id, ts[i] AS prev, ts[i + 1] AS cur
        FROM arr, UNNEST(range(1, len(ts))) AS t(i)
        WHERE len(ts) >= 2
    ),
    bi_counts AS (SELECT prev, cur, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
    bi_vocab AS (
        SELECT bc.prev, bc.cur, bc.c2, k.c AS cprev
        FROM (SELECT * FROM bi_counts ORDER BY c2 DESC, prev, cur
              LIMIT {bigram_vocab_size}) bc
        JOIN counts k ON k.token = bc.prev
    ),
    bi_terms AS (
        SELECT b.doc_id,
               LN({lam} * COALESCE(CAST(v.c2 AS DOUBLE) / v.cprev, 0.0)
                  + {1.0 - lam} * COALESCE(CAST(u.c AS DOUBLE), {alpha}) / tot.n) AS term
        FROM bi b
        LEFT JOIN bi_vocab v ON v.prev = b.prev AND v.cur = b.cur
        LEFT JOIN vocab u ON u.token = b.cur, tot
    ),
    first_terms AS (
        SELECT a.doc_id,
               LN(COALESCE(CAST(u.c AS DOUBLE), {alpha}) / tot.n) AS term
        FROM arr a LEFT JOIN vocab u ON u.token = a.ts[1], tot
        WHERE len(a.ts) >= 1
    ),
    sums AS (
        SELECT doc_id, COUNT(*) AS n_tokens, SUM(term) AS lp
        FROM (SELECT * FROM first_terms UNION ALL SELECT * FROM bi_terms)
        GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(lp / n_tokens, 4) AS mean_logprob,
           round(exp(-lp / n_tokens), 4) AS perplexity
    FROM sums
    """


# ---------------------------------------------------------------------------
# Hashed n-gram linear quality classifier (fastText-shaped gate)
# ---------------------------------------------------------------------------


def _feature_bucket(feature: Column, dims: int) -> Column:
    """Deterministic hashed-feature bucket in ``[0, dims)``: first 8 md5
    hex digits of the feature string as an unsigned int mod ``dims`` —
    the hashing-trick projection, md5-derived so DuckDB reproduces it."""
    return (
        F.conv(F.substring(F.md5(feature), 1, 8), 16, 10).cast("long")
        % F.lit(dims)
    ).cast("int")


def hashed_feature_weights(spark, dims: int = 4096) -> DataFrame:
    """The broadcast weight vector of the linear classifier: one row per
    hash bucket, weight in [-1, 1] derived from md5('w:<bucket>') — the
    stateless stand-in for trained fastText/logistic weights (a real
    deployment overwrites this relation with its trained vector; every
    downstream plan shape is identical). Deterministic, so the scoring
    pipeline stays end-to-end hash-verifiable."""
    return spark.range(dims).select(
        F.col("id").cast("int").alias("bucket"),
        (
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("w:"), F.col("id"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2001
                - 1000
            )
            / 1000.0
        ).alias("w"),
    )


def linear_quality_classifier(
    docs: DataFrame,
    dims: int = 4096,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-shaped document quality gate: hashed unigram+bigram
    features → broadcast weight vector → mean weight → logistic score —
    the learned-classifier complement to the rule-based
    :func:`quality_score` and the perplexity filters (the CCNet stack
    runs exactly this trio; fastText is Joulin et al. 2016's mean of
    hashed n-gram embeddings through a linear head).

    Scale shape, all Catalyst: one array-side feature build (token array
    + zipped bigram slices — no self-join, no window), one equi-join
    against the BROADCAST ``dims``-row weight vector on the md5 hash
    bucket, one map-side-combinable per-doc aggregate. The corpus
    shuffles once, on doc_id. No UDF, no driver collect.

    Output per doc: ``n_features``, ``logit`` (mean feature weight),
    ``score`` = sigmoid(logit), ``keep`` = score >= threshold (compared
    on the ROUNDED score so the flag is cross-engine stable). Documents
    with zero tokens get logit 0 / score 0.5."""
    spark = docs.sparkSession
    arr = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_ts"))
    unis = fan_out(arr, id_col).select(
        F.col(id_col), F.explode(F.col("_ts")).alias("feature")
    )
    bis = (
        fan_out(arr, id_col)
        .filter(F.size("_ts") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_ts"), 1, F.size("_ts") - 1).alias("prev"),
                    F.slice(F.col("_ts"), 2, F.size("_ts") - 1).alias("cur"),
                )
            ).alias("_p"),
        )
        .select(
            F.col(id_col),
            F.concat(F.col("_p.prev"), F.lit("_"), F.col("_p.cur")).alias("feature"),
        )
    )
    feats = unis.unionByName(bis).withColumn(
        "bucket", _feature_bucket(F.col("feature"), dims)
    )
    weights = hashed_feature_weights(spark, dims)
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_features"), F.avg("w").alias("_logit"))
    )
    # zero-token docs never reach the feature relation: re-attach them
    # with the neutral score so the gate annotates EVERY input document
    base = docs.select(F.col(id_col))
    out = base.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
        F.round(F.coalesce(F.col("_logit"), F.lit(0.0)), 4).alias("logit"),
        F.round(
            1.0 / (1.0 + F.exp(-F.coalesce(F.col("_logit"), F.lit(0.0)))), 4
        ).alias("score"),
    )
    return out.withColumn("keep", F.col("score") >= threshold)


def linear_quality_classifier_sql(
    table: str, dims: int = 4096, threshold: float = 0.5
) -> str:
    """DuckDB oracle for :func:`linear_quality_classifier`: same
    tokenization, same md5 hashing trick, same md5-derived weights, same
    mean-weight logistic head."""
    toks = _sql_tokens()
    return f"""
    WITH arr AS (
        SELECT doc_id, {toks} AS ts FROM {table}
    ),
    feats AS (
        SELECT doc_id, unnest(ts) AS feature FROM arr
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(ts)),
               i -> ts[i] || '_' || ts[i + 1])) AS feature
        FROM arr WHERE len(ts) >= 2
    ),
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(feature), 1, 8))::BIGINT % {dims}
                    AS INT) AS bucket
        FROM feats
    ),
    weights AS (
        SELECT CAST(b.b AS INT) AS bucket,
               (('0x' || substring(md5('w:' || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT
                % 2001 - 1000) / 1000.0 AS w
        FROM UNNEST(range(0, {dims})) b(b)
    ),
    scored AS (
        SELECT h.doc_id, COUNT(*) AS n_features, AVG(w.w) AS logit
        FROM hashed h JOIN weights w ON w.bucket = h.bucket
        GROUP BY h.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_features, 0) AS BIGINT) AS n_features,
           round(COALESCE(s.logit, 0.0), 4) AS logit,
           round(1.0 / (1.0 + exp(-COALESCE(s.logit, 0.0))), 4) AS score,
           round(1.0 / (1.0 + exp(-COALESCE(s.logit, 0.0))), 4) >= {threshold}
               AS keep
    FROM {table} d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """


def perplexity_buckets(
    docs: DataFrame,
    vocab_size: int = 65_536,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_mode: str = "sketch",
    sketch_contract: bool = False,
    rank_tolerance: float = 0.03,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): rank
    documents by LM perplexity and cut the corpus into terciles — head
    (lowest perplexity, cleanest) feeds training as-is, middle is
    down-weighted, tail is dropped or re-filtered.

    Scalable shape: NOT a global NTILE (that is a single-task sort over
    the per-doc relation — billions of rows at 100 TB). The two tercile
    THRESHOLDS are one aggregate (2 scalars), broadcast back over the
    scored relation for a per-row CASE — the compute-thresholds-once
    shape CCNet itself uses (CCNet's own thresholds come from a sampled
    LM pass, not an exact global sort).

    ``threshold_mode`` picks the threshold aggregate (r8 verdict #1):

    - ``"sketch"`` (default — the production path): thresholds are
      quantiles of a merged KLL sketch state
      (``kll_sketch_agg_double``, the a14 machinery). Aggregation STATE
      is O(k·log n) per partial — constant-bounded at 100 TB, and the
      per-day sketch states are storable/mergeable artifacts. Accuracy
      is KLL's rank guarantee: the cut lands within ±1.65% RANK of the
      exact tercile (k=200, 99% conf) — a rank wobble on boundary docs,
      never a wrong ordering.
    - ``"exact"``: ``F.percentile`` — bit-exact tercile ranks, but the
      aggregation state is a per-partial map over DISTINCT perplexity
      values, potentially millions of entries per partial at corpus
      scale. The oracle-contract twin for test scale factors, not the
      100 TB path.

    ``sketch_contract=True`` (registry/test mode) buckets on the EXACT
    thresholds (keeping the row hash-deterministic against the DuckDB
    twin) and verifies the sketch path against them in-row: the column
    ``sketch_rank_ok`` asserts the EXACT rank of each sketch threshold
    sits within ``rank_tolerance`` of 1/3 and 2/3 — what KLL actually
    guarantees (same contract shape as a14's
    ``kll_rank_within_tol``). Thresholds round to 4 decimals like the
    perplexities they cut, keeping the bucket assignment engine-exact
    (boundary docs compare equal-rounded values on both sides)."""
    if threshold_mode not in ("exact", "sketch"):
        raise ValueError(f"threshold_mode must be exact|sketch, got {threshold_mode!r}")
    scored = unigram_logprob(docs, vocab_size, alpha, id_col, text_col)
    if sketch_contract:
        # one extra narrow pass over `scored` — avoid recomputing the
        # LM join chain for each consumer
        scored = scored.localCheckpoint(eager=False)

    sketch_thr = None
    if threshold_mode == "sketch" or sketch_contract:
        sketch_thr = (
            scored.agg(F.kll_sketch_agg_double("perplexity").alias("_sk"))
            .select(
                F.round(
                    F.kll_sketch_get_quantile_double("_sk", F.lit(1.0 / 3)), 4
                ).alias("_s1"),
                F.round(
                    F.kll_sketch_get_quantile_double("_sk", F.lit(2.0 / 3)), 4
                ).alias("_s2"),
            )
        )
    if threshold_mode == "exact" or sketch_contract:
        thr = scored.agg(
            F.round(F.percentile("perplexity", F.lit(1.0 / 3)), 4).alias("_t1"),
            F.round(F.percentile("perplexity", F.lit(2.0 / 3)), 4).alias("_t2"),
        )
    else:
        thr = sketch_thr.select(
            F.col("_s1").alias("_t1"), F.col("_s2").alias("_t2")
        )

    out_cols = [
        F.col(id_col),
        F.col("n_tokens"),
        F.col("perplexity"),
        F.when(F.col("perplexity") <= F.col("_t1"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    ]
    buckets = scored.crossJoin(F.broadcast(thr))
    if sketch_contract:
        # EXACT rank of each sketch threshold (one conditional-count agg
        # over the scored relation) vs the tercile targets — the rank
        # contract KLL guarantees, hashed as its boolean projection
        rank_ok = (
            scored.crossJoin(F.broadcast(sketch_thr))
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(
                    (F.col("perplexity") <= F.col("_s1")).cast("long")
                ).alias("_le1"),
                F.sum(
                    (F.col("perplexity") <= F.col("_s2")).cast("long")
                ).alias("_le2"),
            )
            .select(
                (
                    (
                        F.abs(
                            F.col("_le1") / F.col("_n") - F.lit(1.0 / 3)
                        )
                        <= rank_tolerance
                    )
                    & (
                        F.abs(
                            F.col("_le2") / F.col("_n") - F.lit(2.0 / 3)
                        )
                        <= rank_tolerance
                    )
                ).alias("sketch_rank_ok")
            )
        )
        buckets = buckets.crossJoin(F.broadcast(rank_ok))
        out_cols.append(F.col("sketch_rank_ok"))
    return buckets.select(*out_cols)


def perplexity_buckets_sql(
    table: str,
    vocab_size: int = 65_536,
    alpha: float = 1.0,
    sketch_contract: bool = False,
) -> str:
    """DuckDB twin of :func:`perplexity_buckets` (exact-threshold mode;
    with ``sketch_contract`` it predicts the KLL rank flag as all-true —
    the a11/a14 accuracy-contract pattern)."""
    inner = unigram_logprob_sql(table, vocab_size, alpha)
    contract_col = (
        ",\n           TRUE AS sketch_rank_ok" if sketch_contract else ""
    )
    return f"""
    WITH ppl_scored AS ({inner}),
    thr AS (
        SELECT round(quantile_cont(perplexity, 1.0/3), 4) AS t1,
               round(quantile_cont(perplexity, 2.0/3), 4) AS t2
        FROM ppl_scored
    )
    SELECT doc_id, n_tokens, perplexity,
           CASE WHEN perplexity <= t1 THEN 'head'
                WHEN perplexity <= t2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket{contract_col}
    FROM ppl_scored, thr
    """
