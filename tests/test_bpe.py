"""BPE tokenizer (operators/bpe.py): parity with the published greedy
algorithm, merge-application edge semantics, saturation early-stop, and
the encode plan shape.

The ground truth here is an in-test pure-python implementation of the
subword-nmt algorithm (Sennrich et al. 2016: overlap-counted pair
statistics, leftmost non-overlapping merge application, count-then-pair
tiebreak) — the same role the reference repo's own test corpora play for
the wikitext operators."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from wcdimportbot_spark.operators.bpe import (
    bpe_encode_profile,
    bpe_train,
    bpe_train_sql,
    train_merges,
)


# --- pure-python reference (subword-nmt semantics) ---------------------


def _ref_words(texts):
    import re

    words = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    return {w: (list(w) + ["_"], c) for w, c in words.items()}


def _ref_merge(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, num_merges):
    vocab = _ref_words(texts)
    merges = []
    for rank in range(num_merges):
        stats = Counter()
        for syms, freq in vocab.values():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += freq
        if not stats:
            break
        (l, r), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        vocab = {
            w: (_ref_merge(syms, (l, r)), freq)
            for w, (syms, freq) in vocab.items()
        }
    return merges, vocab


TEXTS = [
    "the lower newer tower; the newest lowest!",
    "Wider wide widest, low lower lowest.",
    "new newer newest -- tow tower towering",
    "wide low new 42 tow the the the",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_published_algorithm(spark, docs):
    got = [
        (m[0], m[1], m[2], m[3]) for m in train_merges(docs, num_merges=10)
    ]
    want, _ = _ref_train(TEXTS, 10)
    assert got == want


def test_local_training_bit_parity_with_distributed(spark, docs):
    """r8 verdict #2 — the driver-local loop (one distributed counting
    pass + python greedy loop over the collected dictionary) must be
    bit-identical to the distributed job-per-merge loop when top_k_words
    covers the distinct-word table, at a merge count deep enough to
    exercise merged-symbol pairs."""
    from wcdimportbot_spark.operators.bpe import train_merges_local

    want = [tuple(m) for m in train_merges(docs, num_merges=16)]
    got = [tuple(m) for m in train_merges_local(docs, num_merges=16)]
    assert got == want
    ref, _ = _ref_train(TEXTS, 16)
    assert got == [tuple(m) for m in ref]


def test_local_training_truncated_dictionary_is_frequency_covering(spark):
    """With top_k_words smaller than the vocabulary, training sees the
    FREQUENCY-covering prefix (freq desc, word asc) — the documented
    approximation: merges equal training on just those words."""
    from wcdimportbot_spark.operators.bpe import train_merges_local

    texts = ["zz zz zz zz aa aa aa bb bb cq"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = [tuple(m) for m in train_merges_local(docs, 4, top_k_words=2)]
    # top-2 by freq: zz (4), aa (3) — cq and bb never influence training
    ref, _ = _ref_train(["zz zz zz zz aa aa aa"], 4)
    assert got == [tuple(m) for m in ref]
    assert all("b" not in l + r and "c" not in l + r for _, l, r, _c in got)


def test_merge_application_edge_semantics(spark):
    # repeated in-word merges in one pass + boundary safety: 'aaaa'
    # merges (a,a) twice; 'ab' as a fused symbol is never split-matched
    docs = spark.createDataFrame(
        [(0, "aaaa aaa ab")], "doc_id long, text string"
    )
    merges = train_merges(docs, num_merges=2)
    want, _ = _ref_train(["aaaa aaa ab"], 2)
    assert [(m[0], m[1], m[2], m[3]) for m in merges] == want
    # (a,a) must be merge 0: freq-weighted overlap count = 3 + 2 = 5
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("a", "a", 5)


def test_saturation_early_stop_and_oracle_parity(spark):
    # tiny corpus fully fuses long before 32 merges: the loop stops
    # early and the unrolled-CTE oracle returns the same short table
    duckdb = pytest.importorskip("duckdb")
    texts = ["ab ab ba", "ab ba ba"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, num_merges=32).toPandas()
    assert 0 < len(got) < 32

    con = duckdb.connect()
    import pandas as pd

    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    want = con.execute(bpe_train_sql("documents", 32)).df()
    key = ["merge_rank", "left_sym", "right_sym", "pair_count"]
    assert got.sort_values("merge_rank")[key].values.tolist() == (
        want.sort_values("merge_rank")[key].values.tolist()
    )


def test_encode_profile_counts(spark, docs):
    merges, vocab = _ref_train(TEXTS, 10)
    prof = {
        r["doc_id"]: r.asDict()
        for r in bpe_encode_profile(docs, merges=merges).collect()
    }
    assert set(prof) == set(range(len(TEXTS)))
    # doc 3: 'wide low new 42 tow the the the' -> 7 [a-z] words
    assert prof[3]["n_words"] == 7
    for row in prof.values():
        # every word is at least one token; never more than chars+marker
        assert row["n_words"] <= row["n_bpe_tokens"]
        assert row["tokens_per_word"] == pytest.approx(
            row["n_bpe_tokens"] / row["n_words"]
        )
    # cross-check one doc against the python-reference vocabulary
    toks = {w: len(s) for w, (s, _) in vocab.items()}
    want3 = sum(toks[w] for w in "wide low new tow the the the".split())
    assert prof[3]["n_bpe_tokens"] == want3


def test_tokenizer_store_roundtrip_and_time_travel(spark, docs, tmp_path):
    from wcdimportbot_spark.operators.bpe import load_merges, save_merges

    store = str(tmp_path / "tok")
    m4 = train_merges(docs, num_merges=4)
    v1 = save_merges(spark, m4, store)
    assert load_merges(spark, store) == m4
    # retrain publishes a new version; the old one stays readable
    m8 = train_merges(docs, num_merges=8)
    v2 = save_merges(spark, m8, store)
    assert v1 != v2
    assert load_merges(spark, store) == m8
    assert load_merges(spark, store, version=v1) == m4


def test_cli_bpe_train_then_encode(spark, docs, tmp_path, capsys):
    import json

    from wcdimportbot_spark.cli import main

    docs_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(docs_path)
    store = str(tmp_path / "store")
    tok = str(tmp_path / "tok")
    assert (
        main(
            [
                "--store", store,
                "--bpe-train", docs_path,
                "--bpe-merges", "6",
                "--bpe-store", tok,
            ]
        )
        == 0
    )
    trained = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert trained["trained_merges"] == 6
    assert (
        main(
            ["--store", store, "--bpe-encode", docs_path, "--bpe-store", tok]
        )
        == 0
    )
    enc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert enc["n_docs"] == len(TEXTS) and enc["merges"] == 6
    # fewer tokens than characters, at least one token per word
    assert enc["mean_tokens_per_word"] >= 1.0


def test_encode_dictionary_join_is_broadcast(spark, docs):
    plan = bpe_encode_profile(docs, num_merges=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_row_token_count_matches_batch_profile(spark, docs):
    from wcdimportbot_spark.operators.bpe import bpe_token_count

    merges = train_merges(docs, num_merges=8)
    import pyspark.sql.functions as SF

    per_row = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count(SF.col("text"), merges).alias("n")
        ).collect()
    }
    batch = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_profile(docs, merges=merges).collect()
    }
    assert per_row == batch


def test_streaming_tokenize_gate_parity(spark, docs, tmp_path):
    """Tokenize-on-ingest: a document stream selects the per-row token
    count under the STORED tokenizer — stateless (no watermark, no
    state store), and the accepted set matches the batch encode."""
    import pyspark.sql.functions as SF

    from wcdimportbot_spark.operators.bpe import (
        bpe_token_count,
        load_merges,
        save_merges,
    )

    store = str(tmp_path / "tok")
    save_merges(spark, train_merges(docs, num_merges=8), store)
    merges = load_merges(spark, store)

    src = str(tmp_path / "in")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .select(
            "doc_id", bpe_token_count(SF.col("text"), merges).alias("n")
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["n"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_profile(docs, merges=merges).collect()
    }
    assert got == want


def test_vocab_coverage_stats(spark, docs):
    from wcdimportbot_spark.operators.bpe import bpe_vocab_stats

    merges, vocab = _ref_train(TEXTS, 10)
    rows = bpe_vocab_stats(docs, merges=merges).collect()
    # reference symbol counts: final symbols weighted by word freq
    want = Counter()
    for syms, freq in vocab.values():
        for s in syms:
            want[s] += freq
    got = {r["symbol"]: r["token_count"] for r in rows}
    assert got == dict(want)
    # ranks are 1..V by (count desc, symbol); cum_share ends at 1.0
    by_rank = sorted(rows, key=lambda r: r["vocab_rank"])
    assert [r["vocab_rank"] for r in by_rank] == list(range(1, len(rows) + 1))
    assert by_rank[-1]["cum_share"] == pytest.approx(1.0)
    assert all(
        a["cum_share"] < b["cum_share"] + 1e-12
        for a, b in zip(by_rank, by_rank[1:])
    )


# --- property: the unrolled-CTE oracle IS the subword-nmt algorithm ----
# (fast path: hypothesis drives DuckDB + the pure-python reference, no
# Spark job per example; the Spark side is pinned to the same oracle at
# sf0.001/0.01/0.1 by the registry gate and the fixed-corpus tests)

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=5)
_corpus = st.lists(
    st.lists(_word, min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=5,
)


@given(_corpus)
@settings(max_examples=60, deadline=None)
def test_oracle_matches_reference_on_random_corpora(texts):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = [
        tuple(r)
        for r in con.execute(bpe_train_sql("documents", 6))
        .df()
        .sort_values("merge_rank")
        .itertuples(index=False)
    ]
    want, _ = _ref_train(texts, 6)
    assert got == want
