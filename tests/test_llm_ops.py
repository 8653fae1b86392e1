"""LLM data-pipeline operator tests (dedup / similarity / text analysis /
multimodal plumbing). Oracle equality is covered by scripts/check_oracle.py;
these tests pin semantic properties the oracle cannot express."""

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s", 60),
    (2, "the quick brown fox jumps over the lazy dog near the river bend", "en", "s", 60),  # near-dup of 1
    (3, "completely different words about spark catalyst optimizer plans", "en", "s", 60),
    (4, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s", 60),  # exact dup of 1
    (5, "dog lazy the over jumps fox brown quick the bank river near", "en", "s", 60),  # permutation of 1
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA).cache()


def test_exact_dedup(docs):
    from wcdimportbot_spark.operators.text_dedup import exact_duplicate_groups

    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_doc_id"] == 1


def test_minhash_lsh_finds_near_dup_not_distinct(docs):
    from wcdimportbot_spark.operators.text_dedup import lsh_candidate_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # one-word difference shares most shingles
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated doc


def test_simhash_properties(docs):
    from wcdimportbot_spark.operators.text_dedup import simhash

    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert h[1] == h[4]  # identical text, identical fingerprint
    assert 0 <= h[1] < 2**16
    # near-dup should be closer in hamming distance than the unrelated doc
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(h[1], h[2]) <= ham(h[1], h[3])


def test_fingerprint_order_invariant(docs):
    from wcdimportbot_spark.operators.text_analysis import fingerprint

    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[5]  # permutation, same token set
    assert fps[1] != fps[3]


def test_language_and_quality(spark):
    from wcdimportbot_spark.operators.text_analysis import document_profile

    rows = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat on the log in the sun", "x", "s", 10),
            (2, "le chat est dans la maison et le chien est dans le jardin pour un moment", "x", "s", 10),
            (3, "zzz qqq xxx", "x", "s", 10),
        ],
        SCHEMA,
    )
    prof = {r["doc_id"]: r for r in document_profile(rows).collect()}
    assert prof[1]["detected_lang"] == "en"
    assert prof[2]["detected_lang"] == "fr"
    assert prof[3]["detected_lang"] == "und"
    assert prof[1]["quality"] > prof[3]["quality"]
    assert prof[1]["n_tokens"] == 16


def test_ann_recall_against_bruteforce(spark, sf_dir):
    from wcdimportbot_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_topk_bruteforce,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, num_queries=5, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(emb, num_queries=5, k=3, planes=4, num_tables=8).collect()
    }
    # multi-table LSH should recover most exact neighbours (it is
    # approximate by design; measured ~0.73 at these settings)
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"suspiciously low ANN recall: {recall}"


def test_multimodal_stub_raises_without_fake(docs):
    from wcdimportbot_spark.operators.multimodal import (
        extract_media_features,
        media_from_documents,
    )

    media = media_from_documents(docs)
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_multimodal_fake_features_deterministic(docs):
    from wcdimportbot_spark.operators.multimodal import (
        extract_media_features,
        media_from_documents,
    )

    media = media_from_documents(docs)
    a = {r["media_id"]: r for r in extract_media_features(media).collect()}
    b = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["payload_md5"] == b[k]["payload_md5"]
        assert a[k]["features"] == b[k]["features"]
        assert len(a[k]["features"]) == 4
        assert a[k]["n_bytes"] > 0


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    from wcdimportbot_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, num_queries=5, k=3).collect()
    }
    lo = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, num_queries=5, k=3, num_clusters=8, nprobe=2).collect()
    }
    hi = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, num_queries=5, k=3, num_clusters=8, nprobe=6).collect()
    }
    recall_lo = len(exact & lo) / len(exact)
    recall_hi = len(exact & hi) / len(exact)
    assert recall_hi >= 0.5, f"high-probe IVF recall too low: {recall_hi}"
    # more probes must not reduce recall (monotone candidate superset)
    assert recall_hi >= recall_lo


def test_bmp_codec_roundtrip_properties():
    from wcdimportbot_spark.operators.multimodal import decode_bmp, encode_bmp

    for w, h, rgb in [(1, 1, (0, 0, 0)), (5, 3, (10, 200, 255)), (16, 9, (127, 1, 99))]:
        d = decode_bmp(encode_bmp(w, h, rgb))
        assert (d["width"], d["height"]) == (w, h)
        assert (d["mean_r"], d["mean_g"], d["mean_b"]) == tuple(float(c) for c in rgb)
    # odd widths exercise the 4-byte row padding path: stride != width*3
    d = decode_bmp(encode_bmp(3, 2, (9, 9, 9)))
    assert (d["width"], d["height"], d["mean_r"]) == (3, 2, 9.0)


def test_png_codec_roundtrip_properties():
    import numpy as np

    from wcdimportbot_spark.operators.multimodal import decode_png, encode_png

    for w, h, rgba in [
        (1, 1, (0, 0, 0, 255)),
        (5, 7, (10, 200, 255, 128)),  # >=5 rows: every filter type used
        (16, 9, (127, 1, 99, 7)),
    ]:
        d = decode_png(encode_png(w, h, rgba))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 4)
        assert (d["mean_r"], d["mean_g"], d["mean_b"]) == tuple(
            float(c) for c in rgba[:3]
        )
    # non-solid content: unfiltering must reproduce EXACT bytes, so build
    # a gradient by hand-editing the encoder's input path via a roundtrip
    # of random pixels through encode->decode mean equality
    rng = np.random.default_rng(42)
    # decode_png only reports means; verify a known non-uniform image by
    # comparing against a filter-0-only PNG of the same pixels
    import struct
    import zlib

    from wcdimportbot_spark.operators.multimodal import PNG_SIGNATURE, _png_chunk

    w, h, ch = 6, 6, 3
    px = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    lines = b"".join(bytes([0]) + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    d = decode_png(payload)
    flat = px.reshape(h * w, ch).astype(float)
    assert d["channels"] == 3
    assert abs(d["mean_r"] - flat[:, 0].mean()) < 1e-9
    assert abs(d["mean_g"] - flat[:, 1].mean()) < 1e-9
    assert abs(d["mean_b"] - flat[:, 2].mean()) < 1e-9


def test_png_gate_rejects_unsupported_variants():
    import struct
    import zlib

    import pytest as _pytest

    from wcdimportbot_spark.operators.multimodal import (
        PNG_SIGNATURE,
        _png_chunk,
        decode_png,
        encode_png,
    )

    # 16-bit depth gates honestly
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bogus = PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr16) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + _png_chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(bogus)
    # corrupted CRC is rejected, not silently decoded
    good = bytearray(encode_png(3, 3, (1, 2, 3, 255)))
    good[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with _pytest.raises(NotImplementedError, match="CRC"):
        decode_png(bytes(good))


def test_wav_codec_roundtrip_properties():
    from wcdimportbot_spark.operators.multimodal import decode_wav, encode_wav

    d = decode_wav(encode_wav(8000, 8000, 1234))
    assert d["duration_ms"] == 1000
    assert d["sample_rate"] == 8000
    assert d["rms"] == 1234.0  # ±a square wave: RMS is exactly a


def test_codec_gate_rejects_unsupported_formats():
    from wcdimportbot_spark.operators.multimodal import (
        decode_payload,
        decode_bmp,
    )

    with pytest.raises(NotImplementedError):
        decode_payload(b"\xff\xd8\xff\xe0 jpeg-ish payload")
    with pytest.raises(NotImplementedError):
        decode_payload(b"RIFF\x00\x00\x00\x00AVI LIST")  # RIFF but not WAVE
    # BMP container with an unsupported bit depth still gates honestly
    import struct

    bogus = b"BM" + b"\x00" * 12 + struct.pack("<Iii", 40, 2, 2) + struct.pack(
        "<HH", 1, 8
    ) + b"\x00" * 24
    with pytest.raises(NotImplementedError):
        decode_bmp(bogus)


def test_real_feature_path_decodes_bmp_and_wav(spark):
    from wcdimportbot_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_wav,
        extract_media_features,
    )

    rows = [
        (1, "image", bytearray(encode_bmp(4, 2, (8, 16, 32))), None),
        (2, "audio", bytearray(encode_wav(1600, 8000, 500)), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_media_features(media, fake=False).collect()}
    assert got[1]["features"] == [4.0, 2.0, 8.0, 16.0, 32.0]
    assert got[2]["features"] == [200.0, 500.0]


def test_repetition_profile_semantics(spark):
    """Repetition filter: repeated n-grams within one doc raise the
    duplicated fraction; clean text stays near zero; short docs are 0."""
    from wcdimportbot_spark.operators.text_analysis import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "eight completely distinct words appear exactly once"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(docs).collect()}
    # doc 1: 7 bigrams, 2 distinct ("buy now", "now buy") -> 1 - 2/7
    assert got[1]["rep_bigram"] == round(1 - 2 / 7, 4)
    assert got[1]["repetitive"] is True
    assert got[2]["rep_bigram"] == 0.0 and got[2]["repetitive"] is False
    assert got[3]["n_tokens"] == 1 and got[3]["max_rep"] == 0.0


def test_repeated_spans_cross_doc_only(spark):
    """A span repeated WITHIN one doc does not count; the same span across
    two docs flags both; unique docs report zero shared."""
    from wcdimportbot_spark.operators.text_dedup import repeated_spans

    boiler = "this content is provided under the creative commons license"
    docs = spark.createDataFrame(
        [
            (1, boiler + " apple banana cherry"),
            (2, boiler + " dog elephant fox"),
            # 10 tokens repeated twice inside ONE doc, nowhere else
            (3, "zig zag one two three four five six seven eight "
                "zig zag one two three four five six seven eight"),
            (4, "entirely unique words that appear in no other document here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repeated_spans(docs, window=8).collect()}
    assert got[1]["n_shared"] > 0 and got[2]["n_shared"] > 0
    # the shared spans are exactly the boilerplate prefix windows (the
    # 8-gram must fit inside the 9-token boilerplate -> 2 spans each)
    assert got[1]["n_shared"] == 2 and got[2]["n_shared"] == 2
    assert got[3]["n_shared"] == 0  # intra-doc repetition is NOT cross-doc
    assert got[4]["n_shared"] == 0 and got[4]["flagged"] is False


def test_normalize_url_variants_collapse(spark):
    from wcdimportbot_spark.operators.text_dedup import normalize_url

    from pyspark.sql import functions as F

    rows = [
        ("https://WWW.Example.com/Article/doc1?utm=x",),
        ("http://example.com/Article/doc1/",),
        ("example.com/Article/doc1#frag",),
        ("ftp://user.example.com/Other",),  # different host survives
        ("https://example.com",),  # bare host, no path
    ]
    got = [
        r["n"]
        for r in spark.createDataFrame(rows, "url string")
        .select(normalize_url(F.col("url")).alias("n"))
        .collect()
    ]
    assert got[0] == got[1] == got[2] == "example.com/Article/doc1"
    assert got[3] == "user.example.com/Other"  # path case preserved
    assert got[4] == "example.com"


def test_jpeg_codec_solid_grayscale_exact():
    """Unit quant tables + grayscale (Cb=Cr=128 exactly) make the lossy
    chain deterministic: the round trip must be EXACT, including MCU edge
    padding on non-multiple-of-8 dimensions."""
    import numpy as np

    from wcdimportbot_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for v, (h, w) in [(0, (8, 8)), (7, (5, 9)), (128, (16, 24)), (255, (13, 21))]:
        px = np.full((h, w, 3), v, dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(px), return_pixels=True)
        assert (d["width"], d["height"]) == (w, h)
        assert np.array_equal(d["pixels"], px), (v, h, w)
        assert d["mean_r"] == d["mean_g"] == d["mean_b"] == float(v)


def test_jpeg_codec_random_content_bounded_error():
    """With unit quantization the only loss is coefficient + color
    rounding: random RGB content must round-trip within a tight bound
    through the full huffman/DCT chain."""
    import numpy as np

    from wcdimportbot_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    for shape in [(8, 8), (17, 9), (24, 31)]:
        px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(px), return_pixels=True)
        err = np.abs(d["pixels"].astype(int) - px.astype(int)).max()
        # ±0.5 per quantized coefficient accumulates through the IDCT
        # basis plus ±0.5 YCbCr rounding amplified ~1.8x by the color
        # transform: a handful of counts, not a visually meaningful loss
        assert err <= 6, (shape, err)


def test_jpeg_gates_reject_unsupported_processes():
    import numpy as np
    import pytest as _pytest

    from wcdimportbot_spark.operators.jpeg import decode_jpeg, encode_jpeg

    good = bytearray(encode_jpeg(np.full((8, 8, 3), 5, dtype=np.uint8)))
    # flip SOF0 (0xFFC0) to SOF2 progressive -> honest gate
    i = bytes(good).index(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2:])
    with _pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(prog)
    with _pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG not jpeg")
    # subsampled stream: patch the Y component's sampling factors to 2x2
    sof_body = bytes(good).index(b"\xff\xc0") + 4
    sub = bytearray(good)
    sub[sof_body + 7] = 0x22  # first component sampling byte
    with _pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg(bytes(sub))


def test_bucketed_index_probe_no_store_shuffle(spark, tmp_path):
    """The bucketed-table form of the dedup index: probe joins must scan
    the store pre-partitioned (Bucketed: true, NO Exchange above the
    store scan) with only the batch side shuffling — and the flags must
    match the plain-DataFrame index path exactly."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.text_dedup import (
        dedup_index,
        dedup_index_tables_read,
        dedup_index_tables_write,
        incremental_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    history = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    hashes, bands_rel = dedup_index(history)
    dedup_index_tables_write(hashes, bands_rel, "dedup_ix_test", buckets=4)
    try:
        th, tb = dedup_index_tables_read(spark, "dedup_ix_test")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ann = incremental_dedup(batch, th, tb)
            plan = ann._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # both store scans are bucketed, and no Exchange feeds them: the
        # exchanges in the plan belong to the batch side only
        assert plan.count("Bucketed: true") >= 2, plan[:2000]
        for line in plan.splitlines():
            if "dedup_ix_test" in line:
                assert "Exchange" not in line
        got = {r["doc_id"]: r["fresh"] for r in ann.collect()}
        want = {
            r["doc_id"]: r["fresh"]
            for r in incremental_dedup(batch, hashes, bands_rel).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS dedup_ix_test_hashes")
        spark.sql("DROP TABLE IF EXISTS dedup_ix_test_bands")


def test_two_phase_topk_equals_single_window(spark):
    """Randomized (seeded) equivalence: two_phase_topk must return the
    EXACT rows and ranks of the naive single window for any key/score
    distribution, duplicate scores included, under different input
    partitionings (the _slice stamp must never leak into results)."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from wcdimportbot_spark.operators.similarity import two_phase_topk

    for seed, nparts in ((7, 2), (23, 7), (99, 32)):
        rng = random.Random(seed)
        rows = [
            (rng.randint(0, 4), i, round(rng.random() * 10) / 10.0)
            for i in range(300)
        ]
        df = spark.createDataFrame(
            rows, "key int, rid long, score double"
        ).repartition(nparts)
        order = [F.col("score").desc(), F.col("rid")]
        got = {
            (r["key"], r["rid"], r["rank"])
            for r in two_phase_topk(df, ["key"], order, 7).collect()
        }
        w = W.partitionBy("key").orderBy(*order)
        want = {
            (r["key"], r["rid"], r["rank"])
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 7)
            .collect()
        }
        assert got == want, (seed, nparts)


def test_unigram_logprob_oov_smoothing(spark):
    """With a vocab cut smaller than the token set, OOV tokens must take
    the alpha/N floor: a doc of rare tokens scores strictly lower mean
    log-probability (higher perplexity) than one of frequent tokens, and
    the perplexity of a doc made ONLY of the most frequent token equals
    N/count(token) exactly."""
    from wcdimportbot_spark.operators.text_analysis import unigram_logprob

    import math

    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rare1 rare2"),
            (3, "common common common common common common"),
        ],
        "doc_id long, text string",
    )
    # vocab_size=1 keeps only "common" (12 occurrences of 14 total)
    out = {r["doc_id"]: r for r in unigram_logprob(docs, vocab_size=1).collect()}
    n_total = 14
    p_common = 12 / n_total
    assert out[1]["perplexity"] == round(1 / p_common, 4)
    assert out[3]["perplexity"] == out[1]["perplexity"]
    # doc 2 carries two OOV tokens at the alpha/N floor -> worse score
    assert out[2]["mean_logprob"] < out[1]["mean_logprob"]
    expected2 = (2 * math.log(p_common) + 2 * math.log(1 / n_total)) / 4
    assert out[2]["mean_logprob"] == round(expected2, 4)


def test_unigram_logprob_vocab_cut_is_distributed(spark):
    """The vocab cut must compile to TakeOrderedAndProject (per-partition
    heaps), never a single-partition global sort over the vocabulary."""
    from wcdimportbot_spark.operators.text_analysis import unigram_logprob

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        unigram_logprob(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_ivfpq_residual_adc_decomposition_exact(spark, sf_dir):
    """The residual-ADC identities must hold EXACTLY against the
    reconstruction: dot(q, x̂) = dot(q, c) + Σ lut lookups and
    ‖x̂‖² = ‖c‖² + Σ cross lookups — approximation lives only in the
    quantization x → x̂, never in the scoring algebra."""
    import numpy as np

    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.similarity import (
        ivf_index,
        ivfpq_residual_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    ivf = ivf_index(emb, num_clusters=4)
    codes_df, books = ivfpq_residual_index(emb, ivf, m=8, n_codes=16)
    assigned, centroids = ivf
    cent = np.asarray(centroids)
    m, _, subdim = books.shape
    q = np.array(
        emb.filter(F.col("vec_id") == emb.agg(F.min("vec_id")).first()[0])
        .first()["embedding"],
        dtype=np.float64,
    )
    for r in codes_df.limit(50).collect():
        c, codes = r["cluster"], np.array(r["codes"])
        rhat = np.concatenate([books[j, codes[j]] for j in range(m)])
        xhat = cent[c] + rhat
        adot = q @ cent[c] + sum(
            books[j, codes[j]] @ q[j * subdim : (j + 1) * subdim]
            for j in range(m)
        )
        vnorm2 = cent[c] @ cent[c] + sum(
            2.0 * (cent[c][j * subdim : (j + 1) * subdim] @ books[j, codes[j]])
            + books[j, codes[j]] @ books[j, codes[j]]
            for j in range(m)
        )
        assert abs(adot - q @ xhat) < 1e-9
        assert abs(vnorm2 - xhat @ xhat) < 1e-9


def test_pq_index_rejects_empty_input(spark):
    """An empty embeddings input must fail with a clear error, not an
    opaque numpy crash inside codebook training."""
    import pytest as _pytest

    from wcdimportbot_spark.operators.similarity import pq_index

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="empty"):
        pq_index(empty)


def test_jpeg_tolerates_fill_bytes_and_standalone_markers():
    """Legal-but-foreign streams: 0xFF fill bytes between segments and a
    standalone TEM (0xFF01) marker before SOS must not desync the marker
    scan — the decode still round-trips exactly."""
    import numpy as np

    from wcdimportbot_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = np.full((8, 8, 3), 42, dtype=np.uint8)
    good = encode_jpeg(px)
    # inject a run of fill bytes + a TEM marker right after SOI
    patched = good[:2] + b"\xff\xff\xff\x01" + good[2:]
    d = decode_jpeg(patched, return_pixels=True)
    assert np.array_equal(d["pixels"], px)
    # fill bytes immediately before a mid-stream marker (SOF0) too
    i = good.index(b"\xff\xc0")
    patched2 = good[:i] + b"\xff\xff" + good[i:]
    d2 = decode_jpeg(patched2, return_pixels=True)
    assert np.array_equal(d2["pixels"], px)


def test_pq_codes_and_recall_contract(spark):
    """PQ: codes are m small ints per vector (the 32x-compressed
    representation), the ADC+refine top-k satisfies the epsilon-recall
    contract on the fixture embeddings, and emitted cosines are EXACT
    (refine re-scores on the full vectors, so each emitted cosine must
    equal the brute-force value for that pair)."""
    from wcdimportbot_spark.operators.similarity import (
        ann_recall_report,
        cosine_topk_bruteforce,
        pq_index,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes_df, books = pq_index(emb, m=8, n_codes=256)
    row = codes_df.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 256 for c in row["codes"])
    assert books.shape == (8, 256, 8)  # dim 64 / m 8

    approx = pq_topk(emb, num_queries=5, k=3)
    rep = ann_recall_report(emb, approx, num_queries=5, k=3).collect()
    assert len(rep) == 5
    assert all(r["recall_within_tolerance"] for r in rep)
    # emitted cosines are true values: every (query, neighbor, cosine)
    # must appear in the exact pair ranking with the same rounded cosine
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk_bruteforce(emb, num_queries=5, k=500).collect()
    }
    for r in approx.collect():
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_incremental_dedup_probe(docs):
    """New-batch probe against a stored index: exact dup of history is
    flagged exact+near; a near-dup shares a band bucket but not the
    hash; unrelated content is fresh."""
    from wcdimportbot_spark.operators.text_dedup import (
        dedup_index,
        incremental_dedup,
    )

    history = docs.filter("doc_id = 1")  # the canonical text
    batch = docs.filter("doc_id in (2, 3, 4)")
    hashes, bands_rel = dedup_index(history)
    got = {r["doc_id"]: r for r in incremental_dedup(batch, hashes, bands_rel).collect()}
    assert got[4]["exact_dup_of_history"] and not got[4]["fresh"]  # byte-identical
    assert got[2]["near_dup_of_history"] and not got[2]["fresh"]  # one word off
    assert not got[2]["exact_dup_of_history"]
    assert got[3]["fresh"] and not got[3]["near_dup_of_history"]  # unrelated


def test_dedup_index_ingest_two_batches(spark, tmp_path):
    """The store-backed maintenance loop: batch 1 bootstraps the index
    from an empty store and appends its fresh survivors; batch 2's dupes
    AGAINST THOSE SURVIVORS (not just the original history) are caught.
    Re-ingesting the same content writes nothing new (MERGE idempotence)."""
    from wcdimportbot_spark.operators.text_dedup import (
        dedup_index_ingest,
        read_dedup_index,
    )

    store = str(tmp_path / "dedup_index")
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river bank"),
            (11, "completely different words about spark catalyst optimizer plans"),
        ],
        schema,
    )
    ann1 = {r["doc_id"]: r for r in dedup_index_ingest(b1, store).collect()}
    assert ann1[10]["fresh"] and ann1[11]["fresh"]  # empty store: all fresh

    b2 = spark.createDataFrame(
        [
            # exact dup of batch-1 survivor 10
            (20, "the quick brown fox jumps over the lazy dog near the river bank"),
            # near-dup (one word off) of batch-1 survivor 10
            (21, "the quick brown fox jumps over the lazy dog near the river bend"),
            (22, "unrelated fresh content about parquet row group statistics"),
        ],
        schema,
    )
    ann2 = {r["doc_id"]: r for r in dedup_index_ingest(b2, store).collect()}
    assert ann2[20]["exact_dup_of_history"] and not ann2[20]["fresh"]
    assert ann2[21]["near_dup_of_history"] and not ann2[21]["exact_dup_of_history"]
    assert ann2[22]["fresh"]

    # only FRESH survivors were appended: probing batch-2's exact dup
    # again now hits the index via doc 22's entry count staying stable
    hashes, bands_rel = read_dedup_index(spark, store)
    n_h, n_b = hashes.count(), bands_rel.count()
    ann3 = {r["doc_id"]: r for r in dedup_index_ingest(b2, store).collect()}
    assert not ann3[22]["fresh"]  # its own prior ingest is now history
    hashes2, bands2 = read_dedup_index(spark, store)
    assert hashes2.count() == n_h and bands2.count() == n_b  # nothing new written


def test_dedup_index_delete_forgets_and_refcounts(spark, tmp_path):
    """r11 verdict weak #1 closed: dedup_index_delete makes the index
    FORGET — a purged text's re-ingest is accepted as fresh again —
    while hash attribution refcounts shared band buckets (deleting one
    near-dup text must NOT blind the index to its surviving neighbor),
    with the pruned copy-on-write inode contract, delete-twice
    swallowed, and the legacy-store loud failure."""
    import os

    from wcdimportbot_spark.operators import sinks, versioned
    from wcdimportbot_spark.operators.text_dedup import (
        dedup_index_delete,
        dedup_index_ingest,
        read_dedup_index,
    )

    def inodes(base):
        out = {}
        for root, _d, files in os.walk(base):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, base)] = os.stat(p).st_ino
        return out

    store = str(tmp_path / "dedup_index")
    schema = "doc_id long, text string"
    t_a = "the quick brown fox jumps over the lazy dog near the river bank"
    t_b = "the quick brown fox jumps over the lazy dog near the river bend"
    t_c = "completely different words about spark catalyst optimizer plans"
    b1 = spark.createDataFrame([(1, t_a), (2, t_b), (3, t_c)], schema)
    ann1 = {r["doc_id"]: r for r in dedup_index_ingest(b1, store).collect()}
    assert all(ann1[i]["fresh"] for i in (1, 2, 3))
    hash_a = ann1[1]["text_hash"]

    hpath = os.path.join(store, "hashes")
    before = inodes(versioned.data_dir(hpath))
    doomed = spark.createDataFrame([(hash_a,)], "text_hash string")
    res = dedup_index_delete(doomed, store)
    assert res == {"hashes_deleted": 1, "bands_deleted": 4}

    # inode contract on the hashes store: only doomed buckets rewrote
    doomed_buckets = {
        f"hb={r['hb']}"
        for r in sinks.with_bucket(doomed, "text_hash")
        .select(sinks.BUCKET_COL)
        .collect()
    }
    after = inodes(versioned.data_dir(hpath))
    unt = {
        p: i for p, i in before.items() if os.path.dirname(p) not in doomed_buckets
    }
    assert unt and all(after.get(p) == i for p, i in unt.items())

    # the index forgot A: byte-identical re-ingest is FRESH again...
    ann2 = {
        r["doc_id"]: r
        for r in dedup_index_ingest(
            spark.createDataFrame([(10, t_a), (11, t_c)], schema), store
        ).collect()
    }
    assert not ann2[10]["exact_dup_of_history"]
    # ...while B's surviving band rows still flag A's text as near-dup
    # (annotation), and C is still remembered outright: refcounting via
    # hash attribution, not bucket wipe
    assert ann2[10]["near_dup_of_history"] and not ann2[10]["fresh"]
    assert ann2[11]["exact_dup_of_history"]

    # B's own fingerprints are fully intact
    hashes, bands_rel = read_dedup_index(spark, store)
    assert hashes.filter(F.col("text_hash") == ann1[2]["text_hash"]).count() == 1

    # delete-twice swallowed: A's hash is back (re-ingest 10) — delete a
    # NEVER-known hash instead: nothing published
    v_h = versioned.current_version(hpath)
    res2 = dedup_index_delete(
        spark.createDataFrame([("0" * 32,)], "text_hash string"), store
    )
    assert res2 == {"hashes_deleted": 0, "bands_deleted": 0}
    assert versioned.current_version(hpath) == v_h

    # legacy (unattributed) bands store fails loudly
    legacy = str(tmp_path / "legacy_index")
    from wcdimportbot_spark.operators.text_dedup import (
        _write_band_store_unlocked,
        _write_hash_store_unlocked,
    )

    _write_hash_store_unlocked(
        spark.createDataFrame([(hash_a,)], "text_hash string"),
        os.path.join(legacy, "hashes"),
    )
    _write_band_store_unlocked(
        spark.createDataFrame(
            [(0, "bx", "0#bx")], "band int, bucket string, bk string"
        ),
        os.path.join(legacy, "bands"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="predates hash attribution"):
        dedup_index_delete(doomed, legacy)


def test_mp3_header_probe():
    """Synthesized MPEG1-Layer-III frames (128 kbps, 44100 Hz) behind an
    ID3v2 tag: the header probe reports frames/duration/bitrate without
    any codec; sample decode stays gated and names the probe."""
    import struct

    import pytest as _pytest

    from wcdimportbot_spark.operators.multimodal import (
        decode_payload,
        probe_mp3,
        probe_payload,
    )

    # header: sync=0x7FF, MPEG1 (11), Layer III (01), no CRC (1),
    # bitrate idx 9 (128 kbps), samplerate idx 0 (44100), no padding
    hdr = struct.pack(">I", 0b11111111_111_11_01_1_1001_00_0_0_00_00_0_0_00)
    frame_len = 144 * 128000 // 44100  # 417 bytes
    frame = hdr + b"\x00" * (frame_len - 4)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10  # 10-byte tag body
    payload = id3 + frame * 3
    got = probe_mp3(payload)
    assert got["n_frames"] == 3
    assert got["sample_rate"] == 44100 and got["bitrate_kbps"] == 128
    assert got["duration_ms"] == round(3 * 1152 * 1000.0 / 44100, 3)
    assert probe_payload(payload)["kind"] == "mp3"
    with _pytest.raises(NotImplementedError, match="probe_mp3"):
        decode_payload(payload)


def test_mp4_box_probe():
    """Minimal ISO-BMFF payload (ftyp + moov/mvhd v0): the box probe
    reports brand and mvhd duration; sample decode stays gated."""
    import struct

    import pytest as _pytest

    from wcdimportbot_spark.operators.multimodal import (
        decode_payload,
        probe_mp4,
        probe_payload,
    )

    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0x200)
    mvhd_body = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", 1000, 5000)  # timescale, duration
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    payload = ftyp + moov
    got = probe_mp4(payload)
    assert got["brand"] == "isom"
    assert got["timescale"] == 1000 and got["duration_ms"] == 5000.0
    assert probe_payload(payload)["kind"] == "mp4"
    with _pytest.raises(NotImplementedError, match="probe_mp4"):
        decode_payload(payload)


def test_mp3_probe_gates_foreign_variants():
    """Non-MPEG1/LayerIII headers and syncless payloads must hit the
    honest gate, not mis-parse."""
    import struct

    import pytest as _pytest

    from wcdimportbot_spark.operators.multimodal import probe_mp3

    # MPEG2 (version bits 10) Layer III header
    mpeg2 = struct.pack(">I", 0xFFF39000) + b"\x00" * 100
    with _pytest.raises(NotImplementedError, match="MPEG1 Layer III"):
        probe_mp3(mpeg2)
    # Layer I (layer bits 11) header
    layer1 = struct.pack(">I", 0xFFFF9000) + b"\x00" * 100
    with _pytest.raises(NotImplementedError, match="MPEG1 Layer III"):
        probe_mp3(layer1)
    # bad bitrate index (1111) -> invalid frame gate
    badbr = struct.pack(">I", 0xFFFBF000) + b"\x00" * 100
    with _pytest.raises(NotImplementedError, match="free-format/invalid"):
        probe_mp3(badbr)
    # no frame sync at all
    with _pytest.raises(NotImplementedError, match="no MPEG audio frame"):
        probe_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 32)


def test_bigram_logprob_interpolation_and_backoff(spark):
    """Closed-form check of the interpolated bigram scorer: an in-vocab
    bigram contributes lambda*c2/c(prev) + (1-lambda)*p_uni; a bigram cut
    from the top-B vocab falls back to the pure unigram floor term."""
    import math

    from wcdimportbot_spark.operators.text_analysis import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # corpus: c(a)=3 c(b)=3 c(c)=1, N=7; bigrams (a,b):3 (b,a):1 (b,c):1
    # bigram_vocab_size=2 keeps (a,b) and — by the lexicographic tie
    # rule — (b,a); (b,c) backs off to the unigram term
    out = {
        r["doc_id"]: r
        for r in bigram_logprob(
            docs, vocab_size=100, bigram_vocab_size=2, lam=0.5
        ).collect()
    }
    n = 7.0
    t_first = math.log(3 / n)
    t_ab = math.log(0.5 * (3 / 3) + 0.5 * (3 / n))
    t_bc = math.log(0.5 * 0.0 + 0.5 * (1 / n))
    want2 = round((t_first + t_ab + t_bc) / 3, 4)
    assert out[2]["n_tokens"] == 3
    assert out[2]["mean_logprob"] == want2
    assert out[2]["perplexity"] == round(math.exp(-(t_first + t_ab + t_bc) / 3), 4)
    t_ba = math.log(0.5 * (1 / 3) + 0.5 * (3 / n))
    want1 = round((t_first + t_ab + t_ba + t_ab) / 4, 4)
    assert out[1]["mean_logprob"] == want1


def test_real_feature_path_probes_mp3_and_mp4(spark):
    """extract_media_features(fake=False) must yield features for
    mp3/mp4 payloads via the header/box probes (duration + bitrate /
    timescale) instead of failing the batch."""
    from wcdimportbot_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        synthesize_mp3,
        synthesize_mp4,
    )

    rows = [
        (1, "audio", bytearray(synthesize_mp3(3)), None),
        (2, "video", bytearray(synthesize_mp4(5000)), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["features"] for r in
           extract_media_features(media, fake=False).collect()}
    # the features column is float32 — compare with a tolerance
    assert got[1][0] == pytest.approx(3 * 1152 * 1000.0 / 44100, abs=1e-2)
    assert got[1][1] == 128.0  # bitrate_kbps
    assert got[2][0] == 5000.0 and got[2][1] == 1000.0


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_ivfpq_recall_margin_headroom(spark, sf):
    """VERDICT r7 #1: the sim_ann_ivfpq recall contract was one unlucky
    vector from red — pin the per-query MARGIN (flag-deciding ANN cosine
    above the eps-floor) at every sf, tighter than the registry row's
    margin_floor=0.01, so erosion fails here before the driver's hashed
    flag ever flips. Measured minima at refine=5
    (r10 driver-side kmeans++ IVF fit, canonical sample order):
    0.0443 / 0.0429 / 0.0240 — widen refine (exact rescans are cheap)
    rather than loosening this floor."""
    from wcdimportbot_spark.operators.similarity import (
        ann_recall_margins,
        ivfpq_residual_topk,
    )

    emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
    approx = ivfpq_residual_topk(
        emb, num_queries=10, k=5, num_clusters=16, nprobe=6, m=8,
        n_codes=256, refine=5,
    )
    margins = ann_recall_margins(emb, approx, num_queries=10, k=5, epsilon=0.05)
    assert len(margins) == 10
    worst = min(margins.values())
    assert worst >= 0.012, (
        f"IVFPQ recall margin eroded to {worst:.4f} at sf{sf} "
        f"(contract floor 0.01): widen refine before the driver row flips"
    )


def test_margin_contract_flag_matches_raw_margins(spark):
    """The hashed projection (recall_margin_ok) and the raw diagnostic
    (ann_recall_margins) must agree: flag == (margin >= margin_floor)
    per query, and an absurdly high floor flips flags to False."""
    from wcdimportbot_spark.operators.similarity import (
        ann_recall_margins,
        ann_recall_report,
        ivfpq_residual_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    approx = ivfpq_residual_topk(
        emb, num_queries=10, k=5, num_clusters=16, nprobe=6, m=8,
        n_codes=256, refine=5,
    ).localCheckpoint(eager=True)
    margins = ann_recall_margins(emb, approx, num_queries=10, k=5, epsilon=0.05)
    report = {
        r["query_id"]: r
        for r in ann_recall_report(
            emb, approx, num_queries=10, k=5, epsilon=0.05,
            recall_floor=0.6, margin_floor=0.01,
        ).collect()
    }
    assert set(report) == set(margins)
    for qid, m in margins.items():
        assert report[qid]["recall_margin_ok"] == (m >= 0.01 - 1e-12), (qid, m)
        assert report[qid]["margin_floor"] == 0.01
    strict = ann_recall_report(
        emb, approx, num_queries=10, k=5, epsilon=0.05,
        recall_floor=0.6, margin_floor=10.0,
    )
    assert strict.filter(F.col("recall_margin_ok")).count() == 0


def test_embedding_ann_bucket_guard_bounds_degenerate_corpus(spark):
    """VERDICT r7 #2: 1k identical vectors pile into ONE bucket per
    table — unguarded pair work is N²/2 ≈ 500k. The md5-salt split must
    bound emitted pairs to ~num_tables·N·cap/2, report the oversize via
    bucket stats, and still let connected components reunite the whole
    clique into ONE cluster (the split permutation differs per table, so
    sub-cliques overlap)."""
    from wcdimportbot_spark.operators.curation import connected_components_star
    from wcdimportbot_spark.operators.similarity import (
        embedding_ann_bucket_stats,
        embedding_near_dup_ann,
    )

    n, cap, tables = 1000, 16, 8
    vec = [float((i * 37 + 11) % 97) / 97.0 for i in range(64)]
    emb = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<double>"
    )
    pairs = embedding_near_dup_ann(
        emb, threshold=0.9, max_bucket_size=cap
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    bound = tables * n * cap // 2 + n  # per-table N·cap/2, unioned
    assert 0 < n_pairs <= bound, (n_pairs, bound)
    assert n_pairs < (n * (n - 1) // 2) / 3  # far below the quadratic blowup

    stats = embedding_ann_bucket_stats(emb, max_bucket_size=cap).collect()
    assert len(stats) == tables  # one oversized bucket per table
    assert all(r["bucket_size"] == n and r["nsplit"] == 63 for r in stats)

    cc = connected_components_star(
        pairs.select("vec_a", "vec_b"), src="vec_a", dst="vec_b", max_iter=30
    )
    clusters = cc.groupBy("cluster_id").count().collect()
    assert len(clusters) == 1 and clusters[0]["count"] == n


def test_embedding_ann_guard_identity_under_cap(spark):
    """Buckets at or under the cap must produce byte-identical output to
    the unguarded operator (salt degenerates to 0)."""
    from wcdimportbot_spark.operators.similarity import embedding_near_dup_ann

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    guarded = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_near_dup_ann(emb, max_bucket_size=1024).collect()
    }
    unguarded = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_near_dup_ann(emb, max_bucket_size=None).collect()
    }
    assert guarded == unguarded and len(guarded) > 0


def test_semantic_dedup_keeps_centroid_closest_member(spark):
    """SemDeDup keep policy: within a cluster of mutually-similar
    vectors, exactly the member closest to the cluster centroid
    survives (ties broken toward the smaller id); dissimilar
    cluster-mates and members of other clusters are untouched."""
    from wcdimportbot_spark.operators.similarity import semantic_dedup

    base = [1.0] * 64
    tilt = [1.0] * 32 + [0.96] * 32       # same cluster, cosine ~0.9997 to base
    anti = [-1.0] * 64                     # opposite cluster
    emb = spark.createDataFrame(
        [(1, base), (2, base), (3, tilt), (9, anti)],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in semantic_dedup(emb, threshold=0.9).collect()}
    assert rows[1]["cluster"] == rows[2]["cluster"] == rows[3]["cluster"]
    assert rows[9]["cluster"] != rows[1]["cluster"]
    # 1,2,3 are pairwise >= 0.9-similar: only ONE survives — the
    # centroid-closest (1 and 2 tie at the top; smaller id wins)
    assert rows[1]["kept"] and not rows[2]["kept"] and not rows[3]["kept"]
    assert rows[9]["kept"]
    assert rows[1]["centroid_cosine"] >= rows[3]["centroid_cosine"]


def test_semantic_decontaminate_flags_paraphrase_neighbors(spark):
    """A train vector embedding-close to an eval vector is flagged even
    with zero lexical overlap; a train vector far from every eval vector
    is never flagged (it may or may not surface as a candidate — bucket
    collisions are allowed, contamination verdicts are not)."""
    from wcdimportbot_spark.operators.similarity import semantic_decontaminate

    ev = [1.0] * 64                        # id 0 -> eval (0 % 25 == 0)
    near = [1.0] * 32 + [0.9] * 32         # cosine ~0.999 to ev
    far = [1.0, -1.0] * 32                 # cosine 0 to ev
    emb = spark.createDataFrame(
        [(0, ev), (1, near), (2, far)], "vec_id long, embedding array<double>"
    )
    rows = {r["vec_id"]: r for r in semantic_decontaminate(emb, threshold=0.9).collect()}
    assert 0 not in rows, "eval vectors must never appear in the train report"
    assert rows[1]["contaminated"] and rows[1]["max_eval_cosine"] >= 0.99
    if 2 in rows:
        assert not rows[2]["contaminated"]


def test_gopher_rules_audit_vector(spark):
    """Gopher rule edge semantics: a clean 60-word doc passes all seven
    rules; a bullet-list doc trips the bullet-line rule; an
    ellipsis-heavy doc trips both the symbol-ratio and ellipsis-line
    rules; a short doc fails the word-count band. n_rules_failed counts
    exactly the tripped rules."""
    from wcdimportbot_spark.operators.text_analysis import gopher_rules

    clean = "the quick brown fox jumps over that lazy dog with style and be have to of " * 5
    bullets = "\n".join("- " + clean for _ in range(10))
    dots = " ".join(w + "..." for w in clean.split())
    short = "the cat and the hat have fun with that"
    docs = spark.createDataFrame(
        [(1, clean), (2, bullets), (3, dots), (4, short)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[1]["passes_gopher"] and rows[1]["n_rules_failed"] == 0
    assert rows[1]["stopword_hits"] >= 2 and rows[1]["alpha_word_ratio"] == 1.0
    assert rows[2]["bullet_line_ratio"] == 1.0 and not rows[2]["passes_gopher"]
    assert rows[3]["symbol_ratio"] > 0.1 and rows[3]["ellipsis_line_ratio"] == 1.0
    assert rows[3]["n_rules_failed"] >= 2
    assert rows[4]["n_words"] < 50 and not rows[4]["passes_gopher"]
    assert rows[4]["n_rules_failed"] == 1  # only the word-count band


def test_semantic_dedup_cluster_guard_bounds_pairs(spark):
    """The cluster-size guard reuses the md5 salt split: 600 identical
    vectors pile into ONE cluster; with cap 16 the pair stage runs per
    salt sub-clique instead of quadratically. All members tie on
    centroid cosine, so each sub-clique keeps exactly its min id —
    survivors collapse to ~one per sub-clique (far below 600) and the
    globally smallest id always survives."""
    from wcdimportbot_spark.operators.similarity import semantic_dedup

    vec = [0.5] * 64
    emb = spark.createDataFrame(
        [(i, vec) for i in range(600)], "vec_id long, embedding array<double>"
    )
    rows = semantic_dedup(emb, threshold=0.9, max_cluster_size=16).collect()
    kept = sorted(r["vec_id"] for r in rows if r["kept"])
    assert len(rows) == 600
    # every doc ties on centroid_cosine, so within each salt sub-clique
    # only its min id survives: survivors = one per sub-clique
    assert 0 < len(kept) <= 600 // 16 + 2
    assert kept[0] == 0


def test_linear_quality_classifier_feature_algebra(spark):
    """The fastText-shaped gate: n_features = unigrams + bigrams
    (2n-1 for an n-token doc), empty docs get the neutral 0.5 score,
    and the score is the sigmoid of the mean hashed-feature weight."""
    import math

    from wcdimportbot_spark.operators.text_analysis import (
        hashed_feature_weights,
        linear_quality_classifier,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "alpha")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in linear_quality_classifier(docs).collect()}
    assert rows[1]["n_features"] == 5  # 3 unigrams + 2 bigrams
    assert rows[3]["n_features"] == 1
    assert rows[2]["n_features"] == 0
    assert rows[2]["logit"] == 0.0 and rows[2]["score"] == 0.5 and rows[2]["keep"]
    for r in rows.values():
        assert abs(r["score"] - round(1 / (1 + math.exp(-r["logit"])), 4)) <= 1e-4
    # the weight relation is the swap-in point for a trained vector
    w = hashed_feature_weights(spark, dims=64).collect()
    assert len(w) == 64 and all(-1.0 <= r["w"] <= 1.0 for r in w)


def test_dedup_index_compaction_preserves_probe_results(spark, tmp_path):
    """After several ingest batches the index stores fragment (one file
    per touched bucket per batch); compact_dedup_index rewrites them to
    one file per partition and the NEXT probe annotates identically."""
    import os

    from wcdimportbot_spark.operators.text_dedup import (
        compact_dedup_index,
        dedup_index_ingest,
        dedup_index_probe,
    )

    store = str(tmp_path / "dedup_index")
    schema = "doc_id long, text string"
    words = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    ).split()
    for batch in range(3):
        rows = [
            (
                batch * 1000 + i,
                " ".join(
                    words[(batch * 7 + i * 3 + j * (1 + i % 5)) % len(words)]
                    for j in range(12)
                )
                + f" tail{batch} t{i}",
            )
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, schema).repartition(8)
        dedup_index_ingest(df, store)

    probe_batch = spark.createDataFrame(
        [
            (
                999,  # exact dup of batch-0 doc i=3
                " ".join(
                    words[(0 * 7 + 3 * 3 + j * (1 + 3 % 5)) % len(words)]
                    for j in range(12)
                )
                + " tail0 t3",
            ),
            (998, "entirely novel content words not seen in any ingest batch"),
        ],
        schema,
    )
    before, _ = dedup_index_probe(probe_batch, store)
    before_rows = sorted(tuple(r) for r in before.collect())

    def n_files(sub):
        base = os.path.join(store, sub)
        from wcdimportbot_spark.operators import versioned

        d = versioned.data_dir(base)
        return sum(
            1
            for root, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    frag = n_files("hashes") + n_files("bands")
    res = compact_dedup_index(spark, store)
    assert (
        res["hashes"]["compacted_partitions"] > 0
        or res["bands"]["compacted_partitions"] > 0
    )
    assert n_files("hashes") + n_files("bands") < frag

    after, _ = dedup_index_probe(probe_batch, store)
    assert sorted(tuple(r) for r in after.collect()) == before_rows

    # compaction preserved the bands store's hash attribution: the
    # delete path (which prunes band rows BY text_hash) still works on
    # the compacted index — forget one ingested doc, re-probe it fresh
    from wcdimportbot_spark.operators.text_dedup import dedup_index_delete

    assert after.filter("doc_id = 999 AND exact_dup_of_history").count() == 1
    h = after.filter("doc_id = 999").collect()[0]["text_hash"]
    res_d = dedup_index_delete(
        spark.createDataFrame([(h,)], "text_hash string"), store
    )
    assert res_d["hashes_deleted"] == 1 and res_d["bands_deleted"] == 4
    re_probe, _ = dedup_index_probe(probe_batch, store)
    assert (
        re_probe.filter(
            "doc_id = 999 AND NOT exact_dup_of_history AND fresh"
        ).count()
        == 1
    )


# --- maintained versioned ANN index store (r8 verdict #1) ---------------


def test_ann_store_build_probe_matches_unpruned_scan(spark, sf_dir, tmp_path):
    """Store fidelity + pruning harmlessness: probing the MAINTAINED
    store (model + codes read back from parquet, probed clusters pushed
    down as a partition filter) returns exactly what the same residual
    ADC scan computes over the UNPRUNED stored codes — the store
    roundtrip loses nothing and the partition cut only skips clusters
    no query probes."""
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        ann_index_probe,
        load_ann_model,
        read_ann_codes,
    )
    from wcdimportbot_spark.operators.similarity import ivfpq_residual_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = str(tmp_path / "ann")
    ann_index_build(emb, base)
    got = sorted(
        tuple(r)
        for r in ann_index_probe(emb, base, num_queries=10, k=5).collect()
    )
    cent, books, _meta = load_ann_model(spark, base)
    codes = read_ann_codes(spark, base)
    assigned = emb.join(codes.select("vec_id", "cluster"), "vec_id")
    want = sorted(
        tuple(r)
        for r in ivfpq_residual_topk(
            emb,
            num_queries=10,
            k=5,
            ivf=(assigned, [list(c) for c in cent]),
            rindex=(codes, books),
        ).collect()
    )
    assert got == want and len(got) == 50


def test_ann_store_add_batch_frozen_model_and_idempotence(spark, sf_dir, tmp_path):
    """The incremental loop: build on 2/3, add 1/3 — the store ends
    complete; added vectors are assigned to the NEAREST FROZEN centroid
    (argmin L2, the k-means rule — verified against numpy); replaying
    the add batch is a no-op (insert-if-absent), and the superseded
    snapshot stays readable (time travel within the prune window)."""
    import numpy as np
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_add_batch,
        ann_index_build,
        ann_index_stats,
        load_ann_model,
        read_ann_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    base = str(tmp_path / "ann")
    built = ann_index_build(emb.filter(F.col("vec_id") % 3 != 2), base)
    r1 = ann_index_add_batch(emb.filter(F.col("vec_id") % 3 == 2), base)
    assert r1["added"] == n - built["n_built"] and r1["skipped"] == 0
    assert read_ann_codes(spark, base).count() == n

    # frozen-model assignment: every added vector sits in its nearest
    # stored centroid's partition
    cent, _books, _meta = load_ann_model(spark, base)
    added = (
        read_ann_codes(spark, base)
        .join(emb, "vec_id")
        .filter(F.col("vec_id") % 3 == 2)
        .select("vec_id", "cluster", "embedding")
        .limit(50)
        .collect()
    )
    for r in added:
        x = np.asarray(r["embedding"], dtype=np.float64)
        want = int(((cent - x) ** 2).sum(axis=1).argmin())
        assert r["cluster"] == want

    # idempotent replay + retained history
    import os

    codes_path = os.path.join(base, "codes")
    before = versioned.current_version(codes_path)
    r2 = ann_index_add_batch(emb.filter(F.col("vec_id") % 3 == 2), base)
    assert r2["added"] == 0 and r2["skipped"] == r1["added"]
    assert versioned.current_version(codes_path) == before  # no-op publish
    assert len(versioned.list_versions(codes_path)) >= 2  # history retained

    stats = ann_index_stats(spark, base).collect()
    assert sum(r["n_vectors"] for r in stats) == n
    assert all(abs(r["growth_ratio"] - n / built["n_built"]) < 0.01 for r in stats)


def test_ann_store_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The cluster-partitioned codes store turns the probed-cluster set
    into a PartitionFilter: the probe's scan plan must carry it, and the
    codes side of the ADC join must be broadcast-joined (no Exchange on
    the stored corpus side)."""
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        ann_index_probe,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = str(tmp_path / "ann")
    ann_index_build(emb, base)
    plan = ann_index_probe(
        emb, base, num_queries=10, k=5, nprobe=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan.replace("  ", " ") or (
        "PartitionFilters" in plan and "cluster#" in plan.split("PartitionFilters", 1)[1][:200]
    ), plan[:2000]


def test_semantic_dedup_degenerate_cluster_bound_and_stats(spark):
    """r8 verdict #6 — 2k near-identical vectors pile into ONE semantic
    cluster: the salt-split cap bounds pair work, the survivors are
    bounded by the documented cross-salt trade (at most ~nsplit keepers
    from one clique: one per salt shard — NOT the unguarded single
    keeper, and NOT thousands), and semantic_dedup_cluster_stats
    reports exactly what was forgone (no silent caps)."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_cluster_stats,
    )

    n, cap = 2000, 256
    base = [float((i * 29 + 7) % 83) / 83.0 + 0.5 for i in range(64)]
    emb = spark.createDataFrame(
        [(i, base) for i in range(n)], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(
        emb, threshold=0.9, max_cluster_size=cap
    ).localCheckpoint(eager=True)
    assert out.count() == n  # annotation form: every vector verdicted
    kept = out.filter(F.col("kept")).count()
    nsplit = -(-n // cap)  # ceil
    # identical vectors tie on centroid_cosine -> within each salt shard
    # the smallest id wins; across shards each keeps its own winner
    assert 1 <= kept <= nsplit, (kept, nsplit)

    stats = semantic_dedup_cluster_stats(emb, max_cluster_size=cap).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s["cluster_size"] == n and s["nsplit"] == nsplit
    assert s["uncapped_pairs"] == n * (n - 1) // 2
    assert s["forgone_pairs"] == s["uncapped_pairs"] - s["capped_pairs_bound"]
    assert s["forgone_pairs"] > 0

    # healthy corpora: the guard is a no-op and the stats are empty
    small = spark.createDataFrame(
        [(i, base) for i in range(10)], "vec_id long, embedding array<double>"
    )
    assert semantic_dedup_cluster_stats(small, max_cluster_size=cap).count() == 0


def test_ann_retrain_loop_staleness_and_snapshot_isolation(spark, sf_dir, tmp_path):
    """r9 verdict #2 — the staleness contract made executable: build on
    1/3 of the corpus, grow it 3x via add-batches (frozen, increasingly
    stale model), watch growth_ratio cross the documented ~2x retrain
    threshold, RETRAIN, and verify (a) a reader pinned to the
    pre-retrain codes snapshot finishes its scan (snapshot isolation via
    the age-based retention floor), (b) the retrained store is
    bit-identical to a fresh build over the same corpus (same seed/
    hyperparams read from meta), (c) growth_ratio resets to ~1 and meta
    records the lineage."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        ann_index_stats,
        ann_retrain,
        load_ann_model,
        read_ann_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    base = str(tmp_path / "ann")
    built = ann_index_build(emb.filter(F.col("vec_id") % 3 == 0), base)
    from wcdimportbot_spark.operators.ann_store import ann_index_add_batch

    ann_index_add_batch(emb.filter(F.col("vec_id") % 3 == 1), base)
    ann_index_add_batch(emb.filter(F.col("vec_id") % 3 == 2), base)

    stats = ann_index_stats(spark, base).collect()
    growth = stats[0]["growth_ratio"]
    assert growth >= 2.0, growth  # the documented retrain signal fired
    old_model_version = versioned.current_version(f"{base}/model")

    # a reader resolves the PRE-retrain codes snapshot now...
    pinned = read_ann_codes(spark, base)

    retrained = ann_retrain(emb, base)
    assert retrained["n_built"] == n
    assert retrained["retrained_from"] == old_model_version

    # ...and still completes its scan after the retrain published new
    # versions of both stores (age floor keeps the superseded tree)
    assert pinned.count() == n

    # post-retrain serving state: growth ratio back to ~1, fresh-build
    # bit-parity (deterministic k-means/codebooks under the stored seed)
    stats2 = ann_index_stats(spark, base).collect()
    assert abs(stats2[0]["growth_ratio"] - 1.0) < 0.01
    fresh = str(tmp_path / "ann-fresh")
    ann_index_build(emb, fresh)

    def codes_set(b):
        return {
            (r["vec_id"], r["cluster"], tuple(r["codes"]))
            for r in read_ann_codes(spark, b).collect()
        }

    assert codes_set(base) == codes_set(fresh)
    _c, _b, meta = load_ann_model(spark, base)
    assert meta["n_built"] == n and meta["retrained_from"] == old_model_version


def test_ann_store_optimistic_protocol_takes_no_lock(spark, sf_dir, tmp_path):
    """r9 verdict #5 — the ANN store's writers work lock-free under
    protocol='optimistic': build, add-batch, idempotent replay, and
    retrain all commit through the rename arbiter. writer_lock is
    monkeypatched to explode, so ANY lock acquisition fails the test;
    content and idempotence are then verified through the normal read
    path (the shared-engine multi-process stress in test_versioned.py
    covers cross-process arbitration for this same code path)."""
    import pytest
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators import ann_store as ann

    def _boom(*a, **kw):
        raise AssertionError("optimistic ANN path took the writer lock")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    base = str(tmp_path / "ann-opt")
    mp = pytest.MonkeyPatch()
    mp.setattr(versioned, "writer_lock", _boom)
    try:
        ann.ann_index_build(
            emb.filter(F.col("vec_id") % 3 != 2), base, protocol="optimistic"
        )
        r1 = ann.ann_index_add_batch(
            emb.filter(F.col("vec_id") % 3 == 2), base, protocol="optimistic"
        )
        assert r1["added"] > 0 and r1["skipped"] == 0
        r2 = ann.ann_index_add_batch(  # replay: idempotent no-op
            emb.filter(F.col("vec_id") % 3 == 2), base, protocol="optimistic"
        )
        assert r2["added"] == 0 and r2["skipped"] == r1["added"]
        # upsert composes lock-free too (pruned delete + add, both
        # through the rename arbiter)
        r3 = ann.ann_index_upsert(
            emb.filter(F.col("vec_id") < 4).select(
                "vec_id",
                F.transform("embedding", lambda x: -x).alias("embedding"),
            ),
            base,
            protocol="optimistic",
        )
        assert r3 == {"updated": 4, "added": 4, "skipped": 0}
        ann.ann_retrain(emb, base, protocol="optimistic")
    finally:
        mp.undo()
    assert ann.read_ann_codes(spark, base).count() == n
    import os

    for sub in ("model", "codes"):
        assert not os.path.exists(
            os.path.join(base, sub, versioned.LOCK_FILE)
        )


def test_ann_codes_compaction_folds_appended_files(spark, sf_dir, tmp_path):
    """Append-only add-batches grow one file per touched cluster per
    batch; compact_ann_codes (and the gate's compact_every inline form)
    folds them back to one sorted file per cluster — content and probe
    results byte-identical, file count flat. The operational companion
    the O(batch) write contract relies on."""
    import os

    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        ann_index_probe,
        compact_ann_codes,
        read_ann_codes,
    )
    from wcdimportbot_spark.streaming.ann_gate import ann_ingest_batch_fn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = str(tmp_path / "ann")
    ann_index_build(emb.filter(F.col("vec_id") % 4 == 0), base)

    def n_files():
        d = versioned.data_dir(os.path.join(base, "codes"))
        return sum(
            1
            for root, _d, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    base_files = n_files()
    # three micro-batches through the gate, compaction inline every 2nd
    fn = ann_ingest_batch_fn(base, compact_every=2)
    for i, rem in enumerate((1, 2, 3)):
        fn(emb.filter(F.col("vec_id") % 4 == rem), i)
    before = {
        (r["vec_id"], r["cluster"], tuple(r["codes"]))
        for r in read_ann_codes(spark, base).collect()
    }
    assert len(before) == emb.count()
    # batch_id=2 did not trigger inline compaction (2 % 2 != 1): files
    # accumulated past the compact floor; one explicit pass folds them
    out = compact_ann_codes(spark, base)
    assert out["compacted_partitions"] > 0
    assert n_files() <= base_files
    after = {
        (r["vec_id"], r["cluster"], tuple(r["codes"]))
        for r in read_ann_codes(spark, base).collect()
    }
    assert after == before  # read-only content change
    # compacting an already-compact store publishes nothing
    assert compact_ann_codes(spark, base) == {
        "compacted_partitions": 0,
        "files_before": 0,
    }
    # probes serve the compacted store identically
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_index_probe(emb, base, num_queries=5, k=3).collect()
    }
    assert len(got) == 15


def test_incremental_dedup_probe_never_shuffles_the_store(spark, tmp_path):
    """Round-10 join-side inversion, plan-pinned: the index probe runs
    as TWO LeftSemi broadcast joins per store (store LEFT-SEMI
    broadcast(batch keys), then batch LEFT-SEMI broadcast(matched
    keys)), so the corpus-scale store is only ever a streamed scan —
    never the build side it cannot be at 100 TB, never under a
    SortMergeJoin that would shuffle it per micro-batch. A reversion to
    the single batch-LEFT-SEMI-store join halves the LeftSemi count and
    fails here even though AQE hides it locally by broadcasting the
    tiny test store."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.text_dedup import (
        dedup_index_ingest,
        incremental_dedup,
        read_dedup_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    base = str(tmp_path / "idx")
    dedup_index_ingest(docs.filter(F.col("doc_id") % 2 == 0), base)
    h, b = read_dedup_index(spark, base)
    ann = incremental_dedup(docs.filter(F.col("doc_id") % 50 == 1), h, b)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert plan.count("LeftSemi") == 4, plan[:1500]


def test_ann_pair_probe_survives_model_only_publish(spark, sf_dir, tmp_path):
    """r10 ADVICE (medium #1): model and codes are separate versioned
    stores, so a probe racing a retrain could pair the NEW centroids
    with OLD codes (residuals decoded against the wrong centroids).
    The codes snapshot's _MODEL_VERSION stamp closes the window: after
    a model-only publish (exactly the crash/race window mid-retrain),
    the probe must still load the STAMPED v1 model and return identical
    results — never the fresh model."""
    import numpy as np

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.ann_store import (
        _model_path,
        _populate_model,
        ann_index_build,
        ann_index_probe,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = str(tmp_path / "ann")
    built = ann_index_build(emb, base)
    assert built["model_version"] == "v00000001"
    before = sorted(
        tuple(r)
        for r in ann_index_probe(emb, base, num_queries=5, k=3).collect()
    )
    # model-only publish: garbage centroids/codebooks as model v2 (the
    # state between a retrain's two publishes, or its crash window)
    meta = {k: built[k] for k in ("num_clusters", "m", "n_codes", "subdim", "dim", "seed")}
    meta["n_built"] = 1
    garbage_cent = np.zeros((meta["num_clusters"], meta["dim"]))
    garbage_books = np.zeros((meta["m"], meta["n_codes"], meta["subdim"]))
    mpath = _model_path(base)
    with versioned.writer_lock(mpath):
        version, vdir = versioned.stage_new(mpath)
        _populate_model(vdir, garbage_cent, garbage_books, meta)
        versioned.publish(mpath, version)
    assert versioned.current_version(mpath) == "v00000002"
    after = sorted(
        tuple(r)
        for r in ann_index_probe(emb, base, num_queries=5, k=3).collect()
    )
    assert after == before, "probe paired fresh model with old codes"


def test_ann_add_batch_reencodes_after_retrain_race(spark, sf_dir, tmp_path, monkeypatch):
    """r10 ADVICE (medium #2): a retrain publishing between an
    add-batch's model load and its merge must force a RE-ENCODE — the
    optimistic rebase alone re-runs only the anti-join, so without the
    stamp guard the stale-cluster codes would merge and be pinned
    forever by insert-if-absent. Simulated deterministically: the first
    encode triggers a full retrain mid-call; the guard must reject the
    stale batch, and the retry's codes must match a reference encode
    under the NEW model."""
    from wcdimportbot_spark.operators import ann_store
    from wcdimportbot_spark.operators.ann_store import (
        _codes_path,
        _encode_with_model,
        _read_model_stamp,
        ann_index_add_batch,
        ann_index_build,
        ann_retrain,
        load_ann_model,
        read_ann_codes,
    )
    from wcdimportbot_spark.operators import versioned
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 3 == 0)
    batch = emb.filter(F.col("vec_id") % 3 != 0)
    base = str(tmp_path / "ann")
    ann_index_build(first, base)

    calls = {"n": 0}
    real_encode = _encode_with_model

    def racing_encode(vecs, cent, books, id_col, vec_col):
        calls["n"] += 1
        out = real_encode(vecs, cent, books, id_col, vec_col)
        if calls["n"] == 1:
            # the concurrent retrain, landing between model load & merge
            ann_retrain(first, base)
        return out

    monkeypatch.setattr(ann_store, "_encode_with_model", racing_encode)
    res = ann_index_add_batch(batch, base)
    assert calls["n"] == 2, "stale batch must be re-encoded, not rebased"
    assert res["added"] == batch.count()
    # stored codes for the batch == a reference encode under the NEW model
    mv = versioned.current_version(ann_store._model_path(base))
    stamp = _read_model_stamp(versioned.data_dir(_codes_path(base)))
    assert stamp == mv == "v00000002"
    cent, books, _meta = load_ann_model(spark, base, version=mv)
    want = {
        (r["vec_id"], r["cluster"], tuple(r["codes"]))
        for r in real_encode(batch, cent, books, "vec_id", "embedding").collect()
    }
    got = {
        (r["vec_id"], r["cluster"], tuple(r["codes"]))
        for r in read_ann_codes(spark, base)
        .join(batch.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    assert got == want, "merged codes are not the new-model encoding"


def test_ann_delete_staleness_flags_and_retrain_recovers(spark, tmp_path):
    """r11 verdict Next #4: growth_ratio only ever flagged GROWTH — an
    index whose store shrank under ann_index_delete never looked stale
    even with centroids fitted on mostly-gone data. drift_ratio =
    max(ratio, 1/ratio) flips past the ~2x trigger after deleting ~2/3,
    and the retrain-on-remaining-corpus resets it to ~1 with the margin
    contract green."""
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        ann_index_delete,
        ann_index_probe,
        ann_index_stats,
        ann_retrain,
    )
    from wcdimportbot_spark.operators.similarity import ann_recall_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = str(tmp_path / "ann")
    ann_index_build(emb, base)
    st0 = ann_index_stats(spark, base).first()
    assert abs(st0["drift_ratio"] - 1.0) < 0.01

    doomed = emb.filter(
        (F.col("vec_id") % 3 != 0) & (F.col("vec_id") >= 10)
    ).select("vec_id")
    ann_index_delete(doomed, base)
    st1 = ann_index_stats(spark, base).first()
    assert st1["growth_ratio"] < 0.5  # the old trigger saw "shrink = fine"
    assert st1["drift_ratio"] >= 2.0  # the symmetric one flags it

    remaining = emb.join(F.broadcast(doomed), "vec_id", "left_anti")
    ann_retrain(remaining.localCheckpoint(eager=True), base)
    st2 = ann_index_stats(spark, base).first()
    assert abs(st2["drift_ratio"] - 1.0) < 0.01

    approx = ann_index_probe(
        emb, base, num_queries=10, k=5, nprobe=8, refine=10
    )
    report = ann_recall_report(
        remaining,
        approx,
        num_queries=10,
        k=5,
        epsilon=0.05,
        recall_floor=0.6,
        margin_floor=0.01,
    ).collect()
    assert report and all(r["recall_within_tolerance"] for r in report)
    assert all(r["recall_margin_ok"] for r in report)


def test_ann_store_upsert_replaces_changed_vectors(spark, sf_dir, tmp_path):
    """Re-crawl refresh at the ANN layer: add_batch is insert-if-absent,
    so a changed embedding for a stored vec_id was silently dropped —
    ann_index_upsert replaces it (delete matched + re-encode + add),
    the new row lands in the cluster the NEW content belongs to, and
    the store never holds two rows of one id."""
    import numpy as np
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.ann_store import (
        ann_index_add_batch,
        ann_index_build,
        ann_index_upsert,
        load_ann_model,
        read_ann_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    base = str(tmp_path / "ann")
    ann_index_build(emb, base)

    # the refresh batch: 8 stored ids with NEGATED embeddings (far from
    # the originals) + 2 brand-new ids carrying existing-vector content
    changed = emb.filter(F.col("vec_id") < 8).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    novel = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 10)
    ).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    batch = changed.unionByName(novel)

    before = {
        r["vec_id"]: r
        for r in read_ann_codes(spark, base)
        .filter(F.col("vec_id") < 8)
        .collect()
    }

    # the changed-content hazard: add_batch's insert-if-absent probe is
    # cluster-pruned, so a changed vector whose nearest centroid MOVED
    # is inserted NEXT TO its stale row — the store serves two versions
    r0 = ann_index_add_batch(changed, base)
    assert r0["added"] + r0["skipped"] == 8
    assert r0["added"] > 0  # negation moved some vectors across clusters
    dup_ids = (
        read_ann_codes(spark, base)
        .groupBy("vec_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_ids == r0["added"]

    # upsert replaces the 8 (healing the duplicated ids) + inserts the 2
    res = ann_index_upsert(batch, base)
    assert res == {"updated": 8, "added": 10, "skipped": 0}

    codes = read_ann_codes(spark, base)
    assert codes.count() == n + 2  # replacements in place, novels added
    after = {
        r["vec_id"]: r
        for r in codes.filter(F.col("vec_id") < 8).collect()
    }
    assert len(after) == 8  # exactly one row per replaced id store-wide
    # every replaced row re-encoded: nearest-centroid cluster of the
    # NEGATED vector, verified against the stored model numpy-side
    cent, _books, _meta = load_ann_model(spark, base)
    emb_map = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id") < 8).collect()
    }
    moved = 0
    for vid, row in after.items():
        want = int(((cent - (-emb_map[vid])) ** 2).sum(axis=1).argmin())
        assert row["cluster"] == want
        moved += row["cluster"] != before[vid]["cluster"]
    assert moved > 0  # negation moved at least one vector across clusters

    # upsert replay converges: same batch again — all 10 now matched,
    # replaced in place, still one row per id
    res2 = ann_index_upsert(batch, base)
    assert res2 == {"updated": 10, "added": 10, "skipped": 0}
    assert read_ann_codes(spark, base).count() == n + 2
    dupes = (
        read_ann_codes(spark, base)
        .groupBy("vec_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dupes == 0


def test_ann_store_lifecycle_composition_preserves_model_stamp(
    spark, sf_dir, tmp_path
):
    """The ANN analog of the graph stores' maintenance-composition
    contract: build -> add -> upsert -> delete -> compact in sequence on
    ONE store must carry the codes snapshots' _MODEL_VERSION stamp
    through every engine (a compaction or delete that dropped it would
    silently degrade the staleness guard and load_ann_pair to the
    unverified current-of-each pairing), and retrain must advance it."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.ann_store import (
        _codes_path,
        _read_model_stamp,
        ann_index_add_batch,
        ann_index_build,
        ann_index_delete,
        ann_index_upsert,
        ann_retrain,
        compact_ann_codes,
        read_ann_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = str(tmp_path / "ann")
    cpath = _codes_path(base)

    def stamp():
        return _read_model_stamp(versioned.data_dir(cpath))

    ann_index_build(emb.filter(F.col("vec_id") % 2 == 0), base)
    v1 = stamp()
    assert v1 is not None

    ann_index_add_batch(emb.filter(F.col("vec_id") % 2 == 1), base)
    assert stamp() == v1
    ann_index_upsert(
        emb.filter(F.col("vec_id") < 4).select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        ),
        base,
    )
    assert stamp() == v1
    ann_index_delete(
        emb.filter(F.col("vec_id") % 9 == 7).select("vec_id"), base
    )
    assert stamp() == v1
    compact_ann_codes(spark, base)
    assert stamp() == v1

    n_left = read_ann_codes(spark, base).count()
    assert n_left == emb.count() - emb.filter(F.col("vec_id") % 9 == 7).count()

    ann_retrain(emb, base)
    v2 = stamp()
    assert v2 is not None and v2 != v1  # retrain republished the pair



def test_dedup_index_split_bucket_composes_with_loop(spark, sf_dir, tmp_path):
    """Extendible-hashing split on the dedup index's hashes store: the
    fanout lever that keeps a k-hash purge's write fraction at
    min(k,B)/B as the index grows. Split one bucket, then prove the
    whole maintenance loop still re-derives buckets under the split
    map: a later ingest batch merges, a re-sent doc probes as exact
    dup, and a delete through the split map makes it fresh again."""
    import os

    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import sinks
    from wcdimportbot_spark.operators.text_dedup import (
        dedup_index_delete,
        dedup_index_ingest,
        dedup_index_probe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    base = str(tmp_path / "ix")
    dedup_index_ingest(b1, base)
    hpath = os.path.join(base, "hashes")

    pre = {
        r["text_hash"]
        for r in sinks.read_snapshot(spark, hpath).select("text_hash").collect()
    }
    info = sinks.split_bucket(
        spark, hpath, 3, key="text_hash", partitions=[sinks.BUCKET_COL]
    )
    assert info["children"] == [3, 19] and info["depth"] == 1
    post = {
        r["text_hash"]
        for r in sinks.read_snapshot(spark, hpath).select("text_hash").collect()
    }
    assert post == pre  # split moved rows, lost none
    # every child row routes to the bucket the split map derives
    import json

    bm = json.load(
        open(os.path.join(sinks.versioned.data_dir(hpath), "_BUCKETS.json"))
    )
    leaves = {int(k): v for k, v in bm["leaves"].items()}
    routed = (
        sinks.read_snapshot(spark, hpath)
        .withColumnRenamed(sinks.BUCKET_COL, "stored_hb")
        .join(
            sinks.with_bucket(
                spark.createDataFrame([(h,) for h in post], "text_hash string"),
                "text_hash",
                leaves=leaves,
            ),
            "text_hash",
        )
        .filter(F.col("stored_hb") != F.col(sinks.BUCKET_COL))
        .count()
    )
    assert routed == 0

    # the loop composes through the split map
    dedup_index_ingest(b2, base)
    re_probe, _ = dedup_index_probe(b1.orderBy("doc_id").limit(10), base)
    assert re_probe.filter("exact_dup_of_history").count() == 10
    h = re_probe.orderBy("doc_id").limit(1).collect()[0]["text_hash"]
    res = dedup_index_delete(
        spark.createDataFrame([(h,)], "text_hash string"), base
    )
    assert res["hashes_deleted"] == 1
    re2, _ = dedup_index_probe(b1.orderBy("doc_id").limit(10), base)
    assert re2.filter("exact_dup_of_history").count() == 9


def test_dedup_index_params_sidecar(spark, tmp_path):
    """_INDEX.json (writer-property sidecar): the signature parameters
    are recorded on first merge; probe and delete resolve them from the
    store instead of trusting caller guesses (a delete under a smaller
    bands count would leave hash#k fingerprints on disk — breaking the
    purge-completeness contract); a merge under different parameters
    fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import sinks
    from wcdimportbot_spark.operators.text_dedup import (
        _index_params,
        dedup_index_delete,
        dedup_index_ingest,
    )

    base = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words about catalyst optimizer plans"),
        ],
        "doc_id long, text string",
    )
    dedup_index_ingest(docs, base, num_hashes=16, bands=8)
    assert _index_params(base) == {
        "num_hashes": 16,
        "bands": 8,
        "shingle_n": 3,
    }
    bands_store = sinks.read_snapshot(spark, base + "/bands")
    h1 = bands_store.select("text_hash").distinct().collect()
    assert len(h1) == 2

    # ingest with DRIFTED args self-heals: the sidecar wins, so doc 3's
    # band rows land under the recorded bands=8 (not the caller's 4)
    dedup_index_ingest(
        spark.createDataFrame(
            [(3, "some entirely novel text about something else whatever")],
            "doc_id long, text string",
        ),
        base,
        num_hashes=8,
        bands=4,
    )
    import hashlib

    h3 = hashlib.md5(
        b"some entirely novel text about something else whatever"
    ).hexdigest()
    assert (
        sinks.read_snapshot(spark, base + "/bands")
        .filter(F.col("text_hash") == h3)
        .count()
        == 8
    )
    # a DIRECT merge under drifted parameters (bypassing the ingest's
    # resolution) fails loudly instead of interleaving two schemes
    from wcdimportbot_spark.operators.text_dedup import dedup_index_merge

    with pytest.raises(ValueError, match="was built with"):
        dedup_index_merge(
            spark.createDataFrame([(4, "more text")],
                                  "doc_id long, text string"),
            base,
            num_hashes=8,
            bands=4,
        )

    # delete with the DEFAULT bands=4: the sidecar (bands=8) wins, so
    # every hash#0..hash#7 row leaves — none left behind
    import hashlib

    h = hashlib.md5(
        b"the quick brown fox jumps over the lazy dog today"
    ).hexdigest()
    res = dedup_index_delete(
        spark.createDataFrame([(h,)], "text_hash string"), base
    )
    assert res == {"hashes_deleted": 1, "bands_deleted": 8}
    left = sinks.read_snapshot(spark, base + "/bands")
    assert left.filter(F.col("text_hash") == h).count() == 0


def test_ann_delete_resolve_scan_is_column_pruned(spark, sf_dir, tmp_path):
    """The delete's in-window resolve (r15 epoch bracket) advertises a
    column-pruned scan: the codes relation carries a corpus-scale
    ``codes array<int>`` payload per row, and the resolve must read
    ONLY ``vec_id`` from file bytes (``cluster`` is the partition
    column — directory metadata, not data pages) broadcast-semi-joined
    against the id set. Pin both properties so a future reader change
    cannot silently drag the code arrays through the purge path."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        read_ann_codes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = str(tmp_path / "ann")
    ann_index_build(emb, base, num_clusters=4, m=4, n_codes=8)
    ids = spark.range(0, 4).withColumnRenamed("id", "vec_id")
    resolve = (
        read_ann_codes(spark, base)
        .select("vec_id", "cluster")
        .join(F.broadcast(ids), "vec_id", "left_semi")
    )
    plan = resolve._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<vec_id:bigint>" in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
