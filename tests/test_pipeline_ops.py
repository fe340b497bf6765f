"""Unit tests for the training-data pipeline operators (hand-computed
goldens on tiny inputs; cross-engine parity is covered by the DuckDB gate
in scripts/check_correctness.py)."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "aa bb cc dd ee"),
        (2, "aa bb cc dd ee"),          # exact dup of 1
        (3, "aa bb cc dd ff"),          # near dup of 1 (4/6 shingle overlap?)
        (4, "zz yy xx ww vv"),          # unrelated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    from see_spark.operators.dedup import exact_dedup

    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert out[1]["group_size"] == 2 and out[2]["group_size"] == 2
    assert out[1]["is_canonical"] == 1 and out[2]["is_canonical"] == 0
    assert out[3]["group_size"] == 1 and out[3]["is_canonical"] == 1


def test_ngram_jaccard_exact_values(docs):
    from see_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    # doc1/doc2 identical -> jaccard 1.0; doc1/doc3 share 2 of 3 shingles
    # each (|A|=3, |B|=3, common=2) -> 2/4
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert pairs[(1, 3)] == pytest.approx(2 / 4)
    assert (1, 4) not in pairs


def test_ngram_jaccard_shingle_df_cap(spark):
    """The document-frequency cut drops ubiquitous shingles from the join
    AND the sizes: fan-out per shingle is bounded by max_shingle_df^2, and
    on a corpus whose near-dups share rare shingles the reported pair set
    is unchanged."""
    from see_spark.operators.dedup import ngram_jaccard_pairs

    # every doc shares the boilerplate bigram "boiler plate" (df=4)
    corpus = spark.createDataFrame(
        [
            (1, "boiler plate alpha beta gamma"),
            (2, "boiler plate alpha beta delta"),   # near dup of 1
            (3, "boiler plate zebra yak xylo"),
            (4, "boiler plate quark lepton muon"),
        ],
        "doc_id long, text string",
    )

    def pairset(**kw):
        return {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(
                corpus, n=2, threshold=0.5, **kw
            ).collect()
        }

    uncapped = pairset()
    assert uncapped == {(1, 2)}
    # cap=3 drops only "boiler plate" (df=4): same pairs survive
    assert pairset(max_shingle_df=3) == uncapped
    # cap=0 drops every shingle: the join is empty, not erroring
    assert pairset(max_shingle_df=0) == set()
    # consistency: capped jaccard is computed over the capped vocabulary
    # (d1: 3 of 4 shingles kept, 2 shared with d2 -> 2/(3+3-2) = 0.5)
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            corpus, n=2, threshold=0.5, max_shingle_df=3
        ).collect()
    }
    assert capped[(1, 2)] == pytest.approx(0.5)


def test_ivf_kmeans_centroids_move_and_recall(spark):
    """ivf_train_centroids: one Lloyd pass moves seeds to cluster means
    (deterministically), empty clusters keep their position, and trained
    IVF recall@k vs brute force stays high on a clustered corpus."""
    from see_spark.operators.similarity import (
        ivf_train_centroids,
        knn_bruteforce,
        knn_ivf,
    )

    # two tight clusters around +x and +y (integer vectors, exact means)
    vecs = spark.createDataFrame(
        [
            (0, [10, 0]), (1, [0, 10]),            # seeds (first-2 by id)
            (2, [8, 2]), (3, [12, 1]), (4, [9, 0]),
            (5, [1, 9]), (6, [0, 12]), (7, [2, 11]),
        ],
        "vec_id long, embedding array<long>",
    )
    cents = {
        r["centroid_id"]: r["cvec"]
        for r in ivf_train_centroids(
            vecs, 2, iters=1, vec_col="embedding"
        ).collect()
    }
    # cluster 0 = {0,2,3,4} -> mean (39/4, 3/4); cluster 1 = {1,5,6,7}
    assert cents[0] == pytest.approx([39 / 4, 3 / 4])
    assert cents[1] == pytest.approx([3 / 4, 42 / 4])

    q = spark.createDataFrame(
        [(0, [10, 1]), (1, [1, 10])], "query_id long, query_vec array<long>"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_bruteforce(vecs, q, k=4).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in knn_ivf(
            vecs, q, k=4, n_centroids=2, nprobe=1, train_iters=1
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall == 1.0  # clean clusters: nprobe=1 after training suffices


def test_embedding_lsh_pairs_subset_of_exact(spark):
    """Bucketed near-dup pairs are a subset of the all-pairs exact result
    (same threshold), and co-located identical vectors are always found
    (identical vectors share every sign bit)."""
    from see_spark.operators.dedup import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    rows = [
        (i, [((i % 4) + 1) * 100, ((i * 7) % 5) * 100 - 200, 300])
        for i in range(10)
    ]
    rows += [(100, [500, 500, 500]), (101, [500, 500, 500])]  # exact dups
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<long>")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(vecs, threshold=0.9).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_lsh(
            vecs, threshold=0.9, n_planes=4, dim=3
        ).collect()
    }
    assert lsh <= exact
    assert (100, 101) in lsh  # identical vectors share every sign bit


def test_minhash_lsh_finds_dups_and_verifies(docs):
    from see_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.4).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)  # identical docs always bucket together
    assert all(j >= 0.4 for j in pairs.values())  # exact verification holds


def test_simhash_pairs_equal_bruteforce_hamming(spark):
    """Pigeonhole exactness: banded simhash pairs == all-pairs Hamming
    filter (recall is provably 1.0 for max_hamming < bands, precision via
    the bit_count verify)."""
    from see_spark.operators.dedup import simhash, simhash_near_dup_pairs

    corpus = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff"),
            (2, "aa bb cc dd ee ff"),      # exact dup -> hamming 0
            (3, "aa bb cc dd ee gg"),      # near dup
            (4, "zz yy xx ww vv uu"),
            (5, "qq rr ss tt uu vv"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup_pairs(corpus, max_hamming=3).collect()
    }
    assert banded == brute
    assert any(h == 0 for _, _, h in banded)  # the exact dup was found


def test_simhash_identical_docs_equal_fingerprints(docs):
    from see_spark.operators.dedup import simhash

    out = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out[1] == out[2]
    assert out[1] != out[4]
    assert all(0 <= v < (1 << 48) for v in out.values())


def test_knn_bruteforce_self_is_rank1(spark):
    from see_spark.operators.similarity import knn_bruteforce

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    q = vecs.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = knn_bruteforce(vecs, q, k=3).collect()
    assert [r["vec_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["cosine"] == pytest.approx(1.0)


def test_knn_lsh_bucket_deterministic(spark):
    from see_spark.operators.similarity import lsh_bucket

    vecs = spark.createDataFrame(
        [(1, [1.0, -2.0, 3.0, 0.5])], "vec_id long, embedding array<double>"
    )
    b1 = vecs.select(lsh_bucket(F.col("embedding"), 4, 4).alias("b")).collect()[0]["b"]
    b2 = vecs.select(lsh_bucket(F.col("embedding"), 4, 4).alias("b")).collect()[0]["b"]
    assert b1 == b2 and 0 <= b1 < 16


def test_language_id_tiebreak_pinned(spark):
    from see_spark.operators.textstats import language_id

    d = spark.createDataFrame(
        [(1, "the of and to in is"), (2, "der und ist ein das die"),
         (3, "xxx yyy zzz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in language_id(d).collect()}
    assert out[1]["predicted_lang"] == "en"
    assert out[2]["predicted_lang"] == "de"
    # no stopword hits anywhere -> all-zero tie -> first language code wins
    assert out[3]["predicted_lang"] == "de" and out[3]["best_hits"] == 0


def test_quality_score_formula(spark):
    from see_spark.operators.textstats import quality_score

    d = spark.createDataFrame([(1, "the cat the cat")], "doc_id long, text string")
    r = quality_score(d).collect()[0]
    assert r["n_tokens"] == 4
    assert r["distinct_ratio"] == pytest.approx(0.5)  # 2 repeats of 4
    assert r["stop_ratio"] == pytest.approx(0.5)      # 'the' twice
    assert r["quality"] == pytest.approx((4 / 200) * 0.5 * (0.5 + 0.25))


def test_token_counts(spark):
    from see_spark.operators.textstats import token_counts

    d = spark.createDataFrame([(1, "ab1 c-2 ab1")], "doc_id long, text string")
    r = token_counts(d).collect()[0]
    assert r["ws_tokens"] == 3
    assert r["distinct_tokens"] == 2
    # ab|1, c|-|2, ab|1 -> 7 BPE-ish pieces
    assert r["bpe_ish_tokens"] == 7


def test_media_features_fake_decode_and_stub(spark):
    from see_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        media_from_documents,
    )

    d = spark.createDataFrame(
        [(0, "hello world", "src0"), (2, "x" * 100, "src2")],
        "doc_id long, text string, source string",
    )
    media = media_from_documents(d)
    feats = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert feats["0"]["n_bytes"] == 11
    assert sum(feats["0"]["byte_histogram"]) == 11
    # real decode of synthetic non-container bytes must fail honestly:
    # image kinds hit the container sniffer (PNG/GIF only), other kinds
    # the NotImplementedError stub
    with pytest.raises(
        Exception,
        match="NotImplementedError|imaging|unrecognized image container",
    ):
        extract_features(media, fake=False).collect()
    frames = frame_sample(media, every_n_bytes=50, stride=3).collect()
    # doc 2 is 'video' (2 % 3), 100 bytes -> frames 0..2 step 3 -> [0]
    assert [(r["media_id"], r["frame_no"]) for r in frames] == [("2", 0)]


def _make_wav(n_frames, rate=8000, n_channels=1, width=2, freq=440.0):
    """Synthesize a PCM WAV entirely with stdlib wave + numpy."""
    import io
    import wave

    import numpy as np

    t = np.arange(n_frames * n_channels, dtype="float64") / rate
    wave_f = np.sin(2 * np.pi * freq * t)
    if width == 1:
        samples = (wave_f * 100 + 128).astype("uint8")
    else:
        samples = (wave_f * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_audio_features_real_wav_decode(spark):
    """The HONEST media decode path: real WAV containers decode through
    the stdlib wave module inside mapInPandas; features must match a
    direct numpy computation on the source samples, and corrupt payloads
    must yield error rows, not job failure."""
    import numpy as np

    from see_spark.operators.multimodal import audio_features, decode_wav

    wav16, s16 = _make_wav(4000, rate=8000, width=2)
    wav8, s8 = _make_wav(1000, rate=4000, width=1)
    stereo, _ = _make_wav(600, rate=8000, n_channels=2, width=2)

    # kernel-level: decode returns the exact samples written
    decoded, rate = decode_wav(wav16)
    assert rate == 8000 and np.array_equal(decoded[:, 0], s16)

    media = spark.createDataFrame(
        [("a", wav16), ("b", wav8), ("c", stereo), ("bad", b"not a wav")],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}

    norm = s16.astype("float64") / 32768.0
    assert rows["a"]["n_channels"] == 1
    assert rows["a"]["sample_rate_hz"] == 8000
    assert rows["a"]["n_frames"] == 4000
    assert rows["a"]["duration_s"] == pytest.approx(0.5)
    assert rows["a"]["peak"] == pytest.approx(np.abs(norm).max())
    assert rows["a"]["rms"] == pytest.approx(np.sqrt((norm ** 2).mean()))
    assert rows["a"]["decode_error"] is None

    norm8 = (s8.astype("float64") - 128.0) / 128.0
    assert rows["b"]["sample_rate_hz"] == 4000
    assert rows["b"]["rms"] == pytest.approx(np.sqrt((norm8 ** 2).mean()))

    assert rows["c"]["n_channels"] == 2 and rows["c"]["n_frames"] == 600

    assert rows["bad"]["decode_error"] is not None
    assert rows["bad"]["n_frames"] is None


def test_extract_features_fake_false_decodes_real_wav(spark):
    """fake=False has one honest branch: RIFF audio payloads really decode
    and the byte stats run over the decoded PCM buffer."""
    import numpy as np

    from see_spark.operators.multimodal import extract_features

    wav16, s16 = _make_wav(500, rate=8000, width=2)
    media = spark.createDataFrame(
        [("a", "audio", wav16)], "media_id string, kind string, payload binary"
    )
    row = extract_features(media, fake=False).collect()[0]
    pcm_bytes = np.frombuffer(s16.tobytes(), dtype=np.uint8)
    assert row["n_bytes"] == len(pcm_bytes)
    assert row["byte_mean"] == pytest.approx(pcm_bytes.mean())
    assert row["byte_histogram"] == np.bincount(
        pcm_bytes % 16, minlength=16
    ).tolist()


def test_streaming_matches_batch(spark, tmp_path):
    """availableNow streamed tumbling counts == batch tumbling counts."""
    from see_spark.streaming.windows import stream_tumbling_counts, tumbling_counts

    ev = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:10:00", i % 2, "click", float(i)) for i in range(12)],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    events_dir = str(tmp_path / "events")
    ev.write.parquet(events_dir)
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(spark.read.parquet(events_dir)).collect()
    }
    streamed_df = stream_tumbling_counts(
        spark, events_dir, spark.read.parquet(events_dir).schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streamed_df.collect()
    }
    assert streamed == batch


def test_token_entropy_closed_forms(spark):
    """Uniform 4 distinct tokens -> exactly 2 bits (norm 1.0); all-same
    -> 0 bits with NULL norm; 'a a b b' -> 1 bit."""
    import math

    from see_spark.operators.textstats import token_entropy

    d = spark.createDataFrame(
        [(1, "w x y z"), (2, "s s s s s"), (3, "a a b b"),
         (4, "a a a b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(d).collect()}
    assert out[1]["entropy_bits"] == 2.0 and out[1]["norm_entropy"] == 1.0
    assert out[2]["entropy_bits"] == 0.0 and out[2]["norm_entropy"] is None
    assert out[3]["entropy_bits"] == 1.0
    # H(3/4, 1/4) = 2 - 0.75*log2(3)
    want = round(2 - 0.75 * math.log2(3), 6)
    assert out[4]["entropy_bits"] == want
    assert out[1]["n_tokens"] == 4 and out[1]["n_types"] == 4
    assert out[2]["n_types"] == 1
