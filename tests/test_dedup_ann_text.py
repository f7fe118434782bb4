"""Tests: dedup family, ANN (brute force + LSH recall), text analysis,
multimodal plumbing, streaming ingest."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.operators import ann, dedup, multimodal, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # plant exact + near duplicates with known ids
    d0 = base.filter(F.col("doc_id") == 0).select(F.col("text").alias("t")).first()["t"]
    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100001, 100002, 100003],
                "text": [
                    d0,                      # exact dup of doc 0
                    d0 + " tail",            # near dup of doc 0
                    "zzz completely unique standalone document qqq",
                ],
            }
        )
    )
    return base.unionByName(extra)


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).filter(F.col("n_docs") > 1).toPandas()
    clusters = {tuple(r.doc_ids) for r in out.itertuples()}
    assert any(0 in c and 100001 in c for c in clusters)
    # canonical is min id
    for r in out.itertuples():
        assert r.canonical_doc_id == min(r.doc_ids)


def test_minhash_lsh_finds_neardup(spark, docs):
    pairs = dedup.minhash_lsh(docs).toPandas()
    got = {(r.doc_a, r.doc_b) for r in pairs.itertuples()}
    assert (0, 100001) in got  # exact dup certainly collides
    assert (0, 100002) in got  # near dup (one appended token)
    assert all(p[0] < p[1] for p in got)


def test_simhash_exact_dups_equal(spark, docs):
    sh = dedup.simhash64(docs).toPandas()
    m = dict(zip(sh["doc_id"], sh["simhash"]))
    assert m[0] == m[100001]
    # near dup within small hamming distance
    ham = bin(int(m[0]) ^ int(m[100002])).count("1")
    assert ham <= 8
    # unique doc far away
    ham_u = bin(int(m[0]) ^ int(m[100003])).count("1")
    assert ham_u > 8


def test_ngram_jaccard_pairs(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, min_sim=0.5).toPandas()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.itertuples()}
    assert got.get((0, 100001)) == 1.0
    assert (0, 100002) in got


def test_ann_lsh_recall(spark):
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    probes = vecs.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    cands = vecs.select(F.col("vec_id").alias("cand_id"), "embedding")
    exact = ann.brute_force_topk(probes, cands, k=5)
    # this synthetic embedding table is weakly clustered (top-5 neighbor
    # cosine ~0.3), so use coarse buckets (4 planes) and 4 tables
    approx_all = ann.lsh_topk(vecs, k=5, n_planes=4, n_tables=4)
    approx = approx_all.filter(F.col("probe_id") < 30)
    r = ann.recall_at_k(approx, exact, k=5)
    assert r >= 0.2, f"LSH recall@5 too low: {r}"
    # recall grows with table count (the LSH quality knob)
    approx1 = ann.lsh_topk(vecs, k=5, n_planes=4, n_tables=1).filter(
        F.col("probe_id") < 30
    )
    assert ann.recall_at_k(approx1, exact, k=5) <= r + 1e-9
    # brute force is self-consistent: every probe has exactly 5 neighbors
    cnt = exact.groupBy("probe_id").count().toPandas()
    assert set(cnt["count"]) == {5}


def test_ann_lsh_topk_planted_recall(spark):
    """Planted-twin ground truth: each base vector gets a 0.05-noise twin
    (cosine ≈ 0.999). lsh_topk with 2 tables of 4 planes must recover ≥85%
    of the twins at rank 1 — the recall gate for the driver's ann_lsh_topk
    query parameters."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(80, 64))
    noise = base + 0.05 * rng.normal(size=(80, 64))
    vecs_np = np.vstack([base, noise]).astype("float32")
    rows = [(i, [float(x) for x in vecs_np[i]]) for i in range(160)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    approx = ann.lsh_topk(vecs, k=1, n_planes=4, dim=64, n_tables=2)
    got = {
        r.probe_id: r.cand_id
        for r in approx.filter(F.col("rnk") == 1).collect()
    }
    hits = sum(1 for p, c in got.items() if abs(p - c) == 80)
    assert hits / 160 >= 0.85, f"planted recall@1 {hits}/160"


def test_embedding_neardup_self(spark):
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # duplicate a vector under a new id → must be found at cosine 1.0
    dup = vecs.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    out = dedup.embedding_neardup(vecs.unionByName(dup), min_cosine=0.999)
    got = {(r.doc_a, r.doc_b) for r in out.toPandas().itertuples()}
    assert (7, 1_000_007) in got


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat and the dog sat in the house with the mouse",
                    "el perro y la casa de los gatos en la calle por la noche",
                    "qwerty zxcvb 12345",
                ],
            }
        )
    )
    out = text.lang_id(df).toPandas().set_index("doc_id")
    assert out.loc[1, "lang_guess"] == "en"
    assert out.loc[2, "lang_guess"] == "es"
    assert out.loc[3, "lang_guess"] == "und"

    q = text.quality_score(df).toPandas().set_index("doc_id")
    assert q.loc[1, "quality"] > q.loc[3, "quality"]

    tc = text.token_counts(df).toPandas().set_index("doc_id")
    assert tc.loc[1, "n_ws_tokens"] == 12
    assert tc.loc[3, "n_bpe_tokens"] == 3

    fp = text.fingerprint(df).toPandas()
    assert fp["fingerprint64"].nunique() == 3
    # order sensitivity
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["dog the cat"]})
    )
    df3 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["cat the dog"]})
    )
    f2 = text.fingerprint(df2).first()["fingerprint64"]
    f3 = text.fingerprint(df3).first()["fingerprint64"]
    assert f2 != f3


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media, dim=8, fake_decode=True).toPandas()
    assert len(feats) == 30
    assert set(feats["feat_dim"]) == {8}
    assert feats["payload_sha256"].str.len().eq(64).all()
    # all three modalities decode REAL bytes (WAV / BMP / DIB-AVI)
    real_feats = multimodal.extract_features(
        media, dim=8, fake_decode=False
    ).toPandas()
    assert len(real_feats) == 30
    # a compressed-codec (non-AVI) video payload needs the fake path
    fake_vid = spark.createDataFrame(
        [(99, "video", "video/mp4", bytearray(b"\x00\x01mp4 junk"),
          8, 8, 100)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="ValueError|not an uncompressed"):
        multimodal.extract_features(fake_vid, dim=8, fake_decode=False).count()
    assert multimodal.extract_features(
        fake_vid, dim=8, fake_decode=True
    ).count() == 1


def test_wav_decode_real_bytes(spark):
    """The audio decoder parses REAL RIFF/WAVE PCM: a 440 Hz half-amplitude
    sine must come back with the right duration, rate and rms ≈ 0.5/√2."""
    import math

    payload = multimodal.make_wav_bytes(freq_hz=440.0, ms=500, rate=8000,
                                        amp=0.5)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    media = spark.createDataFrame(
        [(0, "audio", "audio/wav", bytearray(payload), None, None, 500)],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_audio_stats(media).collect()[0]
    assert row.sample_rate == 8000
    assert row.n_channels == 1
    assert row.n_samples == 4000
    assert row.duration_ms == 500
    assert abs(float(row.rms) - 0.5 / math.sqrt(2)) < 0.01
    assert 0.49 < float(row.peak) <= 0.51
    assert float(row.clip_ratio) == 0.0
    # a clipped full-amplitude tone registers clipping
    loud = multimodal.make_wav_bytes(freq_hz=200.0, ms=200, amp=1.1)
    media2 = spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(loud), None, None, 200)],
        multimodal.MEDIA_SCHEMA,
    )
    row2 = multimodal.decode_audio_stats(media2).collect()[0]
    assert float(row2.clip_ratio) > 0.1
    # malformed bytes surface as an error (no silent fake)
    bad = spark.createDataFrame(
        [(2, "audio", "audio/wav", bytearray(b"not a wav"), None, None, 1)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        multimodal.decode_audio_stats(bad).count()
    # frame sampling plan explodes video rows JVM-side
    plan = multimodal.frame_sample_plan(media, every_ms=10_000).toPandas()
    assert (plan["frame_ts_ms"] % 10_000 == 0).all()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert plan["media_id"].nunique() == n_videos


def test_streaming_ingest(spark, tmp_path, small_corpus):
    from ontologymatching_spark.streaming import ingest

    src_files, _ = small_corpus
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    spark.createDataFrame(src_files).write.parquet(src_dir)
    ingest.ingest_available_now(spark, src_dir, out_dir, ck_dir)
    got = spark.read.parquet(out_dir)
    from ontologymatching_spark.operators.extract import extract_triples

    want = extract_triples(spark.createDataFrame(src_files))
    assert got.count() == want.count()
    # exactly-once: re-running the drained stream appends nothing
    ingest.ingest_available_now(spark, src_dir, out_dir, ck_dir)
    assert spark.read.parquet(out_dir).count() == want.count()


def test_word2vec_and_browse(spark):
    from ontologymatching_spark.operators import embeddings

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tokens")
    )
    vecs = embeddings.train_word2vec(docs, dim=16, min_count=2).cache()
    assert vecs.count() > 10
    assert len(vecs.first()["vector"]) == 16
    probe = vecs.first()["word"]
    nn = embeddings.nearest_words(vecs, [probe], k=5).toPandas()
    assert len(nn) == 5
    assert (nn["probe"] == probe).all()
    assert nn["cosine"].is_monotonic_decreasing


def test_bmp_decode_real_bytes(spark):
    """The image decoder parses REAL uncompressed 24-bit BMP bytes: a
    hand-built 3x2 image with known pixels (odd width exercises the 4-byte
    row padding) must come back with exact channel means, and malformed /
    unsupported payloads must raise."""
    import struct

    import numpy as np

    # 3x2 pixels, rows top-to-bottom; channels (R, G, B)
    pix = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
            [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        ],
        dtype="u1",
    )
    row_bytes = 3 * 3
    pad = (-row_bytes) % 4
    body = b"".join(
        pix[i, :, ::-1].tobytes() + b"\x00" * pad  # BGR, bottom-up
        for i in range(1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    payload = (
        struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
        + info + body
    )
    media = spark.createDataFrame(
        [(0, "image", "image/bmp", bytearray(payload), 3, 2, None)],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_image_stats(media).collect()[0]
    assert (row.width, row.height, row.bpp) == (3, 2, 24)
    assert float(row.mean_r) == pytest.approx(pix[..., 0].mean(), abs=1e-6)
    assert float(row.mean_g) == pytest.approx(pix[..., 1].mean(), abs=1e-6)
    assert float(row.mean_b) == pytest.approx(pix[..., 2].mean(), abs=1e-6)
    luma = (0.299 * pix[..., 0] + 0.587 * pix[..., 1]
            + 0.114 * pix[..., 2]).astype("float64")
    assert float(row.luma_mean) == pytest.approx(luma.mean(), abs=1e-6)
    assert float(row.luma_std) == pytest.approx(luma.std(), abs=1e-6)
    # the generator's BMPs round-trip through the decoder
    gen = multimodal.make_bmp_bytes(17, 9, seed=7)  # odd width -> padded rows
    assert gen[:2] == b"BM"
    media2 = spark.createDataFrame(
        [(1, "image", "image/bmp", bytearray(gen), 17, 9, None)],
        multimodal.MEDIA_SCHEMA,
    )
    row2 = multimodal.decode_image_stats(media2).collect()[0]
    assert (row2.width, row2.height) == (17, 9)
    # gradient runs left->right in R: right half brighter than left half
    assert 0.0 < float(row2.mean_r) < 255.0
    # malformed bytes surface as an error (no silent fake)
    bad = spark.createDataFrame(
        [(2, "image", "image/bmp", bytearray(b"not a bmp"), 1, 1, None)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        multimodal.decode_image_stats(bad).count()


def test_avi_decode_real_bytes(spark):
    """The video decoder parses REAL RIFF/AVI bytes: a hand-built 2-frame
    3x2 DIB clip with known pixels must come back with exact per-frame
    lumas, motion = |Δ luma|, and container metadata; malformed payloads
    raise."""
    import numpy as np

    from ontologymatching_spark.operators.multimodal import (
        _avi_frames, make_avi_bytes,
    )

    payload = make_avi_bytes(3, 2, n_frames=2, fps=10, seed=5)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    w, h, n_declared, fps, lumas = _avi_frames(payload)
    assert (w, h, n_declared) == (3, 2, 2)
    assert fps == 10.0
    assert len(lumas) == 2
    # frame 1 is frame 0 rolled by one column: same pixel multiset → equal
    # mean luma (roll is a permutation)
    assert lumas[0] == pytest.approx(lumas[1], abs=1e-9)

    media = spark.createDataFrame(
        [(0, "video", "video/x-msvideo", bytearray(payload), 3, 2, 200)],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_video_stats(media).collect()[0]
    assert (row.width, row.height, row.n_frames) == (3, 2, 2)
    assert float(row.fps) == 10.0
    assert row.duration_ms == 200
    assert float(row.motion) == pytest.approx(0.0, abs=1e-6)  # roll = perm

    # hand-built single-column clip where motion is nonzero: 1x1 frames
    # with luma 0 then 255
    fr0 = np.array([[[0, 0, 0]]], dtype="u1")
    fr1 = np.array([[[255, 255, 255]]], dtype="u1")
    import struct as _s

    def chunk(fcc, data):
        return fcc + _s.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    def lst(t, data):
        return chunk(b"LIST", t + data)

    frame_bytes = [f[0, :, ::-1].tobytes() + b"\x00" for f in (fr0, fr1)]
    avih = _s.pack("<14I", 100000, 0, 0, 0, 2, 0, 1, 4, 1, 1, 0, 0, 0, 0)
    strh = _s.pack("<4s4sIHH8I4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, 10, 0,
                   2, 4, 0, 0, 0, 0, 1, 1)
    strf = _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 2835, 2835, 0, 0)
    body = (b"AVI "
            + lst(b"hdrl", chunk(b"avih", avih)
                  + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
            + lst(b"movi", b"".join(chunk(b"00db", f) for f in frame_bytes)))
    hand = b"RIFF" + _s.pack("<I", len(body)) + body
    media2 = spark.createDataFrame(
        [(1, "video", "video/x-msvideo", bytearray(hand), 1, 1, 200)],
        multimodal.MEDIA_SCHEMA,
    )
    row2 = multimodal.decode_video_stats(media2).collect()[0]
    assert float(row2.luma_mean) == pytest.approx(127.5, abs=1e-6)
    assert float(row2.motion) == pytest.approx(255.0, abs=1e-6)

    # per-frame stats: one row per frame, lumas exact
    frames = multimodal.video_frame_stats(media2).toPandas()
    assert list(frames["frame_idx"]) == [0, 1]
    assert [float(x) for x in frames["luma_mean"]] == pytest.approx(
        [0.0, 255.0], abs=1e-6
    )
    assert list(frames["ts_ms"]) == [0, 100]

    # malformed bytes surface as an error (no silent fake)
    bad = spark.createDataFrame(
        [(2, "video", "video/x-msvideo", bytearray(b"not an avi"), 1, 1, 1)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        multimodal.decode_video_stats(bad).count()

    # synth_media videos round-trip through the real decoder
    media3 = multimodal.synth_media(spark, n=9)
    vids = multimodal.decode_video_stats(media3).toPandas()
    assert len(vids) == 3
    assert (vids["n_frames"] >= 2).all()


def test_ann_ivf_topk_planted_recall(spark):
    """IVF planted-twin gate: clustered base vectors (so the coarse
    quantizer has real cells) + 0.05-noise twins (cosine ≈ 0.999). ivf_topk
    with 4 cells / nprobe 2 must put the twin at rank 1 for ≥85% of
    vectors, and the index must prune: candidate pairs ≪ n²."""
    import numpy as np

    rng = np.random.default_rng(11)
    # 4 well-separated cluster centers, 20 base vectors each
    centers = rng.normal(size=(4, 64)) * 4.0
    base = np.vstack([
        centers[c] + rng.normal(size=(20, 64)) for c in range(4)
    ])
    noise = base + 0.05 * rng.normal(size=(80, 64))
    vecs_np = np.vstack([base, noise]).astype("float32")
    rows = [(i, [float(x) for x in vecs_np[i]]) for i in range(160)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    approx = ann.ivf_topk(vecs, k=1, n_centroids=4, nprobe=2, n_iter=3,
                          sample=64)
    got = {
        r.probe_id: r.cand_id
        for r in approx.filter(F.col("rnk") == 1).collect()
    }
    hits = sum(1 for p, c in got.items() if abs(p - c) == 80)
    assert hits / 160 >= 0.85, f"IVF planted recall@1 {hits}/160"


def test_ivf_centroids_deterministic_across_parallelism(spark):
    """The binary-grid k-means must give bit-identical centroids regardless
    of partitioning (the cross-engine-oracle property, checked across
    repartitions)."""
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    a = ann.ivf_train_centroids(vecs.repartition(2), n_centroids=4,
                                n_iter=2, sample=32)
    b = ann.ivf_train_centroids(vecs.repartition(17), n_centroids=4,
                                n_iter=2, sample=32)
    pa = {r.cid: list(r.ce) for r in a.collect()}
    pb = {r.cid: list(r.ce) for r in b.collect()}
    assert pa == pb  # exact float equality — grid arithmetic


def test_ngram_contamination(spark):
    """Planted-overlap decontamination: a doc sharing a 5-gram with the
    benchmark is flagged; disjoint docs are not; short docs yield 0 grams."""
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["the quick brown fox jumps over the lazy dog"]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [
                "start here the quick brown fox jumps and more words after",
                "completely different content with no shared phrases at all",
                "too short",
            ],
        })
    )
    out = text.ngram_contamination(docs, bench, n=5).toPandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"])
    # "the quick brown fox jumps" and "quick brown fox jumps and"? only the
    # first 5-gram exists in the benchmark
    assert out.loc[1, "n_contaminated"] == 1
    assert not bool(out.loc[2, "contaminated"])
    assert out.loc[3, "n_grams"] == 0
    assert out.loc[3, "n_contaminated"] == 0

    # shuffle-join fallback (pathological benchmark sizes): identical
    # results, and the plan really drops the broadcast — only the narrow
    # exploded hash rows shuffle
    shuffled = text.ngram_contamination(docs, bench, n=5, broadcast=False)
    assert (
        shuffled.toPandas().set_index("doc_id").sort_index().to_dict()
        == out.sort_index().to_dict()
    )
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_scrub_pii(spark):
    """Typed redaction with exact expectations on a hand-built string."""
    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1],
            "text": ["mail a.user+x@corp.example.org from 192.168.0.1 token "
                     "deadbeefdeadbeefdeadbeefdeadbeef acct 1234567890 done"],
        })
    )
    row = text.scrub_pii(df).collect()[0]
    assert row.n_email == 1
    assert row.n_ipv4 == 1
    assert row.n_hexsecret == 1
    assert row.n_longdigits == 1
    assert row.scrubbed_text == (
        "mail <EMAIL> from <IP> token <SECRET> acct <NUMBER> done"
    )
    # clean text is untouched, all counts zero
    clean = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": ["no secrets here just words"]})
    )
    r2 = text.scrub_pii(clean).collect()[0]
    assert (r2.n_email, r2.n_ipv4, r2.n_hexsecret, r2.n_longdigits) == (0, 0, 0, 0)
    assert r2.scrubbed_text == "no secrets here just words"


def test_repetition_stats(spark):
    """Hand-computed Gopher repetition signals: 'spam spam spam ham' has
    dup ratio 1-2/4, top unigram 3/4, top bigram 'spam spam' 2/3 > 0.18."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2],
                      "text": ["spam spam spam ham",
                               "all ten words in this line are fully distinct tokens"]})
    )
    out = text.repetition_stats(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 4
    assert out.loc[1, "dup_token_ratio"] == pytest.approx(0.5)
    assert out.loc[1, "top_unigram_frac"] == pytest.approx(3 / 4)
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(2 / 3)
    assert bool(out.loc[1, "repetition_flagged"])
    assert out.loc[2, "dup_token_ratio"] == pytest.approx(0.0)
    assert out.loc[2, "top_unigram_frac"] == pytest.approx(1 / 10)
    assert out.loc[2, "top_bigram_frac"] == pytest.approx(1 / 9)  # < 0.18
    assert not bool(out.loc[2, "repetition_flagged"])
    # single-token doc: no bigrams, nothing flagged
    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3], "text": ["solo"]})
    )
    r = text.repetition_stats(one).collect()[0]
    assert r.top_bigram_frac == 0.0 and not r.repetition_flagged


def test_stratified_sample(spark):
    """Deterministic domain mixing: per-stratum kept fractions approach the
    configured rates, membership is identical across partitionings, and a
    re-run keeps exactly the same rows (md5 coin, no RNG state)."""
    from ontologymatching_spark.operators import sampling

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, stratum string")
    rates = {"a": 0.5, "b": 0.1}
    out1 = sampling.stratified_sample(df, "stratum", rates, "k")
    kept = out1.groupBy("stratum").count().toPandas().set_index("stratum")
    assert abs(kept.loc["a", "count"] / 1000 - 0.5) < 0.06
    assert abs(kept.loc["b", "count"] / 1000 - 0.1) < 0.04
    ids1 = {r.k for r in out1.collect()}
    ids2 = {
        r.k
        for r in sampling.stratified_sample(
            df.repartition(13), "stratum", rates, "k"
        ).collect()
    }
    assert ids1 == ids2
    # default_rate drops unknown strata entirely at 0.0
    extra = spark.createDataFrame([(99999, "zz")], "k long, stratum string")
    assert sampling.stratified_sample(extra, "stratum", rates, "k").count() == 0
    # a different salt draws a different (still deterministic) coin
    ids3 = {
        r.k
        for r in sampling.stratified_sample(
            df, "stratum", rates, "k", salt="other"
        ).collect()
    }
    assert ids3 != ids1


def test_chunk_documents(spark):
    """Exact window boundaries: 10 tokens, max 4, overlap 2 → stride 2,
    ceil((10-2)/2)=4 chunks covering [1-4],[3-6],[5-8],[7-10]."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"]})
    )
    out = (
        text.chunk_documents(df, max_tokens=4, overlap=2)
        .toPandas().sort_values("chunk_idx")
    )
    assert list(out["chunk_text"]) == [
        "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10",
    ]
    assert list(out["n_chunk_tokens"]) == [4, 4, 4, 4]
    # short doc → one chunk, whole text
    short = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": ["just three tokens"]})
    )
    row = text.chunk_documents(short, max_tokens=4, overlap=2).collect()
    assert len(row) == 1 and row[0].chunk_text == "just three tokens"
    with pytest.raises(ValueError):
        text.chunk_documents(df, max_tokens=4, overlap=4)


def test_pack_documents(spark):
    """Within one shard, packs fill to the budget in id order: docs of
    3/4/5/6 tokens with budget 8 → offsets 0,3,7,12 → packs 0,0,0,1."""
    rows = [(i * 8, f"{' tok' * n}".strip()) for i, n in
            enumerate([3, 4, 5, 6])]  # ids 0,8,16,24 → all shard 0 (n=8)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        text.pack_documents(df, budget=8, n_shards=8)
        .toPandas().sort_values("doc_id")
    )
    assert list(out["shard_id"]) == [0, 0, 0, 0]
    assert list(out["pack_offset"]) == [0, 3, 7, 4]  # 12 % 8 = 4
    assert list(out["pack_id"]) == [0, 0, 0, 1]
    # sharding: different ids land in their own shard windows
    df2 = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], "doc_id long, text string"
    )
    p2 = text.pack_documents(df2, budget=8, n_shards=8).toPandas()
    assert set(p2["shard_id"]) == {0, 1}
    assert (p2["pack_offset"] == 0).all()


def test_avi_strf_and_00dc_validation(spark):
    """The AVI walker validates the strf BITMAPINFOHEADER (must be
    uncompressed 24-bit DIB) and rejects compressed '00dc' frame chunks;
    extract_features(fake_decode=True) falls back to the content-hash
    stand-in for such payloads instead of raising."""
    import struct as _s

    from ontologymatching_spark.operators.multimodal import (
        _avi_frames, _fake_feature, make_avi_bytes,
    )

    def chunk(fcc, data):
        return fcc + _s.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    def lst(t, data):
        return chunk(b"LIST", t + data)

    def build(bpp=24, compression=0, frame_fcc=b"00db"):
        # 1x1 "frame" padded to a 4-byte stride — big enough to pass the
        # old size-only check even when the header lies about the codec
        frame = b"\x10\x20\x30\x00"
        avih = _s.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, 4, 1, 1, 0, 0, 0, 0)
        strh = _s.pack("<4s4sIHH8I4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, 10,
                       0, 1, 4, 0, 0, 0, 0, 1, 1)
        strf = _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, bpp, compression, 4,
                       2835, 2835, 0, 0)
        body = (b"AVI "
                + lst(b"hdrl", chunk(b"avih", avih)
                      + lst(b"strl",
                            chunk(b"strh", strh) + chunk(b"strf", strf)))
                + lst(b"movi", chunk(frame_fcc, frame)))
        return b"RIFF" + _s.pack("<I", len(body)) + body

    # well-formed baseline decodes
    w, h, _, _, lumas = _avi_frames(build())
    assert (w, h, len(lumas)) == (1, 1, 1)
    # 32-bpp strf → rejected even though the frame passes the size check
    with pytest.raises(ValueError, match="24-bit"):
        _avi_frames(build(bpp=32))
    # compressed fourcc in strf → rejected
    with pytest.raises(ValueError, match="biCompression"):
        _avi_frames(build(compression=0x44495658))  # 'XVID'
    # compressed '00dc' frame chunk → rejected
    with pytest.raises(ValueError, match="00dc"):
        _avi_frames(build(frame_fcc=b"00dc"))
    # missing strf → rejected (header-less streams can't be validated)
    gen = make_avi_bytes(2, 2, n_frames=1)
    _avi_frames(gen)  # generator output still round-trips

    bad = build(bpp=32)
    media = spark.createDataFrame(
        [(0, "video", "video/x-msvideo", bytearray(bad), 1, 1, 100)],
        multimodal.MEDIA_SCHEMA,
    )
    # fake_decode=False surfaces the error
    with pytest.raises(Exception):
        multimodal.extract_features(media, dim=8, fake_decode=False).count()
    # fake_decode=True covers undecodable AVIs with the hash stand-in
    row = multimodal.extract_features(
        media, dim=8, fake_decode=True
    ).collect()[0]
    expect = ",".join(f"{v:.6f}" for v in _fake_feature(bad, 8))
    assert row.feature == expect


def test_chunk_empty_doc_token_count(spark):
    """Empty/whitespace-only docs emit one chunk with n_chunk_tokens=0
    (split('', ' ') yields [''] — the count must not report 1)."""
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one two")], "doc_id long, text string"
    )
    out = text.chunk_documents(df, max_tokens=4, overlap=2).toPandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[0, "n_chunk_tokens"] == 0
    assert by_id.loc[1, "n_chunk_tokens"] == 0
    assert by_id.loc[2, "n_chunk_tokens"] == 2


def test_ivf_param_derivation(spark):
    """n_centroids=None derives ≈√N centroids, parallelism-sized salt and
    a per-centroid training sample — so bench-scale defaults (8 cells)
    can't silently leak into a production-sized index."""
    import numpy as np

    from ontologymatching_spark.operators.ann import derive_ivf_params

    # pure math: √N centroids, salt fills 4× shuffle parallelism, capped
    assert derive_ivf_params(100, 32) == (10, 13, 128)
    assert derive_ivf_params(1_000_000, 32) == (1000, 1, 4096)
    assert derive_ivf_params(1_000_000, 2048) == (1000, 9, 4096)
    assert derive_ivf_params(4, 32) == (2, 64, 128)  # salt cap
    assert derive_ivf_params(0, 32) == (1, 64, 128)  # degenerate floor

    # end-to-end: the None path builds a working index (N=160 → 13 cells)
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16)) * 4.0
    base = np.vstack([
        centers[c] + rng.normal(size=(20, 16)) for c in range(4)
    ])
    noise = base + 0.05 * rng.normal(size=(80, 16))
    vecs_np = np.vstack([base, noise]).astype("float32")
    rows = [(i, [float(x) for x in vecs_np[i]]) for i in range(160)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    approx = ann.ivf_topk(vecs, k=1, n_centroids=None, nprobe=2, n_iter=2)
    got = {
        r.probe_id: r.cand_id
        for r in approx.filter(F.col("rnk") == 1).collect()
    }
    hits = sum(1 for p, c in got.items() if abs(p - c) == 80)
    assert hits / 160 >= 0.7, f"derived-IVF planted recall@1 {hits}/160"


def test_probe_media_codecs(spark):
    """Magic-bytes codec probe identifies real containers (incl. an XVID
    AVI whose frames can't be decoded here) from synthesized headers —
    metadata is real, no fabricated features."""
    import struct as _s

    from ontologymatching_spark.operators.multimodal import (
        _probe_codec, make_avi_bytes, make_bmp_bytes, make_wav_bytes,
    )

    assert _probe_codec(make_wav_bytes(440.0, 100)) == (
        "riff/wave", "pcm", "wFormatTag=1"
    )
    assert _probe_codec(make_bmp_bytes(4, 4, seed=1))[:2] == ("bmp", "dib")
    assert _probe_codec(make_avi_bytes(4, 4, n_frames=1)) == (
        "riff/avi", "dib24", "biCompression=0"
    )

    # hand-built XVID AVI header: probe reports the fourcc instead of
    # decoding (or faking) the frames
    def chunk(fcc, data):
        return fcc + _s.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    def lst(t, data):
        return chunk(b"LIST", t + data)

    xvid = _s.unpack("<I", b"XVID")[0]
    avih = _s.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, 4, 1, 1, 0, 0, 0, 0)
    strh = _s.pack("<4s4sIHH8I4h", b"vids", b"XVID", 0, 0, 0, 0, 1, 10, 0,
                   1, 4, 0, 0, 0, 0, 1, 1)
    strf = _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 12, xvid, 4, 0, 0, 0, 0)
    body = (b"AVI " + lst(b"hdrl", chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
            + lst(b"movi", chunk(b"00dc", b"\x01\x02\x03\x04")))
    avi_xvid = b"RIFF" + _s.pack("<I", len(body)) + body
    assert _probe_codec(avi_xvid) == (
        "riff/avi", "xvid", f"biCompression={xvid}"
    )

    # other families from raw magic bytes
    png = b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR" + _s.pack(
        ">IIBBBBB", 640, 480, 8, 2, 0, 0, 0)
    assert _probe_codec(png) == ("png", "png", "640x480")
    assert _probe_codec(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00")[0] == "jpeg"
    assert _probe_codec(
        _s.pack(">I", 20) + b"ftypisom" + b"\x00" * 8
    ) == ("iso-bmff", "isom", "mp4-family")
    assert _probe_codec(b"OggSxxxx" + b"OpusHead" + b"\x00" * 8)[1] == "opus"
    assert _probe_codec(b"\x1aE\xdf\xa3" + b"\x00" * 16)[0] == "matroska"
    assert _probe_codec(b"fLaC" + b"\x00" * 16)[0] == "flac"
    assert _probe_codec(b"ID3\x04\x00" + b"\x00" * 16)[0] == "mp3"
    assert _probe_codec(b"\x00" * 16) == ("unknown", "unknown", "00000000")

    # distributed path over the synth table: every row identified
    media = multimodal.synth_media(spark, n=12)
    probed = multimodal.probe_media_codecs(media).toPandas()
    assert len(probed) == 12
    assert set(probed["container"]) == {"riff/wave", "bmp", "riff/avi"}
    assert (probed["codec"] != "unknown").all()
