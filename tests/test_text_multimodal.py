"""Text analytics + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from scrapy_playwright_scrapegraphai_spark.functions import text as T
from scrapy_playwright_scrapegraphai_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! 123"), (2, "  a  b  "), (3, "")],
        "doc_id long, text string",
    )
    feats = T.quality_features_expr(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select("doc_id", *[
        v.alias(k) for k, v in feats.items()
    ]).collect()}
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["n_chars"] == 17
    assert rows[1]["punct_per_mille"] == int(1000 * 2 / 17)
    assert rows[1]["digit_per_mille"] == int(1000 * 3 / 17)
    assert rows[2]["n_tokens"] == 2
    assert rows[3]["n_chars"] == 0 and rows[3]["punct_per_mille"] == 0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat with it"),
            (2, "il gatto di casa che dorme per ore"),
            (3, "der hund und die katze ist mit uns"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", T.lang_id_expr(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "it", 3: "de", 4: "und"}


def test_winnowing_null_text(spark):
    """NULL text → no fingerprints (0/0/NULL/NULL), matching what any
    relational recomputation yields — not the single-empty-kgram row the
    unguarded exprs used to emit."""
    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e f g")], "doc_id long, text string"
    )
    wx = T.winnowing_exprs(F.col("text"), k=3, w=4)
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in wx.items()]
        ).collect()
    }
    assert rows[1]["n_kgrams"] == 0
    assert rows[1]["n_fingerprints"] == 0
    assert rows[1]["fp_min"] is None and rows[1]["fp_max"] is None
    assert rows[2]["n_kgrams"] == 5 and rows[2]["n_fingerprints"] >= 1
    assert rows[2]["fp_min"] is not None


def test_fingerprints(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    rows = df.select(
        "doc_id", "text",
        T.fingerprint_md5_expr(F.col("text")).alias("md5"),
        T.rolling_fingerprint_udf(F.col("text")).alias("roll"),
    ).collect()
    import hashlib

    for r in rows:
        assert r["md5"] == hashlib.md5(r["text"].encode()).hexdigest()
        assert r["roll"] == T.blake2_fingerprint(r["text"])


def test_multimodal_feature_plumbing(spark):
    import numpy as np

    media = spark.createDataFrame(
        [
            (1, "image", "image/fake", b"\x00\x10\x20\xff" * 100, 10, 10, 0),
            (2, "audio", "audio/fake", b"\x01\x02" * 50, 0, 0, 2000),
            (3, "video", "video/fake", b"", 0, 0, 3500),
        ],
        M.MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert feats[1]["n_bytes"] == 400
    assert len(feats[1]["features"]) == 16
    want = M.fake_feature_extractor(b"\x00\x10\x20\xff" * 100)
    assert np.allclose(feats[1]["features"], want)
    assert feats[3]["n_bytes"] == 0 and sum(feats[3]["features"]) == 0.0


def test_multimodal_decode_stub_raises(spark):
    media = spark.createDataFrame(
        [(1, "image", "image/png", b"xx", 1, 1, 0)], M.MEDIA_SCHEMA
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        M.extract_features(media, use_stub_decoder=True).collect()
    assert "NotImplementedError" in str(exc.value) or "codec libraries" in str(exc.value)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(3, "video", "video/fake", b"", 0, 0, 3500),
         (4, "image", "image/fake", b"", 1, 1, 0)],
        M.MEDIA_SCHEMA,
    )
    plan = M.frame_sample_plan(media, every_ms=1000).collect()
    assert sorted((r["media_id"], r["ts_ms"]) for r in plan) == [
        (3, 0), (3, 1000), (3, 2000), (3, 3000)
    ]
