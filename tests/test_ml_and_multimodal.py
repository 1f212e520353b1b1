"""ML-stage (TCN inference) and multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.ml.tcn import (
    TCNWeights,
    causal_dilated_conv,
    predict_windows,
    tcn_forward,
    weight_normalized,
)
from aidc_2018_timeseries_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    decode_images,
    frame_sample_stub,
)
from aidc_2018_timeseries_spark.operators.windowing import rolling_window_arrays
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_causal_conv_is_causal():
    """out[t] must not depend on x[t'] for t' > t."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 2))
    w = rng.normal(size=(3, 2, 4))
    b = np.zeros(4)
    base = causal_dilated_conv(x, w, b, dilation=2)
    x2 = x.copy()
    x2[8:, :] += 100.0  # perturb the future
    pert = causal_dilated_conv(x2, w, b, dilation=2)
    np.testing.assert_allclose(base[:8], pert[:8], rtol=1e-12)
    assert not np.allclose(base[8:], pert[8:])


def test_weight_norm_formula():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(3, 2, 4))
    g = rng.normal(size=(1, 1, 4))
    w = weight_normalized(v, g)
    want = g * v / np.sqrt((v**2).mean(axis=(0, 1), keepdims=True) + 1e-3)
    np.testing.assert_allclose(w, want, rtol=1e-12)


def test_distributed_tcn_matches_local(spark):
    """mapInPandas inference == pure-NumPy forward on collected windows."""
    rng = np.random.default_rng(5)
    rows = [
        (sid, t, float(v0), float(v1))
        for sid in (1, 2)
        for t, (v0, v1) in enumerate(rng.normal(size=(25, 2)))
    ]
    df = spark.createDataFrame(rows, "series_id int, t int, f0 double, f1 double")
    windows = rolling_window_arrays(df, "series_id", "t", ["f0", "f1"], seq_len=8)
    weights = TCNWeights(n_features=2, n_hidden=4, levels=2, kernel_size=3)
    preds = {
        (r["series_id"], r["rn"]): r["pred"]
        for r in predict_windows(windows, weights).collect()
    }
    local = {}
    for r in windows.collect():
        x = np.array([[e["f0"], e["f1"]] for e in r["window"]])
        local[(r["series_id"], r["rn"])] = tcn_forward(x, weights)
    assert preds.keys() == local.keys()
    for k in preds:
        assert preds[k] == pytest.approx(local[k], rel=1e-9)


def test_binary_metadata_and_decode(spark):
    d = load_table(spark, SF_DIR, "documents").limit(50)
    meta = binary_metadata(attach_binary_payload(d, "text"))
    rows = meta.select("doc_id", "n_bytes", "sha256", "text").collect()
    import hashlib

    for r in rows[:10]:
        assert r["n_bytes"] == len(r["text"].encode())
        assert r["sha256"] == hashlib.sha256(r["text"].encode()).hexdigest()

    from aidc_2018_timeseries_spark.operators import multimodal as mm

    if not mm._HAS_PIL:  # fake-kernel path: text payloads aren't real images
        decoded = decode_images(attach_binary_payload(d, "text")).collect()
        assert len(decoded) == 50
        for r in decoded:
            assert r["width"] >= 16 and r["height"] >= 16 and r["n_channels"] == 3
            assert 0.0 <= r["mean_intensity"] <= 1.0


def test_frame_sample_stub(spark):
    d = load_table(spark, SF_DIR, "documents").limit(10)
    frames = frame_sample_stub(attach_binary_payload(d, "text"), every_n=7)
    rows = frames.groupBy("doc_id").agg(F.max("frame_idx").alias("m"), F.count(F.lit(1)).alias("n")).collect()
    for r in rows:
        assert r["m"] % 7 == 0 and r["n"] == r["m"] // 7 + 1


def test_resize_stub_shapes(spark):
    from aidc_2018_timeseries_spark.operators.multimodal import (
        attach_binary_payload,
        fake_resize_kernel,
        resize_images,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(20).select("doc_id", "text")
    # include an empty payload: the fake kernel must still emit w*h*3 bytes.
    # kernel pinned to the fake so the test runs identically with or
    # without PIL (text payloads aren't decodable images)
    empty = docs.sparkSession.createDataFrame([(10_000_000, "")], ["doc_id", "text"])
    payloads = attach_binary_payload(docs.unionByName(empty), "text")
    out = resize_images(
        payloads, target_w=8, target_h=4, kernel=fake_resize_kernel(8, 4)
    ).collect()
    assert len(out) == 21
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["resized"]) == 8 * 4 * 3  # every output exactly w*h*3 bytes


def test_audio_feature_extract_row_expansion(spark):
    from aidc_2018_timeseries_spark.operators.multimodal import (
        attach_binary_payload,
        extract_audio_features,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    payloads = attach_binary_payload(docs, "text")
    sizes = {r["doc_id"]: r["n"] for r in payloads.select("doc_id", F.octet_length("payload").alias("n")).collect()}
    rows = extract_audio_features(payloads, frame_bytes=64).collect()
    got = {}
    for r in rows:
        assert r["rms"] >= 0.0
        got[r["doc_id"]] = max(got.get(r["doc_id"], -1), r["frame_idx"])
    # 1 payload -> ceil(n/64) frames: the row-expanding iterator contract
    for doc_id, n in sizes.items():
        expect_frames = max(1, -(-n // 64))
        assert got[doc_id] == expect_frames - 1


def test_pil_decode_resize(spark):
    """Real-codec path (runs only where PIL is installed — mirrors the
    scipy .mat shim's test gating): synthesize tiny PNGs driver-side,
    push them through the SAME mapInPandas plans as the fake kernel, and
    check true dimensions, channel count, and resized byte length."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from aidc_2018_timeseries_spark.operators.multimodal import (
        decode_images,
        resize_images,
    )

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png_bytes(20, 10, (255, 255, 255))),  # white -> mean_intensity 1.0
        (2, png_bytes(7, 5, (0, 0, 0))),  # black -> mean_intensity 0.0
        (3, png_bytes(64, 64, (128, 64, 32))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    decoded = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert (decoded[1]["width"], decoded[1]["height"]) == (20, 10)
    assert decoded[1]["mean_intensity"] == pytest.approx(1.0)
    assert decoded[2]["mean_intensity"] == pytest.approx(0.0)
    assert all(decoded[i]["n_channels"] == 3 for i in (1, 2, 3))

    resized = resize_images(df, target_w=8, target_h=4).collect()
    assert len(resized) == 3
    for r in resized:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["resized"]) == 8 * 4 * 3  # raw RGB bytes at target size


def test_audio_frames_face_matches_operator(spark):
    """The catalog face is the operator plus ROUND(rms, 6): same row set,
    scalar driver-canonicalizable schema."""
    from aidc_2018_timeseries_spark.operators.multimodal import (
        attach_binary_payload,
        extract_audio_features,
    )
    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all

    load_all()
    face = CATALOG["multimodal_audio_frames"].spark_fn(spark, SF_DIR)
    assert face.schema.simpleString() == (
        "struct<doc_id:bigint,frame_idx:int,rms:double>"
    )
    got = sorted(map(tuple, face.collect()))
    docs = load_table(spark, SF_DIR, "documents")
    want = sorted(
        map(
            tuple,
            extract_audio_features(attach_binary_payload(docs, "text"))
            .select("doc_id", "frame_idx", F.round("rms", 6).alias("rms"))
            .collect(),
        )
    )
    assert got == want and len(got) > len(set(r[0] for r in got))  # row-expanding


def test_spatial_dropout_m2_semantics():
    """M2 (Dropout2D, reference custom_neon_classes.py:20-33): the mask
    is per-CHANNEL (constant across time), deterministic from (seed,
    block, layer), training masks at full value, inference scales by
    keep (non-inverted semantics), and keep=1.0 is the exact identity
    the catalog faces were verified under."""
    import numpy as np

    from aidc_2018_timeseries_spark.ml.tcn import (
        TCNWeights,
        apply_spatial_dropout,
        spatial_dropout_mask,
        tcn_forward,
    )

    h = np.arange(40, dtype=float).reshape(10, 4) + 1.0
    # identity at keep=1 regardless of mode
    assert (apply_spatial_dropout(h, 1.0, True, 7) == h).all()
    assert (apply_spatial_dropout(h, 1.0, False, 7) == h).all()
    # inference = deterministic keep-scale
    assert np.allclose(apply_spatial_dropout(h, 0.5, False), h * 0.5)
    # training: per-channel mask, constant over time, reproducible
    out1 = apply_spatial_dropout(h, 0.5, True, seed=3, block_idx=1, layer_idx=0)
    out2 = apply_spatial_dropout(h, 0.5, True, seed=3, block_idx=1, layer_idx=0)
    assert (out1 == out2).all()
    mask = spatial_dropout_mask(4, 0.5, 3, 1, 0)
    assert set(mask) <= {0.0, 1.0}
    for c in range(4):
        col = out1[:, c]
        assert (col == h[:, c]).all() if mask[c] == 1.0 else (col == 0).all()
    # different (seed, block, layer) decorrelate
    masks = {
        tuple(spatial_dropout_mask(64, 0.5, s, b, l))
        for s in range(3) for b in range(2) for l in range(2)
    }
    assert len(masks) > 1
    # statistical rate: mean keep fraction over many seeds ~ keep
    rates = [spatial_dropout_mask(64, 0.7, s, 0, 0).mean() for s in range(200)]
    assert abs(float(np.mean(rates)) - 0.7) < 0.03
    # wiring: keep=1.0 forward identical to the pre-M2 path; training
    # forward deterministic; inference keep<1 differs from identity
    w = TCNWeights(n_features=3)
    x = np.random.default_rng(0).normal(size=(12, 3))
    base = tcn_forward(x, w)
    assert tcn_forward(x, w, keep=1.0, training=True) == base
    t1 = tcn_forward(x, w, keep=0.5, training=True, dropout_seed=11)
    t2 = tcn_forward(x, w, keep=0.5, training=True, dropout_seed=11)
    assert t1 == t2
    assert tcn_forward(x, w, keep=0.5, training=False) != base
