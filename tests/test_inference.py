"""K10 batched-inference scaffold: equality with the fused pipeline path,
batch re-chunking, pluggable scorer, and the F9 NHWC tensor contract."""

from __future__ import annotations

import numpy as np

from ocrd_anybaseocr_spark.operators.extract import page_index
from ocrd_anybaseocr_spark.operators.inference import (
    classify_pages_batched,
    preprocess_nhwc,
    register_scorer,
)
from ocrd_anybaseocr_spark.operators.pipeline import build_page_results
from ocrd_anybaseocr_spark.sources.tables import load_corpus


def test_batched_inference_equals_pipeline(spark, corpus_dir):
    docs, blobs = load_corpus(spark, corpus_dir)
    pages = page_index(docs.limit(6)).join(blobs, "media_ref")
    got = {
        r.media_ref: (list(r.scores), list(r.labels))
        for r in classify_pages_batched(pages, batch_size=5).collect()
    }
    want = {
        r.media_ref: (list(r.scores), list(r.labels))
        for r in build_page_results(docs.limit(6), blobs, n_parts=4).collect()
    }
    assert set(got) == set(want)
    for ref in got:
        assert got[ref] == want[ref], ref


def test_pluggable_scorer(spark, corpus_dir):
    """A registered scorer replaces the model without changing the plan;
    the loader runs once per worker (executor-global model load)."""

    def loader():
        def constant_scorer(png_batch):
            s = np.full((len(png_batch), 21), 0.01)
            s[:, 13] = 0.99  # 'page'
            return s

        return constant_scorer

    register_scorer("const", loader)
    docs, blobs = load_corpus(spark, corpus_dir)
    pages = page_index(docs.limit(2)).join(blobs, "media_ref")
    rows = classify_pages_batched(pages, scorer="const", batch_size=3).collect()
    assert rows
    assert all(r.labels == ["page"] for r in rows)
    assert all(abs(r.scores[13] - 0.99) < 1e-12 for r in rows)


def test_nhwc_preprocess_contract(corpus_dir):
    """F9: the CNN input tensor is (n, 600, 500, 1) float32 in [0, 1] —
    the reference's exact reshape (layout_analysis.py:96-99)."""
    import pyarrow.parquet as pq
    import os

    blobs = pq.read_table(os.path.join(corpus_dir, "page_blobs.parquet")).to_pylist()
    batch = [b["image"] for b in blobs[:4]]
    t = preprocess_nhwc(batch)
    assert t.shape == (4, 600, 500, 1)
    assert t.dtype == np.float32
    assert 0.0 <= t.min() and t.max() <= 1.0
    assert t.max() > 0.5  # paper background ~235/255


def test_resize_cubic_interpolation_quality():
    """The inference preprocess resampler must INTERPOLATE (monotone ramp
    preserved, no new extrema) and ANTI-ALIAS (a 1-px grid downscales to
    its mean, where point sampling keeps full-contrast stripes) — the
    reference feeds the classifier a LANCZOS-class 500x600 resize
    (layout_analysis.py:97-99); nearest aliases fine strokes."""
    from ocrd_anybaseocr_spark.kernels.transform import resize_cubic, resize_nearest

    # monotone horizontal ramp stays monotone and in-range after resize
    ramp = np.tile(np.linspace(0, 255, 200).astype(np.uint8), (40, 1))
    up = resize_cubic(ramp, 60, 500)
    dn = resize_cubic(ramp, 20, 77)
    for r in (up, dn):
        rows = r.astype(np.int64)
        assert (np.diff(rows, axis=1) >= 0).all(), "ramp must stay monotone"
        assert rows.min() >= 0 and rows.max() <= 255
    # identity at unchanged size (integer alignment -> kernel(0)=1)
    assert np.array_equal(resize_cubic(ramp, *ramp.shape), ramp)

    # 1-px vertical grid (alternating 0/255 columns) downscaled 4x:
    # support-scaled cubic averages to ~mean everywhere; nearest keeps
    # full-contrast stripes (aliasing)
    grid = np.zeros((64, 64), dtype=np.uint8)
    grid[:, ::2] = 255
    aa = resize_cubic(grid, 16, 16).astype(np.float64)
    assert abs(aa.mean() - 127.5) < 12
    assert aa.std() < 20, f"aliasing: std {aa.std():.1f}"
    # nearest locks onto one phase of the grid (here: all-255) — the
    # aliasing failure mode being fixed
    na = resize_nearest(grid, 0.25).astype(np.float64)
    assert abs(na.mean() - 127.5) > 100
