"""Multimodal metadata operators: JVM-side PNG header parsing must agree
with the generator's ground-truth dimensions, byte for byte."""

from __future__ import annotations

from ocrd_anybaseocr_spark.operators.media import media_metadata
from ocrd_anybaseocr_spark.sources.tables import load_corpus


def test_png_metadata_matches_truth(spark, corpus_dir):
    _, blobs = load_corpus(spark, corpus_dir)
    meta = media_metadata(blobs).join(
        blobs.select("media_ref", "width", "height"), "media_ref"
    )
    rows = meta.collect()
    assert rows
    for r in rows:
        assert r.is_png
        assert r.png_width == r.width
        assert r.png_height == r.height
        assert r.png_bit_depth == 8
        assert r.pixels == r.width * r.height


def test_metadata_plan_has_no_python(spark, corpus_dir):
    """The metadata path must stay JVM-side: no Python UDF nodes."""
    from ocrd_anybaseocr_spark.plans import explain_str

    _, blobs = load_corpus(spark, corpus_dir)
    plan = explain_str(media_metadata(blobs), "simple")
    assert "Python" not in plan and "MapInPandas" not in plan
