"""Batched page-classification inference stage (K10 scaffold).

The reference loads its Inception-V3 model ONCE per worker process
(setup(), cli/ocrd_anybaseocr_layout_analysis.py:51-67; max_workers=1 at
:41 because a TF context cannot be forked) and predicts per page after a
500x600 LANCZOS resize, /255 normalize, NHWC reshape (:96-99) with the
multi-label threshold 0.5 + argmax fallback (:109-133).

Spark form: one ``mapInPandas`` stage where the scorer is resolved once
per EXECUTOR PYTHON WORKER through a module-level cache (each worker
imports this module once — the Spark analogue of setup()), pages are
re-batched to ``batch_size`` before each scorer call (a GPU model wants
large fixed batches regardless of Arrow batch sizing), and the scorer is
PLUGGABLE: ``register_scorer(name, loader)`` lets a real weights file
drop in without touching the plan. The default scorer is the
deterministic run-feature classifier (kernels/classify.py — the
sanctioned substitute, SURVEY.md §7.5), so the scaffold is pytest-equal
to the fused pipeline path. ``preprocess_nhwc`` reproduces the exact
tensor contract a CNN scorer would consume (F9).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from ..config import DEFAULT_PARAMS, LABELS

DEFAULT_BATCH = 64

INFERENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("scores", T.ArrayType(T.DoubleType()), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
    ]
)

# scorer registry: name -> zero-arg loader returning
# Callable[[list[bytes]], np.ndarray of shape (n, len(LABELS))]
_SCORER_LOADERS: dict[str, Callable[[], Callable]] = {}
# per-process cache — populated at most once per executor Python worker,
# the Spark analogue of the reference's setup() model load
_SCORER_CACHE: dict[str, Callable] = {}


def register_scorer(name: str, loader: Callable[[], Callable]) -> None:
    _SCORER_LOADERS[name] = loader


def get_scorer(name: str) -> Callable:
    if name not in _SCORER_CACHE:
        _SCORER_CACHE[name] = _SCORER_LOADERS[name]()
    return _SCORER_CACHE[name]


def preprocess_nhwc(png_batch: list[bytes]) -> np.ndarray:
    """F9: the reference's exact input contract for the CNN — 500x600
    LANCZOS-class resize (support-scaled cubic: an interpolating,
    anti-aliasing filter matching the reference's tensor contract on real
    scans, where nearest/point sampling aliases fine strokes), /255 float,
    NHWC single channel (ref layout_analysis.py:96-99: (n, 600, 500, 1))."""
    from ..kernels.transform import resize_cubic
    from ..png import decode_gray

    out = np.empty((len(png_batch), 600, 500, 1), dtype=np.float32)
    for i, png in enumerate(png_batch):
        img, _ = decode_gray(bytes(png))
        out[i, :, :, 0] = resize_cubic(img, 600, 500).astype(np.float32) / 255.0
    return out


def _default_loader() -> Callable:
    """Deterministic featurizer scorer (the stand-in 'model'): scores from
    the run-feature classifier — identical to the fused pipeline path."""
    from ..oracle import process_page

    def scorer(png_batch: list[bytes]) -> np.ndarray:
        return np.asarray(
            [process_page(bytes(p), DEFAULT_PARAMS)["scores"] for p in png_batch],
            dtype=np.float64,
        )

    return scorer


register_scorer("default", _default_loader)


def threshold_labels(scores: np.ndarray, threshold: float = 0.5) -> list[list[str]]:
    """A6 (ref layout_analysis.py:122-131): multi-label >= threshold, argmax
    fallback when empty."""
    out = []
    for row in scores:
        labels = [LABELS[i] for i, s in enumerate(row) if s >= threshold]
        if not labels:
            labels = [LABELS[int(np.argmax(row))]]
        out.append(labels)
    return out


def classify_pages_batched(
    pages_with_blobs: DataFrame,
    scorer: str = "default",
    batch_size: int = DEFAULT_BATCH,
) -> DataFrame:
    """(doc_id, media_ref, image) → (doc_id, media_ref, scores, labels).

    One Arrow hop; inside the UDF the Arrow batches are re-chunked to
    ``batch_size`` scorer calls. The scorer LOADER ships in the closure
    (executor workers import this module fresh, so a driver-side registry
    entry would not exist there) but the loaded model is still cached per
    worker process — loaded once, the reference's setup() analogue."""
    loader = _SCORER_LOADERS[scorer] if isinstance(scorer, str) else scorer
    cache_key = scorer if isinstance(scorer, str) else getattr(
        scorer, "__qualname__", repr(scorer)
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if cache_key not in _SCORER_CACHE:
            _SCORER_CACHE[cache_key] = loader()
        model = _SCORER_CACHE[cache_key]
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                scores = model(list(chunk["image"]))
                labels = threshold_labels(scores, DEFAULT_PARAMS.classify.threshold)
                yield pd.DataFrame(
                    {
                        "doc_id": list(chunk["doc_id"]),
                        "media_ref": list(chunk["media_ref"]),
                        "scores": [list(map(float, s)) for s in scores],
                        "labels": labels,
                    }
                )

    return pages_with_blobs.select("doc_id", "media_ref", "image").mapInPandas(
        stage, schema=INFERENCE_SCHEMA
    )
