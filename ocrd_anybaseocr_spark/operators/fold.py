"""Document-structure fold operator (W4) as a grouped-map UDF.

The reference's two-phase split — parallel per-page inference, then a
sequential per-document fold (reference:
cli/ocrd_anybaseocr_layout_analysis.py:72-86,140-220) — maps exactly onto
Spark's shuffle boundary: page_results shuffle once on doc_id, then
``applyInPandas`` folds each document's pages in reading order. The fold is
bounded per document (max ~40 pages), so no stateful-streaming operator is
needed (SURVEY.md §2.9).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .. import schema as S


def fold_structure(page_results: DataFrame) -> DataFrame:
    """page_results(doc_id, media_ref, page_no, labels, ...) → DOC_STRUCTURE."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.fold import fold_document

        pdf = pdf.sort_values("page_no")  # W5 invariant: explicit order key
        pages = [(m, list(l)) for m, l in zip(pdf["media_ref"], pdf["labels"])]
        divs, links = fold_document(pages)
        return pd.DataFrame(
            {
                "doc_id": [pdf["doc_id"].iloc[0]],
                "divs": [[{"log_id": d[0], "label": d[1], "parent_id": d[2]} for d in divs]],
                "links": [[{"log_id": l[0], "media_ref": l[1]} for l in links]],
            }
        )

    return (
        page_results.select("doc_id", "media_ref", "page_no", "labels")
        .groupBy("doc_id")
        .applyInPandas(fold, schema=S.DOC_STRUCTURE)
    )
