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


N_FOLD_BUCKETS = 64


def fold_structure(page_results: DataFrame) -> DataFrame:
    """page_results(doc_id, media_ref, page_no, labels, ...) → DOC_STRUCTURE.

    Grouped by a doc_id HASH BUCKET, not by doc_id: one applyInPandas call
    folds ~hundreds of documents (pandas groupby inside), so the per-group
    Python/Arrow overhead is amortized — at 10^12 docs a per-document UDF
    call would dominate the stage. Results are identical: each document is
    still folded alone, in explicit (doc_id, page_no) order.
    """
    from pyspark.sql import functions as F

    def fold_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.fold import fold_document

        pdf = pdf.sort_values(["doc_id", "page_no"])  # W5: explicit order keys
        out = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            pages = [(m, list(l)) for m, l in zip(g["media_ref"], g["labels"])]
            divs, links = fold_document(pages)
            out.append(
                {
                    "doc_id": doc_id,
                    "divs": [
                        {"log_id": d[0], "label": d[1], "parent_id": d[2]} for d in divs
                    ],
                    "links": [{"log_id": l[0], "media_ref": l[1]} for l in links],
                }
            )
        return pd.DataFrame(out, columns=["doc_id", "divs", "links"])

    return (
        page_results.select("doc_id", "media_ref", "page_no", "labels")
        .withColumn("_fold_bucket", F.pmod(F.hash("doc_id"), F.lit(N_FOLD_BUCKETS)))
        .groupBy("_fold_bucket")
        .applyInPandas(fold_bucket, schema=S.DOC_STRUCTURE)
    )
