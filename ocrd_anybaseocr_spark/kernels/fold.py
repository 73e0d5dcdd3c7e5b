"""Document-structure fold (W4): the ordered stateful per-document scan.

Faithful reimplementation of the reference's ``add_log_divs`` branching
(reference: cli/ocrd_anybaseocr_layout_analysis.py:140-220), including its
quirks, which we preserve deliberately:

- ``logIDs`` is a defaultdict(int) while div ids start at 0, so a
  chapter/section div that received id 0 is treated as nonexistent by the
  'page' branch (``logIDs['chapter']==0 and logIDs['section']==0``).
- ``log_divs[first]`` can be referenced before any div with that label was
  created (the acknowledged-unclear branch, reference L197 "rs: not sure
  about the remaining branches") — the reference would raise KeyError; we
  guard with root parentage (-1), per SURVEY.md §7 hard-part 3.

Root parent is encoded as -1 (the METS logical structMap root).
"""

from __future__ import annotations

from collections import defaultdict

ROOT = -1


def fold_document(pages: list[tuple[str, list[str]]]):
    """Fold (media_ref, labels) pairs in reading order.

    Returns (divs: list[(log_id, label, parent_id)],
             links: list[(log_id, media_ref)]).
    """
    log_id_counter = 0
    log_ids: dict[str, int] = defaultdict(int)
    log_divs: dict[str, int] = {}
    first: str | None = None
    prev_labels: list[str] = []
    divs: list[tuple[int, str, int]] = []
    links: list[tuple[int, str]] = []

    def parent_of(label_key: str | None) -> int:
        if label_key is None:
            return ROOT
        return log_divs.get(label_key, ROOT)

    for media_ref, labels in pages:
        for label in labels:
            page_log_id = -1
            parent = ROOT
            if label != "page":
                if label not in ("chapter", "section"):
                    if label in prev_labels:
                        page_log_id = log_ids[label]
                    if label == "binding":
                        parent = ROOT
                    elif label in ("cover", "endsheet", "paste_down"):
                        parent = parent_of("binding")
                    elif label != "title_page" and first is not None:
                        parent = parent_of(first)
                    else:
                        parent = ROOT
                else:
                    if first is None:
                        first = label
                        parent = ROOT
                    elif first == label:
                        parent = ROOT
                    else:
                        parent = parent_of(first)
            else:
                # Reference quirk (layout_analysis.py:185-201): when
                # logIDs['chapter'] == logIDs['section'] != 0 the reference
                # falls through all three ifs and reuses the STALE
                # parent_node from a previous loop iteration. That state is
                # unreachable: ids come from one monotonically increasing
                # counter, so two labels can never hold the same NONZERO id
                # — equality only happens at 0/0 (neither assigned, since
                # defaultdict(int) default and div id 0 are conflated),
                # which the third branch handles. Re-initializing
                # parent=ROOT here is therefore observationally identical.
                if log_ids["chapter"] > log_ids["section"]:
                    page_log_id = log_ids["chapter"]
                if log_ids["section"] > log_ids["chapter"]:
                    page_log_id = log_ids["section"]
                if log_ids["chapter"] == 0 and log_ids["section"] == 0:
                    if first is None:
                        first = "chapter"
                        parent = ROOT
                    elif first == label:
                        parent = ROOT
                    else:
                        parent = parent_of(first)

            if page_log_id < 0:
                divs.append((log_id_counter, label, parent))
                log_divs[label] = log_id_counter
                log_ids[label] = log_id_counter
                page_log_id = log_id_counter
                log_id_counter += 1

            links.append((page_log_id, media_ref))
        prev_labels = list(labels)
    return divs, links
