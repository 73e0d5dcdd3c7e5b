"""Byte-pair-encoding tokenizer — pure-Python kernel shared by the Spark
operator (operators/tokenize.py) and the materialized oracle
(oracle.materialize_expected), the same single-definition contract as the
image kernels: the distributed fit/encode and the single-process
expectation can only disagree if the Spark PLUMBING (word-count shuffle,
bounded top-V fetch, Arrow-batched encode) is wrong, never the algorithm.

Public algorithm per Sennrich et al. 2016 ("Neural Machine Translation of
Rare Words with Subword Units") with the GPT-2-style lowest-rank-first
encoder. The reference has no tokenizer; this extends the
training-data-pipeline family (SURVEY §2 scope — token counting's
learned-subword sibling, and the vocabulary a `pack_sequences` run would
tokenize with).

Determinism contract: the fit consumes (word, count) pairs as a SET (dict
iteration order never affects the result) — ties on pair count break to
the lexicographically smallest pair, so any two runs (and any two engines
feeding the same counts) learn the identical merge table.
"""

from __future__ import annotations

from typing import Iterable

BPE_MERGES = 64  # merge-table size (the bounded model, like k x dim in k-means)
BPE_TOP_WORDS = 512  # fit vocabulary cap: top words by (count desc, word asc)
EOW = "</w>"  # end-of-word marker (standard Sennrich formulation)


def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word: its characters plus the
    end-of-word marker (so merges can learn suffixes like 'er</w>'
    distinct from word-internal 'er')."""
    return tuple(word) + (EOW,)


def _apply_merge(
    syms: tuple[str, ...], pair: tuple[str, str], merged: str
) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right occurrence of ``pair``."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_counts: Iterable[tuple[str, int]], n_merges: int = BPE_MERGES
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from (word, count) pairs. Each round counts
    adjacent symbol pairs weighted by word count, merges the most frequent
    pair (ties -> lexicographically smallest), and rewrites the vocabulary.
    Stops early when no pair occurs at least twice (merging a
    frequency-1 pair memorizes a single word — noise, not structure)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        k = word_symbols(w)
        vocab[k] = vocab.get(k, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best, best_c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_c < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            k = _apply_merge(syms, best, merged)
            nxt[k] = nxt.get(k, 0) + c
        vocab = nxt
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style encode: repeatedly merge the LOWEST-RANK pair present
    (not left-to-right greedy — rank order is what makes encoding agree
    with training). Unseen characters simply stay singleton symbols."""
    syms: tuple[str, ...] = word_symbols(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = _apply_merge(syms, best_pair, best_pair[0] + best_pair[1])
    return list(syms)


def bpe_encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize a whitespace-split text with a learned merge table."""
    ranks = {p: i for i, p in enumerate(merges)}
    toks: list[str] = []
    for w in text.split(" "):
        toks.extend(bpe_encode_word(w, ranks))
    return toks
