"""Byte-level BPE tokenizer — train + distributed encode.

The brief's token-counting operator, upgraded to a real trainable
byte-pair encoder (Sennrich et al. 2016; the GPT-2 byte-level
variant without the regex pre-split). Public algorithm, from scratch.

Shape: TRAINING runs on a bounded sample (merge selection is an
inherently sequential greedy loop — every production tokenizer trains
offline on a sample); ENCODING is the corpus-scale stage — a
``map_batches`` callable class whose merge table builds once per
worker and applies per document.

Determinism: merge ties break on the lexicographically smallest pair,
so identical corpora give identical vocabularies everywhere.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


def train_bpe(texts, n_merges: int = 256) -> list[tuple[int, int]]:
    """Greedy BPE merge list over the byte corpus. Token ids: 0-255 =
    raw bytes; merge i creates id 256+i."""
    seqs = [list(t.encode("utf-8")) for t in texts if t]
    merges: list[tuple[int, int]] = []
    for step in range(n_merges):
        counts: Counter = Counter()
        for s in seqs:
            counts.update(zip(s, s[1:]))
        if not counts:
            break
        best_n = max(counts.values())
        pair = min(p for p, c in counts.items() if c == best_n)
        if best_n < 2:
            break
        merges.append(pair)
        new_id = 256 + step
        for si, s in enumerate(seqs):
            out = []
            i = 0
            while i < len(s):
                if (i + 1 < len(s)
                        and s[i] == pair[0] and s[i + 1] == pair[1]):
                    out.append(new_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[si] = out
    return merges


def bpe_encode(text: str, ranks: dict[tuple[int, int], int]) -> list[int]:
    """Encode one string: repeatedly merge the best-ranked adjacent
    pair (the standard BPE apply loop)."""
    s = list(text.encode("utf-8"))
    while len(s) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [256 + best_rank]
    return s


def bpe_decode(ids: list[int],
               merges: list[tuple[int, int]]) -> str:
    """Inverse: expand merged ids back to bytes."""
    table = {256 + i: p for i, p in enumerate(merges)}

    def expand(t: int) -> bytes:
        if t < 256:
            return bytes([t])
        a, b = table[t]
        return expand(a) + expand(b)

    return b"".join(expand(t) for t in ids).decode("utf-8", "replace")


class BPETokenizer:
    """``map_batches`` stage: adds ``bpe_tokens`` (list<int32>) and
    ``n_bpe_tokens`` columns. The merge-rank table ships in the
    closure and rebuilds once per worker (plain picklable callable)."""

    def __init__(self, merges: list[tuple[int, int]],
                 text_col: str = "text", ids_col: str | None = None):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.ids_col = ids_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        all_ids = []
        for t in batch[self.text_col].to_pylist():
            ids = bpe_encode(t or "", self.ranks)
            counts.append(len(ids))
            if self.ids_col:
                all_ids.append(ids)
        batch = batch.append_column(
            "n_bpe_tokens", pa.array(counts, pa.int64()))
        if self.ids_col:
            batch = batch.append_column(
                self.ids_col,
                pa.array(all_ids, pa.list_(pa.int32())))
        return batch


def train_bpe_on_dataset(ds, text_col: str = "text",
                         n_merges: int = 256,
                         sample_size: int = 2048):
    """Bounded-sample training (the only driver materialization —
    O(sample), the standard offline-tokenizer pattern)."""
    rows = ds.select_columns([text_col]).limit(sample_size).take_all()
    return train_bpe([r[text_col] for r in rows], n_merges)
