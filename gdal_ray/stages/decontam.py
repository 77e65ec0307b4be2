"""Benchmark decontamination — remove/flag training documents that
overlap evaluation sets (the GPT-3 appendix-C recipe, also Gopher
§A2: any document sharing an N-gram of ~13 normalized words with a
benchmark example is contaminated).

Shape: the benchmark side is SMALL (eval sets) — its n-gram hash set
builds once on the driver, is sorted and ``ray.put`` once, and every
corpus batch probes it with a vectorized ``searchsorted``. The corpus
side streams; nothing shuffles.

Normalization: lowercase + whitespace tokenization (the published
recipe's "normalized words"). Hashing: per-token FNV folded through a
polynomial rolling combination, so each document's n-gram hashes are
one vectorized window pass over its token-hash array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV = np.uint64(1099511628211)
_P = np.uint64(0x100000001B3)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            h = np.uint64(14695981039346656037)
            for b in t.encode("utf-8", "ignore"):
                h = (h ^ np.uint64(b)) * _FNV
            out[i] = h
    return out


def ngram_hashes(text: str, n: int = 13) -> np.ndarray:
    """Normalized word n-gram hashes of one document (empty when the
    document has fewer than n tokens — too short to contaminate)."""
    tokens = (text or "").lower().split()
    if len(tokens) < n:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(tokens)
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    pw = _P ** np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (win * pw[None, :]).sum(axis=1, dtype=np.uint64)


def build_contamination_index(bench_texts, n: int = 13) -> np.ndarray:
    """Sorted unique n-gram hashes of the benchmark corpus — the
    broadcast probe side (eval sets are MBs, never corpus-sized)."""
    parts = [ngram_hashes(t, n) for t in bench_texts]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(ds, index: np.ndarray, n: int = 13,
                  text_col: str = "text", mode: str = "flag"):
    """Flag (or drop) contaminated documents: one broadcast of the
    sorted benchmark hash set, one vectorized searchsorted probe per
    document. ``mode="flag"`` appends ``contaminated`` +
    ``n_contaminated_ngrams`` columns; ``mode="drop"`` keeps only
    clean documents."""
    import ray

    if mode not in ("flag", "drop"):
        raise ValueError(mode)
    ref = ray.put(np.asarray(index, dtype=np.uint64))

    def probe(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        flags, counts = [], []
        for t in batch[text_col].to_pylist():
            h = ngram_hashes(t, n)
            if len(h) == 0 or len(idx) == 0:
                flags.append(False)
                counts.append(0)
                continue
            pos = np.searchsorted(idx, h)
            pos[pos == len(idx)] = len(idx) - 1
            hit = idx[pos] == h
            flags.append(bool(hit.any()))
            counts.append(int(hit.sum()))
        if mode == "drop":
            return batch.filter(pa.array([not f for f in flags]))
        return batch.append_column(
            "contaminated", pa.array(flags, pa.bool_())
        ).append_column(
            "n_contaminated_ngrams", pa.array(counts, pa.int64())
        )

    return ds.map_batches(probe, batch_format="pyarrow")
