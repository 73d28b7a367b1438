"""Similarity search over an embedding column (list<float>).

Two paths per the task sheet:
  - brute-force cosine top-k: numpy matmul per batch against a broadcast
    query matrix (``ray.put`` ONCE, read per task — never re-shipped per
    batch), partial top-k per batch, merged on the driver (tiny).
  - LSH-bucketed variant (scale path): random-hyperplane signatures put
    both corpus and query vectors into Hamming buckets; only colliding
    buckets are scored — the candidate-generation shuffle pattern shared
    with the dedup engine (stages/candidates.py).

Embedding near-dup (cosine >= threshold pairs) reuses the same hyperplane
bucketing as candidate generation.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _mat_from_list_col(col, dtype=np.float32) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dim = len(col[0])
    flat = col.values.to_numpy(zero_copy_only=False).astype(dtype)
    return flat.reshape(len(col), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def knn_cosine_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dtype=np.float32,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row → (query_idx, vec_id, cos).

    The query matrix is broadcast via ``ray.put`` once; each batch computes
    one (B, Q) matmul and emits only its local top-k rows, so the driver
    merges Q*k*num_batches candidate rows, never the corpus.
    ``dtype=float64`` gives bit-parity with SQL-engine ranking.
    """
    qn = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(qn)

    def _score(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)                       # plasma-local, zero-copy
        m = _normalize(_mat_from_list_col(t[vec_col], dtype))
        sims = m @ q.T                           # (B, Q)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]    # (kk, Q)
        qi = np.repeat(np.arange(q.shape[0]), kk)
        ri = top.T.reshape(-1)
        return pa.table(
            {
                "query_idx": pa.array(qi.astype(np.int64)),
                id_col: pa.array(ids[ri]),
                "cos": pa.array(sims[ri, qi].astype(np.float64)),
            }
        )

    parts = ds.map_batches(_score, batch_format="pyarrow", batch_size=4096,
                           zero_copy_batch=True)
    # driver-side merge of per-batch partial top-k (small)
    best: dict[int, list] = {}
    for b in parts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, vid, cos in zip(
            b["query_idx"].to_pylist(), b[id_col].to_pylist(), b["cos"].to_pylist()
        ):
            h = best.setdefault(qi, [])
            if len(h) < k:
                heapq.heappush(h, (cos, vid))
            elif cos > h[0][0]:
                heapq.heapreplace(h, (cos, vid))
    rows = []
    for qi in sorted(best):
        for cos, vid in sorted(best[qi], key=lambda x: (-x[0], x[1])):
            rows.append((qi, vid, cos))
    return pd.DataFrame(rows, columns=["query_idx", id_col, "cos"])


def hyperplane_signatures(m: np.ndarray, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(m.shape[1], n_bits)).astype(np.float32)
    return (m @ planes > 0).astype(np.uint8)


def knn_cosine_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 16,
    probe_hamming: int = 2,
    seed: int = 0x11A5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: score only rows whose hyperplane signature is
    within ``probe_hamming`` of the query's (multi-probe LSH).

    Scale path: the bucket filter prunes the matmul to a small corpus
    fraction; recall controlled by (n_bits, probe_hamming).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(qn.shape[1], n_bits)).astype(np.float32)
    q_sig = (qn @ planes > 0).astype(np.uint8)               # (Q, n_bits)
    ctx = ray.put((qn, planes, q_sig))

    def _score(t: pa.Table) -> pa.Table:
        q, pl, qs = ray.get(ctx)
        m = _normalize(_mat_from_list_col(t[vec_col]))
        sig = (m @ pl > 0).astype(np.uint8)                  # (B, n_bits)
        # Hamming between each row and each query signature
        ham = (sig[:, None, :] != qs[None, :, :]).sum(axis=2)  # (B, Q)
        cand = ham <= probe_hamming
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ri, qi = np.nonzero(cand)
        if len(ri) == 0:
            return pa.table(
                {"query_idx": pa.array([], type=pa.int64()),
                 id_col: pa.array([], type=pa.int64()),
                 "cos": pa.array([], type=pa.float32())}
            )
        sims = np.einsum("ij,ij->i", m[ri], q[qi])
        return pa.table(
            {
                "query_idx": pa.array(qi.astype(np.int64)),
                id_col: pa.array(ids[ri]),
                "cos": pa.array(sims.astype(np.float32)),
            }
        )

    parts = ds.map_batches(_score, batch_format="pyarrow", batch_size=4096,
                           zero_copy_batch=True)
    best: dict[int, list] = {}
    for b in parts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, vid, cos in zip(
            b["query_idx"].to_pylist(), b[id_col].to_pylist(), b["cos"].to_pylist()
        ):
            h = best.setdefault(qi, [])
            if len(h) < k:
                heapq.heappush(h, (cos, vid))
            elif cos > h[0][0]:
                heapq.heapreplace(h, (cos, vid))
    rows = []
    for qi in sorted(best):
        for cos, vid in sorted(best[qi], key=lambda x: (-x[0], x[1])):
            rows.append((qi, vid, cos))
    return pd.DataFrame(rows, columns=["query_idx", id_col, "cos"])


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    n_bits: int = 12,
    seed: int = 0xE5B,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: bucket by hyperplane signature, verify
    cosine within buckets — the dedup candidate-shuffle pattern applied to
    vectors. Returns (a, b, cos) with a < b."""
    rng = np.random.default_rng(seed)
    planes_ref = None

    def _bucket(t: pa.Table) -> pa.Table:
        nonlocal planes_ref
        m = _normalize(_mat_from_list_col(t[vec_col]))
        r = np.random.default_rng(seed)        # deterministic per task
        pl = r.normal(size=(m.shape[1], n_bits)).astype(np.float32)
        sig = (m @ pl > 0).astype(np.uint64)
        bucket = np.zeros(len(m), dtype=np.uint64)
        for i in range(n_bits):
            bucket |= sig[:, i] << np.uint64(i)
        out = pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "bucket": pa.array(bucket.view(np.int64)),
            }
        )
        return out

    def _verify(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return pa.table(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 "cos": pa.array([], type=pa.float32())}
            )
        m = _normalize(_mat_from_list_col(g[vec_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        ii, jj = iu[0][mask], iu[1][mask]
        a, b = ids[ii], ids[jj]
        swap = a > b
        return pa.table(
            {
                "a": pa.array(np.where(swap, b, a)),
                "b": pa.array(np.where(swap, a, b)),
                "cos": pa.array(sims[iu][mask].astype(np.float32)),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_verify, batch_format="pyarrow")
    )
