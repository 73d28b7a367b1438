"""Document chunking: split long docs into fixed-size overlapping token
windows.

The context-window prep step of a training pipeline (long docs → model-
sized pieces with overlap so no boundary context is lost). Pure
``flat_map``-shaped streaming transform: each input batch expands into
chunk rows independently — no shuffle, no state, layout-invariant.

Chunk rule (SQL-replicable): whitespace tokens; windows start at
0, stride, 2·stride, … while start < n_tokens; each window keeps
``chunk_tokens`` tokens (shorter at the tail); text is rebuilt with
single spaces. Empty/whitespace-only docs emit no chunks. Equals DuckDB
``generate_series(1, len(ts), stride)`` + ``list_slice`` (driver oracle
``doc_chunks``).

≙ the reference's per-file work-list decomposition (deduplidog.py:196-197
slices the corpus into workable units); here the unit is the token
window a trainer actually consumes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.signatures import tokenize_offsets


def chunk_docs(
    ds: ray.data.Dataset,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """documents → (doc_id, chunk_id, n_tokens, chunk_text) rows."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def _chunks(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks, off = tokenize_offsets(t[text_col].to_pylist())
        out_id, out_cid, out_n, out_txt = [], [], [], []
        for d in range(len(ids)):
            lo, hi = off[d], off[d + 1]
            nt = hi - lo
            for c, start in enumerate(range(0, int(nt), stride)):
                piece = toks[lo + start: lo + min(start + chunk_tokens, nt)]
                out_id.append(ids[d])
                out_cid.append(c)
                out_n.append(len(piece))
                out_txt.append(" ".join(piece))
        return pa.table(
            {
                # preserve the input id dtype (string doc ids are legal)
                id_col: pa.array(out_id, type=t[id_col].type),
                "chunk_id": pa.array(np.asarray(out_cid, dtype=np.int64)),
                "n_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
                "chunk_text": pa.array(out_txt, type=pa.string()),
            }
        )

    return ds.map_batches(_chunks, batch_format="pyarrow",
                          zero_copy_batch=True)
