"""Contained-document detection: exact substring pairs at corpus scale.

≙ the reference's shrunk/partial-copy use case (docs/index.md:20-22,38)
applied to text: find every ordered pair (contained, container) where one
document's text occurs verbatim inside another's.

Shape: winnowing fingerprints as candidate keys (Schleimer et al. — two
texts sharing a token run of >= w+k-1 tokens share a selected
fingerprint), hash-partition groupby, then EXACT char-level substring
verification inside the partition (CPython's two-way `in` — the
suffix-automaton-class check). Guarantee: containments of at least
``w + k - 1`` tokens are always found; shorter fragments are below the
fingerprint resolution (tune ``w`` down for finer recall at more keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.config import SignatureConfig
from deduplidog_ray.stages.signatures import shingle_hashes, winnow_keys


def contained_doc_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    winnow_w: int = 4,
    partitions: int = 64,
    seed: int = 0x5EED,
) -> pd.DataFrame:
    """All ordered (contained_id, container_id) exact-substring pairs.

    Candidates via winnowing; verification is char-exact, so the result
    equals the O(n^2) SQL ``position(a.text IN b.text) > 0`` wherever the
    shared run is >= winnow_w + shingle_k - 1 tokens.
    """

    def _keys(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        flat, off = shingle_hashes(texts, shingle_k, seed)
        wdoc, wval, _ = winnow_keys(flat, off, winnow_w)
        out = t.select([id_col, text_col]).take(pa.array(wdoc))
        part = (wval % np.uint64(partitions)).astype(np.int64)
        out = out.append_column("wkey", pa.array(wval.view(np.int64)))
        return out.append_column("part", pa.array(part))

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        pairs: set[tuple[int, int]] = set()
        for _, seg in g.groupby("wkey", sort=False):
            if len(seg) < 2:
                continue
            ids = seg[id_col].to_numpy()
            texts = seg[text_col].to_numpy()
            for i in range(len(seg)):
                for j in range(i + 1, len(seg)):
                    if ids[i] == ids[j]:
                        continue
                    if texts[i] in texts[j]:
                        pairs.add((ids[i], ids[j]))
                    if texts[j] in texts[i]:
                        pairs.add((ids[j], ids[i]))
        if not pairs:
            return pd.DataFrame(
                {"contained_id": pd.Series(dtype="int64"),
                 "container_id": pd.Series(dtype="int64")}
            )
        a, b = zip(*sorted(pairs))
        return pd.DataFrame({"contained_id": list(a), "container_id": list(b)})

    parts = ds.map_batches(_keys, batch_format="pyarrow", zero_copy_batch=True)
    out = parts.groupby("part").map_groups(_verify, batch_format="pandas")
    df = out.to_pandas()
    # the same pair can surface in several partitions (one per shared
    # fingerprint) — global distinct on the small result
    return (
        df.drop_duplicates()
        .sort_values(["contained_id", "container_id"], kind="stable")
        .reset_index(drop=True)
    )
