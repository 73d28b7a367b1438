"""Span-level (paragraph-style) exact dedup — C4's keep-first policy.

Corpus-level pipelines dedup not just whole documents but repeated
SPANS across documents (C4 removed any three-sentence span seen
before; The Pile / RefinedWeb do the line/paragraph variant). This
module implements the keep-first-occurrence policy over fixed token
spans: every occurrence of a span after its first (ordered by
``(doc_id, pos)``) is cut out of its document's text.

Scale shape (three bounded exchanges, nothing driver-side):

1. **Explode** — spans are built inside ``map_batches`` entirely with
   Arrow C++: one ``split_pattern`` then a re-grouped ListArray +
   ``binary_join`` (no per-token Python).
2. **Winner selection** — ONE ``groupby`` shuffle partitioned by the
   64-bit span hash (corpus moves once); inside each of the P
   partitions the winner is a vectorized sort + ``duplicated`` on the
   TRUE span strings (hash is only the partitioner — two distinct
   spans colliding in 64 bits must not merge, same rule as
   ``exact.py``). Only the loser coordinates ``(doc_id, pos)`` leave —
   the exchange back is ∝ duplicate instances, not the corpus.
3. **Rebuild** — drops union'd with the docs, ONE ``groupby`` keyed by
   ``hash(doc_id) % P`` (P-bounded UDF dispatch), per-doc splice.

≙ beyond-reference LLM-pipeline op (task sheet); the keep-first rule is
the span-granular analog of the reference's "first match wins"
(deduplidog/deduplidog.py:492-494).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from deduplidog_ray.pipelines.exact import DEFAULT_PARTITIONS, add_key_hash
from deduplidog_ray.stages.hashing import hash_arrow_u64


def _explode_spans(t: pa.Table, id_col: str, text_col: str,
                   span_tokens: int) -> pa.Table:
    """(doc_id, pos, span) — one row per ``span_tokens``-token span.
    Tokens are single-space splits (mirrors SQL ``string_split``); the
    last span of a doc may be shorter. All string work is Arrow C++."""
    toks = pc.split_pattern(t[text_col], pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    tok_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = np.diff(tok_off)                       # tokens per doc (≥1)
    n_span = -(-n_tok // span_tokens)              # ceil; '' → 1 span
    # span-grouped list offsets: for doc j, tok_off[j] + {0, s, 2s, …}
    total = int(n_span.sum())
    starts = np.repeat(tok_off[:-1], n_span)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_span)[:-1])), n_span
    )
    span_off = np.empty(total + 1, dtype=np.int32)
    span_off[:-1] = starts + pos * span_tokens
    span_off[-1] = tok_off[-1]
    grouped = pa.ListArray.from_arrays(
        pa.array(span_off), toks.values
    )
    spans = pc.binary_join(grouped, " ")
    ids = pc.take(t[id_col], pa.array(np.repeat(
        np.arange(len(t), dtype=np.int64), n_span)))
    return pa.table(
        {id_col: ids, "pos": pa.array(pos + 1), "span": spans}
    )


def _losers(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Non-first occurrences of each TRUE span string in this hash
    partition → their (doc_id, pos) coordinates."""
    g = g.sort_values([ "span", id_col, "pos"], kind="stable")
    dup = g.duplicated(subset="span", keep="first")
    out = g.loc[dup, [id_col, "pos"]]
    return out if len(out) else pd.DataFrame(
        {id_col: pd.Series([], dtype=g[id_col].dtype),
         "pos": pd.Series([], dtype="int64")}
    )


def dedup_repeated_spans(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """→ (id_col, text_dedup, n_spans, n_dropped): every span occurrence
    after its global first (ordered by ``(doc_id, pos)``) removed."""

    spans = docs.map_batches(
        lambda t: _explode_spans(t, id_col, text_col, span_tokens),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hashed = add_key_hash(spans, ["span"], partitions=partitions)
    drops = hashed.groupby("_part").map_groups(
        lambda g: _losers(g, id_col), batch_format="pandas"
    )

    # rebuild: union (docs ⊎ drops) keyed by hash(doc_id) % P
    def _tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "payload": t[text_col],
                "pos": pa.array(np.full(len(t), -1, dtype=np.int64)),
            }
        )

    def _tag_drops(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "payload": pa.nulls(len(t), pa.string()),
                "pos": pc.cast(t["pos"], pa.int64()),
            }
        )

    def _bucket(t: pa.Table) -> pa.Table:
        h = hash_arrow_u64(t[id_col], seed=0x5BA2)
        part = (h % np.uint64(partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(part))

    both = (
        docs.map_batches(_tag_docs, batch_format="pyarrow",
                         zero_copy_batch=True)
        .union(drops.map_batches(_tag_drops, batch_format="pyarrow",
                                 zero_copy_batch=True))
        .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )

    def _rebuild(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["pos"] < 0]
        dropped = g[g["pos"] > 0]
        drop_map: dict = {}
        for did, p in zip(dropped[id_col].to_numpy(),
                          dropped["pos"].to_numpy()):
            drop_map.setdefault(did, set()).add(int(p))
        out_ids, out_txt, out_ns, out_nd = [], [], [], []
        for did, text in zip(texts[id_col].to_numpy(),
                             texts["payload"].to_numpy()):
            if text is None:          # null text: no spans, pass through
                out_ids.append(did)
                out_txt.append(None)
                out_ns.append(0)
                out_nd.append(0)
                continue
            toks = text.split(" ")
            n = -(-len(toks) // span_tokens)
            gone = drop_map.get(did, ())
            kept = [
                " ".join(toks[i * span_tokens : (i + 1) * span_tokens])
                for i in range(n)
                if (i + 1) not in gone
            ]
            out_ids.append(did)
            out_txt.append(" ".join(kept))
            out_ns.append(n)
            out_nd.append(len(gone))
        return pd.DataFrame(
            {
                id_col: pd.Series(out_ids, dtype=texts[id_col].dtype),
                "text_dedup": out_txt,
                "n_spans": pd.Series(out_ns, dtype="int32"),
                "n_dropped": pd.Series(out_nd, dtype="int32"),
            }
        )

    return both.groupby("_part").map_groups(
        _rebuild, batch_format="pandas"
    )
