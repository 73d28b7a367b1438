"""Tokenizer-prep operators: bigram statistics and BPE training/encoding.

A training-data engine feeds tokenizer training as well as the model:
the expensive part of byte-pair-encoding construction is counting — the
corpus-scale passes — while the merge loop itself runs over the counted
vocabulary (Sennrich et al. 2016's published algorithm trains from a
``word → count`` table, which is |vocab|-bounded, not corpus-bounded;
GPT-2's tokenizer was built the same way).

Division of labor here:

- ``bigram_counts`` — corpus-scale, fully distributed: per-batch
  combiner partials (one row per DISTINCT adjacent pair per batch), one
  |pairs|-bounded groupby. SQL-verifiable.
- ``train_bpe`` — ONE distributed weighted word-count pass, then the
  deterministic merge loop on the counted vocab (driver-side by design:
  its input is |vocab| rows, not the corpus; the loop is inherently
  sequential — merge r+1 depends on merge r).
- ``BpeEncoder`` / ``bpe_token_counts`` — corpus-scale encode with the
  learned merges broadcast once per actor; per-unique-word memoization
  makes the per-batch cost ∝ distinct words, not occurrences.

Determinism: ties in the merge loop break on (count desc, pair asc),
so the merge table is a pure function of the corpus multiset —
layout-invariant and reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_END = "</w>"  # word-final marker (Sennrich convention)


# ---------------------------------------------------------------------------
# bigram counts (SQL-verifiable corpus statistic)
# ---------------------------------------------------------------------------


def bigram_counts(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(a, b, n): corpus-wide counts of adjacent token pairs
    (single-space tokenization, pairs never cross documents)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values.to_pandas().to_numpy()
        if len(flat) < 2:
            return pa.table(
                {"a": pa.array([], pa.string()),
                 "b": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        mask = np.ones(len(flat) - 1, dtype=bool)
        inner = off[1:-1]  # doc boundaries: pair (V[k], V[k+1]) invalid
        mask[inner - 1] = False
        df = pd.DataFrame({"a": flat[:-1][mask], "b": flat[1:][mask]})
        g = df.groupby(["a", "b"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "a": pa.array(g["a"], pa.string()),
                "b": pa.array(g["b"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Sum("cnt", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# BPE training (distributed count → vocab-bounded merge loop)
# ---------------------------------------------------------------------------


def _word_counts(ds: ray.data.Dataset, text_col: str) -> pd.DataFrame:
    """Distributed (word, count) — the combiner-shaped pass; the result
    is |vocab| rows (the only thing the driver ever holds)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), pattern=" ")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pd.Series(flat.to_pandas(), dtype="object").value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="count"))
        .take_all()
    )
    return pd.DataFrame(rows)


def train_bpe(
    ds: ray.data.Dataset,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> pd.DataFrame:
    """Learn up to ``n_merges`` BPE merges from the corpus →
    DataFrame(rank, left, right, merged). Stops early when no pair
    reaches ``min_pair_count``."""
    wc = _word_counts(ds, text_col)
    seqs: list[list[str]] = [list(w) + [_END] for w in wc["word"]]
    counts = wc["count"].to_numpy()

    merges: list[tuple[int, str, str, str]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        # deterministic: count desc, then lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_pair_count:
            break
        merged = left + right
        merges.append((rank, left, right, merged))
        for j, seq in enumerate(seqs):
            k = 0
            out = []
            while k < len(seq):
                if k + 1 < len(seq) and seq[k] == left and seq[k + 1] == right:
                    out.append(merged)
                    k += 2
                else:
                    out.append(seq[k])
                    k += 1
            seqs[j] = out
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged"]
    ).astype({"rank": "int32"})


# ---------------------------------------------------------------------------
# corpus encode with learned merges (actor-pool stage)
# ---------------------------------------------------------------------------


class BpeEncoder:
    """Actor-pool stage: text → BPE token counts per batch partial.

    Merges load once per actor (``__init__``); encoding applies them in
    rank order per the standard algorithm, memoized per distinct word so
    batch cost is ∝ unique words."""

    def __init__(self, merges: pd.DataFrame) -> None:
        self.ranks = {
            (l, r): (int(k), m)
            for k, l, r, m in zip(
                merges["rank"], merges["left"], merges["right"],
                merges["merged"],
            )
        }
        self._memo: dict[str, list[str]] = {}

    def encode_word(self, word: str) -> list[str]:
        got = self._memo.get(word)
        if got is not None:
            return got
        seq = list(word) + [_END]
        while len(seq) > 1:
            best_rank, best_i = None, -1
            for i in range(len(seq) - 1):
                hit = self.ranks.get((seq[i], seq[i + 1]))
                if hit is not None and (best_rank is None or hit[0] < best_rank):
                    best_rank, best_i = hit[0], i
            if best_rank is None:
                break
            l, r = seq[best_i], seq[best_i + 1]
            m = self.ranks[(l, r)][1]
            out = []
            k = 0
            while k < len(seq):  # apply the winning merge EVERYWHERE
                if k + 1 < len(seq) and seq[k] == l and seq[k + 1] == r:
                    out.append(m)
                    k += 2
                else:
                    out.append(seq[k])
                    k += 1
            seq = out
        self._memo[word] = seq
        return seq

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), pattern=" ")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pd.Series(flat.to_pandas(), dtype="object").value_counts()
        agg: dict[str, int] = {}
        for word, c in vc.items():
            for tok in self.encode_word(word):
                agg[tok] = agg.get(tok, 0) + int(c)
        return pa.table(
            {
                "token": pa.array(list(agg.keys()), pa.string()),
                "cnt": pa.array(
                    np.fromiter(agg.values(), dtype=np.int64, count=len(agg))
                ),
            }
        )


def bpe_token_counts(
    ds: ray.data.Dataset, merges: pd.DataFrame, concurrency=(1, 8)
) -> ray.data.Dataset:
    """(token, n) over the BPE-encoded corpus — combiner partials per
    batch, one |tokens|-bounded groupby."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            BpeEncoder,
            fn_constructor_kwargs={"merges": merges},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="n"))
    )
