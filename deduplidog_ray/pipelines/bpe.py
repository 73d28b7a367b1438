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

from deduplidog_ray.stages.textguards import assert_sql_exact_text

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
        # loud precondition (ADVICE r4): train_bpe is the engine side
        # of the chr(30)-framed SQL oracle (train_bpe_sql); reserved
        # separators / odd whitespace in the text would break parity
        # silently, so refuse them per batch instead
        assert_sql_exact_text(t[text_col], "bpe.train_bpe")
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
    if not rows:
        # zero-word corpus (all docs empty/whitespace): typed empty
        # frame so the merge loop sees zero words, not a KeyError
        return pd.DataFrame({"word": pd.Series(dtype="object"),
                             "count": pd.Series(dtype="int64")})
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


# ---------------------------------------------------------------------------
# DuckDB oracle for train_bpe (driver-verifiable merge loop)
# ---------------------------------------------------------------------------


def train_bpe_sql(
    n_merges: int = 50,
    table: str = "documents",
    text_col: str = "text",
    min_pair_count: int = 2,
) -> str:
    """Generate the DuckDB oracle for :func:`train_bpe` — the full
    deterministic merge loop unrolled as ``n_merges`` chained CTE
    iterations over the |vocab|-bounded word-count table.

    Encoding: each word is a separator-framed string with TWO chr(30)
    separators between adjacent symbols (``␟␟c1␟␟c2␟␟</w>␟␟``). A merge
    of pair (l, r) is ``replace(repr, ␟l␟␟r␟, ␟lr␟)`` — the pattern
    consumes ONE separator on each side, leaving one outside, so the
    two-separator invariant survives and consecutive occurrences sharing
    a boundary are all found; this reproduces the engine's greedy
    left-to-right scan exactly (``a a a a`` merges to ``aa aa``, unlike
    a single-separator encoding where ``replace`` would skip the
    boundary-sharing second match). Tie-break ``ORDER BY c DESC, l, r``
    equals the engine's ``(-count, pair)`` tuple min under binary
    collation. An iteration whose best pair falls below
    ``min_pair_count`` yields an empty ``b{r}``; the coalesce fallback
    pattern (five consecutive separators, unreachable — reprs carry at
    most two) makes every later iteration a no-op, mirroring the
    engine's loop break."""
    s1 = "chr(30)"
    s2 = "chr(30)||chr(30)"
    parts = [f"""
        WITH wc AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_filter(
              string_split(coalesce({text_col}, ''), ' '),
              x -> x <> '')) AS word
            FROM {table}
          ) GROUP BY word
        ), w0 AS MATERIALIZED (
          SELECT {s2} || array_to_string(
                   list_append(
                     list_transform(generate_series(1, length(word)),
                                    i -> word[i]),
                     '{_END}'),
                   {s2}) || {s2} AS repr,
                 cnt
          FROM wc
        )"""]
    for r in range(1, n_merges + 1):
        parts.append(f""", p{r} AS MATERIALIZED (
          SELECT l, r2, sum(cnt) AS c FROM (
            SELECT q.syms[u.i] AS l, q.syms[u.i+1] AS r2, q.cnt
            FROM (
              SELECT list_filter(string_split(repr, {s2}),
                                 x -> x <> '') AS syms, cnt
              FROM w{r - 1}
            ) q, unnest(generate_series(1, len(q.syms) - 1)) AS u(i)
          ) GROUP BY l, r2
        ), b{r} AS MATERIALIZED (
          SELECT l, r2, c FROM p{r}
          WHERE c >= {min_pair_count}
          ORDER BY c DESC, l, r2 LIMIT 1
        ), w{r} AS MATERIALIZED (
          SELECT replace(repr,
                   coalesce((SELECT {s1}||l||{s2}||r2||{s1} FROM b{r}),
                            repeat({s1}, 5)),
                   coalesce((SELECT {s1}||l||r2||{s1} FROM b{r}), '')
                 ) AS repr,
                 cnt
          FROM w{r - 1}
        )""")
    selects = "\n          UNION ALL ".join(
        f"""SELECT CAST({r - 1} AS INTEGER) AS rank,
                   l AS "left", r2 AS "right", l || r2 AS merged
            FROM b{r}"""
        for r in range(1, n_merges + 1)
    )
    parts.append(f"""
        SELECT * FROM (
          {selects}
        ) ORDER BY rank
    """)
    return "".join(parts)
