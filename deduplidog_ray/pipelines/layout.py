"""Training-data layout operators: sequence packing + deterministic shuffle.

After dedup/filtering, a training pipeline has to LAY OUT the surviving
documents: pack variable-length docs into fixed token-budget sequences
(so no compute is wasted on padding) and assign a deterministic global
shuffle order (so every epoch's data order is reproducible from a seed,
with no RNG state anywhere in the job).

- :func:`seq_pack` — greedy first-fit-in-order packing of documents into
  ``cap``-token bins, independently per ``source`` partition. Packing is
  inherently a sequential scan, so the scale design makes the SCAN unit the
  partition: ``groupby(source).map_groups`` runs every source's scan in
  parallel, and within a group the greedy fill is computed with an
  O(#bins · log n) searchsorted walk over the token-count prefix sum — not
  a per-row Python loop. Partitioning assumption: one source's docs fit a
  worker (the same assumption every per-group op in this repo documents);
  for a jumbo source, pre-split by ``doc_id`` range — greedy packing
  composes across contiguous splits except at the single seam bin.
- :func:`epoch_shuffle` — bijective multiplicative hash of ``doc_id``
  (Knuth 2654435761 mod 2^32: odd multiplier ⇒ a PERMUTATION of [0,2^32),
  so keys are tie-free) as the shuffle key, then a global dense rank
  WITHOUT a full sort operator: bucket = top 8 key bits → per-bucket
  counts from a tiny combiner pass (256 partial rows per block, summed on
  the driver) → broadcast prefix-sum offsets → one ``groupby(bucket)``
  shuffle where each bucket locally argsorts its keys and adds its offset.
  Two passes over the input, but the only all-to-all moves (doc_id, key)
  pairs — never payload columns.

Both are exactly SQL-reproducible (recursive-CTE greedy scan;
``row_number() OVER (ORDER BY key)``), giving the driver hard oracles for
ops that are usually left unverified in data pipelines.

≙ reference scope: none (the reference flags duplicates in place); these
are the "beyond-reference" corpus-layout ops of SURVEY.md §2.9-2.10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.pipelines.repetition import _doc_tokens

#: Knuth multiplicative constant — same as sampling.py so every layout /
#: sampling decision in the engine derives from one SQL-expressible mix.
_KNUTH32 = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)
_BUCKET_SHIFT = np.uint64(24)      # top 8 bits of the 32-bit key → 256 buckets


def _token_counts(t: pa.Table) -> pa.Table:
    parents, _flat = _doc_tokens(t["text"])
    n_tok = np.bincount(parents, minlength=len(t)).astype(np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "source": t["source"],
            "n_tok": pa.array(n_tok),
        }
    )


def _greedy_fill(n_tok: np.ndarray, cap: int) -> np.ndarray:
    """Greedy first-fit-in-order bin ids for an ordered token-count vector.

    O(#bins) searchsorted walk over the prefix sum; every doc between two
    bin boundaries is assigned vectorized. A doc larger than ``cap`` gets a
    bin of its own (same rule as the SQL oracle's running-fill recursion).
    """
    n = len(n_tok)
    prefix = np.concatenate(([0], np.cumsum(n_tok)))
    bounds = [0]
    pos = 0
    while pos < n:
        j = int(np.searchsorted(prefix, prefix[pos] + cap, side="right")) - 1
        j = max(j, pos + 1)        # oversized doc → its own bin
        bounds.append(j)
        pos = j
    sizes = np.diff(np.asarray(bounds, dtype=np.int64))
    return np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)


def clips_pack(
    ds: ray.data.Dataset, cap_ms: int = 30_000
) -> ray.data.Dataset:
    """`seq_pack` on the AUDIO axis: pack clips into ``cap_ms``-duration
    training bins (batched ASR/audio-LM examples waste no compute on
    padding), greedy first-fit in ``clip_id`` order per SAMPLE RATE —
    clips in one bin must share a rate to concatenate without resample.
    Emits (clip_id, sr_hz, dur_ms, bin_id); bin ids are dense per rate
    group. Same scan-unit-is-the-partition scale story as `seq_pack`
    (|distinct rates| groups, each an O(#bins·log n) prefix-sum walk).
    """

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("clip_id", kind="stable")
        return pd.DataFrame(
            {
                "clip_id": g["clip_id"].to_numpy(),
                "sr_hz": g["sr_hz"].to_numpy(),
                "dur_ms": g["dur_ms"].to_numpy(),
                "bin_id": _greedy_fill(
                    g["dur_ms"].to_numpy().astype(np.int64), cap_ms
                ),
            }
        )

    return ds.groupby("sr_hz").map_groups(
        _pack, batch_format="pandas", num_cpus=0.5
    )


def seq_pack(
    ds: ray.data.Dataset, cap: int = 512, num_partitions: int = 64
) -> ray.data.Dataset:
    """Pack docs into ``cap``-token bins, greedy in ``doc_id`` order per
    source. Emits (doc_id, source, n_tok, bin_id)."""

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "source": g["source"].to_numpy(),
                "n_tok": g["n_tok"].to_numpy(),
                "bin_id": _greedy_fill(g["n_tok"].to_numpy(), cap),
            }
        )

    return (
        ds.map_batches(_token_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(_pack, batch_format="pandas", num_cpus=0.5)
    )


def _shuffle_key(doc_id: np.ndarray) -> np.ndarray:
    # bijective ONLY on [0, 2^32): ids beyond that collide mod 2^32 and
    # the 'reproducible across layouts' contract breaks silently — raise
    # like sort.py does for out-of-range keys (never silently mis-rank);
    # corpora with wider ids should remap to dense int64 first
    ids = doc_id.astype(np.uint64)
    if len(ids) and ids.max() >= _MOD32:
        raise OverflowError(
            "epoch_shuffle requires doc_id < 2^32 for a bijective key; "
            "remap ids to a dense range first"
        )
    return (ids * _KNUTH32) % _MOD32


def epoch_shuffle(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic global shuffle order: (doc_id, pos) where ``pos`` is
    the dense rank of the bijective Knuth key — a seeded permutation of the
    corpus with zero RNG state, reproducible across runs and layouts."""

    def _partial_counts(t: pa.Table) -> pa.Table:
        key = _shuffle_key(t[id_col].to_numpy())
        bc = np.bincount((key >> _BUCKET_SHIFT).astype(np.int64), minlength=256)
        nz = np.nonzero(bc)[0]
        return pa.table(
            {"bucket": pa.array(nz.astype(np.int64)), "n": pa.array(bc[nz])}
        )

    # pass 1: 256-row-bounded partials → driver prefix sums (tiny)
    parts = (
        ds.map_batches(_partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("bucket")["n"]
        .sum()
    )
    counts = np.zeros(256, dtype=np.int64)
    counts[parts.index.to_numpy()] = parts.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(counts)))[:256]

    def _with_bucket(t: pa.Table) -> pa.Table:
        key = _shuffle_key(t[id_col].to_numpy())
        return pa.table(
            {
                id_col: t[id_col],
                "_key": pa.array(key.view(np.int64)),
                "bucket": pa.array((key >> _BUCKET_SHIFT).astype(np.int64)),
            }
        )

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        key = g["_key"].to_numpy().view(np.uint64)
        order = np.argsort(key, kind="stable")     # tie-free: key is bijective
        pos = np.empty(len(g), dtype=np.int64)
        pos[order] = offsets[b] + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({id_col: g[id_col].to_numpy(), "pos": pos})

    return (
        ds.map_batches(_with_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_rank, batch_format="pandas", num_cpus=0.5)
    )
