"""Within-document repetition stats + corpus-LM scoring.

Two quality signals every large-scale training-data pipeline runs (the
"Gopher rules" family of repetition filters, and unigram-LM scoring a la
CCNet's perplexity bucketing) re-expressed Ray-Data-first:

- :func:`doc_repetition` — per-document repeated-token fractions. Purely
  row-local, so it is ONE streaming ``map_batches`` with no shuffle at all;
  the only cross-token state is within a single document, and documents
  never span batches.
- :func:`lm_score` — mean unigram probability of each document under a
  model trained on the corpus itself. Two passes: pass 1 is the existing
  |vocab|-bounded ``token_freq`` combiner aggregate, pass 2 broadcasts the
  (vocab, counts) model once via ``ray.put`` and scores every batch
  vectorized inside an actor pool (model load in ``__init__``, scoring in
  ``__call__`` — the model-in-actor pattern, same shape a KenLM / neural
  LM scorer would take; here the "model" is the exact unigram table so the
  DuckDB oracle can reproduce scores bit-for-bit).

Design notes for 100 TB:
- Tokenization runs on Arrow's RE2 engine (``pc.split_pattern_regex``),
  the same engine DuckDB uses, so ``\\w`` semantics agree on ANY corpus
  (ADVICE r2 #3), and no Python-per-row findall exists in the hot path.
- All ratio outputs are a SINGLE double division of two exact int64s
  (IEEE-exact, order-free) — never a float accumulation whose summation
  order could diverge between engines.
- ``lm_score``'s broadcast model is |vocab|-bounded; prune with
  ``min_count`` when vocabulary outgrows worker heap (a 100M-type vocab at
  16 bytes/entry is ~1.6 GB — shard or prune). ``sum_freq`` saturates
  int64 only past ~9e18 total tokens; a 100 TB corpus (~2e13 tokens) is
  five orders below that.

≙ reference scope: the reference has no quality scoring; these extend its
compare-and-flag semantics to the corpus-hygiene operators the north rule's
training-data setting implies (SURVEY.md §2.9 "beyond-reference" block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _doc_tokens(texts: pa.ChunkedArray | pa.Array, lower: bool = False):
    """(parent_idx, token) arrays for every token occurrence in the batch,
    RE2 ``\\w+`` semantics, fully vectorized (no per-row Python)."""
    col = pc.fill_null(texts, "")
    if lower:
        col = pc.utf8_lower(col)
    parts = pc.split_pattern_regex(col, pattern=r"[^\w]+")
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    mask = pc.not_equal(flat, "")
    return (
        parents.filter(mask).to_numpy().astype(np.int64),
        flat.filter(mask),
    )


def doc_repetition(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc repeated-token stats (Gopher-style repetition signals).

    Emits, per document: total token occurrences ``n_words``, the count of
    the single most frequent token ``top_word_count``, its fraction
    ``top_word_ratio``, and ``dup_word_count`` = occurrences of tokens that
    appear more than once. High ``top_word_ratio`` / dup fraction flags
    degenerate boilerplate-ish documents for removal.

    No shuffle: doc-local stats in one streaming pass.
    """

    def _rep(t: pa.Table) -> pa.Table:
        n = len(t)
        parents, flat = _doc_tokens(t["text"])
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        # factorize tokens once per batch; (doc, token) pair counts via
        # np.unique over a fused integer key
        codes, _uniq = pd.factorize(pd.Series(flat.to_pandas(), dtype="object"))
        vocab_n = codes.max() + 1 if len(codes) else 1
        fused = parents * np.int64(vocab_n) + codes
        pair_keys, pair_counts = np.unique(fused, return_counts=True)
        pair_docs = (pair_keys // vocab_n).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        np.maximum.at(top, pair_docs, pair_counts)
        dup = np.zeros(n, dtype=np.int64)
        dup_mask = pair_counts > 1
        np.add.at(dup, pair_docs[dup_mask], pair_counts[dup_mask])
        nz = np.maximum(n_words, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "top_word_count": pa.array(top),
                "top_word_ratio": pa.array(top.astype(np.float64) / nz),
                "dup_word_count": pa.array(dup),
            }
        )

    return ds.map_batches(_rep, batch_format="pyarrow", zero_copy_batch=True)


class _UnigramScorer:
    """Actor-pool callable: broadcast unigram model in, per-doc scores out.

    ``__init__`` dereferences the ``ray.put`` model ref ONCE per actor
    (zero-copy plasma read of the numpy arrays); ``__call__`` scores a
    batch with two vectorized passes (searchsorted lookup + segment sums).
    """

    def __init__(self, model_ref) -> None:
        vocab, counts, total = ray.get(model_ref)
        self.vocab = vocab          # sorted string ndarray
        self.counts = counts        # int64 ndarray aligned with vocab
        self.total = int(total)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        parents, flat = _doc_tokens(t["text"], lower=True)
        toks = flat.to_numpy(zero_copy_only=False)
        if len(self.vocab) == 0:
            # a fully-pruned vocabulary scores every token as unseen —
            # clip-to-(-1) on an empty array would IndexError instead
            freq = np.zeros(len(toks), dtype=np.int64)
        else:
            pos = np.searchsorted(self.vocab, toks)
            pos_c = np.clip(pos, 0, len(self.vocab) - 1)
            hit = self.vocab[pos_c] == toks
            freq = np.where(hit, self.counts[pos_c], 0)
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        sum_freq = np.zeros(n, dtype=np.int64)
        np.add.at(sum_freq, parents, freq)
        denom = np.maximum(n_words, 1).astype(np.float64) * float(self.total)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "sum_freq": pa.array(sum_freq),
                "mean_unigram_p": pa.array(sum_freq.astype(np.float64) / denom),
            }
        )


def lm_score(
    ds: ray.data.Dataset, concurrency: int = 4, min_count: int = 1
) -> ray.data.Dataset:
    """Score every document by mean unigram probability under the corpus's
    own token distribution (low = rare-word-heavy / junk; high = common).

    ``mean_unigram_p`` = (Σ_occurrences count(token)) / (n_words · total):
    integer arithmetic until one exactly-rounded double division, so the
    DuckDB oracle reproduces it bit-for-bit (a log-prob variant would hang
    on cross-libm ``ln`` ULPs and float summation order).

    Pass 1 (model training) reuses :func:`token_freq`'s combiner shape —
    the shuffle moves |vocab|-bounded partials. The collected model is
    driver-held once and ``ray.put`` once; actors read it zero-copy.
    """
    from deduplidog_ray.pipelines.textops import token_freq

    # |vocab|-bounded collect; at extreme vocabularies pass min_count > 1
    # to prune the broadcast model (tokens below it score 0, the same
    # treatment as out-of-vocabulary tokens in an increment)
    freq = token_freq(ds, min_count=min_count).to_pandas()
    freq = freq.sort_values("token", kind="stable")
    vocab = freq["token"].to_numpy(dtype=object)
    counts = freq["count"].to_numpy(dtype=np.int64)
    total = int(counts.sum())
    model_ref = ray.put((vocab, counts, total))

    return ds.map_batches(
        _UnigramScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        batch_size=2048,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )


def dup_gram_ratio(
    ds: ray.data.Dataset,
    k: int = 3,
    seed: int = 0xD0C5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc duplicated-text score (C4/RefinedWeb-style): among each
    document's DISTINCT token k-grams, the fraction that occur in >= 2
    distinct documents corpus-wide → (doc_id, n_grams, n_dup, dup_ratio).

    Two streaming passes + one |distinct grams|-bounded shuffle:
    the boilerplate census (`frequent_gram_set`, min_docs=2) yields the
    duplicated-gram hash set, broadcast ONCE; the scoring pass recomputes
    each doc's distinct grams and answers membership with one
    searchsorted — no per-row Python, corpus never shuffles. Docs with
    fewer than k tokens emit no row (no grams to score). dup_ratio is a
    single int/int IEEE division, so the SQL oracle hashes bit-equal.

    Same 64-bit-hash membership asymmetry as `decontaminate` /
    `strip_boilerplate` (ADVICE r2 #4): a collision (~n²·2⁻⁶⁴) can only
    nudge a score, never drop data.
    """
    from deduplidog_ray.pipelines.boilerplate import (
        frequent_gram_set,
        positional_gram_hashes,
    )

    dup = frequent_gram_set(ds, k=k, min_docs=2, seed=seed,
                            text_col=text_col)
    ref = ray.put(dup)

    def _score(t: pa.Table) -> pa.Table:
        dup_sorted = ray.get(ref)
        texts = t[text_col].to_pylist()
        n = len(texts)
        flat, off, _, _ = positional_gram_hashes(texts, k, seed)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        order = np.lexsort((flat, doc_idx))
        d_s, f_s = doc_idx[order], flat[order]
        keep = np.r_[True, (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])] \
            if len(d_s) else np.zeros(0, dtype=bool)
        d_u, f_u = d_s[keep], f_s[keep]
        pos = np.searchsorted(dup_sorted, f_u)
        isdup = (pos < len(dup_sorted)) & (dup_sorted[np.minimum(
            pos, max(len(dup_sorted) - 1, 0))] == f_u) \
            if len(dup_sorted) else np.zeros(len(f_u), dtype=bool)
        n_grams = np.bincount(d_u, minlength=n).astype(np.int64)
        n_dup = np.bincount(d_u, weights=isdup.astype(np.float64),
                            minlength=n).astype(np.int64)
        mask = n_grams > 0
        ids = t[id_col].to_numpy(zero_copy_only=False)[mask]
        ng, nd = n_grams[mask], n_dup[mask]
        return pa.table({
            id_col: pa.array(ids),
            "n_grams": pa.array(ng),
            "n_dup": pa.array(nd),
            "dup_ratio": pa.array(nd.astype(np.float64) / ng),
        })

    return ds.map_batches(_score, batch_format="pyarrow",
                          zero_copy_batch=True)
