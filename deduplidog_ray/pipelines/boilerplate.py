"""Cross-document boilerplate removal: mask globally-frequent token k-grams.

The repeated-substring hygiene op of LLM corpus prep (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better" — ExactSubstr;
CCNet's repeated-paragraph removal): a token k-gram occurring in at least
``min_docs`` DISTINCT documents is boilerplate (headers, footers, license
blurbs, navigation chrome); every token covered by such a gram is dropped
and the document rewritten. ≙ the reference's normalizer family N1-N5
(deduplidog.py:118-126 — strip the noise BEFORE comparing) promoted from
per-name regexes to corpus-statistical spans.

Two passes, both corpus-streaming:

1. **Frequent-gram census.** Per batch: positional gram hashes, distinct
   per doc (a gram repeated within one doc counts once), per-batch
   partial counts — the combiner pattern of `textops.token_freq`. One
   ``groupby(gram).sum`` whose width is the corpus's DISTINCT gram count,
   then the (small — boilerplate is rare by definition) frequent set is
   collected and broadcast via ``ray.put`` as one sorted uint64 array.
2. **Masking rewrite.** Per batch: positional gram hashes again,
   membership against the broadcast set (searchsorted), coverage via a
   difference array (+1 at each hit start, -1 past its end, cumsum > 0),
   rebuild the text from uncovered tokens. No shuffle.

Exactly SQL-mirrorable (driver oracle `boilerplate_mask`): grams as
chr(30)-joined token windows, coverage as a position join, rebuild as
``string_agg(... ORDER BY pos) FILTER (WHERE not covered)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.stages.hashing import combine64, hash_strings_u64, mix64
from deduplidog_ray.stages.signatures import tokenize_offsets


def positional_gram_hashes(
    texts: list[str | None], k: int, seed: int
) -> tuple[np.ndarray, np.ndarray, list[str], np.ndarray]:
    """Token k-gram hashes per doc IN POSITION ORDER, plus the tokens.

    Unlike `signatures.shingle_hashes` there is NO short-doc sentinel:
    docs with fewer than ``k`` tokens emit zero grams (nothing to mask).
    Returns (flat gram hashes, gram offsets[D+1], flat tokens,
    token offsets[D+1]).
    """
    ndocs = len(texts)
    flat_tokens, tok_off = tokenize_offsets(texts)
    tok_h = (
        hash_strings_u64(flat_tokens, seed=seed)
        if flat_tokens
        else np.empty(0, dtype=np.uint64)
    )
    ntok = tok_off[1:] - tok_off[:-1]
    counts = np.maximum(ntok - k + 1, 0).astype(np.int64)
    off = np.empty(ndocs + 1, dtype=np.int64)
    off[0] = 0
    np.cumsum(counts, out=off[1:])
    out = np.empty(off[-1], dtype=np.uint64)
    if off[-1] and len(tok_h) >= k:
        win = np.lib.stride_tricks.sliding_window_view(tok_h, k)
        acc = mix64(win[:, 0], seed=seed)
        for j in range(1, k):
            acc = combine64(acc, win[:, j])
        long_mask = counts > 0
        starts = tok_off[:-1][long_mask]
        c = counts[long_mask]
        total = int(c.sum())
        rep_starts = np.repeat(starts, c)
        base = np.repeat(np.cumsum(np.concatenate([[0], c[:-1]])), c)
        src_idx = rep_starts + (np.arange(total) - base)
        rep_dst = np.repeat(off[:-1][long_mask], c)
        out[rep_dst + (np.arange(total) - base)] = acc[src_idx]
    return out, off, flat_tokens, tok_off


def frequent_gram_set(
    ds: ray.data.Dataset,
    k: int = 3,
    min_docs: int = 5,
    seed: int = 0xB011,
    text_col: str = "text",
) -> np.ndarray:
    """Sorted hashes of grams present in >= min_docs distinct documents."""

    def _partial(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        flat, off, _, _ = positional_gram_hashes(texts, k, seed)
        n = len(texts)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        order = np.lexsort((flat, doc_idx))
        d_s, f_s = doc_idx[order], flat[order]
        keep = np.r_[True, (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])]
        g, c = np.unique(f_s[keep], return_counts=True)
        return pa.table(
            {"g": pa.array(g.view(np.int64)), "c": pa.array(c.astype(np.int64))}
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .sum("c")
    )
    parts = [
        b["g"].to_numpy(zero_copy_only=False).view(np.uint64)[
            b["sum(c)"].to_numpy(zero_copy_only=False) >= min_docs
        ]
        for b in agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if len(b)
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(parts))


def strip_boilerplate(
    ds: ray.data.Dataset,
    k: int = 3,
    min_docs: int = 5,
    seed: int = 0xB011,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Rewrite each doc with frequent-gram-covered tokens removed.

    Output: (id_col, clean_text, n_removed). A token at position p is
    covered iff some gram starting in [p-k+1, p] is frequent.
    """
    freq = frequent_gram_set(ds, k, min_docs, seed, text_col)
    freq_ref = ray.put(freq)

    def _mask(t: pa.Table) -> pa.Table:
        fg = ray.get(freq_ref)
        texts = t[text_col].to_pylist()
        flat, off, toks, tok_off = positional_gram_hashes(texts, k, seed)
        if len(fg) and len(flat):
            pos = np.searchsorted(fg, flat)
            hit = (pos < len(fg)) & (fg[np.minimum(pos, len(fg) - 1)] == flat)
        else:
            hit = np.zeros(len(flat), dtype=bool)
        ntok_total = int(tok_off[-1])
        delta = np.zeros(ntok_total + k, dtype=np.int32)
        if hit.any():
            n = len(texts)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
            # global token index of each gram start (grams are in position
            # order per doc; a gram never crosses its doc boundary, so the
            # k-wide expansion stays inside the doc's token range)
            local = np.arange(len(flat)) - np.repeat(off[:-1], np.diff(off))
            starts = tok_off[:-1][doc_idx] + local
            s = starts[hit]
            np.add.at(delta, s, 1)
            np.add.at(delta, s + k, -1)
        covered = np.cumsum(delta[:ntok_total]) > 0
        clean, removed = [], []
        for d in range(len(texts)):
            s, e = int(tok_off[d]), int(tok_off[d + 1])
            cov = covered[s:e]
            clean.append(
                " ".join(tok for tok, c in zip(toks[s:e], cov) if not c)
            )
            removed.append(int(cov.sum()))
        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": pa.array(clean, type=pa.string()),
                "n_removed": pa.array(removed, type=pa.int64()),
            }
        )

    return ds.map_batches(_mask, batch_format="pyarrow", zero_copy_batch=True)
