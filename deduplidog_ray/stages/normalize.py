"""Transcript normalization — vectorized pyarrow.compute, one stage.

≙ the reference's per-file stem normalizers applied in sequence at
deduplidog/deduplidog.py:464-476:

    N1 space2char       (:469-470)
    N2 strip_end_counter (:471-472, regex ``\\(\\d+\\)$`` compiled at :204)
    N3 strip_suffix      (:473-474, user regex)
    N4 casefold          (:475-476 — broken in the reference, intent per :96-97)
    N5 truncation        (:288 — 47-char Google-Photos stem case)

The reference applies these per work-file inside the main loop; here they are
one vectorized ``map_batches`` over the ``transcript`` column producing
``norm_transcript`` — the join/shingle key for every downstream stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from deduplidog_ray.config import NormalizeConfig


def normalize_array(arr: pa.ChunkedArray | pa.Array, cfg: NormalizeConfig) -> pa.Array:
    """Apply the configured normalizers to a string array (null-safe)."""
    out = arr
    if cfg.collapse_whitespace:
        out = pc.replace_substring_regex(out, r"\s+", " ")
        out = pc.utf8_trim_whitespace(out)
    if cfg.strip_end_counter:
        # ≙ ``\(\d+\)$`` (deduplidog.py:204) plus optional leading space
        out = pc.replace_substring_regex(out, r"\s?\(\d+\)$", "")
    if cfg.strip_suffix:
        out = pc.replace_substring_regex(out, f"(?:{cfg.strip_suffix})$", "")
    if cfg.space2char is not None:
        out = pc.replace_substring(out, " ", cfg.space2char)
    if cfg.casefold:
        out = pc.utf8_lower(out)
    if cfg.truncate is not None:
        out = pc.utf8_slice_codeunits(out, 0, cfg.truncate)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def make_normalizer(cfg: NormalizeConfig):
    """A map_batches(batch_format='pyarrow') fn adding ``norm_transcript``."""

    def _normalize(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch["transcript"], cfg)
        if "norm_transcript" in batch.column_names:
            batch = batch.drop_columns(["norm_transcript"])
        return batch.append_column("norm_transcript", norm)

    return _normalize
