"""Cluster canonicalization — the distributed re-expression of ``_affect``.

≙ reference ``_affect`` (deduplidog/deduplidog.py:521-592): per duplicate
pair it picked (affected, kept) by role / size / age and applied warnings.
Order-independent version (SURVEY.md §7 decision 3): per *cluster*, the
canonical member = max by

    (is_original,            ≙ work_dir vs original_dir roles (:185-190)
     n_bytes,                ≙ treat_bigger_as_original (:533-535)
     clip_id ascending)      deterministic tiebreak (no mtime in the schema;
                             the "older is genuine" heuristic (:554-559) maps
                             to source-side policy here)

Policy flags:
  skip_bigger      (:539-541): duplicates bigger than the canonical get
                   action='keep' + a SIZE WARNING reason instead of the
                   configured action.
  neglect_warning  (:565-566): apply the action even when warned.
  invert_selection (:128-129, :513-516): output only the NON-duplicates
                   (anti-join semantics) — applied by the pipeline.

EXECUTION SHAPE: one UDF call per HASH PARTITION of cluster_id, never one
per cluster (same rationale as stages/verify.py) — inside a partition the
whole canonicalization is vectorized pandas (sort + duplicated + transform).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduplidog_ray.config import CanonicalPolicy

_EMPTY = pd.DataFrame(
    {
        "clip_id": pd.Series(dtype="object"),
        "cluster_id": pd.Series(dtype="object"),
        "is_canonical": pd.Series(dtype="bool"),
        "action": pd.Series(dtype="object"),
        "reasons": pd.Series(dtype="object"),
        "canonical_dur_ms": pd.Series(dtype="int32"),
    }
)


def make_canonicalizer(
    policy: CanonicalPolicy, reasons_by_clip: dict[str, list[str]] | None = None
):
    """map_groups(batch_format='pandas') fn over rows grouped by the hash
    PARTITION of cluster_id (``_cpart``). Vectorized across all clusters
    in the partition. Input needs: clip_id, cluster_id, n_bytes
    (+ optional ``role``); output = RESULT_SCHEMA columns.
    """
    reasons_by_clip = reasons_by_clip or {}

    def _canon(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _EMPTY.copy()
        df = g.copy()
        df["_orig"] = (
            (df["role"] == "original") if "role" in df.columns else False
        )
        size_key = df["n_bytes"] if policy.treat_bigger_as_original else 0
        df["_size_key"] = size_key
        df = df.sort_values(
            ["cluster_id", "_orig", "_size_key", "clip_id"],
            ascending=[True, False, False, True],
            kind="stable",
        )
        is_canon = ~df.duplicated("cluster_id", keep="first")
        canon_size = df.groupby("cluster_id", sort=False)["n_bytes"].transform(
            "first"
        )
        bigger = (df["n_bytes"] > canon_size) & ~is_canon
        # A5 metadata propagation ≙ set_both_to_older_date /
        # _change_file_date (reference deduplidog.py:547-553, :681-696):
        # every member adopts the canonical's authoritative duration, and a
        # member whose own metadata would SHRINK gets the warning the
        # reference raises when a replace would lose the older timestamp.
        canon_dur = (
            df.groupby("cluster_id", sort=False)["dur_ms"].transform("first")
            if "dur_ms" in df.columns
            else pd.Series(np.zeros(len(df), dtype="int32"), index=df.index)
        )
        longer = (
            (df["dur_ms"] > canon_dur) & ~is_canon
            if "dur_ms" in df.columns
            else pd.Series(False, index=df.index)
        )

        action = np.full(len(df), policy.action, dtype=object)
        if policy.skip_bigger:
            action[bigger.to_numpy()] = "keep"
        elif not policy.neglect_warning:
            action[bigger.to_numpy()] = "skip"   # warned ⇒ no action (:565-566)
        action[is_canon.to_numpy()] = "keep"

        base_reasons = df["clip_id"].map(lambda c: list(reasons_by_clip.get(c, [])))
        delta = (df["n_bytes"] - canon_size).to_numpy()
        ddur = (
            (df["dur_ms"] - canon_dur).to_numpy()
            if "dur_ms" in df.columns
            else np.zeros(len(df), dtype=np.int64)
        )
        reasons = [
            r
            + ([f"SIZE WARNING {int(d)} B"] if big else [])
            + ([f"DUR WARNING +{int(dd)} ms"] if lng else [])
            for r, big, d, lng, dd in zip(
                base_reasons, bigger.to_numpy(), delta, longer.to_numpy(), ddur
            )
        ]
        return pd.DataFrame(
            {
                "clip_id": df["clip_id"].to_numpy(),
                "cluster_id": df["cluster_id"].to_numpy(),
                "is_canonical": is_canon.to_numpy(),
                "action": action,
                "reasons": reasons,
                "canonical_dur_ms": canon_dur.to_numpy().astype("int32"),
            }
        )

    return _canon
