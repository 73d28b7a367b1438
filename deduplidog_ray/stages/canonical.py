"""Cluster canonicalization — the distributed re-expression of ``_affect``.

≙ reference ``_affect`` (deduplidog/deduplidog.py:521-592): per duplicate
pair it picked (affected, kept) by role / size / age and applied warnings.
Order-independent version (SURVEY.md §7 decision 3): per *cluster*, the
canonical member = max by

    (is_original,            ≙ work_dir vs original_dir roles (:185-190)
     n_bytes,                ≙ treat_bigger_as_original (:533-535)
     -dur_ms,                deterministic tiebreak (no mtime in the schema;
                             the "older is genuine" heuristic (:554-559) maps
                             to source-side policy here)
     clip_id ascending)      final deterministic tiebreak

Policy flags:
  skip_bigger      (:539-541): duplicates bigger than the canonical get
                   action='keep' + a SIZE WARNING reason instead of the
                   configured action.
  neglect_warning  (:565-566): apply the action even when warned.
  invert_selection (:128-129, :513-516): output only the NON-duplicates
                   (anti-join semantics) — applied by the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduplidog_ray.config import CanonicalPolicy


def make_canonicalizer(policy: CanonicalPolicy, reasons_by_clip: dict[str, list[str]] | None = None):
    """map_groups(batch_format='pandas') fn over rows grouped by cluster_id.

    Input groups carry: clip_id, cluster_id, n_bytes, dur_ms, and optionally
    ``role`` ('original'|'work'). Output = RESULT_SCHEMA columns.
    """
    reasons_by_clip = reasons_by_clip or {}

    def _canon(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            # typed empty frame: an untyped one infers float64 columns and
            # trips Ray's schema-consistency check on union
            return pd.DataFrame(
                {
                    "clip_id": pd.Series(dtype="object"),
                    "cluster_id": pd.Series(dtype="object"),
                    "is_canonical": pd.Series(dtype="bool"),
                    "action": pd.Series(dtype="object"),
                    "reasons": pd.Series(dtype="object"),
                }
            )
        is_orig = (
            (g["role"] == "original").to_numpy()
            if "role" in g.columns
            else np.zeros(len(g), dtype=bool)
        )
        size = g["n_bytes"].to_numpy() if policy.treat_bigger_as_original else np.zeros(len(g))
        # lexicographic max by (is_original, size, clip_id ascending)
        order = sorted(
            range(len(g)),
            key=lambda i: (not is_orig[i], -size[i], g["clip_id"].iat[i]),
        )
        canon_i = order[0]
        canon_size = g["n_bytes"].iat[canon_i]
        canon_id = g["clip_id"].iat[canon_i]

        actions, reasons, is_canon = [], [], []
        for i in range(len(g)):
            cid = g["clip_id"].iat[i]
            r = list(reasons_by_clip.get(cid, []))
            if i == canon_i:
                actions.append("keep")
                is_canon.append(True)
            else:
                is_canon.append(False)
                warned = False
                if g["n_bytes"].iat[i] > canon_size:
                    r.append(f"SIZE WARNING {int(g['n_bytes'].iat[i] - canon_size)} B")
                    warned = True
                if warned and policy.skip_bigger:
                    actions.append("keep")
                elif warned and not policy.neglect_warning:
                    actions.append("skip")       # warned ⇒ no action (:565-566)
                else:
                    actions.append(policy.action)
            reasons.append(r)
        return pd.DataFrame(
            {
                "clip_id": g["clip_id"].to_numpy(),
                "cluster_id": canon_id,
                "is_canonical": is_canon,
                "action": actions,
                "reasons": reasons,
            }
        )

    return _canon
