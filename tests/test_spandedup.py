"""Span-level keep-first dedup (pipelines/spandedup.py): planted
repeats, boundary spans, layout invariance, and the empty-after-dedup
edge."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplidog_ray.pipelines.spandedup import dedup_repeated_spans


def _run(rows, span_tokens=3, blocks=1, partitions=8):
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = dedup_repeated_spans(
        ds, span_tokens=span_tokens, partitions=partitions
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _reference(rows, span_tokens=3):
    """Brute-force keep-first over (doc_id, pos)."""
    seen = set()
    out = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        toks = r["text"].split(" ")
        n = -(-len(toks) // span_tokens)
        kept, dropped = [], 0
        for i in range(n):
            s = " ".join(toks[i * span_tokens : (i + 1) * span_tokens])
            if s in seen:
                dropped += 1
            else:
                seen.add(s)
                kept.append(s)
        out.append(
            {
                "doc_id": r["doc_id"],
                "text_dedup": " ".join(kept),
                "n_spans": n,
                "n_dropped": dropped,
            }
        )
    return pd.DataFrame(out)


_ROWS = [
    {"doc_id": 0, "text": "a b c d e f g h"},          # spans: abc def gh
    {"doc_id": 1, "text": "a b c x y z"},               # abc repeats → cut
    {"doc_id": 2, "text": "x y z a b c d e f"},         # xyz? no (doc1's is 'x y z'); abc+def? positions differ
    {"doc_id": 3, "text": "a b c a b c a b c"},         # self-repeat within doc
    {"doc_id": 4, "text": "g h"},                       # short doc = 1 span 'g h' ≠ doc0's 'g h' span
    {"doc_id": 5, "text": ""},                          # empty → one '' span
    {"doc_id": 6, "text": ""},                          # second '' → fully dropped
]


def test_keep_first_matches_bruteforce(ray_session):
    got = _run(_ROWS)
    want = _reference(_ROWS)
    pd.testing.assert_frame_equal(
        got[want.columns].astype(str), want.astype(str)
    )
    g = got.set_index("doc_id")
    # planted facts, spelled out
    assert g.loc[1, "text_dedup"] == "x y z"            # 'a b c' cut
    assert g.loc[3, "text_dedup"] == ""                 # all three repeats cut
    assert g.loc[3, "n_dropped"] == 3
    assert g.loc[6, "text_dedup"] == "" and g.loc[6, "n_dropped"] == 1
    assert g.loc[0, "n_dropped"] == 0                   # first owner keeps all


def test_layout_invariance(ray_session):
    a = _run(_ROWS, blocks=1, partitions=4)
    b = _run(list(reversed(_ROWS)), blocks=5, partitions=16)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))


def test_boundary_span_not_merged_with_full_span(ray_session):
    # trailing short span 'g h' (doc 0's tail) and doc 4's whole text
    # 'g h' ARE the same string → doc 4 loses it (doc 0 is earlier)
    rows = [
        {"doc_id": 0, "text": "a b c g h"},
        {"doc_id": 4, "text": "g h"},
    ]
    got = _run(rows).set_index("doc_id")
    assert got.loc[0, "text_dedup"] == "a b c g h"
    assert got.loc[4, "text_dedup"] == "" and got.loc[4, "n_dropped"] == 1
