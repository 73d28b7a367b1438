"""Parity of the two containment execution plans.

contained_doc_pairs collapses its three exchange rounds into one task
below `small_threshold` (adaptive execution); this gates that the
small-path and the hash-partitioned path produce identical pairs.
"""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.containment import contained_doc_pairs


def _corpus():
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry numbered crates across a frozen river "
        "delta before dawn breaks over the eastern ridge line today"
    )
    rows = {
        1: base,
        2: "PREFIX " + base + " SUFFIX",          # contains 1
        3: base[10:90],                            # contained in 1 and 2
        4: "completely unrelated text about submarine cables and moss",
        5: "tiny",                                 # short-doc sideband
        6: "PREFIX " + base + " SUFFIX",           # duplicate of 2
    }
    return pa.table(
        {
            "doc_id": pa.array(list(rows), type=pa.int64()),
            "text": pa.array(list(rows.values()), type=pa.string()),
        }
    )


def test_small_and_partitioned_paths_match(ray_session):
    t = _corpus()
    small = contained_doc_pairs(rd.from_arrow(t), small_threshold=10**9)
    parted = contained_doc_pairs(rd.from_arrow(t), small_threshold=0)

    def norm(df: pd.DataFrame):
        return sorted(map(tuple, df.to_numpy().tolist()))

    assert norm(small) == norm(parted)
    got = set(map(tuple, small.to_numpy().tolist()))
    # ground truth: every ordered substring pair
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {
        (a, b)
        for a in texts
        for b in texts
        if a != b and texts[a] in texts[b]
    }
    assert got == want
