"""idf_cosine_pairs: idf-weighted shingle-set cosine near-dup —
hand-computed planted corpus, max_df stop-shingle pruning, edge cases."""

import math

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.sparsesim import idf_cosine_pairs


def _w(n_docs: int, df: int) -> int:
    return int(math.floor(math.log(float(n_docs) / float(df)) * 1000 + 0.5))


def test_planted_pair_exact_cosine(ray_session):
    # docs 1 and 2 share the sentence "alpha beta gamma delta" (2 shared
    # shingles); each has one private tail shingle. docs 3..6 are
    # distinct filler so idf is meaningful.
    docs = [
        (1, "alpha beta gamma delta private one tail"),
        (2, "alpha beta gamma delta other two ending"),
        (3, "completely different text body here now"),
        (4, "nothing shared with anybody else at all"),
        (5, "lorem ipsum dolor sit amet consectetur adipiscing"),
        (6, "pack my box with five dozen liquor jugs"),
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [d for d, _ in docs],
                      "text": [t for _, t in docs]})
    )
    out = idf_cosine_pairs(ds, threshold=0.1, max_df=200)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2)]
    # hand computation: every shingle here is distinct-per-doc except the
    # two shared ones ("alpha beta gamma", "beta gamma delta"), so
    # df=2 for shared (w2s), df=1 for private (w1s); each doc has 5
    # shingles: 2 shared + 3 private.
    w1, w2 = _w(6, 1), _w(6, 2)
    dot = 2 * w2 * w2
    n2 = 2 * w2 * w2 + 3 * w1 * w1
    expect = float(dot) / (math.sqrt(float(n2)) * math.sqrt(float(n2)))
    assert out["cos"][0] == expect


def test_max_df_prunes_boilerplate(ray_session):
    # the shared sentence appears in 6 of 9 docs; with max_df=4 it is
    # pruned from the measure -> no pair reaches the threshold; with the
    # cap lifted it carries idf ln(9/6) > 0 and dominates -> all 15
    # pairs among the sharing docs match
    boiler = "this footer appears in most but not all documents "
    rows = [(i, boiler + f"unique words {i} here") for i in range(6)]
    rows += [(10, "zebra quilt xylophone vortex umbrella tundra spiral"),
             (11, "raven ozone nimbus meadow lagoon kelp juniper iris"),
             (12, "harbor granite fjord ember dune crater basalt atoll")]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [d for d, _ in rows],
                      "text": [t for _, t in rows]})
    )
    out = idf_cosine_pairs(ds, threshold=0.05, max_df=4)
    assert len(out) == 0
    out2 = idf_cosine_pairs(ds, threshold=0.05, max_df=9)
    assert len(out2) == 6 * 5 // 2


def test_short_and_null_docs(ray_session):
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["two words", "two words", None, ""],
    }))
    # docs with < 3 tokens contribute one whole-string shingle; docs 1
    # and 2 are identical -> cos 1.0; null/empty contribute nothing
    out = idf_cosine_pairs(ds, threshold=0.9, max_df=200)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2)]
    assert out["cos"][0] == 1.0


def test_pair_partials_bounded_by_max_df(ray_session):
    # a shingle with df == max_df still pairs; df == max_df + 1 never
    # does — the fan-out bound is the measure, not a silent truncation
    sent = "shared sentence body for the cap check"
    rows = [(i, sent + f" filler {i}") for i in range(5)]
    rows += [(10, "zebra quilt xylophone vortex umbrella tundra spiral"),
             (11, "raven ozone nimbus meadow lagoon kelp juniper iris"),
             (12, "harbor granite fjord ember dune crater basalt atoll")]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [d for d, _ in rows],
                      "text": [t for _, t in rows]})
    )
    out5 = idf_cosine_pairs(ds, threshold=0.05, max_df=5)
    assert len(out5) == 10
    assert len(idf_cosine_pairs(ds, threshold=0.05, max_df=4)) == 0
