"""Degenerate-input robustness: empty tables, single rows, all-poison."""

import numpy as np
import pyarrow as pa
import pytest

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.pipelines.dedup import NearDupPipeline
from deduplidog_ray.schema import CLIPS_SCHEMA


def _clips_table(rows):
    cols = {name: [] for name in CLIPS_SCHEMA.names}
    for r in rows:
        for name in CLIPS_SCHEMA.names:
            cols[name].append(r.get(name))
    return pa.table(
        {
            "clip_id": pa.array(cols["clip_id"], type=pa.string()),
            "bytes": pa.array(cols["bytes"], type=pa.binary()),
            "sr_hz": pa.array(cols["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(cols["dur_ms"], type=pa.int32()),
            "codec": pa.array(cols["codec"], type=pa.string()),
            "transcript": pa.array(cols["transcript"], type=pa.string()),
        }
    )


def test_single_row(ray_session):
    import ray.data as rd

    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm

    t = _clips_table(
        [
            {
                "clip_id": "only",
                "bytes": encode(make_pcm(1, 500, 8000), 8000, "pcm_s16le"),
                "sr_hz": 8000,
                "dur_ms": 500,
                "codec": "pcm_s16le",
                "transcript": "one lonely clip",
            }
        ]
    )
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(t)).to_pandas()
    assert len(res) == 1
    assert res.iloc[0]["action"] == "keep"
    assert bool(res.iloc[0]["is_canonical"])


def test_all_poison(ray_session):
    import ray.data as rd

    t = _clips_table(
        [
            {
                "clip_id": f"bad_{i}",
                "bytes": b"\xde\xad" * 10,
                "sr_hz": 8000,
                "dur_ms": 100,
                "codec": "pcm_s16le",
                "transcript": "t",
            }
            for i in range(5)
        ]
    )
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(t)).to_pandas()
    assert len(res) == 5
    assert (res["action"] == "quarantine").all()


def test_null_and_empty_transcripts(ray_session):
    import ray.data as rd

    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm

    rows = []
    for i, tr in enumerate([None, "", "   ", "real transcript here with words"]):
        rows.append(
            {
                "clip_id": f"c{i}",
                "bytes": encode(make_pcm(100 + i, 400, 8000), 8000, "pcm_s16le"),
                "sr_hz": 8000,
                "dur_ms": 400,
                "codec": "pcm_s16le",
                "transcript": tr,
            }
        )
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(_clips_table(rows))).to_pandas()
    assert len(res) == 4                      # nothing crashes, all labeled


def test_hash_collision_does_not_merge_distinct_keys():
    """Planted 64-bit key-hash collision: rows with DIFFERENT real keys but
    the SAME _key_hash must never merge — the hash is only the partitioner
    (VERDICT r1 #4; birthday bound at 10^12 rows makes collisions certain)."""
    import pandas as pd

    from deduplidog_ray.pipelines.exact import (
        _keep_first_partition,
        _report_partition,
        _singletons_partition,
    )

    g = pd.DataFrame(
        {
            "_key_hash": [7, 7, 7],  # collision: alpha and beta share a hash
            "_k": ["alpha", "beta", "alpha"],
            "doc_id": [2, 1, 3],
            "_part": [0, 0, 0],
        }
    )
    kept = _keep_first_partition(g, ["_k"], "doc_id")
    assert sorted(kept["doc_id"]) == [1, 2]  # beta kept, alpha keeps min id

    rep = _report_partition(g, ["_k"], "doc_id")
    assert rep.to_dict("records") == [{"doc_id": 2, "n_dups": 2}]

    single = _singletons_partition(g, ["_k"])
    assert list(single["_k"]) == ["beta"]


def test_containment_short_docs_and_midtoken(ray_session, tmp_path):
    """Containment is exact for inputs BELOW the winnowing guarantee
    (short docs → broadcast sideband) and for mid-token char substrings
    (char-level shingles) — both misses in the round-1 token design."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplidog_ray.pipelines.containment import contained_doc_pairs

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "the quick brown fox jumps over the lazy dog while the band plays on and on",
                "quick brown fox jumps over the lazy dog while the band plays on",
                "x fox",
                "ick brown fox jumps over the lazy dog while the band play",
                "og",
                "zzz totally unrelated content here with nothing shared",
            ],
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    got = contained_doc_pairs(rd.read_parquet(p))
    want = duckdb.sql(
        f"""SELECT a.doc_id AS contained_id, b.doc_id AS container_id
            FROM read_parquet('{p}') a JOIN read_parquet('{p}') b
            ON a.doc_id <> b.doc_id AND position(a.text IN b.text) > 0
            ORDER BY 1, 2"""
    ).fetchdf().astype({"contained_id": "int64", "container_id": "int64"})
    assert got.reset_index(drop=True).equals(want)


def test_dup_stats_partial_immune_to_hash_collision():
    """`_stats_partition` counts distinct REAL keys (not hashes): a planted
    64-bit collision between two different keys must still count both."""
    import pyarrow as pa

    from deduplidog_ray.pipelines.exact import _stats_partition

    g = pa.table(
        {
            "_key_hash": [7, 7, 7, 9],
            "_k": ["alpha", "beta", "alpha", "gamma"],
            "source": ["s1", "s1", "s1", "s2"],
            "_part": [0, 0, 0, 0],
        }
    )
    out = _stats_partition(g, ["_k"], "source").to_pandas().set_index("source")
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_unique"] == 2   # alpha+beta despite shared hash
    assert out.loc["s2", "n_docs"] == 1
    assert out.loc["s2", "n_unique"] == 1


def test_boilerplate_masking_edges(ray_session):
    """Short docs (< k tokens) emit no grams and pass through; coverage at
    segment boundaries never bleeds into the next document."""
    import pyarrow as pa

    import ray.data as rd

    from deduplidog_ray.pipelines.boilerplate import strip_boilerplate

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64()),
            "text": [
                "a b c tail1",        # shares gram "a b c" with most docs
                "a b c tail2",
                "a b c tail3",
                "a b c tail4",
                "a b c tail5",
                "x y",                # < k tokens: untouched
                "tail6 a b c",        # gram at END of doc: covers last 3
            ],
        }
    )
    out = (
        strip_boilerplate(rd.from_arrow(docs), k=3, min_docs=5)
        .to_pandas()
        .set_index("doc_id")
    )
    # "a b c" is in 6 distinct docs; each doc keeps only its tail token
    for i in range(1, 6):
        assert out.loc[i, "clean_text"] == f"tail{i}"
        assert out.loc[i, "n_removed"] == 3
    assert out.loc[6, "clean_text"] == "x y" and out.loc[6, "n_removed"] == 0
    assert out.loc[7, "clean_text"] == "tail6" and out.loc[7, "n_removed"] == 3


def test_fuzzy_join_empty_and_null_texts(ray_session):
    import ray.data as rd

    from deduplidog_ray.pipelines.textdedup import fuzzy_join_text

    left = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "", None]),
    })
    right = pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta", ""]),
    })
    got = fuzzy_join_text(
        rd.from_arrow(left), rd.from_arrow(right), threshold=0.7
    ).to_pandas()
    # defined semantics (matches the text_jaccard_dup SQL oracle's
    # whole-doc-gram rule for short docs): empty and null texts carry ONE
    # empty gram, so empty==empty pairs at jaccard 1; the real-text
    # duplicate pairs too
    assert set(zip(got["left_id"], got["right_id"])) == {
        (1, 10), (2, 11), (3, 11)
    }
    assert (got["jaccard"] == 1.0).all()


def test_balance_sources_single_source_keeps_everything(ray_session):
    import ray.data as rd

    from deduplidog_ray.pipelines.sampling import balance_sources

    t = pa.table({
        "doc_id": pa.array(np.arange(100, dtype=np.int64)),
        "source": pa.array(["only"] * 100),
    })
    got = balance_sources(rd.from_arrow(t)).to_pandas()
    # n_min == n_key → threshold 2^32 → every hash qualifies
    assert len(got) == 100


def test_chunk_docs_rejects_bad_params(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from deduplidog_ray.pipelines.chunking import chunk_docs

    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": pa.array(["a b c"])})
    with _pytest.raises(ValueError):
        chunk_docs(rd.from_arrow(t), chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_docs(rd.from_arrow(t), stride=-1)
