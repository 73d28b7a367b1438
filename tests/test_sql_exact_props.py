"""Property-based parity for the SQL-exact md5 families: on
hypothesis-generated corpora, the engine and its DuckDB oracle must
agree value for value — not just on the driver's fixture tables.

Alphabet note: the oracles' gram/symbol encodings use chr(30)/chr(31)
separators and single-space word splits, so generated text sticks to
printable non-control characters (the documented precondition; the
driver corpora are ASCII). Multi-byte codepoints are included — both
engines index strings by codepoint.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import ray.data as rd

# words: letters (incl. some multibyte), digits; no whitespace/controls
_WORD = st.text(
    alphabet="abcdeXYZ01√é✓", min_size=1, max_size=6
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=12)


def _duck(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(sql).fetchdf()


@settings(max_examples=15, deadline=None)
@given(_CORPUS)
def test_bpe_merge_loop_matches_sql(ray_session, corpus):
    from deduplidog_ray.pipelines.bpe import train_bpe, train_bpe_sql

    df = pd.DataFrame({
        "doc_id": range(len(corpus)), "text": corpus,
    })
    eng = train_bpe(rd.from_pandas(df), n_merges=6)
    ora = _duck(df, train_bpe_sql(n_merges=6)).astype({"rank": "int32"})
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True)
    )


@settings(max_examples=10, deadline=None)
@given(_CORPUS)
def test_cms_md5_matches_sql(ray_session, corpus):
    from deduplidog_ray.pipelines.sketches import (
        cms_estimate_md5,
        cms_token_counts_md5,
    )

    df = pd.DataFrame({
        "doc_id": range(len(corpus)), "text": corpus,
    })
    sketch = cms_token_counts_md5(rd.from_pandas(df), width=256, depth=3)
    sql = r"""
        WITH tok AS (
          SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS tk
          FROM documents
        ), tc AS (
          SELECT tk, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tk
        ), dd(d) AS (VALUES (0), (1), (2)),
        cell AS (
          SELECT d,
                 (md5_number_upper(d::VARCHAR || chr(31) || tk) % 256)
                     AS col,
                 sum(cnt) AS s
          FROM tc, dd GROUP BY d, col
        ), probe AS (
          SELECT tk, d,
                 (md5_number_upper(d::VARCHAR || chr(31) || tk) % 256)
                     AS col
          FROM tc, dd
        )
        SELECT p.tk AS token, CAST(min(c.s) AS BIGINT) AS n_est
        FROM probe p JOIN cell c ON c.d = p.d AND c.col = p.col
        GROUP BY p.tk ORDER BY p.tk
    """
    ora = _duck(df, sql)
    est = cms_estimate_md5(sketch, list(ora["token"]))
    assert list(est.astype("int64")) == list(ora["n_est"])


@settings(max_examples=10, deadline=None)
@given(_CORPUS)
def test_hll_md5_matches_sql(ray_session, corpus):
    from deduplidog_ray.pipelines.sketches import hll_distinct_per_key_md5

    df = pd.DataFrame({
        "source": [f"s{i % 2}" for i in range(len(corpus))],
        "text": corpus,
    })
    eng = hll_distinct_per_key_md5(
        rd.from_pandas(df), "source", "text", p=4
    )
    sql = """
        WITH hv AS (
          SELECT source, md5_number_upper(coalesce(text, '')) AS h
          FROM documents
        ), rr AS (
          SELECT source,
                 CAST(h // 1152921504606846976 AS BIGINT) AS reg,
                 65 - length(bin(
                   ((h % 1152921504606846976) * 16 + 8)::UBIGINT)) AS rank
          FROM hv
        ), regmax AS (
          SELECT source, reg, max(rank) AS r FROM rr GROUP BY source, reg
        ), keys AS (SELECT DISTINCT source FROM documents),
        full_regs AS (
          SELECT k.source, g.g AS reg, coalesce(m.r, 0) AS r
          FROM keys k
          CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS g) g
          LEFT JOIN regmax m ON m.source = k.source AND m.reg = g.g
        ), agg AS (
          SELECT source, max(r) AS K,
                 CAST(count(*) FILTER (WHERE r = 0) AS BIGINT) AS zeros
          FROM full_regs GROUP BY source
        ), s AS (
          SELECT f.source, sum((1::HUGEINT << (a.K - f.r))) AS S
          FROM full_regs f JOIN agg a ON a.source = f.source
          GROUP BY f.source
        ), est AS (
          SELECT a.source,
                 0.673 * 16.0 * 16.0 * power(2.0, a.K)
                     / CAST(s.S AS DOUBLE) AS e_raw,
                 a.zeros
          FROM agg a JOIN s USING (source)
        )
        SELECT source,
               CAST(floor(CASE WHEN e_raw <= 2.5 * 16 AND zeros > 0
                               THEN 16.0 * ln(16.0 / zeros)
                               ELSE e_raw END + 0.5) AS BIGINT)
                   AS approx_distinct
        FROM est ORDER BY source
    """
    ora = _duck(df, sql)
    a = eng.sort_values("source").reset_index(drop=True)
    b = ora.sort_values("source").reset_index(drop=True)
    assert list(a["source"]) == list(b["source"])
    assert list(a["approx_distinct"].astype("int64")) == \
        list(b["approx_distinct"].astype("int64"))


@settings(max_examples=8, deadline=None)
@given(_CORPUS)
def test_minhash_band_pairs_matches_sql(ray_session, corpus):
    from deduplidog_ray.pipelines.textdedup import (
        minhash_band_pairs,
        minhash_band_pairs_sql,
    )

    df = pd.DataFrame({
        "doc_id": range(len(corpus)), "text": corpus,
    })
    eng = minhash_band_pairs(
        rd.from_pandas(df), partitions=4
    ).to_pandas()
    ora = _duck(df, minhash_band_pairs_sql())
    # an all-empty corpus yields a zero-row Dataset whose pandas view
    # can lose its schema — empty means empty on both sides
    a = set() if len(eng) == 0 else set(zip(eng["doc_a"], eng["doc_b"]))
    b = set(zip(ora["doc_a"], ora["doc_b"]))
    assert a == b


@settings(max_examples=8, deadline=None)
@given(_CORPUS)
def test_simhash_dup_pairs_matches_sql(ray_session, corpus):
    from deduplidog_ray.pipelines.textdedup import (
        simhash_dup_pairs,
        simhash_dup_pairs_sql,
    )

    df = pd.DataFrame({
        "doc_id": range(len(corpus)), "text": corpus,
    })
    eng = simhash_dup_pairs(
        rd.from_pandas(df), partitions=4
    ).to_pandas()
    ora = _duck(df, simhash_dup_pairs_sql())
    a = set() if len(eng) == 0 else \
        {(r.doc_a, r.doc_b, r.hamming) for r in eng.itertuples()}
    b = {(r.doc_a, r.doc_b, r.hamming) for r in ora.itertuples()}
    assert a == b


# ---------------------------------------------------------------------------
# textguards boundary (r5): the guard must accept EXACTLY the strings on
# which the engine tokenizer (Python str.split) and the oracle tokenizer
# (RE2-ASCII \s+, DuckDB regexp_split_to_array) agree — loud-refusal on
# anything that would silently diverge, no false alarms on anything safe.
# ---------------------------------------------------------------------------

_MIXED = st.text(
    alphabet=(
        "ab XY1√é✓\t\n\r\x0c"              # safe: letters + ASCII whitespace
        "\x0b\x1c\x1d\x1e\x1f\x85\xa0 　"   # divergent codepoints
    ),
    min_size=0, max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(_MIXED)
def test_textguard_boundary_is_tokenizer_agreement(s):
    import pyarrow as pa

    from deduplidog_ray.stages.textguards import assert_sql_exact_text

    try:
        assert_sql_exact_text([s], "prop")
        guarded = False
    except ValueError:
        guarded = True

    con = duckdb.connect()
    sql_toks = con.execute(
        r"SELECT list_filter(regexp_split_to_array(?, '\s+'),"
        r" x -> x <> '')",
        [s],
    ).fetchone()[0]
    py_toks = s.split()
    if not guarded:
        # accepted → the two tokenizers MUST agree on this string
        assert list(sql_toks) == py_toks, (s, sql_toks, py_toks)
    else:
        # refused → some divergent codepoint is present (the guard may
        # be conservative about \x1e/\x1f even when tokenizations
        # match, because they collide with the frame separators)
        assert any(c in s for c in
                   "\x0b\x1c\x1d\x1e\x1f\x85\xa0 　"), repr(s)
