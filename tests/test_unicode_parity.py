"""RE2 tokenizer parity on NON-ASCII text (ADVICE r2 #3).

token_freq's claim of bit-exact DuckDB parity previously held only for
ASCII corpora: the pipeline tokenized with Python re (Unicode \\w) while
the oracle used RE2 (ASCII \\w). The pipeline now tokenizes with Arrow's
RE2 kernels, so the parity is real on any corpus — gated here with
Czech/German/French diacritics.
"""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.textops import token_freq

_ORACLE = r"""
    SELECT t AS token, CAST(count(*) AS BIGINT) AS count
    FROM (
      SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS t
      FROM documents
    )
    GROUP BY t
"""


def test_token_freq_unicode_matches_duckdb(ray_session):
    texts = [
        "Ahoj že se máš dobře že",
        "die Straße über alles füße",
        "naïve café déjà vu café",
        "plain ascii words only",
        "",
        None,
        "mixed žluťoučký kůň pěl ďábelské ódy",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = (
        token_freq(rd.from_arrow(t))
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = (
        con.execute(_ORACLE)
        .df()
        .sort_values("token")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"count": "int64"}), want.astype({"count": "int64"})
    )
    # the RE2 semantics are visible: 'že' split at the non-ASCII char,
    # so the bare fragment 'e' exists and 'že' does not
    toks = set(got["token"])
    assert "že" not in toks and "e" in toks
