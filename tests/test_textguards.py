"""Loud preconditions for the SQL-exact text families (ADVICE r4):
reserved separators / non-ASCII whitespace must raise, not silently
diverge from the DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.stages.textguards import assert_sql_exact_text


@pytest.mark.parametrize("bad", [
    "a\x1eb",      # record separator = the gram join char itself
    "a\x1fb",      # unit separator = the md5 prefix join char
    "a\x1cb",      # Python-whitespace, not RE2 \s
    "a\x0bb",      # vertical tab: Python-whitespace, not RE2 \s
    "a\xa0b",      # NBSP: Python splits, RE2-ASCII \s does not
    "a\x85b",      # NEL
    "a b",    # em space
    "a　b",    # ideographic space
])
def test_guard_rejects_reserved(bad):
    with pytest.raises(ValueError, match="reserved separator"):
        assert_sql_exact_text(["fine", bad, None], "unit")


def test_guard_accepts_normal_text():
    assert_sql_exact_text(
        ["hello world", "", None, "tab\tand\nnewline", "ünïcode läuft",
         "form\x0cfeed is in both whitespace classes"],
        "unit",
    )
    assert_sql_exact_text(pa.chunked_array([pa.array(["a", "b c"])]), "u2")
    assert_sql_exact_text([], "empty")


def test_train_bpe_raises_loudly(ray_session):
    from deduplidog_ray.pipelines.bpe import train_bpe

    ds = rd.from_pandas(pd.DataFrame({
        "text": ["plain words here", "sneaky\x1eseparator inside"],
    }))
    with pytest.raises(Exception, match="reserved separator"):
        train_bpe(ds, n_merges=3)


def test_md5_shingles_raise_loudly():
    from deduplidog_ray.pipelines.textdedup import _md5_shingles

    with pytest.raises(ValueError, match="reserved separator"):
        _md5_shingles(["ok text", "bad\xa0nbsp"], k=3)
    x, off = _md5_shingles(["ok text here friend"], k=3)
    assert len(x) == 2 and off[-1] == 2


def test_gram_strings_raise_loudly():
    from deduplidog_ray.pipelines.sketches import _gram_strings

    with pytest.raises(ValueError, match="reserved separator"):
        _gram_strings(["ok", "evil\x1fchar"], k=2)
    flat, off = _gram_strings(["one two three"], k=2)
    assert flat == ["one\x1etwo", "two\x1ethree"]
