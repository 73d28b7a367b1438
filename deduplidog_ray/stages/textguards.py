"""Loud preconditions for the SQL-exact text families.

The md5/separator oracle families (``bpe.train_bpe_sql``'s chr(30)
frames, ``sketches``' chr(30)-joined grams + chr(31)-prefixed md5
hashes, ``textdedup._md5_shingles``) tokenize with Python
``str.split()`` on the engine side and RE2-ASCII ``\\s+`` / literal
separators on the DuckDB side. Those two tokenizers agree on every
corpus the synthesizer emits, but diverge SILENTLY on text containing

- ASCII control separators ``\\x0b`` and ``\\x1c``–``\\x1f``
  (``\\x0c`` form feed is in BOTH whitespace classes and stays
  allowed; Python treats the others as
  whitespace, RE2 ``\\s`` does not — and chr(30)/chr(31) additionally
  collide with the frame/join separators themselves), or
- non-ASCII Unicode whitespace (``\\x85``, ``\\xa0``, U+1680,
  U+2000–U+200A, U+2028/29/2F, U+205F, U+3000 — Python splits on them,
  RE2-ASCII ``\\s`` keeps them inside a token).

Per ADVICE r4, the precondition is enforced here rather than merely
documented: a batch containing any such codepoint raises with a
pointer to the fix, instead of producing an engine/oracle mismatch
that only surfaces as a value-hash failure. The check is one
vectorized RE2 scan per batch (Arrow ``match_substring_regex``), so
the hot path pays a single pass over the text column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: every codepoint on which Python ``str.split()`` and RE2-ASCII
#: ``\s+`` disagree, plus the reserved frame separators themselves
_RESERVED_PATTERN = (
    "[\x0b\x1c-\x1f\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)


def assert_sql_exact_text(texts, where: str) -> None:
    """Raise ``ValueError`` if any text in the batch contains a
    codepoint the SQL-exact families cannot represent faithfully.

    ``texts`` may be a Python list, an Arrow array, or a ChunkedArray;
    nulls are fine (they tokenize to nothing on both sides).
    """
    if isinstance(texts, (list, tuple)):
        texts = pa.array(
            ["" if t is None else t for t in texts], pa.string()
        )
    if not len(texts):
        return
    hit = pc.any(
        pc.match_substring_regex(
            pc.fill_null(texts, ""), _RESERVED_PATTERN
        )
    ).as_py()
    if hit:
        raise ValueError(
            f"{where}: input text contains a reserved separator or "
            "non-ASCII whitespace codepoint (one of \\x0b, \\x1c-\\x1f, "
            "\\x85, \\xa0, or a Unicode space) — Python str.split() and the "
            "RE2-ASCII SQL oracle tokenize these differently, so the "
            "SQL-exact family would silently diverge. Normalize the "
            "text first (stages.normalize collapses whitespace) or use "
            "the non-SQL-exact variant of this operator."
        )
