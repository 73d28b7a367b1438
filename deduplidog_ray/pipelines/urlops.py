"""URL canonicalization + domain statistics — the web-corpus hygiene
operators (crawl dedup keys on the canonical URL, per-domain quotas and
blocklists key on the registrable domain).

All string surgery runs on Arrow's RE2 kernels inside ``map_batches``
(the same regex automata DuckDB uses), so the DuckDB oracle reproduces
every byte of the canonical form:

- lowercase the whole URL
- drop fragment (``#...``) and query (``?...``)
- scheme whitelist http/https (everything else → null row)
- strip the scheme's default port (``:80`` http, ``:443`` https); keep
  explicit non-default ports
- strip one leading ``www.`` label
- empty path → ``/``
- registrable domain = last two dot-labels of the canonical host (the
  public-suffix list is out of scope; documented approximation)

≙ the reference's name-normalization family (deduplidog's stem
normalizers, SURVEY §2.2 N1-N5) applied to the web-corpus key space.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_HOST_RE = (
    r"^(?P<scheme>https?)://(?P<host>[^/:?#]+)(?::(?P<port>[0-9]+))?"
    r"(?P<path>/[^?#]*)?$"
)


def canonicalize_urls(
    ds: ray.data.Dataset,
    url_col: str = "url",
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Adds ``canon_url`` and ``domain`` columns; rows whose URL is not
    parseable http(s) get nulls in both (kept, not dropped — the caller
    decides whether unparseable rows are quarantine or noise)."""

    def _canon(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t[url_col])
        # fragment & query off first so the tail regex stays anchored
        base = pc.replace_substring_regex(low, pattern=r"[?#].*$",
                                          replacement="")
        parts = pc.extract_regex(base, pattern=_HOST_RE)
        ok = pc.is_valid(parts)
        scheme = pc.struct_field(parts, "scheme")
        host = pc.replace_substring_regex(
            pc.struct_field(parts, "host"), pattern=r"^www\.",
            replacement="",
        )
        port = pc.struct_field(parts, "port")
        path = pc.struct_field(parts, "path")
        default_port = pc.or_(
            pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
            pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
        )
        port_part = pc.if_else(
            pc.or_(pc.equal(port, ""), default_port),
            "",
            pc.binary_join_element_wise(":", port, ""),
        )
        path_part = pc.if_else(pc.equal(path, ""), "/", path)
        canon = pc.binary_join_element_wise(
            scheme, "://", host, port_part, path_part, ""
        )
        canon = pc.if_else(ok, canon, pa.nulls(len(t), pa.string()))
        dom = pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+)$")
        domain = pc.if_else(
            pc.and_(ok, pc.is_valid(dom)),
            pc.struct_field(dom, "d"),
            pa.nulls(len(t), pa.string()),
        )
        out = t.select(list(keep_cols) + [url_col])
        out = out.append_column("canon_url", canon)
        return out.append_column("domain", domain)

    return ds.map_batches(_canon, batch_format="pyarrow",
                          zero_copy_batch=True)


def domain_stats(
    ds: ray.data.Dataset,
    url_col: str = "url",
) -> ray.data.Dataset:
    """Per-registrable-domain corpus stats over canonicalized URLs:
    (domain, n_rows, n_urls) with n_urls = DISTINCT canonical URLs —
    the quota/blocklist key table. Distinct-per-group runs as one
    hash-partitioned exchange on the domain (combiner-unfriendly exact
    distinct; the skinny (domain, canon_url) projection is what ships).
    Unparseable rows aggregate under domain NULL so the noise volume is
    visible rather than silently dropped."""
    import pandas as pd

    canon = canonicalize_urls(ds, url_col=url_col)

    def _skinny(t: pa.Table) -> pa.Table:
        from deduplidog_ray.stages.hashing import hash_strings_u64

        import numpy as np

        dom = t["domain"].to_pylist()
        h = hash_strings_u64([d or "\x00null" for d in dom], seed=0xD0)
        return pa.table(
            {
                "domain": t["domain"],
                "canon_url": t["canon_url"],
                "part": pa.array((h % np.uint64(32)).astype(np.int64)),
            }
        )

    def _agg(g: pd.DataFrame) -> pa.Table:
        out = (
            g.groupby("domain", dropna=False)
            .agg(n_rows=("canon_url", "size"),
                 n_urls=("canon_url", pd.Series.nunique))
            .reset_index()
        )
        return pa.table(
            {
                "domain": pa.array(
                    [None if pd.isna(d) else d for d in out["domain"]],
                    type=pa.string(),
                ),
                "n_rows": pa.array(out["n_rows"].to_numpy(),
                                   type=pa.int64()),
                "n_urls": pa.array(out["n_urls"].to_numpy(),
                                   type=pa.int64()),
            }
        )

    return (
        canon.map_batches(_skinny, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("part")
        .map_groups(_agg, batch_format="pandas")
    )
