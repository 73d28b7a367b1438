"""URL canonicalization + domain stats unit gates (pipelines/urlops.py)."""

import pandas as pd
import pytest

import ray.data

from deduplidog_ray.pipelines.urlops import canonicalize_urls, domain_stats


def test_canonicalize_rules(ray_session):
    urls = [
        "HTTPS://WWW.Example.COM:443/Path/One?q=2#frag",  # default port
        "http://sub.site.org:80/x",                       # default port
        "http://sub.site.org:8080/x",                     # explicit port
        "https://Example.com",                            # empty path
        "ftp://weird.host/x",                             # scheme reject
        "not a url",
        None,
        "http://www.www.doubled.net/y",                   # ONE www strip
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"url": urls}))
    out = canonicalize_urls(ds).to_pandas()
    assert out["canon_url"].tolist() == [
        "https://example.com/path/one",
        "http://sub.site.org/x",
        "http://sub.site.org:8080/x",
        "https://example.com/",
        None,
        None,
        None,
        "http://www.doubled.net/y",
    ]
    assert out["domain"].tolist() == [
        "example.com", "site.org", "site.org", "example.com",
        None, None, None, "doubled.net",
    ]


def test_domain_stats_distinct(ray_session):
    urls = [
        "https://a.example.com/x?q=1",   # same canon as next
        "https://a.example.com/x#frag",
        "https://b.example.com/x",       # same domain, different canon
        "junk",                          # -> NULL domain bucket
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"url": urls}))
    out = domain_stats(ds).to_pandas().set_index("domain")
    assert out.loc["example.com", "n_rows"] == 3
    assert out.loc["example.com", "n_urls"] == 2
    null_row = out[out.index.isna()]
    assert int(null_row["n_rows"].iloc[0]) == 1
