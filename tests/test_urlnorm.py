"""C1 canonicalizer properties: idempotence, and exact equality of the
vectorized fast path vs the per-URL reference implementation."""

from __future__ import annotations

import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from crawlspark.synth import UNIT, GraphConfig
from crawlspark.urlnorm import canonicalize_one, canonicalize_series

CORPUS = [
    "http://example.com",
    "http://example.com/",
    "HTTP://EXAMPLE.com:80/a/b",
    "https://example.com:443/a",
    "https://example.com:8443/a",
    "http://example.com:8080/p?b=2&a=1",
    "http://example.com/a/../b",
    "http://example.com/a/./b",
    "http://example.com/..",
    "http://example.com/../a",
    "http://example.com/a/..",
    "http://example.com/a/b/../../c",
    "http://example.com/a//../b",
    "http://example.com//../a",
    "http://example.com/././.",
    "http://example.com/.../..",
    "http://example.com/..a/b",
    "http://example.com/a/..b",
    "http://example.com/foo/..%2Fbar",
    "http://example.com/a/../b?y=2&x=1",
    "http://example.com/a/./b?utm_source=x&q=1#f",
    "http://example.com/p#frag",
    "http://example.com./p",
    "http://example.com/p?utm_source=x&q=1",
    "http://example.com/%7Euser/%2fx",
    "http://user:pw@example.com/p",
    "http://[::1]:80/p",
    "ftp://example.com/x",
    "not a url",
    "http://",
    "http://example.com/p?",
    "http://example.com/p?a=1&a=0",
    "http://example.com:0/p",
    "http://example.com:65535/p",
    "http://example.com:65536/p",
    "http://example.com:99999/p",
    "http://example.com:100000/p",
    "http://example.com:99999/p?b=2&a=1",
    "http://example.com:655351234567/p",
    "  http://example.com/p  ",
    "http://exa_mple.com/p",
    "http://example.com//double//slash",
    "http://example.com/UPPER/Case",
]


def test_fast_path_equals_reference_corpus():
    extra = [
        UNIT.messy_url(UNIT.page_url(i, j), i, j, k)
        for i in range(UNIT.n_sites)
        for j in range(3)
        for k in range(5)
    ]
    urls = pd.Series(CORPUS + extra)
    got = canonicalize_series(urls)
    want = urls.map(canonicalize_one)
    assert got.where(got.notna(), None).tolist() == want.where(want.notna(), None).tolist()


def test_idempotent_on_corpus():
    for u in CORPUS:
        c = canonicalize_one(u)
        if c is not None:
            assert canonicalize_one(c) == c, u


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="abcXYZ019.-_/:?#&=%~@[] ",
        min_size=0,
        max_size=40,
    ).map(lambda s: "http://" + s)
)
def test_fast_path_equals_reference_fuzz(u):
    got = canonicalize_series(pd.Series([u])).iloc[0]
    want = canonicalize_one(u)
    assert (got is None and want is None) or got == want


def test_all_dot_hosts_rejected():
    """Hypothesis-found divergence (http://.//): an all-dot host
    strips to nothing — both paths must reject it, not emit a
    hostless URL."""
    for u in ["http://.//", "http://./", "http://.", "http://..",
              "http://...//x", "http://./p?a=1"]:
        assert canonicalize_one(u) is None, u
        assert canonicalize_series(pd.Series([u])).iloc[0] is None, u
    # trailing-dot hosts still normalize (the rstrip's purpose)
    assert canonicalize_one("http://a.example.com./p") == "http://a.example.com/p"


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet="./abA%", min_size=0, max_size=24))
@example("a/././..")           # r2 counterexample: single-pass '/./'
@example("a/./../.")           # collapse left residue the pop rule ate
@example("a/.././..")
@example("./a/././../..")
@example("..a/../..")
@example(".a/./..")
def test_dot_segment_fuzz(p):
    """The vectorized RE2 dot-segment resolver must equal the per-URL
    reference on arbitrary ./ soup paths (incl. %-escapes and uppercase,
    which route through the mid/slow paths)."""
    u = "http://example.com/" + p
    got = canonicalize_series(pd.Series([u])).iloc[0]
    want = canonicalize_one(u)
    assert got == want, (u, got, want)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="./ab?#=&", min_size=0, max_size=24))
def test_dot_segment_query_fuzz(p):
    """Dot-segment soup with query/fragment chars — exercises the mid
    path's dot resolver against the reference."""
    u = "http://example.com/" + p
    got = canonicalize_series(pd.Series([u])).iloc[0]
    want = canonicalize_one(u)
    assert (got is None and want is None) or got == want, (u, got, want)


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_idempotent_fuzz(u):
    c = canonicalize_one(u)
    if c is not None:
        assert canonicalize_one(c) == c


def test_resolve_series_null_safe():
    """Null hrefs or bases must not crash the Arrow batch (urljoin on
    None raises TypeError); they pass through as nulls."""
    from crawlspark.urlnorm import resolve_series

    bases = pd.Series(["http://a.com/x", None, "http://a.com/x", None])
    hrefs = pd.Series([None, "rel", "rel", None])
    got = resolve_series(bases, hrefs)
    assert got.iloc[0] is None
    assert got.iloc[1] == "rel"
    assert got.iloc[2] == "http://a.com/rel"
    assert got.iloc[3] is None


def test_resolve_series_equals_urljoin():
    from urllib.parse import urljoin

    from crawlspark.urlnorm import resolve_series

    bases = ["http://a.com/x/y", "http://a.com/x/", "https://b.org/p?q=1"]
    hrefs = ["/abs/path", "rel", "../up", "http://other.com/z", "//cdn.com/a",
             "#frag", "?q=2", "p2", ""]
    B, H = [], []
    for b in bases:
        for h in hrefs:
            B.append(b); H.append(h)
    got = resolve_series(pd.Series(B), pd.Series(H)).tolist()
    want = [urljoin(b, h) for b, h in zip(B, H)]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc019./:?#&=%~-", min_size=0, max_size=25))
def test_resolve_fuzz(href):
    from urllib.parse import urljoin

    from crawlspark.urlnorm import resolve_series

    base = "http://site.example.com/dir/page"
    got = resolve_series(pd.Series([base]), pd.Series([href])).iloc[0]
    assert got == urljoin(base, href)
