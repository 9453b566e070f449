"""URL canonicalization (operator C1) — RFC-3986 normalize.

The reference normalizes URLs with ad-hoc string munging before
enqueueing (SURVEY.md §2.1 C1; mandated by BASELINE.json:north_star
"canonicalizes and hashes discovered URLs (RFC-3986 normalize)").

`canonicalize_one` is the pure-Python definition (idempotent —
property-tested); `canonicalize_udf` wraps it as a vectorized
pandas/Arrow UDF so the plan never runs row-at-a-time Python
(input_hint policy). Host/path extraction stays JVM-side via
`F.parse_url` on the already-canonical URL.

Normalization steps:
  - scheme + host lowercased; only http/https pass
  - default port stripped (:80 / :443)
  - fragment removed
  - dot-segments resolved (RFC 3986 §5.2.4); empty path → "/"
  - percent-encoding: unreserved octets decoded, other escapes upper-cased
  - tracking query params dropped (utm_*, fbclid, gclid, msclkid);
    remaining params sorted by (key, value) for a canonical order
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TRACKING = re.compile(r"^(utm_.*|fbclid|gclid|msclkid)$")
_DEFAULT_PORTS = {"http": 80, "https": 443}
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _pct_normalize(s: str) -> str:
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
        else:
            out.append(seg)
    p = "/".join(out)
    if not p.startswith("/"):
        p = "/" + p
    return p


def canonicalize_one(url: str | None) -> str | None:
    """Pure canonicalizer; returns None for non-crawlable URLs."""
    if url is None or not isinstance(url, str):
        return None
    try:
        s = urlsplit(url.strip())
        scheme = s.scheme.lower()
        if scheme not in _DEFAULT_PORTS:
            return None
        host = s.hostname
        if not host:
            return None
        host = host.lower().rstrip(".")
        if not host:  # all-dot host ('.', '..') strips to nothing
            return None
        if ":" in host:  # IPv6 literal — urlsplit strips the brackets
            host = f"[{host}]"
        port = s.port  # may raise ValueError on junk ports
        netloc = host if port is None or port == _DEFAULT_PORTS[scheme] else f"{host}:{port}"
        path = _pct_normalize(_remove_dot_segments(s.path or "/"))
        q = sorted(
            (k, v)
            for k, v in parse_qsl(s.query, keep_blank_values=True)
            if not _TRACKING.match(k)
        )
        return urlunsplit((scheme, netloc, path, urlencode(q), ""))
    except ValueError:
        return None


# Vectorized fast path: URLs with no query, no percent-escapes, no
# dot-segments, no userinfo normalize with pyarrow compute kernels
# (RE2 extract + C++ string ops — ~12× faster than per-URL Python).
# Everything else falls back to the exact per-URL canonicalizer.
# Equality of the two paths is property-tested (tests/test_urlnorm.py).
# Port group is capped at 5 digits: longer ports fail the whole match
# and fall through to the slow path (canonicalize_one → None, since
# urlsplit .port raises for > 65535). Five-digit ports that still
# exceed 65535 (e.g. :99999) are cleared from the fast/mid match by
# the numeric _port_ok check below — keeping fast == reference exact.
_FAST_PATTERN = (
    r"^(?P<scheme>[Hh][Tt][Tt][Pp][Ss]?)://(?P<host>[A-Za-z0-9.\-]+)"
    r"(?P<port>:[1-9][0-9]{0,4})?(?P<path>/[^?#%]*)?(?:#.*)?$"
)
# mid path: same shape but WITH a query in a conservative charset whose
# parse_qsl→urlencode round trip is the identity (no %-escapes, no '+',
# only unreserved chars) — param drop/sort then happens on short
# strings in Python, ~10× cheaper than full urllib
_MID_PATTERN = (
    r"^(?P<scheme>[Hh][Tt][Tt][Pp][Ss]?)://(?P<host>[A-Za-z0-9.\-]+)"
    r"(?P<port>:[1-9][0-9]{0,4})?(?P<path>/[^?#%]*)?\?(?P<query>[A-Za-z0-9_=&.~\-]*)(?:#.*)?$"
)
def _resolve_dots_arrow(path):
    """Vectorized RFC 3986 §5.2.4 dot-segment removal, iterated RE2
    replaces to fixpoint (nesting depth passes). Exactly mirrors
    _remove_dot_segments for '/'-rooted paths: leading '/..' drops,
    '/./' collapses, '<seg>/..' pops (empty segments pop too);
    property- and fuzz-tested equal. This keeps dot-segment URLs — the
    most common messy variant in link graphs — on the vectorized fast
    path instead of per-row Python.

    The pop rule must never consume a '.' or '..' as the popped
    segment: a single '/./'-collapse pass leaves overlapping-match
    residue (e.g. '/a/././..' → '/a/./..'), and a pop rule with a bare
    [^/]* would then eat the dot instead of the real parent, yielding
    '/a' where the reference gives '/'. RE2 has no lookahead, so the
    exclusion is spelled out: the popped segment is empty, starts with
    a non-dot, is '.'+non-dot+rest, or is '..'+at-least-one-char.
    """
    import pyarrow.compute as pc

    pop_seg = r"(?:\.\.[^/]+|\.[^/.][^/]*|[^/.][^/]*)?"
    for _ in range(64):
        new = pc.replace_substring_regex(path, r"^(/\.\.)+(/|$)", r"\2")
        new = pc.replace_substring_regex(new, r"/\.(/|$)", r"\1")
        new = pc.replace_substring_regex(new, "/" + pop_seg + r"/\.\.(/|$)", r"\1")
        if new.equals(path):
            break
        path = new
    return path


def _port_ok(port):
    """True where the extracted ':NNNNN' group is absent or ≤ 65535."""
    import pyarrow as pa
    import pyarrow.compute as pc

    digits = pc.utf8_slice_codeunits(port, 1, 6)
    num = pc.cast(
        pc.if_else(
            pc.or_kleene(pc.is_null(digits), pc.equal(digits, "")),
            pa.scalar("0"),
            digits,
        ),
        pa.int32(),
    )
    return pc.less_equal(num, 65535)


def _norm_query(q: str) -> str:
    """Identical to parse_qsl(keep_blank_values)→drop tracking→sort→
    urlencode for queries in the _MID_PATTERN charset. Within that
    charset the only char urlencode escapes is a '=' inside the value
    (keys stop at the first '='; '&' splits pairs; the rest are
    quote_plus-safe), and the sort must run on the DECODED value —
    which equals the raw text here since '%' is outside the charset —
    before the '=' → %3D escape is applied."""
    if not q:
        return ""
    pairs = []
    for kv in q.split("&"):
        if not kv:
            continue
        k, _, v = kv.partition("=")
        if not _TRACKING.match(k):
            pairs.append((k, v))
    pairs.sort()
    return "&".join(f"{k}={v.replace('=', '%3D')}" for k, v in pairs)


def canonicalize_series(urls: pd.Series) -> pd.Series:
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.utf8_trim_whitespace(
        pa.Array.from_pandas(urls.astype("object").where(urls.map(lambda u: isinstance(u, str)), None))
    )
    ext = pc.extract_regex(arr, _FAST_PATTERN)
    scheme = pc.utf8_lower(pc.struct_field(ext, "scheme"))
    host = pc.utf8_rtrim(pc.utf8_lower(pc.struct_field(ext, "host")), ".")
    port = pc.struct_field(ext, "port")
    path = pc.struct_field(ext, "path")
    # unmatched optional groups extract as "" (not null); dot segments
    # resolve vectorized (possibly back to "" ⇒ "/")
    path = pc.if_else(
        pc.or_kleene(pc.is_null(path), pc.equal(path, "")), pa.scalar("/"), path
    )
    path = _resolve_dots_arrow(path)
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    default_port = pc.if_else(pc.equal(scheme, "http"), pa.scalar(":80"), pa.scalar(":443"))
    port_norm = pc.if_else(
        pc.or_kleene(pc.is_null(port), pc.equal(port, default_port)),
        pa.scalar(""),
        port,
    )
    joined = pc.binary_join_element_wise(
        scheme, pc.if_else(pc.is_valid(scheme), pa.scalar("://"), pa.scalar(None, pa.string())),
        host, port_norm, path, "",
    )
    # all-dot hosts rtrim to "" — route them off the fast path so the
    # reference's empty-host rejection (None) applies
    fast = pc.and_kleene(
        pc.and_kleene(pc.is_valid(scheme), _port_ok(port)),
        pc.not_equal(host, ""),
    )

    out = joined.to_pandas()
    out.index = urls.index
    fast_pd = fast.to_pandas().fillna(False).astype(bool)
    fast_pd.index = urls.index
    rest = ~fast_pd

    if rest.any():
        # mid path: query URLs in the round-trip-identity charset
        sub = pc.if_else(pa.Array.from_pandas(fast_pd), pa.scalar(None, pa.string()), arr)
        ext2 = pc.extract_regex(sub, _MID_PATTERN)
        scheme2 = pc.utf8_lower(pc.struct_field(ext2, "scheme"))
        host2 = pc.utf8_rtrim(pc.utf8_lower(pc.struct_field(ext2, "host")), ".")
        port2 = pc.struct_field(ext2, "port")
        path2 = pc.struct_field(ext2, "path")
        path2 = pc.if_else(
            pc.or_kleene(pc.is_null(path2), pc.equal(path2, "")), pa.scalar("/"), path2
        )
        path2 = _resolve_dots_arrow(path2)
        path2 = pc.if_else(pc.equal(path2, ""), pa.scalar("/"), path2)
        dp2 = pc.if_else(pc.equal(scheme2, "http"), pa.scalar(":80"), pa.scalar(":443"))
        port2 = pc.if_else(
            pc.or_kleene(pc.is_null(port2), pc.equal(port2, dp2)), pa.scalar(""), port2
        )
        base2 = pc.binary_join_element_wise(
            scheme2,
            pc.if_else(pc.is_valid(scheme2), pa.scalar("://"), pa.scalar(None, pa.string())),
            host2, port2, path2, "",
        )
        # same all-dot-host rejection as the fast mask
        mid = pc.and_kleene(
            pc.and_kleene(pc.is_valid(scheme2), _port_ok(port2)),
            pc.not_equal(host2, ""),
        )
        mid_pd = mid.to_pandas().fillna(False).astype(bool)
        mid_pd.index = urls.index
        if mid_pd.any():
            base_pd = base2.to_pandas()
            base_pd.index = urls.index
            q_pd = pc.struct_field(ext2, "query").to_pandas()
            q_pd.index = urls.index
            nq = q_pd[mid_pd].map(_norm_query)
            out[mid_pd] = base_pd[mid_pd].str.cat(("?" + nq).where(nq != "", ""))
        slow = rest & ~mid_pd
        if slow.any():
            out[slow] = urls[slow].map(canonicalize_one)
    return out


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


# -- relative link resolution (RFC 3986 §5) --------------------------------

_ABS = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def resolve_one(base: str, href: str) -> str:
    """urljoin semantics — the reference-crawler behavior for hrefs."""
    from urllib.parse import urljoin

    try:
        return urljoin(base, href)
    except ValueError:
        return href


def resolve_series(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Vectorized resolve: absolute hrefs (the common case in link
    graphs) pass through untouched; scheme-relative and relative ones
    fall back to per-row urljoin. Property-tested == urljoin."""
    is_abs = hrefs.str.match(_ABS).astype("boolean").fillna(False).astype(bool)
    out = hrefs.copy()
    # null hrefs/bases stay out of the urljoin loop (urljoin(b, None)
    # raises TypeError); they pass through as nulls, which the
    # downstream canonicalizer maps to None anyway
    rel = ~is_abs & hrefs.notna() & bases.notna()
    if rel.any():
        out[rel] = [resolve_one(b, h) for b, h in zip(bases[rel], hrefs[rel])]
    return out


@F.pandas_udf(T.StringType())
def resolve_canonicalize_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    """One Arrow pass: resolve against the fetching document's URL,
    then canonicalize (C13 → C1)."""
    return canonicalize_series(resolve_series(bases, hrefs))


def with_url_parts(df, url_col: str = "url_norm"):
    """Attach host/path (JVM-side parse_url) + xxhash64 (C2/C3)."""
    return (
        df.withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST")))
        .withColumn("path", F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")))
        .withColumn("url_hash", F.xxhash64(F.col(url_col)))
    )


# -- registered-domain extraction (C33 nested-PSL extension) ----------------

def _psl_split(rules):
    """Partition PSL rules into (plain, wildcard bases, exception
    names): ``"co.uk"`` is plain, ``"*.ck"`` contributes base ``ck``,
    ``"!www.ck"`` contributes exception name ``www.ck``."""
    plain = tuple(r for r in rules if not r.startswith(("!", "*.")))
    wild = tuple(r[2:] for r in rules if r.startswith("*."))
    exc = tuple(r[1:] for r in rules if r.startswith("!"))
    return plain, wild, exc


def registered_domain(col, rules) -> "F.Column":
    """The publicsuffix.org registered domain (a.k.a. pay-level
    domain) of a host column, as pure JVM column math — the full PSL
    algorithm, not a fixed label count: plain rules (``co.uk``),
    wildcard rules (``*.ck``), exception rules (``!www.ck``), and the
    implicit default ``*`` (unknown TLD = its rightmost label).
    Longest matching rule wins; an exception beats everything and
    names the registered domain directly; the registered domain is
    the public suffix plus one preceding label; a host that IS a
    public suffix yields NULL.

    ``rules`` is a static config tuple rendered as literal arrays
    (scenario-sized rule sets). The real ~10k-rule list would make
    the candidate probe a broadcast JOIN against a rules table keyed
    by candidate suffix instead of ``array_contains`` on a literal —
    same dataflow, zero shuffles on the host side either way. Per-row
    cost ∝ host labels × rules probed; no UDF, whole-stage codegen.
    """
    plain, wild, exc = _psl_split(rules)
    host = F.col(col) if isinstance(col, str) else col
    labels = F.split(host, r"\.")
    n = F.size(labels)
    plain_a = F.array(*[F.lit(r) for r in plain]) if plain else F.array().cast("array<string>")
    wild_a = F.array(*[F.lit(r) for r in wild]) if wild else F.array().cast("array<string>")
    exc_a = F.array(*[F.lit(r) for r in exc]) if exc else F.array().cast("array<string>")

    def cand(i):
        return F.array_join(F.slice(labels, i, n), ".")

    # start indices (1-based, ascending = longest suffix first) whose
    # candidate suffix matches a rule; wildcard *.x matches when the
    # candidate minus its first label equals a wildcard base
    idx = F.sequence(F.lit(1), n)
    exc_idx = F.filter(idx, lambda i: F.array_contains(exc_a, cand(i)))
    match_idx = F.filter(
        idx,
        lambda i: F.array_contains(plain_a, cand(i))
        | ((i < n) & F.array_contains(wild_a, cand(i + 1))),
    )
    # public-suffix start: exception rule minus its leftmost label;
    # else the longest (first) match; else the default * rule (TLD)
    ps_start = F.when(
        F.size(exc_idx) > 0, F.element_at(exc_idx, 1) + 1
    ).otherwise(
        F.when(F.size(match_idx) > 0, F.element_at(match_idx, 1)).otherwise(n)
    )
    return F.when(ps_start > 1, F.array_join(F.slice(labels, ps_start - 1, n), "."))


def registered_domain_py(host: str, rules) -> str | None:
    """Sequential twin of :func:`registered_domain` (refsim politeness
    keys + oracle expectation parquet)."""
    plain, wild, exc = _psl_split(rules)
    labels = host.split(".")
    n = len(labels)
    ps_start = n - 1  # default * rule: public suffix = rightmost label
    matched = False
    for i in range(n):  # 0-based; longest suffix first
        c = ".".join(labels[i:])
        if c in exc:
            ps_start = i + 1
            matched = True
            break
        if not matched and (
            c in plain or (i + 1 < n and ".".join(labels[i + 1 :]) in wild)
        ):
            ps_start = i
            matched = True
    if ps_start == 0:
        return None
    return ".".join(labels[ps_start - 1 :])
