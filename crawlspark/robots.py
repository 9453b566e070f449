"""Real robots.txt parsing (C6 ingestion path).

The reference family fetches /robots.txt per site and honors it
imperatively; here parsing is a one-time-per-host ingestion step that
compiles the text into the engine's `robots_rules`
array<struct<allow,prefix,pattern,spec>> (schemas.ROBOTS_RULE), which
the per-URL hot path then matches entirely JVM-side
(operators/politeness.ROBOTS_ALLOW_EXPR — no Python per URL).

Grammar (Google robots.txt spec, RFC 9309):
  - `User-agent:` lines open a group; consecutive UA lines share the
    following rules. Matching group = longest UA token that is a
    case-insensitive prefix of our agent name; `*` is the fallback.
  - `Allow:` / `Disallow:` with path patterns; empty Disallow = no
    restriction (rule skipped). `*` matches any char run; `$` anchors
    the pattern end. Patterns with neither stay plain prefixes.
  - Precedence: most specific rule (longest rule path) wins; Allow
    wins ties. No matching rule ⇒ allowed.
  - `Crawl-delay:` (de-facto extension) → crawl_delay_ms.

Parsing runs vectorized over Arrow batches (one robots.txt per host —
the cold path; still no per-row Python at plan level).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import ROBOTS_RULE

_WILD = re.compile(r"[*$]")

DEFAULT_AGENT = "crawlspark"


def _to_regex(pat: str) -> str:
    """Robots wildcard pattern → anchored regex (Java/RE2-safe: only
    `.*` and `$` survive escaping)."""
    end = pat.endswith("$")
    core = pat[:-1] if end else pat
    esc = re.escape(core).replace(r"\*", ".*")
    return "^" + esc + ("$" if end else "")


def _rule(allow: bool, path: str) -> dict:
    if _WILD.search(path):
        # literal prefix up to the first wildcard keeps plain-prefix
        # consumers (and quick pre-filters) meaningful
        prefix = path.split("*", 1)[0].rstrip("$")
        return {"allow": allow, "prefix": prefix,
                "pattern": _to_regex(path), "spec": len(path)}
    return {"allow": allow, "prefix": path, "pattern": None, "spec": len(path)}


def parse_robots(text: str | None, agent: str = DEFAULT_AGENT) -> tuple[list[dict], int | None]:
    """→ (rules for the best-matching UA group, crawl_delay_ms or None).

    Missing/empty/unparseable text ⇒ ([], None) = everything allowed.
    """
    if not text or not isinstance(text, str):
        return [], None
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[dict], list[int]]] = []  # (uas, rules, delays)
    cur_uas: list[str] = []
    cur: tuple[list[str], list[dict], list[int]] | None = None
    in_ua_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_ua_run and cur is not None:
                cur[0].append(value.lower())
            else:
                cur = ([value.lower()], [], [])
                groups.append(cur)
            in_ua_run = True
            continue
        in_ua_run = False
        if cur is None:
            continue  # rules before any User-agent line are ignored
        if field in ("allow", "disallow"):
            if not value:
                continue  # empty Disallow/Allow = no restriction
            cur[1].append(_rule(field == "allow", value))
        elif field == "crawl-delay":
            try:
                cur[2].append(int(float(value) * 1000))
            except ValueError:
                pass

    best: tuple[int, list[dict], list[int]] | None = None
    for uas, rules, delays in groups:
        for ua in uas:
            if ua == "*":
                score = 0
            elif agent_l.startswith(ua) and ua:
                score = len(ua)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules, delays)
    if best is None:
        return [], None
    return best[1], (best[2][0] if best[2] else None)


def parse_sitemaps(text: str | None) -> list[str]:
    """`Sitemap:` directive URLs, in file order. Per RFC 9309 §2.3 the
    directive is FILE-GLOBAL — valid anywhere, including before the
    first User-agent group — so this is a separate whole-file scan,
    not part of the group grammar above. Absolute URLs only (the spec
    requires them); relative values are dropped."""
    if not text or not isinstance(text, str):
        return []
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if "://" in value:
                out.append(value)
    return out


_PARSED = T.StructType(
    [
        T.StructField("robots_rules", T.ArrayType(ROBOTS_RULE), False),
        T.StructField("crawl_delay_ms", T.LongType(), True),
        T.StructField("sitemaps", T.ArrayType(T.StringType()), False),
    ]
)


@F.pandas_udf(_PARSED)
def _parse_udf(texts: pd.Series) -> pd.DataFrame:
    parsed = [parse_robots(t) for t in texts]
    return pd.DataFrame(
        {
            "robots_rules": [
                [(r["allow"], r["prefix"], r["pattern"], r["spec"]) for r in rules]
                for rules, _ in parsed
            ],
            "crawl_delay_ms": [d for _, d in parsed],
            "sitemaps": [parse_sitemaps(t) for t in texts],
        }
    )


def compile_robots(df: DataFrame, text_col: str = "robots_txt",
                   default_delay_ms: int = 1000) -> DataFrame:
    """(host, robots_txt, …) → + (robots_rules, crawl_delay_ms):
    the host_config ingestion step. One Arrow pass; hosts ≪ URLs so
    this never sits on the per-URL hot path."""
    parsed = df.withColumn("_p", _parse_udf(F.col(text_col)))
    return (
        parsed.withColumn("robots_rules", F.col("_p.robots_rules"))
        .withColumn(
            "crawl_delay_ms",
            F.coalesce(F.col("_p.crawl_delay_ms"), F.lit(default_delay_ms)),
        )
        .withColumn("sitemaps", F.col("_p.sitemaps"))
        .drop("_p")
    )
