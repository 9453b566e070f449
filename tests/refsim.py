"""refsim — single-threaded reference-semantics simulator (SURVEY.md §5.2).

A ~100-line stand-in for the reference crawler's runtime semantics
(beanstalkd drain: priority ascending, FIFO within equal priority;
exact URL-seen set; per-host crawl-delay token budgets), recast as the
same batch micro-cycles the north_rule prescribes. Deliberately
trivial — plain dicts and a sorted scan — so its correctness is
inspectable; it is the oracle for the three non-SQL invariants:
crawl ordering, final URL-seen set, per-document span sequences.

Shares ONLY the pure content definitions with the engine (synth page
generator, canonicalizer, robots decision) — none of the engine's
scheduling / dedup / politeness dataflow.
"""

from __future__ import annotations

import math
from urllib.parse import urljoin, urlsplit

from crawlspark.synth import GraphConfig, extract_links_from_text, robots_allowed
from crawlspark.urlnorm import canonicalize_one


class RefSim:
    def __init__(self, cfg: GraphConfig):
        self.cfg = cfg

    def run(self, max_cycles: int | None = None):
        cfg = self.cfg
        hosts = [cfg.host(i) for i in range(cfg.n_sites)]
        rules = {h: cfg.robots_rules(i) for i, h in enumerate(hosts)}
        prio = {h: cfg.site_priority(i) for i, h in enumerate(hosts)}
        cap = {h: cfg.token_capacity(i) for i, h in enumerate(hosts)}
        refill = {h: cfg.refill_per_cycle(i) for i, h in enumerate(hosts)}
        tokens = dict(cap)

        seen: dict[str, int] = {}          # url_norm -> first_cycle
        queued: dict[str, tuple] = {}      # url_norm -> (score, seq, depth, host)
        order: list[tuple[int, int, str, int, bool]] = []  # (cycle, pos, url, attempt, ok)
        docs: dict[str, tuple[int, list[dict]]] = {}
        attempts: dict[str, int] = {}      # url_norm -> failed attempts so far
        max_retries = cfg.max_retries
        seq = 0

        def admit(raw: str, depth: int, cycle: int, base: str | None = None) -> None:
            nonlocal seq
            u = canonicalize_one(urljoin(base, raw) if base else raw)
            if u is None:
                return
            sp = urlsplit(u)
            host, path = sp.hostname, sp.path or "/"
            if host not in rules:
                return
            if not robots_allowed(path, rules[host]):
                return
            if u in seen:
                return
            seen[u] = cycle
            seq += 1
            queued[u] = (depth + prio[host], seq, depth, host)

        for raw in cfg.seeds():
            admit(raw, 0, 0)

        mc = max_cycles if max_cycles is not None else cfg.max_cycles
        for c in range(1, mc + 1):
            if not queued:
                break
            allow = {}
            for h in hosts:
                tokens[h] = min(cap[h], tokens[h] + refill[h])
                allow[h] = math.floor(tokens[h])
            # beanstalkd drain: scan in (priority, FIFO) order, honor
            # per-host allowance, stop at batch_size
            batch = []
            for u, (score, s, depth, host) in sorted(
                queued.items(), key=lambda kv: (kv[1][0], kv[1][1])
            ):
                if allow[host] > 0:
                    allow[host] -= 1
                    batch.append((u, score, s, depth, host))
                    if len(batch) == cfg.batch_size:
                        break
            if not batch:
                break
            for pos, (u, score, s, depth, host) in enumerate(batch, 1):
                del queued[u]
                tokens[host] -= 1
                i, j = cfg.url_to_page(u)
                attempt = attempts.get(u, 0) + 1
                ok = cfg.fetch_ok(i, j, attempt)
                order.append((c, pos, u, attempt, ok))
                if not ok:
                    # TTR analogue: the attempt consumed a token and a
                    # batch slot; the URL re-queues with its ORIGINAL
                    # (score, seq) — FIFO position preserved — unless
                    # retries are exhausted
                    attempts[u] = attempt
                    if attempt < max_retries:
                        queued[u] = (score, s, depth, host)
                    continue
                spans = cfg.page_spans(i, j)
                docs[u] = (c, spans)
                for span in spans:
                    if span["kind"] == "text":
                        for raw in extract_links_from_text(span["text"]):
                            admit(raw, depth + 1, c, base=u)
        return order, seen, docs
