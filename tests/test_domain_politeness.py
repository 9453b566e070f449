"""C33 registered-domain politeness grouping (q114): pin the
properties the order-hash oracle can't localize — the politeness key
rule, budget conservation per domain in the refsim drain, and the
grouping actually BINDING across subdomain siblings (a scenario where
the shared bucket never throttles would prove nothing).
"""

import collections

from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT, UNIT_DOMGROUP


def test_pol_key_rule():
    assert UNIT.pol_key_of_host("site0003.example.com") == "site0003.example.com"
    g = UNIT_DOMGROUP
    assert g.pol_key_of_host("s2.dom0001.example.com") == "dom0001.example.com"
    assert g.host(4) == "s1.dom0001.example.com"
    assert g.site_of_host("s1.dom0001.example.com") == 4
    # domain-level draws agree across the domain's member sites
    assert g.token_capacity(3) == g.token_capacity(4) == g.token_capacity(5)
    assert g.refill_per_cycle(0) == g.refill_per_cycle(2)


def test_domain_budget_conserved_and_binding():
    g = UNIT_DOMGROUP
    res = RefSim(g).run()
    caps = {
        g.pol_key_of_host(g.host(i)): g.token_capacity(i)
        for i in range(g.n_sites)
    }
    per = collections.Counter()
    hosts_per_dom_cycle = collections.defaultdict(set)
    for (c, _p, _u, h, _sc, _sq, _d, _a, _ok) in res.order:
        dom = g.pol_key_of_host(h)
        per[(c, dom)] += 1
        hosts_per_dom_cycle[(c, dom)].add(h)
    # conservation: no domain ever spends more than its capacity in
    # one cycle (refill can never push the bucket past cap)
    assert all(n <= caps[dom] for (_c, dom), n in per.items())
    # binding: some cycle spends a domain's whole capacity...
    assert any(n == caps[dom] for (_c, dom), n in per.items())
    # ...and the shared budget is genuinely contested across siblings:
    # at least one (cycle, domain) slate draws from >1 subdomain host
    assert any(len(hs) > 1 for hs in hosts_per_dom_cycle.values())
    # every subdomain host is eventually crawled (grouping must not
    # starve a member forever)
    crawled = {o[3] for o in res.order}
    assert crawled == {g.host(i) for i in range(g.n_sites)}
