"""C34 anti-starvation priority aging (q115): pin what the order-hash
oracle can't localize — aging is BINDING on the scenario graph (the
drain order departs from the unaged twin), the decay rule is exact,
and retries keep accruing age from the original admission cycle.
"""

import dataclasses

from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT, UNIT_AGING


def test_aging_changes_drain_order_and_decays_exactly():
    res = RefSim(UNIT_AGING).run()
    twin = dataclasses.replace(UNIT_AGING, priority_aging_every=None)
    res0 = RefSim(twin).run()
    o1 = [r[2] for r in res.order]
    o0 = [r[2] for r in res0.order]
    assert o1 != o0, "aging never bound — scenario proves nothing"
    # decay rule: every attempt's recorded score is its base score
    # (depth + site_priority) minus age // aging_every
    prio = {
        UNIT_AGING.host(i): UNIT_AGING.site_priority(i)
        for i in range(UNIT_AGING.n_sites)
    }
    admit_cycle = dict(res.seen)  # url -> admission cycle
    for (c, _p, u, h, eff, _s, depth, _a, _ok) in res.order:
        base = depth + prio[h]
        age = c - admit_cycle[u]
        assert eff == base - age // UNIT_AGING.priority_aging_every, (u, c)


def test_aging_off_is_identity():
    # the UNIT contract order is byte-identical with the knob absent
    # (default) and with it explicitly None
    a = RefSim(UNIT).run().order
    b = RefSim(dataclasses.replace(UNIT, priority_aging_every=None)).run().order
    assert a == b
