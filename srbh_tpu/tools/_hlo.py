"""Post-optimisation HLO text analysis helpers.

Used by the LICM bench-chain guard (tests/test_bench_chains.py) to prove
that every convolution of the timed train step stays inside the
while-loop body of the chained bench program (see
tools/train_bench.py:build_chained for the measured hoisting bug).
"""
from __future__ import annotations

import re

_CALL_KEYS = ("calls=", "to_apply=", "body=", "condition=")
_CONV = re.compile(r"=\s*\S+\s+convolution\(")


def computations(hlo_text: str) -> dict:
    """Map computation name -> list of instruction lines."""
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"^(ENTRY\s+)?(%[\w.\-]+)\s*\(.*\{\s*$", line)
        if m:
            cur = m.group(2)
            comps[cur] = []
        elif cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comps[cur].append(line)
    return comps


def _convs_reachable(comps: dict, name: str, seen: set) -> int:
    if name in seen:
        return 0
    seen.add(name)
    lines = comps.get(name, ())
    n = sum(1 for l in lines if _CONV.search(l))
    for l in lines:
        for key in _CALL_KEYS:
            for m in re.finditer(key + r"(%[\w.\-]+)", l):
                n += _convs_reachable(comps, m.group(1), seen)
        for m in re.finditer(r"branch_computations=\{([^}]*)\}", l):
            for c in m.group(1).split(","):
                n += _convs_reachable(comps, c.strip(), seen)
    return n


def conv_placement(hlo_text: str):
    """(total convolutions, convolutions reachable from while bodies)."""
    comps = computations(hlo_text)
    total = sum(1 for l in hlo_text.splitlines() if _CONV.search(l))
    bodies = set(re.findall(r"body=(%[\w.\-]+)", hlo_text))
    seen = set()
    in_body = sum(_convs_reachable(comps, b, seen) for b in bodies)
    return total, in_body
