#!/usr/bin/env python
"""Extract the reference's golden-analytic closed-form sample corpus into a
committed npz fixture.

Source (read-only):
  /root/reference/test/golden-analytic/core/closed_form_samples_generated.hpp
  (5,848 lines of %a hex-float sample pools) and
  pyramid_topology_golden_generated.hpp (index-parallel topology snapshots).

Output: tests/data/golden_closed_form.npz with one array pair per pool.
The samples are INPUTS (crystal shape parameters) chosen by the reference's
generator to sit structurally far from (or clearly inside) its merge
tolerances; the analytic truth our tests check against is an independent
numpy half-space oracle (tests/test_golden_corpus.py), plus the reference's
own topology snapshots for the well-conditioned pyramid pools.
"""

import re
import sys

import numpy as np

SRC = "/root/reference/test/golden-analytic/core/closed_form_samples_generated.hpp"
TOPO = "/root/reference/test/golden-analytic/core/pyramid_topology_golden_generated.hpp"
OUT = "tests/data/golden_closed_form.npz"

HEXF = r"[+-]?0x[0-9a-fA-F]+(?:\.[0-9a-fA-F]+)?p[+-]?\d+"
NUM = rf"(?:{HEXF}|[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"


def _f(tok: str) -> float:
    tok = tok.strip().rstrip("fF")
    if tok.lower().startswith(("0x", "-0x", "+0x")):
        return float.fromhex(tok)
    return float(tok)


def parse_pools(text: str) -> dict:
    pools = {}
    for m in re.finditer(
        r"inline constexpr (\w+) (k\w+)\[\]? ?=? ?\{(.*?)\n\};",
        text, re.S,
    ):
        struct, name, body = m.groups()
        body = re.sub(r"//[^\n]*", "", body)  # strip comments (seeds, sigmas)
        nums = re.findall(NUM, body)
        vals = [_f(t) for t in nums]
        if struct == "PrismDistSample":
            arr = np.asarray(vals, np.float32).reshape(-1, 6)
        elif struct == "PyramidDirectSample":
            arr = np.asarray(vals, np.float32).reshape(-1, 11)
        elif struct == "PyramidMillerFixedSample":
            arr = np.asarray(vals, np.float64).reshape(-1, 13)
        else:
            continue
        pools[name] = arr
    return pools


def parse_topology(text: str) -> dict:
    pools = {}
    for m in re.finditer(
        r"inline constexpr PyramidTopologyGolden (k\w+)\[\d*\] = \{(.*?)\n\};",
        text, re.S,
    ):
        name, body = m.groups()
        rows = re.findall(r"\{\s*(\d+),\s*0x([0-9a-fA-F]+)u?,\s*0x([0-9a-fA-F]+)u?\s*\}", body)
        arr = np.asarray(
            [(int(a), int(b, 16), int(c, 16)) for a, b, c in rows], np.int64
        )
        pools[name] = arr
    return pools


def main() -> int:
    text = open(SRC).read()
    pools = parse_pools(text)
    topo = parse_topology(open(TOPO).read())
    out = {}
    for name, arr in pools.items():
        out[name] = arr
        print(f"{name}: {arr.shape}")
    for name, arr in topo.items():
        out[name] = arr
        print(f"{name}: {arr.shape}")
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
