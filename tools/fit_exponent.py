#!/usr/bin/env python3
"""Fit per-query scaling exponents from the two ScaleProbe decades.

Inputs: the 1x->10x probe (SCALEPROBE.json) and the 10x->100x probe
(default /tmp/scaleprobe_100x.json). Each query then has three measured
points t(1x), t(10x), t(100x) — the 10x point measured independently in
BOTH probes, which doubles as a session-to-session consistency check.

The fitted exponent is the least-squares slope of log10(t) vs log10(n)
over the three points (using the mean of the two 10x measurements):
t ~ n^p. p = 1 is perfectly linear scaling; p < 1 means fixed costs
still amortizing; p > 1 is the super-linear signature that sinks a
100 TB scale-up.
"""
import json
import math
import sys


def main() -> None:
    a_path = sys.argv[1] if len(sys.argv) > 1 else "SCALEPROBE.json"
    b_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaleprobe_100x.json"
    with open(a_path) as f:
        a = json.load(f)
    with open(b_path) as f:
        b = json.load(f)

    print("| Query | t(1x) s | t(10x) s | t(100x) s | 10x drift | fitted p |")
    print("|---|---|---|---|---|---|")
    xs = [0.0, 1.0, 2.0]  # log10(mult)
    for name, qa in a["queries"].items():
        qb = b["queries"].get(name)
        if qb is None:
            continue
        t1 = qa["t_small_sec"]
        t10a, t10b = qa["t_big_sec"], qb["t_small_sec"]
        t100 = qb["t_big_sec"]
        drift = t10b / t10a
        t10 = (t10a + t10b) / 2.0
        ys = [math.log10(t1), math.log10(t10), math.log10(t100)]
        xbar, ybar = sum(xs) / 3, sum(ys) / 3
        p = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
            (x - xbar) ** 2 for x in xs)
        print(f"| `{name}` | {t1:.2f} | {t10:.2f} | {t100:.2f} "
              f"| {drift:.2f}x | **{p:.2f}** |")


if __name__ == "__main__":
    main()
