#!/usr/bin/env python3
"""Scale-probe protocol lint — the self-enforcement the r18 verdict
asked for: nothing local reddened when a registry addition shipped
without its two measured probe decades, which is exactly how
q_dup_matrix / q_ngram_coverage slipped out (and how the IVF O(n^2)
hid before the protocol existed). Same move that killed the no-oracle
class in r17 (lint_oracle.py): make the gap a local FAIL.

Rules:
  1. Every query in the registry (read from Verify's oracle_sql.json —
     the same name universe the correctness gate uses) that is NOT in
     tools/probe_baseline.json's grandfathered list MUST have a row in
     BOTH SCALEPROBE.json and SCALEPROBE_100X.json (both measured
     decades). Grandfathered pre-r19 queries are covered by the family
     arguments in SCALE.md; everything new pays its own measurement.
  2. Every name in ScaleProbe.headline must have rows in both files —
     "added to the probe list but never run" is also a violation.
  3. Every probed name must exist in the registry (a stale probe row
     for a renamed/deleted query would misstate coverage).

Usage:
    python3 tools/lint_probe.py [verifyOutDir-or-oracle_sql.json]
(default: looks for oracle_sql.json under /tmp/vout, then the repo's
committed artifacts). Exit 0 = protocol holds, 1 = violations.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_registry(arg):
    cands = []
    if arg:
        cands.append(arg if arg.endswith(".json") else
                     os.path.join(arg, "oracle_sql.json"))
    cands.append("/tmp/vout/oracle_sql.json")
    for c in cands:
        if os.path.exists(c):
            return set(json.load(open(c))), c
    # fallback: the latest committed correctness artifact's name set
    arts = sorted(f for f in os.listdir(REPO)
                  if re.match(r"CORRECTNESS_r\d+\.json$", f))
    if arts:
        path = os.path.join(REPO, arts[-1])
        return set(json.load(open(path))), path
    sys.exit("lint_probe: no oracle_sql.json or CORRECTNESS artifact found")


def headline_names():
    src = open(os.path.join(
        REPO, "src/main/scala/graft/ScaleProbe.scala")).read()
    m = re.search(r"val headline: Seq\[String\] = Seq\((.*?)\)\n\n",
                  src, re.S)
    if not m:
        sys.exit("lint_probe: cannot parse ScaleProbe.headline")
    return re.findall(r'"(q_?[A-Za-z0-9_]+)"', m.group(1))


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else None
    registry, src = load_registry(arg)
    baseline = set(json.load(
        open(os.path.join(REPO, "tools/probe_baseline.json")))["grandfathered"])
    probed_1x = set(json.load(
        open(os.path.join(REPO, "SCALEPROBE.json")))["queries"])
    probed_100x = set(json.load(
        open(os.path.join(REPO, "SCALEPROBE_100X.json")))["queries"])
    headline = headline_names()

    violations = []
    for q in sorted(registry - baseline):
        missing = [f for f, s in
                   (("SCALEPROBE.json", probed_1x),
                    ("SCALEPROBE_100X.json", probed_100x)) if q not in s]
        if missing:
            violations.append(
                f"registry addition {q} lacks probe rows in "
                f"{' and '.join(missing)} (run ScaleProbe at 1x/10x and "
                f"10x/100x, merge, add a SCALE.md row)")
        if q not in headline:
            violations.append(
                f"registry addition {q} is not in ScaleProbe.headline "
                f"(future re-probes would silently skip it)")
    for q in headline:
        missing = [f for f, s in
                   (("SCALEPROBE.json", probed_1x),
                    ("SCALEPROBE_100X.json", probed_100x)) if q not in s]
        if missing:
            violations.append(
                f"headline query {q} has no rows in {' and '.join(missing)} "
                f"(listed for probing but never measured)")
    for q in sorted((probed_1x | probed_100x) - registry):
        violations.append(
            f"probed name {q} is not in the registry ({src}) — stale row")

    if violations:
        print(f"lint_probe: {len(violations)} violation(s)")
        for v in violations:
            print(f"  VIOLATION: {v}")
        sys.exit(1)
    print(f"lint_probe: OK — {len(registry)} registry queries, "
          f"{len(registry - baseline)} post-baseline additions all carry "
          f"both probe decades; {len(headline)} headline names measured")


if __name__ == "__main__":
    main()
