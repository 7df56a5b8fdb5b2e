#!/usr/bin/env python3
"""Merge N bench pass JSONs into one best-of artifact.

Usage: merge_bench.py OUT [--replace q1,q2] PASS1 [PASS2 ...]

Takes the per-query minimum across passes (steady-state estimate; the
noop-sink harness has no cross-query caching, so min is the least-noise
statistic on a shared box), recomputes the total, and preserves the sf
field of the first pass.

--replace names queries whose WORKLOAD changed (a query that grew a
stage, or was re-specified): their values from the FIRST input (the
prior baseline being refreshed) are discarded, so the new minimum
reflects the new workload instead of min-folding against a number the
query can no longer achieve.
"""
import json
import sys


def main() -> None:
    args = sys.argv[1:]
    replace = set()
    if "--replace" in args:
        i = args.index("--replace")
        replace = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    out, passes = args[0], args[1:]
    loaded = [json.load(open(p)) for p in passes]
    # Contention report per input pass, from the dense fixed-work
    # sentinel schedule Bench emits: every sentinel runs the identical
    # data-independent query, so on an idle box all points agree and
    # the index sits at ~1.0. index = mean/min (how inflated the
    # average sweep moment was); worst = max/min (the hottest window).
    # A pass with index >> 1 should not be trusted as a floor source —
    # which min-folding already enforces, but now the artifact SAYS it.
    for path, d in zip(passes, loaded):
        pts = d.get("sentinels") or []
        secs = sorted(p["sec"] for p in pts if p.get("sec", -1) > 0)
        if len(secs) >= 2:
            # baseline = the 25th percentile, not the minimum: one
            # unusually FAST point (cache/JIT luck) would inflate a
            # min-based index and flag an idle sweep; as long as a
            # quarter of the sentinels ran clean, p25 sits at the
            # uncontended cost and inflated points push mean/max up.
            lo = secs[len(secs) // 4]
            idx, worst = sum(secs) / len(secs) / lo, max(secs) / lo
            flag = "  <-- CONTENDED" if idx > 1.25 else ""
            print(f"contention {path}: index {idx:.2f} (worst point "
                  f"{worst:.2f}x, {len(secs)} sentinels){flag}")
    for name in replace:
        loaded[0]["queries"].pop(name, None)
    # mixed-sf passes would merge incomparable timings into one total
    sfs = {str(d.get("sf", "")) for d in loaded}
    assert len(sfs) == 1, f"sf mismatch across passes: {sorted(sfs)}"
    names = set()
    for d in loaded:
        names |= set(d["queries"])
    # An input that is itself a prior merge carries its accumulated pass
    # count; folding it must ADD that history, not collapse it to 1 —
    # otherwise every refresh resets the artifact's stated depth. A prior
    # merge's own per-query pass_counts (queries added mid-history have
    # seen fewer passes than the file) take precedence over its global.
    weights = [int(d.get("passes", 1)) for d in loaded]

    def seen(d, w, n):
        if n not in d["queries"]:
            return 0
        return int(d.get("pass_counts", {}).get(n, w))

    merged = {}
    pass_counts = {}
    for n in sorted(names):
        vals = [d["queries"][n] for d in loaded if n in d["queries"]]
        merged[n] = min(vals)
        pass_counts[n] = sum(seen(d, w, n) for d, w in zip(loaded, weights))
    partial = sorted(
        n for n in names if any(n not in d["queries"] for d in loaded))
    if partial:
        # legitimate under the per-query refresh protocol (carrying old
        # minima forward for unchanged queries), but make it visible so
        # totals from differing query sets are never silently compared
        print(f"note: {len(partial)} queries present in only some passes "
              f"(e.g. {partial[:5]}); per-query pass counts recorded")
    doc = {
        "metric": "total",
        "value": sum(merged.values()),
        "unit": "sec",
        "queries": merged,
        "sf": loaded[0].get("sf", ""),
        "passes": sum(weights),
        "pass_counts": pass_counts,
    }
    with open(out, "w") as f:
        json.dump(doc, f)
    print(f"{out}: {len(merged)} queries, total {doc['value']:.1f}s "
          f"(best of {doc['passes']} accumulated passes, "
          f"{len(loaded)} inputs this fold)")


if __name__ == "__main__":
    main()
