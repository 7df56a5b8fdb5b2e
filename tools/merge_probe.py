#!/usr/bin/env python3
"""Merge a fresh ScaleProbe output into a committed SCALEPROBE file —
the probe-side twin of merge_bench.py: per-query rows from the new run
REPLACE the old rows (each row carries its own reps/spread, so mixed
protocols stay self-describing), queries absent from the new run keep
their committed measurement, and the file is never raw-overwritten.

Usage:
    python3 tools/merge_probe.py <committed.json> <fresh.json>

Refuses to merge runs measured against different decade directories —
a 1x/10x row merged into the 10x/100x file would silently corrupt every
fitted exponent.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    base_path, new_path = sys.argv[1], sys.argv[2]
    with open(base_path) as f:
        base = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    for k in ("small_dir", "big_dir"):
        if base.get(k) != new.get(k):
            sys.exit(f"merge_probe: {k} mismatch — base={base.get(k)!r} "
                     f"new={new.get(k)!r}; refusing to mix decades")
    replaced, added = [], []
    for name, row in new["queries"].items():
        (replaced if name in base["queries"] else added).append(name)
        base["queries"][name] = row
    base["queries"] = dict(sorted(base["queries"].items()))
    with open(base_path, "w") as f:
        json.dump(base, f, indent=2)
        f.write("\n")
    print(f"merged into {base_path}: {len(replaced)} replaced "
          f"({', '.join(replaced) or '-'}), {len(added)} added "
          f"({', '.join(added) or '-'})")


if __name__ == "__main__":
    main()
