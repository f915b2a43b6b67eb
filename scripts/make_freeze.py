#!/usr/bin/env python3
"""Regenerate bench_freeze.json: per-query MIN across bench artifacts.

The freeze is the machine-readable per-query baseline the judge's 2x
gate (and Bench's own outlier re-run pass) binds against — round-8
verdict item #1b: keep it committed and ratchet it by min so one noisy
sweep can never loosen it.

Usage: python3 scripts/make_freeze.py <out> <label> <artifact.json...>

Inputs may be Bench full artifacts ({"queries": {...}, "sf1":
{"queries": {...}}}) or existing freeze files ({"sf01": {...}, "sf1":
{...}}); both merge the same way.
"""
import sys, json


def load_maps(path):
    d = json.load(open(path))
    if "sf01" in d:  # freeze-format input
        return d.get("sf01", {}), d.get("sf1", {})
    sf1 = d.get("sf1") or {}
    return d.get("queries", {}), sf1.get("queries", {})


def main(out, label, paths):
    sf01, sf1 = {}, {}
    for p in paths:
        q01, q1 = load_maps(p)
        for k, v in q01.items():
            sf01[k] = min(sf01.get(k, v), v)
        for k, v in q1.items():
            sf1[k] = min(sf1.get(k, v), v)
    freeze = {
        "label": label,
        "sources": paths,
        "sf01": dict(sorted(sf01.items())),
        "sf1": dict(sorted(sf1.items())),
    }
    with open(out, "w") as f:
        json.dump(freeze, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(sf01)} sf0.1 entries, {len(sf1)} sf1 entries")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
