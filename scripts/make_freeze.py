#!/usr/bin/env python3
"""Regenerate bench_freeze.json: per-query MIN across bench artifacts.

The freeze is the machine-readable per-query baseline the judge's 2x
gate (and Bench's own outlier re-run pass) binds against — round-8
verdict item #1b: keep it committed and ratchet it by min so one noisy
sweep can never loosen it.

Usage: python3 scripts/make_freeze.py <out> <label> \
         [--reset <query>@<sf01|sf1>=<seconds>]... <artifact.json...>

Inputs may be Bench full artifacts ({"queries": {...}, "sf1":
{"queries": {...}}}) or existing freeze files ({"sf01": {...}, "sf1":
{...}}); both merge the same way.

r15 (round-14 verdict #2): `--reset` is an explicit, evidence-backed
RE-BASELINE of a named entry — the min-ratchet can lock in a one-off
scheduling fluke forever and permanently flag a healthy query as >2x
(the q_chi_square_indep case: 0.455 s frozen sf1 minimum vs 1.0-1.2 s
across six judge solo runs AND its own 1.028 s sf0.1 freeze, on a
contingency-grid plan whose cost is corpus-size-free). A blanket
"sf1 may not undercut X% of sf0.1" floor was tried and REJECTED: the
distinct-text-collapse dedup family legitimately runs sf1 near or below
its sf0.1 time (distinct contents are scale-invariant in the generator),
so only a named reset with recorded evidence is safe. The entry is SET
(not min'd) to the given value AFTER the merge, and every reset is
recorded in the freeze artifact's "resets" field so the loosening is
auditable.
"""
import sys, json


def load_maps(path):
    d = json.load(open(path))
    if "sf01" in d:  # freeze-format input
        return d.get("sf01", {}), d.get("sf1", {})
    sf1 = d.get("sf1") or {}
    return d.get("queries", {}), sf1.get("queries", {})


def main(argv):
    out, label = argv[0], argv[1]
    paths, resets = [], []
    rest = list(argv[2:])
    i = 0
    while i < len(rest):
        a = rest[i]
        if a.startswith("--reset"):
            # r16 (advisor): accept all three spellings — '--reset q@sf=v',
            # '--reset=q@sf=v', and a single quoted '--reset q@sf=v' token.
            # The r15 parser made the documented space-separated form a
            # ValueError (spec '') and would have consumed the value token
            # as an artifact path.
            if a == "--reset":
                assert i + 1 < len(rest), "--reset needs a <query>@<sf>=<v> argument"
                spec = rest[i + 1]
                i += 1
            else:
                spec = a.split(" ", 1)[1] if " " in a else a[len("--reset"):]
                spec = spec.lstrip("=")
            name_sf, val = spec.split("=")
            name, sf = name_sf.split("@")
            assert sf in ("sf01", "sf1"), f"bad reset sf: {sf}"
            resets.append((name, sf, float(val)))
        else:
            paths.append(a)
        i += 1
    sf01, sf1 = {}, {}
    for p in paths:
        q01, q1 = load_maps(p)
        for k, v in q01.items():
            sf01[k] = min(sf01.get(k, v), v)
        for k, v in q1.items():
            sf1[k] = min(sf1.get(k, v), v)
    applied = []
    for name, sf, val in resets:
        target = sf01 if sf == "sf01" else sf1
        if name in target:
            applied.append(
                {"query": name, "sf": sf, "old": target[name], "new": val})
            print(f"reset {name}@{sf}: {target[name]} -> {val}")
            target[name] = val
        else:
            # r16 (advisor): a reset naming an absent query must fail loud,
            # not silently vanish — it is evidence-backed surgery on a
            # specific entry, and a typo'd name means the surgery didn't
            # happen while the operator believes it did.
            sys.exit(f"--reset target {name}@{sf} not present in merged map")
    freeze = {
        "label": label,
        "sources": paths,
        "sf01": dict(sorted(sf01.items())),
        "sf1": dict(sorted(sf1.items())),
    }
    if applied:
        freeze["resets"] = applied
    with open(out, "w") as f:
        json.dump(freeze, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(sf01)} sf0.1 entries, {len(sf1)} sf1 entries")


if __name__ == "__main__":
    main(sys.argv[1:])
