#!/usr/bin/env python3
"""Re-seed src/main/resources/graft/bench_bands.json from a full-precision
bench record (bench_out.json / bench_out_c32.json).

r15 (the r14 verdict's task 5): band coverage was ~18 adjudicated entries,
which let the 1-2 s inflated tail (q153/q253-class sustained-contention
readings) pass unexamined — the med/min spike trigger cannot fire when med
and min inflate together, and the band trigger only covers seeded queries.
This tool extends coverage to EVERY query whose measured MIN is >= the
floor threshold (default 0.5 s), seeding [floor, ceiling] =
[0.7*min, 1.5*min] from a quiet-box run; existing entries are replaced
only when the fresh reading is FASTER (code got faster -> tighter band),
never loosened, so a slow run can only tighten the trigger by accident,
not relax it.

Usage: reseed_bands.py <bench_out.json> [min_seconds=0.5]
"""
import json
import sys

BANDS = "src/main/resources/graft/bench_bands.json"


def main() -> None:
    rec = json.load(open(sys.argv[1]))
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    cur = json.load(open(BANDS))
    bands = cur["bands"]
    mins = rec["mins"]
    changed, added = 0, 0
    for name, mn in sorted(mins.items()):
        if mn < thr or mn <= 0:
            continue
        floor, ceil = round(0.7 * mn, 2), round(1.5 * mn, 2)
        if name in bands:
            if ceil < bands[name][1]:  # only ever tighten
                bands[name] = [floor, ceil]
                changed += 1
        else:
            bands[name] = [floor, ceil]
            added += 1
    cur["bands"] = dict(sorted(bands.items()))
    json.dump(cur, open(BANDS, "w"), indent=1)
    print(f"bands: {len(bands)} total, {added} added, {changed} tightened")


if __name__ == "__main__":
    main()
