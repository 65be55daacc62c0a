#!/usr/bin/env python3
"""Regenerate fixtures/bench_baselines.json from a Bench stdout capture.

Usage: python3 tools/bench_baselines.py BENCH_STDOUT_FILE

Reads the FIRST output line of graft.Bench (the full per-query detail:
"queries" plus every "queries_rN" steady map) and writes the flat
{"name": seconds} map Bench loads at startup to emit per-series
"movers" in its bounded totals line. Run at each round's close on the
closing bench capture, so the NEXT round's driver run attributes any
series drift from the archived artifact alone (VERDICT r13 item 5).
"""
import json
import re
import sys


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    text = open(sys.argv[1]).read()
    # the detail line is the first {"metric":"total",... with "queries"
    line = next(l for l in text.splitlines()
                if '"metric":"total"' in l and '"queries":' in l)
    start = line.index('{"metric"')
    doc = json.loads(line[start:])
    flat = {}
    for key, val in doc.items():
        if key == "queries" or re.fullmatch(r"queries_r\d+", key):
            for name, secs in val.items():
                flat[name] = secs
    out = "fixtures/bench_baselines.json"
    with open(out, "w") as f:
        json.dump(dict(sorted(flat.items())), f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(flat)} per-query baselines")


if __name__ == "__main__":
    main()
