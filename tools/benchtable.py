#!/usr/bin/env python3
"""Generate BASELINE.md's per-query markdown table from a committed
BENCHTABLE_r{N}.json (the builder's parsed median-of-3 bench output).

Usage:
    python3 tools/benchtable.py BENCHTABLE_r07.json

Prints the two-column `| query | sec | query | sec |` table to stdout;
paste it under the round's section in BASELINE.md. The JSON artifact is
the versioned source of truth for round-over-round per-query diffs —
the markdown is a rendering, never hand-edited.
"""
import json
import sys


def main():
    with open(sys.argv[1]) as f:
        t = json.load(f)
    qs = sorted(t["queries"].items())
    half = (len(qs) + 1) // 2
    left, right = qs[:half], qs[half:]
    print("| query | sec | query | sec |")
    print("| --- | --- | --- | --- |")
    for i in range(half):
        l = f"| {left[i][0]} | {left[i][1]} |"
        r = f" {right[i][0]} | {right[i][1]} |" if i < len(right) else "  |  |"
        print(l + r)


if __name__ == "__main__":
    main()
