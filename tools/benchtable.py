#!/usr/bin/env python3
"""Render and diff the committed BENCHTABLE_r{N}.json artifacts (the
builder's parsed median-of-3 bench output).

Usage:
    python3 tools/benchtable.py BENCHTABLE_r08.json
        Prints the two-column `| query | sec | query | sec |` markdown
        table; paste it under the round's section in BASELINE.md. The
        JSON artifact is the versioned source of truth — the markdown
        is a rendering, never hand-edited.

    python3 tools/benchtable.py --diff OLD.json NEW.json [threshold]
        Flags per-query regressions MECHANICALLY, corrected for uniform
        host drift: when both artifacts carry `queries_norm` (round 8+,
        each query's time divided by the control query's time in the
        same run), the comparison is norm-vs-norm, so a run that is
        uniformly 1.6x slower because of host load flags nothing.
        Raw-seconds ratios are shown alongside for context. For an
        artifact without `queries_norm` (round <= 7) the norms are
        DERIVED as queries[q]/queries[control] so the comparison stays
        drift-corrected; only a missing/failed control degrades to raw
        ratios (with a warning). Default threshold: 1.3x normalized —
        the threshold BASELINE.md's regression claims use.
"""
import json
import sys


def render(path):
    with open(path) as f:
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


def diff(old_path, new_path, threshold):
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    # an artifact predating the queries_norm field (round <= 7) still
    # carries everything needed to derive it: norm[q] = queries[q] /
    # queries[control], control name taken from the OTHER artifact
    # (fallback q01_delay_avg) — so the drift-corrected comparison
    # works across the r07/r08 boundary instead of degrading to raw
    def norms_of(art, other):
        if art.get("queries_norm"):
            return art["queries_norm"]
        control = (art.get("control") or other.get("control")
                   or "q01_delay_avg")
        qs = art.get("queries", {})
        c = qs.get(control, -1.0)
        if c <= 0:
            return None
        derived = {q: (t / c if t > 0 else -1.0) for q, t in qs.items()}
        art.setdefault("control", control)
        art.setdefault("control_sec", c)
        print(f"note: derived queries_norm for an artifact lacking it "
              f"(control {control} = {c} s)")
        return derived

    o = norms_of(old, new)
    n = norms_of(new, old)
    use_norm = o is not None and n is not None
    if not use_norm:
        print("WARNING: no usable control in an artifact; "
              "raw-seconds ratios only (host drift NOT cancelled)")
        o, n = old["queries"], new["queries"]
    kind = "normalized" if use_norm else "raw"
    flagged = 0
    for q in sorted(set(o) & set(n)):
        ov, nv = o[q], n[q]
        if ov <= 0 or nv <= 0:
            print(f"SKIP  {q}: failed execution in a run (old={ov} new={nv})")
            continue
        ratio = nv / ov
        if ratio >= threshold:
            raw = ""
            if use_norm:
                ro, rn = old["queries"].get(q), new["queries"].get(q)
                raw = f" (raw {ro} -> {rn} s)"
            print(f"REGR  {q}: {kind} {ov} -> {nv} ({ratio:.2f}x){raw}")
            flagged += 1
    only_old = sorted(set(o) - set(n))
    only_new = sorted(set(n) - set(o))
    if only_new:
        print(f"NEW   {len(only_new)} queries: {', '.join(only_new)}")
    if only_old:
        print(f"GONE  {len(only_old)} queries: {', '.join(only_old)}")
    if use_norm:
        print(f"control: {old.get('control')} "
              f"{old.get('control_sec')} -> {new.get('control_sec')} s "
              f"(uniform host factor cancelled)")
    print(f"== {flagged} regressions >= {threshold}x {kind} ==")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--diff":
        threshold = float(args[3]) if len(args) > 3 else 1.3
        diff(args[1], args[2], threshold)
    else:
        render(args[0])


if __name__ == "__main__":
    main()
