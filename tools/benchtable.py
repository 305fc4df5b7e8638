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

        Round 10: the round-9 verdict proved 3-pass medians of
        sub-0.5 s queries carry +/-30% run-to-run noise (the builder's
        own 4-run control experiment: 0.238-0.315 s), so a bare 1.3x
        median ratio flags phantom regressions. When BOTH artifacts
        carry per-query spread (`queries_lo`/`queries_hi`, emitted by
        the 5-pass bench from round 10 on), a query is flagged ONLY
        when, in addition to the median ratio, its measured noise
        bands are disjoint in the regression direction:
        new_lo_norm > old_hi_norm. Overlapping bands mean the two
        medians are indistinguishable at the bench's own measured
        resolution -> NOISE, not REGR. Artifacts without spread fall
        back to the round-8 median-only rule (with a note).
"""
import json
import sys


def render(path):
    with open(path) as f:
        t = json.load(f)
    lo, hi = t.get("queries_lo", {}), t.get("queries_hi", {})

    def cell(q, v):
        if q in lo and q in hi:
            return f"{v} [{lo[q]}..{hi[q]}]"
        return f"{v}"

    qs = sorted(t["queries"].items())
    half = (len(qs) + 1) // 2
    left, right = qs[:half], qs[half:]
    spread = " [lo..hi]" if lo and hi else ""
    print(f"| query | sec{spread} | query | sec{spread} |")
    print("| --- | --- | --- | --- |")
    for i in range(half):
        l = f"| {left[i][0]} | {cell(*left[i])} |"
        r = (f" {right[i][0]} | {cell(*right[i])} |"
             if i < len(right) else "  |  |")
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

    # Per-query noise bands, in the SAME units as o/n (normalized when
    # use_norm, else raw seconds): [lo, hi] of the successful passes.
    # Only round-10+ artifacts carry queries_lo/queries_hi.
    def bands_of(art):
        lo, hi = art.get("queries_lo"), art.get("queries_hi")
        if not lo or not hi:
            return None
        if use_norm:
            c = art.get("control_sec", -1.0)
            if not c or c <= 0:
                return None
            return {q: (lo[q] / c, hi[q] / c) for q in lo if q in hi}
        return {q: (lo[q], hi[q]) for q in lo if q in hi}

    ob, nb = bands_of(old), bands_of(new)
    use_bands = ob is not None and nb is not None

    # the r09/r10 generation boundary: exactly ONE side carries bands.
    # The unbanded side's median is a point with UNKNOWABLE spread (the
    # round-9 experiment measured +/-30% on 3-pass medians), so
    # norm-interval overlap cannot be evaluated. The mechanical rule
    # that still has teeth: flag only when the RAW delta exceeds the
    # banded side's own observed band WIDTH for that query — a real
    # regression (say 2x) dwarfs the query's noise width, while
    # control-drift-inflated normalized ratios ride deltas far inside
    # it. Raw band width in raw seconds, no normalization involved.
    def widths_of(art):
        lo, hi = art.get("queries_lo"), art.get("queries_hi")
        if not lo or not hi:
            return None
        return {q: hi[q] - lo[q] for q in lo if q in hi}

    one_sided = None
    if not use_bands:
        one_sided = widths_of(new) or widths_of(old)
        if one_sided is not None:
            print("note: only one artifact carries queries_lo/queries_hi; "
                  "flagging requires raw |delta| > the banded side's band "
                  "width (norm-interval overlap needs both sides)")
        else:
            print("note: no artifact carries queries_lo/queries_hi spread; "
                  "median-only flagging (pre-round-10 rule, noise-blind)")
    flagged = noise = 0
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
            if use_bands and q in ob and q in nb:
                o_lo, o_hi = ob[q]
                n_lo, n_hi = nb[q]
                if n_lo <= o_hi:
                    print(f"NOISE {q}: {kind} {ov} -> {nv} ({ratio:.2f}x) "
                          f"but bands overlap "
                          f"[{o_lo:.3f},{o_hi:.3f}] vs [{n_lo:.3f},{n_hi:.3f}]"
                          f"{raw}")
                    noise += 1
                    continue
                raw += (f" bands [{o_lo:.3f},{o_hi:.3f}] -> "
                        f"[{n_lo:.3f},{n_hi:.3f}] disjoint")
            elif one_sided is not None and q in one_sided:
                d = abs(new["queries"].get(q, 0.0) - old["queries"].get(q, 0.0))
                w = one_sided[q]
                if d <= w:
                    print(f"NOISE {q}: {kind} {ov} -> {nv} ({ratio:.2f}x) "
                          f"but raw delta {d:.3f} s inside the banded "
                          f"side's band width {w:.3f} s{raw}")
                    noise += 1
                    continue
                raw += f" raw delta {d:.3f} s > band width {w:.3f} s"
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
    band_note = (f" ({noise} above-threshold medians adjudicated NOISE "
                 f"by band overlap)" if use_bands else
                 (f" ({noise} above-threshold medians adjudicated NOISE by "
                  f"sub-band-width raw delta)" if one_sided else ""))
    print(f"== {flagged} regressions >= {threshold}x {kind}{band_note} ==")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--diff":
        threshold = float(args[3]) if len(args) > 3 else 1.3
        diff(args[1], args[2], threshold)
    else:
        render(args[0])


if __name__ == "__main__":
    main()
