#!/usr/bin/env python3
"""Run the sf1 point benchmark END TO END and write SF1BENCH_r{N}.json.

Round-13 item 4: SF1BENCH_r12.json dropped the per-query `hash_match`
field its r11 predecessor carried (a truncated first write, then a
refresh that fixed the JSON but not the field) — a round artifact
claiming a gate must carry the gate's output, machine-readable. This
runner restores the discipline as CODE instead of a by-hand merge:

  1. `sbt runMain graft.Sf1Bench`  -> the bench JSON line + verify dump
  2. `tools/check.py <sf1>/verify` -> per-query verdicts, row counts,
                                      and per-oracle DuckDB wall seconds
                                      (check_result.json)
  3. merge -> SF1BENCH_r{N}.json, written truncation-safely
     (temp file + fsync + atomic rename — the 93c830e lesson).

Usage:  python3 tools/sf1run.py r13
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "rX"
    out_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1_k10_p1")

    t0 = time.monotonic()
    p = subprocess.run(["sbt", "-batch", "runMain graft.Sf1Bench"],
                       capture_output=True, text=True, cwd=REPO)
    bench_wall = round(time.monotonic() - t0, 1)
    sys.stdout.write(p.stdout[-2000:])
    line = None
    for l in p.stdout.splitlines():
        l = l.strip()
        if l.startswith("{") and l.endswith("}"):
            try:
                line = json.loads(l)
            except json.JSONDecodeError:
                pass
    if line is None or p.returncode != 0:
        sys.stderr.write(p.stderr[-3000:])
        sys.exit(f"Sf1Bench failed (rc={p.returncode}) or emitted no JSON line")

    t1 = time.monotonic()
    c = subprocess.run([sys.executable, os.path.join(REPO, "tools", "check.py"),
                        out_dir, os.path.join(out_dir, "verify")],
                       capture_output=True, text=True, cwd=REPO)
    sys.stdout.write(c.stdout[-3000:])
    with open(os.path.join(out_dir, "verify", "check_result.json")) as f:
        res = json.load(f)

    line["bench_wall_sec"] = bench_wall
    line["hash_match"] = {
        n: (f"PASS ({res['rows'].get(n, '?')} rows)" if v == "pass" else v.upper())
        for n, v in sorted(res["verdicts"].items())}
    line["hash_gate_wall_sec"] = round(time.monotonic() - t1, 1)
    line["oracle_wall_sec"] = res["oracle_wall_sec"]
    line["hash_gate_note"] = (
        'tools/check.py vs DuckDB over the k=10 PERTURBED snapshot in one '
        'run (tools/sf1run.py — the hash_match field is generated, not '
        'hand-merged); q83/q96/q107/q123/q131 use the artifact-backed held '
        "oracles (q131's membership algebra stays fully re-derived over the "
        'dumped lifeassign route); q15 gates a per-rank census on both '
        'engines (sf0.1 keeps the full row gate); three spot-checks '
        '(q96 exact top-5, q83 rank-1 route, q107 graph-edge norms) '
        're-derive 16-probe slices from raw embeddings so the '
        'artifact-backed gates are not self-referential; per-oracle DuckDB '
        'walls recorded')

    out = os.path.join(REPO, f"SF1BENCH_{rnd}.json")
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(line, f, indent=1, sort_keys=False)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, out)
    print(f"wrote {out}")
    sys.exit(1 if (c.returncode != 0 or res.get("fail", 1) != 0) else 0)


if __name__ == "__main__":
    main()
