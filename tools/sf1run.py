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
import hashlib
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The parallel-setup lanes' source files: byte-identical lanes mean a
# setup_sec move is not a code change (round-16 continued adjudication,
# now evaluated in code -- round-17 item 4).
LANE_SOURCES = [
    "src/main/scala/graft/operators/Similarity.scala",
    "src/main/scala/graft/operators/Dedup.scala",
    "src/main/scala/graft/sources/Layout.scala",
]

# Healthy round-16 machine measured ~22 effective cores on the 32-way
# MD5 probe; below this the host is throughput-degraded and setup_sec
# moves adjudicate to HOST.
EFFECTIVE_CORES_HEALTHY = 18.0


def lane_src_sha():
    h = hashlib.sha256()
    for rel in LANE_SOURCES:
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def prior_artifact(rnd):
    m = re.fullmatch(r"r(\d+)", rnd)
    if not m:
        return None
    for n in range(int(m.group(1)) - 1, 0, -1):
        p = os.path.join(REPO, f"SF1BENCH_r{n}.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    return None


def adjudicate(line, rnd, all_pass):
    """The round-16 by-hand procedure as code: lanes byte-identical +
    gates stable + saturation probe below the healthy threshold =>
    a setup_sec move is HOST noise, not a code regression."""
    sha = lane_src_sha()
    line["lane_src_sha"] = sha
    eff = line.get("effective_cores")
    prior = prior_artifact(rnd)
    out = {
        "effective_cores": eff,
        "healthy_threshold": EFFECTIVE_CORES_HEALTHY,
        "lanes_byte_identical_to_prior": (
            prior is not None and prior.get("lane_src_sha") == sha),
        "gates_stable": bool(all_pass),
        "rule": ("lanes byte-identical + gates stable + probe below "
                 "threshold => HOST"),
    }
    if eff is None:
        out["verdict"] = "NO_PROBE"
    elif prior is not None and prior.get("lane_src_sha") not in (None, sha):
        out["verdict"] = "CODE_CHANGED"
    elif eff >= EFFECTIVE_CORES_HEALTHY:
        out["verdict"] = "MACHINE_HEALTHY"
    elif out["lanes_byte_identical_to_prior"] and all_pass:
        out["verdict"] = "HOST"
    elif prior is None or prior.get("lane_src_sha") is None:
        # degraded machine, no prior sha to compare lanes against:
        # setup_sec comparisons across rounds are not meaningful
        out["verdict"] = "HOST_DEGRADED_NO_PRIOR"
    else:
        out["verdict"] = "INCONCLUSIVE"
    line["setup_adjudication"] = out


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
    adjudicate(line, rnd,
               all(v == "pass" for v in res["verdicts"].values()))
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
