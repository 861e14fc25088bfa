#!/usr/bin/env python3
"""Paired A/B benchmark: interleave two checkouts in ONE idle session.

Why: round-over-round bench ratios have been losing signal to box
drift — round 18's committed artifact read 21% slower than round 17's
with the UNTOUCHED entry subset drifting MORE than the touched one.
Interleaving both checkouts A,B,A,B in the same session makes the
drift hit both sides equally, so the PAIRED ratio isolates the code.

Usage:
  python3 tools/bench_ab.py <refA> [refB=HEAD] [reps=2] [sfDir]

Protocol:
  - `git worktree add` a read-only checkout of refA (refB runs from
    the current working tree if it IS HEAD, else gets its own
    worktree);
  - alternate full `graft.Bench` runs A,B,A,B… (`reps` each side),
    every run its own JVM via `sbt runMain` with the standard bench
    envs (each run already applies the in-JVM steady-state protocol:
    warmup pass discarded, min of warm passes);
  - per query, take the MIN across each side's runs (same estimator
    as the committed artifact), compute the per-query and total
    paired ratios over the SHARED query set;
  - write bench_ab.json {refA, refB, totals, ratio, per_query}.

Run from an otherwise-idle machine, like any bench.
"""
import json
import os
import subprocess
import sys


def sh(cmd, cwd=None, env=None):
    print(f"[ab] $ {cmd}", flush=True)
    subprocess.run(cmd, shell=True, cwd=cwd, env=env, check=True)


def bench_once(checkout, tag, run_idx, sf_dir):
    out = f"/tmp/bench_ab_{tag}_{run_idx}.json"
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_OUT"] = out
    sh('sbt --error "runMain graft.Bench"', cwd=checkout, env=env)
    with open(out) as f:
        line = json.load(f)
    return line["queries"]


def main():
    ref_a = sys.argv[1]
    ref_b = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def checkout_of(ref, name):
        if ref == "HEAD":
            return repo
        path = f"/tmp/bench_ab_{name}"
        sh(f"git worktree remove --force {path} 2>/dev/null || true",
           cwd=repo)
        sh(f"git worktree add --detach {path} {ref}", cwd=repo)
        return path

    ca = checkout_of(ref_a, "a")
    cb = checkout_of(ref_b, "b")
    # pre-compile both once so compile time never lands inside a run
    for c in (ca, cb):
        sh("sbt --error compile", cwd=c)

    runs_a, runs_b = [], []
    for i in range(reps):  # strict interleave: A,B,A,B…
        runs_a.append(bench_once(ca, "a", i, sf_dir))
        runs_b.append(bench_once(cb, "b", i, sf_dir))

    def fold(runs):
        keys = set.intersection(*(set(r) for r in runs))
        return {k: min(r[k] for r in runs) for k in keys}

    qa, qb = fold(runs_a), fold(runs_b)
    shared = sorted(set(qa) & set(qb))
    tot_a = sum(qa[k] for k in shared)
    tot_b = sum(qb[k] for k in shared)
    per_q = {k: {"a": round(qa[k], 3), "b": round(qb[k], 3),
                 "ratio": round(qb[k] / qa[k], 3) if qa[k] > 0 else None}
             for k in shared}
    worst = sorted(shared, key=lambda k: -(per_q[k]["ratio"] or 0))[:10]
    result = {
        "refA": ref_a, "refB": ref_b, "reps": reps, "sf": sf_dir,
        "shared_queries": len(shared),
        "total_a_sec": round(tot_a, 2), "total_b_sec": round(tot_b, 2),
        "paired_ratio_b_over_a": round(tot_b / tot_a, 4),
        "worst_entries": {k: per_q[k] for k in worst},
        "per_query": per_q,
    }
    with open(os.path.join(repo, "bench_ab.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: result[k] for k in (
        "refA", "refB", "shared_queries", "total_a_sec", "total_b_sec",
        "paired_ratio_b_over_a")}), flush=True)
    print("[ab] per-entry detail in bench_ab.json", flush=True)


if __name__ == "__main__":
    main()
