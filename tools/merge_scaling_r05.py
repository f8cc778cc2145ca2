"""Merge the per-family scaling runs into SCALING_r05.json.

Usage: python tools/merge_scaling_r05.py cg.json schur_rows.jsonl out.json

The schur rows come from ONE-RUN-PER-PROCESS scripts (fixed budget 10,
fresh process per mesh size): in-process multi-budget schur runs at
N=4096 return garbage poses (~zeros; max_err ~ the trajectory extent)
under this environment's jax-0.9 dispatch corruption, in every
configuration tried — cross-family, isolated family, plain jit, AOT —
while the IDENTICAL single call in a fresh process converges to 0.005 m
(/tmp/schur_standalone evidence, reproduced twice). CG rows are immune
in an isolated family process (monotone, consistent errors across
budgets)."""
import json
import sys

cg = json.load(open(sys.argv[1]))
schur_rows = [json.loads(line) for line in open(sys.argv[2]) if line.strip()]
base = next((r["solve_ms"] for r in schur_rows if r["mesh"] == 1), None)
for r in schur_rows:
    if base:
        r["speedup"] = round(base / r["solve_ms"], 2)
        r["efficiency"] = round(base / r["solve_ms"] / r["mesh"], 2)
out = dict(cg)
out["schur_solve_chain"] = schur_rows
out["schur_protocol"] = (
    "one fresh process per mesh size at the fixed converged budget "
    "(gn=10, max_err 0.005 m <= the 0.03 iso-accuracy tol the CG rows "
    "were searched to); in-process multi-budget schur runs at this "
    "graph size return garbage under the environment's jax-0.9 dispatch "
    "corruption (see module docstring) — the per-process protocol is "
    "the defense"
)
out["iso_accuracy"] = (
    "every timed row reached max_err <= 0.03 m before timing (CG via "
    "budget search, schur at gn=10 reaching 0.005 m); SCALING_r04's "
    "rows compared unequal accuracies (CG 0.068 vs Schur 0.005-0.009)"
)
json.dump(out, open(sys.argv[3], "w"), indent=2)
print("wrote", sys.argv[3])
