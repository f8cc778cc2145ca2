"""Round-5 session-batched cost-split experiments on the real TPU.

Run: timeout 570 python -u tools/tpu_batch_experiments2.py <mode> [S] [stride]
ONE variant per process invocation (see tpu_batch_experiments.py header:
a killed mid-compile client wedges the shared relay).

Modes:
  base        — production program as bench.py r4 ran it
                (method=dense_cg, the vmapped lock-step path).
  nosolve     — _keyframe_solve monkeypatched to identity: frontend-only
                cost of the same program (the solve share by subtraction).
  lanes       — the lanes-batched solver (fg.solve_batched). Extra
                key=value args: gn=<int> cg=<int> edges=<int>
                method=lanes_cg|lanes_chol
  gn2 / edges1536 / gn2edges — legacy vmapped-path ablations.
"""
import sys, time
import dataclasses as dc

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from dpg_slam_tpu import batch
from dpg_slam_tpu import engine as eng_mod
import bench

mode = sys.argv[1] if len(sys.argv) > 1 else "base"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 4
kv = dict(a.split("=", 1) for a in sys.argv[4:])

cfg = bench._bench_config()
if mode in ("edges1536", "gn2edges") or "edges" in kv:
    ec = int(kv.get("edges", 1536))
    cfg = dc.replace(cfg, capacity=dc.replace(cfg.capacity, max_edges=ec))
if mode in ("gn2", "gn2edges"):
    cfg = dc.replace(
        cfg, pose_graph=dc.replace(cfg.pose_graph, incremental_gn_iterations=2)
    )
if mode == "nosolve":
    eng_mod._keyframe_solve = lambda cfg, s, m, b=None: s

kwargs = {}
if mode == "lanes":
    kwargs["solve_method"] = kv.get("method", "lanes_cg")
    if "gn" in kv:
        kwargs["solve_gn_iterations"] = int(kv["gn"])
    if "cg" in kv:
        kwargs["solve_cg_iterations"] = int(kv["cg"])
elif mode != "nosolve":
    kwargs["solve_method"] = "dense_cg"

sessions, gts = bench.build_batched_sessions(cfg, n_sessions=S)
t0 = time.perf_counter()
states, counts = batch.process_sessions_batched(
    cfg, sessions, solve_stride=stride, **kwargs)
float(jnp.sum(states.poses))
tc = time.perf_counter() - t0
total = sum(counts)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    st, _ = batch.process_sessions_batched(
        cfg, sessions, solve_stride=stride, **kwargs)
    float(jnp.sum(st.poses))
    best = min(best, time.perf_counter() - t0)
    time.sleep(0.05)
from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame
ates = []
for i, (odom, _s) in enumerate(sessions):
    lane = batch.session_state(st, i)
    n = int(lane.num_nodes)
    kf = np.nonzero(batch.keyframe_schedule(cfg, odom))[0][:n]
    ates.append(ate_rmse(np.asarray(lane.poses[:n]), to_anchor_frame(gts[i][kf])))
ne = np.asarray(st.graph.num_edges)
print(
    f"{mode} S={S} stride={stride}: compile {tc:.1f}s, best {best:.2f}s "
    f"-> {total/best:.1f} kf/s aggregate; mean lane ATE {np.mean(ates):.4f} m; "
    f"num_edges max {int(ne.max())} mean {float(ne.mean()):.0f}",
    flush=True,
)
