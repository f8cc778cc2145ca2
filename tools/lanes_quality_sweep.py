"""CPU quality sweep for the lanes-batched solver: lane ATE vs
(method, gn, cg) at the bench workload shape, so TPU runs only confirm
speed on configurations whose quality already passed.

Run: python tools/lanes_quality_sweep.py [S] [stride]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from dpg_slam_tpu import batch
from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame

S = int(sys.argv[1]) if len(sys.argv) > 1 else 4
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 4

cfg = bench._bench_config()
sessions, gts = bench.build_batched_sessions(cfg, n_sessions=S)


def run(method, gn=None, cg=None):
    st, counts = batch.process_sessions_batched(
        cfg, sessions, solve_stride=stride, solve_method=method,
        solve_gn_iterations=gn, solve_cg_iterations=cg, use_kernel=False,
    )
    ates = []
    for i, (odom, _s) in enumerate(sessions):
        lane = batch.session_state(st, i)
        n = int(lane.num_nodes)
        kf = np.nonzero(batch.keyframe_schedule(cfg, odom))[0][:n]
        ates.append(ate_rmse(np.asarray(lane.poses[:n]), to_anchor_frame(gts[i][kf])))
    print(
        f"{method:10s} gn={gn} cg={cg}: mean ATE {np.mean(ates):.4f} m "
        f"(max {np.max(ates):.4f})",
        flush=True,
    )
    return float(np.mean(ates))


run("dense_cg")                      # r4 production reference
run("lanes_chol", gn=5)
run("lanes_chol", gn=3)
run("lanes_cg", gn=5, cg=32)
run("lanes_cg", gn=5, cg=16)
run("lanes_cg", gn=3, cg=32)
run("lanes_cg", gn=3, cg=12)
