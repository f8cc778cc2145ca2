"""Session-batched throughput experiments on the real TPU.

Run: timeout 570 python -u tools/tpu_batch_experiments.py <method> <S> <stride>
ONE variant per process invocation: a killed mid-compile client leaves the
remote compiler grinding for tens of minutes and wedges the shared relay
(measured repeatedly on 2026-08-21); keep each invocation to one compile.
Write output to a FILE when running under a killable timeout — pipes lose
buffered output on kill.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from dpg_slam_tpu.io import dataset
from dpg_slam_tpu import batch
import bench

method = sys.argv[1] if len(sys.argv) > 1 else "dense_cg"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 1

cfg = bench._bench_config()
sessions, gts = bench.build_batched_sessions(cfg, n_sessions=S)
t0 = time.perf_counter()
states, counts = batch.process_sessions_batched(
    cfg, sessions, solve_method=method, solve_stride=stride
)
float(jnp.sum(states.poses))
tc = time.perf_counter() - t0
total = sum(counts)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    st, _ = batch.process_sessions_batched(
        cfg, sessions, solve_method=method, solve_stride=stride
    )
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
print(f"S={S} {method} stride={stride}: compile {tc:.1f}s, best {best:.2f}s "
      f"-> {total/best:.1f} kf/s aggregate; mean lane ATE {np.mean(ates):.4f} m",
      flush=True)
