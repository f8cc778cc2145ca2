"""Build the committed bench fixtures under bench_assets/ (CPU-only).

Two fixtures, both config-guarded (bench.py compares the stored
config.json to bench._bench_config().to_json() and rebuilds on mismatch):

  bench_assets/session/   the two-pass reoptimize session (the headline
                          benchmark input; also the kbench input)
  bench_assets/keyframe/  a primed online session + never-seen
                          continuation scans for the keyframe metric

Rebuild after changing bench._bench_config or any engine state layout:

  python tools/build_bench_assets.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from dpg_slam_tpu.utils.checkpoint import save_checkpoint


def main():
    root = pathlib.Path(__file__).resolve().parent.parent / "bench_assets"
    cfg = bench._bench_config()

    t0 = time.perf_counter()
    eng = bench.build_two_pass_session(cfg)
    print(
        f"session built in {time.perf_counter()-t0:.1f}s, nodes={eng.num_nodes()}",
        flush=True,
    )
    save_checkpoint(root / "session", eng)

    t0 = time.perf_counter()
    eng_kf, seq, t_start = bench.build_session(cfg)
    print(
        f"keyframe session built in {time.perf_counter()-t0:.1f}s, "
        f"nodes={eng_kf.num_nodes()}, continuation={len(seq.scans)-t_start} scans",
        flush=True,
    )
    save_checkpoint(root / "keyframe", eng_kf)
    np.savez_compressed(
        root / "keyframe" / "continuation.npz",
        scans=np.asarray(seq.scans[t_start:], np.float32),
        odometry=np.asarray(seq.odometry[t_start:], np.float32),
        odom_prev=np.asarray(seq.odometry[t_start - 1], np.float32),
        t_start=t_start,
    )
    print(f"saved to {root}", flush=True)


if __name__ == "__main__":
    main()
