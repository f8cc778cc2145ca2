"""Build the bench two-pass session once and checkpoint it, so kernel
profiling runs don't re-pay the session-build TPU compile each time.

Run: timeout 580 python tools/build_session.py [/tmp/bench_session]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench
from dpg_slam_tpu.utils.checkpoint import save_checkpoint


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_session"
    cfg = bench._bench_config()
    t0 = time.perf_counter()
    eng = bench.build_two_pass_session(cfg)
    print(f"built in {time.perf_counter()-t0:.1f}s, nodes={eng.num_nodes()}",
          flush=True)
    save_checkpoint(out, eng)
    print(f"saved to {out}", flush=True)


if __name__ == "__main__":
    main()
