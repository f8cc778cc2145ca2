"""Measure the serial C++ baseline reoptimize time from the checkpointed
bench session (CPU only; safe to run while the TPU is busy).

Run: python tools/cpu_baseline_time.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import bench
from tools._common import load_bench_session


def main():
    eng = load_bench_session(sys.argv[1] if len(sys.argv) > 1 else None)
    cfg = eng.config
    t0 = time.perf_counter()
    cpu_s, pairs = bench.bench_reoptimize_cpu(cfg, eng)
    print(f"native C++ reoptimize: {cpu_s*1e3:.1f} ms, {pairs} pairs "
          f"(wall {time.perf_counter()-t0:.1f}s)")


if __name__ == "__main__":
    main()
