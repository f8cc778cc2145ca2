"""Micro-bench the Pallas ICP kernel on TPU from the checkpointed bench
session: compacted+sorted live pairs, iteration histogram, variant timing.

Run: timeout 580 python tools/kbench.py
Env: BENCH_SESSION (checkpoint dir, default bench_assets/session),
     KBENCH_VARIANTS (comma list of _run_kernel variants, default v2),
     KBENCH_ITERS (comma list of max_iterations, default "<config>,15"),
     KBENCH_ERRTOL (comma list of icp_error_delta_rel_tol values to A/B,
       default "<config>,0" — the error-delta exit vs the strict
       PCL step-epsilon exit),
     KBENCH_JSON (path: append one JSON line per measurement).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu import engine as eng_mod
from dpg_slam_tpu.ops import icp_pallas
from tools._common import load_bench_session, timed_detailed


def main():
    print("backend:", jax.default_backend(), flush=True)
    eng = load_bench_session()
    state = eng.state
    nb = eng._solve_bucket(int(state.num_nodes))
    node_fields = (
        "poses", "odom_poses", "pass_ids", "node_active",
        "ranges", "labels", "sector_active", "cloud",
        "cloud_mask", "cloud_normals",
    )
    sub = state._replace(**{f: getattr(state, f)[:nb] for f in node_fields})
    rcfg = eng._reopt_config()
    pg = rcfg.pose_graph
    K = pg.max_loop_closures_per_node

    flat = eng_mod._reoptimize_pairs(rcfg, sub)
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = [np.asarray(x) for x in flat]
    live = np.nonzero(flat_valid)[0]
    is_succ = (live % (1 + K)) == 0
    order = np.concatenate([live[is_succ], live[~is_succ]])
    B = max(64, -(-len(order) // 64) * 64)
    idx = np.concatenate([order, np.zeros((B - len(order),), np.int64)])
    val = np.concatenate([np.ones(len(order), bool), np.zeros(B - len(order), bool)])
    print(f"live={len(live)} (succ {is_succ.sum()}) -> B={B}", flush=True)

    lsrc = jnp.asarray(flat_src[idx])
    ltgt = jnp.asarray(flat_tgt[idx])
    lval = jnp.asarray(val)
    lseed = jnp.asarray(seeds[idx])
    lgate = jnp.asarray(flat_gate[idx])

    def run(sub, lsrc, ltgt, lval, lseed, lgate, max_iters, variant="v2",
            err_tol=0.0):
        src = sub.cloud[lsrc]
        smask = sub.cloud_mask[lsrc] & lval[:, None]
        tgt = sub.cloud[ltgt]
        tmask = sub.cloud_mask[ltgt] & lval[:, None]
        nrm = sub.cloud_normals[ltgt]
        planes = (
            jnp.where(smask, src[..., 0], -icp_pallas._MASK_COORD),
            jnp.where(smask, src[..., 1], -icp_pallas._MASK_COORD),
            jnp.where(tmask, tgt[..., 0], icp_pallas._MASK_COORD),
            jnp.where(tmask, tgt[..., 1], icp_pallas._MASK_COORD),
            nrm[..., 0], nrm[..., 1],
            smask.astype(jnp.float32),
        )
        seeds_g = jnp.concatenate([lseed, lgate[:, None]], axis=-1)
        return icp_pallas._run_kernel(
            planes, seeds_g,
            max_iterations=max_iters,
            max_corr=pg.icp_max_correspondence_distance,
            reciprocal=pg.icp_use_reciprocal_correspondences,
            epsilon=pg.icp_maximum_transformation_epsilon,
            censi=False,
            interpret=False,
            error_delta_rel_tol=err_tol,
            variant=variant,
        )

    variants = os.environ.get("KBENCH_VARIANTS", "jt").split(",")
    iters_list = tuple(
        int(s) for s in os.environ.get(
            "KBENCH_ITERS", f"{pg.icp_maximum_iterations},15").split(",")
    )
    errtols = tuple(
        float(s) for s in os.environ.get(
            "KBENCH_ERRTOL",
            f"{getattr(pg, 'icp_error_delta_rel_tol', 0.0)},0").split(",")
    )
    ref_out = None
    for variant in variants:
      for err_tol in errtols:
        for iters in iters_list:
            f = jax.jit(
                lambda *a, it=iters, v=variant, et=err_tol: run(
                    *a, max_iters=it, variant=v, err_tol=et
                )
            )
            try:
                t, tc, out = timed_detailed(f, sub, lsrc, ltgt, lval, lseed, lgate)
            except Exception as e:  # a variant failing to Mosaic-compile
                print(f"{variant} max_iters={iters}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
                continue
            blk_iters = np.asarray(out[:, 11]).reshape(-1, icp_pallas._G)[:, 0]
            if iters == pg.icp_maximum_iterations:
                if ref_out is None:
                    ref_out = np.asarray(out[:, 0:3])
                dev = float(np.max(np.abs(np.asarray(out[:, 0:3]) - ref_out)))
            else:
                dev = float("nan")
            print(
                f"{variant} errtol={err_tol:g} kernel B={B} max_iters={iters}: {t*1e3:.2f} ms raw, "
                f"{tc*1e3:.2f} ms canary-corrected  "
                f"({tc/max(len(live),1)*1e6:.1f} us/live pair; "
                f"block-iter sum {blk_iters.sum():.0f}, "
                f"us/block-iter {tc*1e6/max(blk_iters.sum(),1):.1f}; "
                f"dev vs first variant {dev:.2e})",
                flush=True,
            )
            h = np.percentile(blk_iters, [0, 25, 50, 75, 100])
            print(f"  block iters pct [0/25/50/75/100]: {h}", flush=True)
            jpath = os.environ.get("KBENCH_JSON")
            if jpath:
                with open(jpath, "a") as fh:
                    fh.write(json.dumps({
                        "variant": variant,
                        "error_delta_rel_tol": err_tol,
                        "max_iters": iters,
                        "B": B,
                        "live_pairs": int(len(live)),
                        "ms_raw": round(t * 1e3, 2),
                        "ms_canary_corrected": round(tc * 1e3, 2),
                        "us_per_live_pair": round(tc / max(len(live), 1) * 1e6, 2),
                        "block_iter_sum": int(blk_iters.sum()),
                        "us_per_block_iter": round(
                            float(tc * 1e6 / max(blk_iters.sum(), 1)), 2),
                        "block_iter_pct_0_25_50_75_100": [float(x) for x in h],
                        "transform_dev_vs_first_variant": None
                        if np.isnan(dev) else float(f"{dev:.3e}"),
                    }) + "\n")


if __name__ == "__main__":
    main()
