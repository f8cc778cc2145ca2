"""Micro-time the vmapped incremental solve's internals on the real TPU
(the session-batched throughput mode is ~85% solve; find the hog).

Run: timeout 570 python -u tools/profile_batched_solve.py
Each timing is an amortized on-device fori loop (the relay's dispatch RTT
dwarfs single calls); all compiles are tiny.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu.graph import factor_graph as fg

S, NB = 16, 128
E = NB * 10
N3 = 3 * NB


def amortized(fn, *args, loop=50, repeats=3):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            out = fn(i, *a)
            return acc + out * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, loop, body, jnp.float32(0.0))

    float(looped(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped(*args))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    return best / loop


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # Synthetic but realistically-shaped batched graph: chain + closures.
    poses = jnp.asarray(rng.normal(0, 1, (S, NB, 3)), jnp.float32)
    node_mask = jnp.broadcast_to(jnp.arange(NB) < 120, (S, NB))
    ei = np.arange(NB - 1)
    edge_idx = np.zeros((E, 2), np.int32)
    edge_idx[: NB - 1, 0] = ei
    edge_idx[: NB - 1, 1] = ei + 1
    n_extra = E - (NB - 1)
    ci = rng.integers(0, 100, n_extra)
    cj = np.minimum(ci + rng.integers(10, 27, n_extra), NB - 1)
    edge_idx[NB - 1 :] = np.stack([ci, cj], 1)
    g_one = fg.FactorGraph(
        prior_idx=jnp.zeros((8,), jnp.int32),
        prior_val=jnp.zeros((8, 3), jnp.float32),
        prior_sqrt_info=jnp.broadcast_to(jnp.eye(3) * 5.0, (8, 3, 3)).astype(jnp.float32),
        num_priors=jnp.int32(1),
        edge_idx=jnp.asarray(edge_idx),
        edge_meas=jnp.asarray(rng.normal(0, 0.5, (E, 3)), jnp.float32),
        edge_sqrt_info=jnp.broadcast_to(jnp.eye(3) * 3.0, (E, 3, 3)).astype(jnp.float32),
        num_edges=jnp.int32(1000),
    )
    graphs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), g_one
    )

    def vassemble(i, poses, graphs, node_mask):
        eq, err = jax.vmap(
            lambda p, g, m: fg._assemble(p, g, m, 2.0)
        )(poses + i * jnp.float32(1e-30), graphs, node_mask)
        return jnp.sum(eq.rhs) + err.sum()

    t = amortized(vassemble, poses, graphs, node_mask)
    print(f"vmapped _assemble:            {t*1e3:7.3f} ms", flush=True)

    eq, _ = jax.vmap(lambda p, g, m: fg._assemble(p, g, m, 2.0))(
        poses, graphs, node_mask
    )

    def vdense_h(i, eq, graphs):
        H = jax.vmap(
            lambda e, g: fg._dense_H(e, g, jnp.float32(1e-4))
        )(eq._replace(rhs=eq.rhs + i * jnp.float32(1e-30)), graphs)
        return jnp.sum(H) * jnp.float32(1e-6)

    t = amortized(vdense_h, eq, graphs)
    print(f"vmapped _dense_H:             {t*1e3:7.3f} ms", flush=True)

    Hf = jax.vmap(lambda e, g: fg._dense_H(e, g, jnp.float32(1e-4)))(eq, graphs)
    rhs = eq.rhs.reshape(S, N3)

    def vcho(i, Hf, rhs):
        import jax.scipy.linalg as jsl

        def one(H, b):
            L, low = jsl.cho_factor(H + i * jnp.float32(1e-30))
            return jsl.cho_solve((L, low), b)

        return jnp.sum(jax.vmap(one)(Hf, rhs))

    t = amortized(vcho, Hf, rhs, loop=20)
    print(f"vmapped cho_factor+solve:     {t*1e3:7.3f} ms", flush=True)

    for iters in (8, 64):
        def vcg(i, eq, graphs, it=iters):
            out = jax.vmap(
                lambda e, g: fg._dense_cg_solve(e, g, jnp.float32(1e-4), it)
            )(eq._replace(rhs=eq.rhs + i * jnp.float32(1e-30)), graphs)
            return jnp.sum(out)

        t = amortized(vcg, eq, graphs, loop=20)
        print(f"vmapped _dense_cg_solve({iters:3d}): {t*1e3:7.3f} ms", flush=True)

    def verr(i, poses, graphs):
        return jnp.sum(
            jax.vmap(lambda p, g: fg.total_error(p, g, 2.0))(
                poses + i * jnp.float32(1e-30), graphs
            )
        )

    t = amortized(verr, poses, graphs)
    print(f"vmapped total_error:          {t*1e3:7.3f} ms", flush=True)

    def vsolve(i, poses, graphs, node_mask, method, gn):
        out, _ = jax.vmap(
            lambda p, g, m: fg.solve.__wrapped__(
                p, g, m, max_iterations=gn, method=method,
                robust_delta=2.0, gradient_tol=1e-4,
                terminate_on_reject=True, rel_tol=1e-4,
                cg_iterations=16,
            )
        )(poses + i * jnp.float32(1e-30), graphs, node_mask)
        return jnp.sum(out)

    for method, gn in (("dense", 2), ("dense_cg", 2), ("dense", 5)):
        t = amortized(
            lambda i, p, g, m, me=method, it=gn: vsolve(i, p, g, m, me, it),
            poses, graphs, node_mask, loop=10,
        )
        print(f"vmapped full solve {method:9s} gn={gn} cg16: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
