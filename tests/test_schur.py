"""Schur-complement distributed solver tests on the virtual 8-device mesh."""

import numpy as np
import jax.numpy as jnp

from dpg_slam_tpu import geom
from dpg_slam_tpu.graph import factor_graph as fg
from dpg_slam_tpu.parallel import make_mesh
from dpg_slam_tpu.parallel.schur import schur_solve


def chain_graph_with_closures(N, cap, n_closures, seed=0, noise=0.05):
    """Ground-truth trajectory + odometry chain + long-range closures."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((N, 3))
    for i in range(1, N):
        gt[i] = np.asarray(
            geom.compose(jnp.array(gt[i - 1]), jnp.array([1.0, 0.0, rng.uniform(-0.3, 0.3)]))
        )
    g = fg.empty_graph(max_priors=4, max_edges=256)
    g = fg.add_prior(
        g, jnp.int32(0), jnp.array(gt[0], jnp.float32),
        fg.sqrt_info_from_sigmas(jnp.array([0.05, 0.05, 0.02])),
    )
    model = fg.sqrt_info_from_sigmas(jnp.array([0.1, 0.1, 0.05]))
    for i in range(N - 1):
        meas = geom.between(jnp.array(gt[i]), jnp.array(gt[i + 1]))
        g = fg.add_between(g, jnp.int32(i), jnp.int32(i + 1), meas, model)
    for _ in range(n_closures):
        i, j = sorted(rng.choice(N, 2, replace=False))
        if j - i < 3:
            continue
        meas = geom.between(jnp.array(gt[i]), jnp.array(gt[j]))
        g = fg.add_between(g, jnp.int32(i), jnp.int32(j), meas, model)
    init = jnp.zeros((cap, 3)).at[:N].set(
        jnp.array(gt + rng.normal(0, noise, (N, 3)), jnp.float32)
    )
    mask = jnp.arange(cap) < N
    return g, init, mask, gt


def test_schur_matches_dense():
    N, cap = 32, 32
    g, init, mask, gt = chain_graph_with_closures(N, cap, n_closures=6)
    dense, _ = fg.solve(init, g, mask, max_iterations=25, method="dense")

    mesh = make_mesh(8)
    schur, sep_count = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=32, max_iterations=25,
    )
    assert int(sep_count) > 0
    assert int(sep_count) <= 32
    np.testing.assert_allclose(np.asarray(schur[:N]), np.asarray(dense[:N]), atol=3e-3)


def test_schur_no_cross_edges():
    """A pure chain split at block boundaries: separators are only the
    boundary-crossing chain edges' endpoints."""
    N, cap = 32, 32
    g, init, mask, gt = chain_graph_with_closures(N, cap, n_closures=0)
    mesh = make_mesh(8)
    schur, sep_count = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=32, max_iterations=25,
    )
    # 7 boundary crossings x 2 endpoints = 14 separators.
    assert int(sep_count) == 14
    dense, _ = fg.solve(init, g, mask, max_iterations=25, method="dense")
    np.testing.assert_allclose(np.asarray(schur[:N]), np.asarray(dense[:N]), atol=3e-3)


def test_schur_recovers_ground_truth():
    N, cap = 64, 64
    g, init, mask, gt = chain_graph_with_closures(N, cap, n_closures=10, noise=0.1)
    mesh = make_mesh(8)
    schur, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=64, max_iterations=30,
    )
    err = np.linalg.norm(np.asarray(schur[:N, :2]) - gt[:, :2], axis=1)
    assert err.max() < 0.05, f"max node error {err.max()}"
