"""Golden tests for the pose-graph GN/LM solver.

The canonical fixture is the 5-pose + loop-closure scenario the reference
embeds as its install smoke test (dpg_slam_main.cc:217-282) — a square
trajectory whose known optimum is
  x0=(0,0,0) x1=(2,0,0) x2=(4,0,pi/2) x3=(4,2,pi) x4=(2,2,-pi/2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dpg_slam_tpu.graph import factor_graph as fg


def build_gtsam_fixture(capacity_nodes=8, capacity_edges=16):
    """The dpg_slam_main.cc:220-251 graph, 0-indexed."""
    g = fg.empty_graph(max_priors=4, max_edges=capacity_edges)
    prior_sigmas = jnp.array([0.3, 0.3, 0.1])
    g = fg.add_prior(g, jnp.int32(0), jnp.zeros(3), fg.sqrt_info_from_sigmas(prior_sigmas))
    model = fg.sqrt_info_from_sigmas(jnp.array([0.2, 0.2, 0.1]))
    half_pi = np.pi / 2
    edges = [
        (0, 1, [2, 0, 0]),
        (1, 2, [2, 0, half_pi]),
        (2, 3, [2, 0, half_pi]),
        (3, 4, [2, 0, half_pi]),
        (4, 1, [2, 0, half_pi]),  # loop closure
    ]
    for i, j, m in edges:
        g = fg.add_between(g, jnp.int32(i), jnp.int32(j), jnp.array(m, jnp.float32), model)

    init = jnp.zeros((capacity_nodes, 3), jnp.float32)
    init = init.at[0].set(jnp.array([0.5, 0.0, 0.2]))
    init = init.at[1].set(jnp.array([2.3, 0.1, -0.2]))
    init = init.at[2].set(jnp.array([4.1, 0.1, half_pi]))
    init = init.at[3].set(jnp.array([4.0, 2.0, np.pi]))
    init = init.at[4].set(jnp.array([2.1, 2.1, -half_pi]))
    mask = jnp.arange(capacity_nodes) < 5
    return g, init, mask


EXPECTED = np.array(
    [
        [0, 0, 0],
        [2, 0, 0],
        [4, 0, np.pi / 2],
        [4, 2, np.pi],
        [2, 2, -np.pi / 2],
    ]
)


@pytest.mark.parametrize("method", ["dense", "cg", "dense_cg", "dense_pallas"])
def test_gtsam_fixture_optimum(method):
    g, init, mask = build_gtsam_fixture()
    poses, stats = fg.solve(init, g, mask, method=method, max_iterations=30)
    got = np.asarray(poses[:5])
    # Angle comparison modulo 2pi (x4 may come out as +pi or -pi).
    np.testing.assert_allclose(got[:, :2], EXPECTED[:, :2], atol=1e-3)
    ang_err = np.abs(np.angle(np.exp(1j * (got[:, 2] - EXPECTED[:, 2]))))
    np.testing.assert_allclose(ang_err, 0.0, atol=1e-3)
    assert float(stats.final_error) < 1e-6
    assert float(stats.final_error) < float(stats.initial_error)


def test_error_decreases_monotonically_via_stats():
    g, init, mask = build_gtsam_fixture()
    _, stats = fg.solve(init, g, mask, max_iterations=5)
    assert float(stats.final_error) <= float(stats.initial_error)
    assert int(stats.iterations) >= 1


def test_masked_nodes_untouched():
    g, init, mask = build_gtsam_fixture()
    init = init.at[6].set(jnp.array([9.0, 9.0, 9.0]))
    poses, _ = fg.solve(init, g, mask, max_iterations=10)
    # Slot 6 is masked out: its (nonsense) value must pass through unchanged
    # except for angle wrapping applied uniformly.
    np.testing.assert_allclose(np.asarray(poses[6, :2]), [9.0, 9.0], atol=1e-6)


def test_odometry_chain_only():
    """No loop closure: solution follows the odometry chain exactly."""
    g = fg.empty_graph(max_priors=2, max_edges=8)
    g = fg.add_prior(g, jnp.int32(0), jnp.zeros(3), fg.sqrt_info_from_sigmas(jnp.array([0.1, 0.1, 0.05])))
    model = fg.sqrt_info_from_sigmas(jnp.array([0.2, 0.2, 0.1]))
    for i in range(3):
        g = fg.add_between(g, jnp.int32(i), jnp.int32(i + 1), jnp.array([1.0, 0.0, 0.0]), model)
    init = jnp.zeros((8, 3))
    mask = jnp.arange(8) < 4
    poses, stats = fg.solve(init, g, mask, max_iterations=20)
    want = np.stack([np.array([i, 0.0, 0.0]) for i in range(4)])
    np.testing.assert_allclose(np.asarray(poses[:4]), want, atol=1e-4)


def test_invalid_edge_slot_not_consumed():
    g = fg.empty_graph(max_priors=2, max_edges=4)
    model = fg.sqrt_info_from_sigmas(jnp.array([0.2, 0.2, 0.1]))
    g = fg.add_between(g, jnp.int32(0), jnp.int32(1), jnp.ones(3), model, valid=False)
    assert int(g.num_edges) == 0
    g = fg.add_between(g, jnp.int32(0), jnp.int32(1), jnp.ones(3), model, valid=True)
    assert int(g.num_edges) == 1


def test_sqrt_info_from_covariance():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 3))
    cov = jnp.array(A @ A.T + 3 * np.eye(3), jnp.float32)
    R = fg.sqrt_info_from_covariance(cov)
    np.testing.assert_allclose(
        np.asarray(R.T @ R), np.linalg.inv(np.asarray(cov)), rtol=2e-3, atol=2e-4
    )


def test_total_error_zero_at_ground_truth():
    g, _, mask = build_gtsam_fixture()
    gt = jnp.zeros((8, 3)).at[:5].set(jnp.array(EXPECTED, jnp.float32))
    assert float(fg.total_error(gt, g)) < 1e-8


def test_dense_pallas_matches_dense_at_blocked_size():
    """fg.solve(method='dense_pallas') == 'dense' on a graph big enough
    that the panel-blocked elimination engages (3N = 192 -> panel 64)."""
    rng = np.random.default_rng(11)
    N, cap = 64, 64
    model = fg.sqrt_info_from_sigmas(jnp.array([0.1, 0.1, 0.05]))
    g = fg.empty_graph(max_priors=4, max_edges=256)
    g = fg.add_prior(
        g, jnp.int32(0), jnp.zeros(3, jnp.float32),
        fg.sqrt_info_from_sigmas(jnp.array([0.01, 0.01, 0.01])),
    )
    gt = np.cumsum(rng.normal(0.5, 0.1, size=(N, 3)) * [1, 0.2, 0.05], axis=0)
    for i in range(N - 1):
        meas = (gt[i + 1] - gt[i]).astype(np.float32)
        g = fg.add_between(g, jnp.int32(i), jnp.int32(i + 1), jnp.asarray(meas), model)
    for i, j in [(0, 20), (10, 40), (25, 63)]:
        meas = (gt[j] - gt[i]).astype(np.float32)
        g = fg.add_between(g, jnp.int32(i), jnp.int32(j), jnp.asarray(meas), model)
    init = jnp.asarray(gt + rng.normal(0, 0.05, size=(N, 3)), jnp.float32)
    mask = jnp.ones((cap,), bool)

    ref, _ = fg.solve(init, g, mask, method="dense", max_iterations=15)
    got, _ = fg.solve(init, g, mask, method="dense_pallas", max_iterations=15)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def _stack_graphs(gs):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gs)


def _perturbed_fixtures(n_lanes, seed=7):
    """S copies of the gtsam fixture with per-lane perturbed inits and
    measurement noise (distinct LM trajectories per lane)."""
    rng = np.random.default_rng(seed)
    gs, inits, masks = [], [], []
    for _ in range(n_lanes):
        g, init, mask = build_gtsam_fixture()
        g = g._replace(
            edge_meas=g.edge_meas
            + jnp.asarray(rng.normal(0, 0.02, g.edge_meas.shape), jnp.float32)
        )
        init = init + jnp.asarray(rng.normal(0, 0.3, init.shape), jnp.float32)
        gs.append(g)
        inits.append(init)
        masks.append(mask)
    return _stack_graphs(gs), jnp.stack(inits), jnp.stack(masks)


def test_solve_batched_matches_per_lane_solve():
    """solve_batched (lanes-batched unrolled LM) reaches the same optima
    as per-lane fg.solve on perturbed copies of the gtsam fixture."""
    S = 4
    gb, initb, maskb = _perturbed_fixtures(S)
    ref = []
    for i in range(S):
        import jax

        g_i = jax.tree_util.tree_map(lambda x: x[i], gb)
        p, _ = fg.solve(
            initb[i], g_i, maskb[i], method="dense", max_iterations=30,
            robust_delta=2.0,
        )
        ref.append(np.asarray(p))
    for method in ("chol", "cg_fixed"):
        got, stats = fg.solve_batched(
            initb, gb, maskb, max_iterations=30, method=method,
            cg_iterations=24, robust_delta=2.0,
        )
        got = np.asarray(got)
        for i in range(S):
            d = np.abs(got[i, :5] - ref[i][:5])
            d[:, 2] = np.abs(np.angle(np.exp(1j * (got[i, :5, 2] - ref[i][:5, 2]))))
            assert d.max() < 2e-3, (method, i, d.max())
        assert np.all(np.asarray(stats.final_error) <= np.asarray(stats.initial_error))


def test_solve_batched_warm_semantics_match_solve():
    """At the engine's warm-start settings (terminate_on_reject,
    gradient_tol, rel_tol) the batched solver's per-lane freeze matches
    fg.solve's early exit: an already-converged lane's poses move ~0."""
    S = 3
    gb, initb, maskb = _perturbed_fixtures(S, seed=11)
    import jax

    # Pre-converge every lane, then re-solve warm with both solvers.
    warm, _ = fg.solve_batched(
        initb, gb, maskb, max_iterations=30, method="chol", robust_delta=2.0
    )
    kwargs = dict(
        max_iterations=5, robust_delta=2.0, gradient_tol=1e-4,
        terminate_on_reject=True, rel_tol=1e-4,
    )
    got, stats = fg.solve_batched(warm, gb, maskb, method="chol", **kwargs)
    for i in range(S):
        g_i = jax.tree_util.tree_map(lambda x: x[i], gb)
        ref, rstats = fg.solve(warm[i], g_i, maskb[i], method="dense", **kwargs)
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref), atol=1e-5,
            err_msg=f"lane {i} warm re-solve diverged",
        )
