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
    schur, sep_count, _ = schur_solve(
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
    schur, sep_count, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=32, max_iterations=25,
    )
    # 7 boundary crossings x 2 endpoints = 14 separators.
    assert int(sep_count) == 14
    dense, _ = fg.solve(init, g, mask, max_iterations=25, method="dense")
    np.testing.assert_allclose(np.asarray(schur[:N]), np.asarray(dense[:N]), atol=3e-3)


def test_spd_solve_pallas_matches_scipy():
    """The fused Pallas interior-elimination kernel (Cholesky + both
    triangular solves) must reproduce cho_factor/cho_solve."""
    import jax.scipy.linalg as jsl

    from dpg_slam_tpu.ops.schur_pallas import spd_solve_pallas

    rng = np.random.default_rng(3)
    n, m = 48, 17
    A = rng.normal(size=(n, n))
    H = (A @ A.T + n * np.eye(n)).astype(np.float32)
    # Identity padding rows, like schur_solve produces for dead slots.
    H[-6:, :] = 0.0
    H[:, -6:] = 0.0
    H[np.arange(n - 6, n), np.arange(n - 6, n)] = 1.0
    B = rng.normal(size=(n, m)).astype(np.float32)

    L, low = jsl.cho_factor(jnp.asarray(H))
    want = jsl.cho_solve((L, low), jnp.asarray(B))
    # Pure-jax evaluation of the kernel body (the shard_map/CPU path)...
    got = spd_solve_pallas(jnp.asarray(H), jnp.asarray(B), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # ...and the pallas_call plumbing itself (interpreter mode).
    got_pl = spd_solve_pallas(
        jnp.asarray(H), jnp.asarray(B), pallas_interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_pl), np.asarray(want), atol=2e-4)


def test_schur_pallas_elimination_matches_xla():
    """schur_solve with the Pallas elimination kernel == the XLA path."""
    N, cap = 32, 32
    g, init, mask, gt = chain_graph_with_closures(N, cap, n_closures=6)
    mesh = make_mesh(8)
    args = (
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
    )
    xla, _, _ = schur_solve(*args, sep_cap=32, max_iterations=15)
    pal, _, _ = schur_solve(
        *args, sep_cap=32, max_iterations=15,
        pallas_elimination=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pal[:N]), np.asarray(xla[:N]), atol=1e-4)


def test_schur_spatial_assignment():
    """A multi-lap trajectory under a SPATIAL partition: co-located nodes
    from different laps share a shard, separators stay bounded, and the
    solution matches the dense solver."""
    from dpg_slam_tpu.parallel.partition import spatial_blocks

    rng = np.random.default_rng(5)
    laps, per_lap = 4, 32
    N = laps * per_lap
    cap = N
    # A square loop traversed `laps` times.
    t = np.linspace(0, 2 * np.pi, per_lap, endpoint=False)
    lap_xy = np.stack([4 * np.cos(t), 4 * np.sin(t)], axis=1)
    gt = np.zeros((N, 3))
    for l in range(laps):
        gt[l * per_lap : (l + 1) * per_lap, :2] = lap_xy
    gt[:, 2] = np.tile(t + np.pi / 2, laps)

    g = fg.empty_graph(max_priors=4, max_edges=512)
    g = fg.add_prior(
        g, jnp.int32(0), jnp.array(gt[0], jnp.float32),
        fg.sqrt_info_from_sigmas(jnp.array([0.05, 0.05, 0.02])),
    )
    model = fg.sqrt_info_from_sigmas(jnp.array([0.1, 0.1, 0.05]))
    for i in range(N - 1):
        meas = geom.between(jnp.array(gt[i]), jnp.array(gt[i + 1]))
        g = fg.add_between(g, jnp.int32(i), jnp.int32(i + 1), meas, model)
    # Closures: every node to its same-position node one lap earlier.
    for i in range(per_lap, N):
        j = i - per_lap
        meas = geom.between(jnp.array(gt[j]), jnp.array(gt[i]))
        g = fg.add_between(g, jnp.int32(j), jnp.int32(i), meas, model)

    init = jnp.asarray(gt + rng.normal(0, 0.05, (N, 3)), jnp.float32)
    mask = jnp.ones((cap,), bool)
    dense, _ = fg.solve(init, g, mask, max_iterations=25, method="dense")

    mesh = make_mesh(8)
    assign = spatial_blocks(gt[:, :2], np.ones(N, bool), 8)
    # Spatial grouping puts all 4 laps' visits to a spot in one shard.
    for l in range(1, laps):
        same_spot = assign[:per_lap] == assign[l * per_lap : (l + 1) * per_lap]
        assert same_spot.mean() > 0.7, same_spot.mean()
    schur, sep_count, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        jnp.asarray(assign),
        sep_cap=96, max_iterations=25,
    )
    # Contiguous split for comparison: every closure crosses shards.
    _, sep_contig, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=N, max_iterations=1,
    )
    assert 0 < int(sep_count) <= 96, int(sep_count)
    assert int(sep_count) < int(sep_contig), (int(sep_count), int(sep_contig))
    np.testing.assert_allclose(
        np.asarray(schur[:N]), np.asarray(dense[:N]), atol=5e-3
    )


def test_schur_recovers_ground_truth():
    N, cap = 64, 64
    g, init, mask, gt = chain_graph_with_closures(N, cap, n_closures=10, noise=0.1)
    mesh = make_mesh(8)
    schur, _, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=64, max_iterations=30,
    )
    err = np.linalg.norm(np.asarray(schur[:N, :2]) - gt[:, :2], axis=1)
    assert err.max() < 0.05, f"max node error {err.max()}"


def test_spd_solve_pallas_blocked_matches_scipy():
    """The panel-blocked elimination (python-unrolled MXU panels,
    ops/schur_pallas._eliminate_blocked) must reproduce
    cho_factor/cho_solve at a production-shaped size, for every panel
    width, through both the pure-jax path and the pallas_call plumbing."""
    import jax.scipy.linalg as jsl

    from dpg_slam_tpu.ops.schur_pallas import _pick_panel, spd_solve_pallas

    rng = np.random.default_rng(7)
    n, m = 256, 33
    assert _pick_panel(n) == 128
    A = rng.normal(size=(n, n))
    H = (A @ A.T / n + 3.0 * np.eye(n)).astype(np.float32)
    H[-9:, :] = 0.0
    H[:, -9:] = 0.0
    H[np.arange(n - 9, n), np.arange(n - 9, n)] = 1.0
    B = rng.normal(size=(n, m)).astype(np.float32)

    L, low = jsl.cho_factor(jnp.asarray(H))
    want = np.asarray(jsl.cho_solve((L, low), jnp.asarray(B)))

    for panel in (64, 128):
        got = np.asarray(
            spd_solve_pallas(
                jnp.asarray(H), jnp.asarray(B), interpret=True, panel=panel
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4)
    got_pl = np.asarray(
        spd_solve_pallas(jnp.asarray(H), jnp.asarray(B), pallas_interpret=True)
    )
    np.testing.assert_allclose(got_pl, want, atol=2e-4)
    # Odd sizes that no panel divides must still solve (unblocked path).
    n2 = 72
    H2 = (np.eye(n2) * 2.0).astype(np.float32)
    B2 = rng.normal(size=(n2, 5)).astype(np.float32)
    got2 = np.asarray(
        spd_solve_pallas(jnp.asarray(H2), jnp.asarray(B2), interpret=True)
    )
    np.testing.assert_allclose(got2, B2 / 2.0, atol=1e-5)


def outlier_graph(N=32, cap=32, seed=2):
    """Stiff odometry chain + correct closures + 3 wrong-basin closures
    (~2 m off, the perceptual-aliasing failure mode reoptimize exists
    for). Tuned so Huber (delta=2, the production default) visibly wins:
    robust max position error ~0.6 m vs quadratic ~2.0 m."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((N, 3))
    for i in range(1, N):
        gt[i] = np.asarray(
            geom.compose(jnp.array(gt[i - 1]), jnp.array([1.0, 0.0, rng.uniform(-0.3, 0.3)]))
        )
    g = fg.empty_graph(4, 256)
    g = fg.add_prior(
        g, jnp.int32(0), jnp.array(gt[0], jnp.float32),
        fg.sqrt_info_from_sigmas(jnp.array([0.05, 0.05, 0.02])),
    )
    chain_m = fg.sqrt_info_from_sigmas(jnp.array([0.02, 0.02, 0.01]))
    clos_m = fg.sqrt_info_from_sigmas(jnp.array([0.1, 0.1, 0.05]))
    for i in range(N - 1):
        g = fg.add_between(
            g, jnp.int32(i), jnp.int32(i + 1),
            geom.between(jnp.array(gt[i]), jnp.array(gt[i + 1])), chain_m,
        )
    for i, j in [(1, 15), (8, 25), (4, 29)]:
        g = fg.add_between(
            g, jnp.int32(i), jnp.int32(j),
            geom.between(jnp.array(gt[i]), jnp.array(gt[j])), clos_m,
        )
    for i, j in [(2, 20), (5, 27), (9, 30)]:
        bad = geom.between(jnp.array(gt[i]), jnp.array(gt[j])) + jnp.array(
            [2.0, 2.0, 0.4], jnp.float32
        )
        g = fg.add_between(g, jnp.int32(i), jnp.int32(j), bad, clos_m)
    init = jnp.zeros((cap, 3)).at[:N].set(
        jnp.array(gt + rng.normal(0, 0.05, (N, 3)), jnp.float32)
    )
    mask = jnp.arange(cap) < N
    return g, init, mask, gt


def test_schur_huber_outlier_parity():
    """Single-chip solver semantics in the distributed Schur solve: with
    wrong-basin (outlier) closures injected, the Huber-IRLS Schur result
    must match fg.solve(robust_delta=...) — and the outliers must actually
    matter (pure-GN result visibly dragged away from ground truth)."""
    N = 32
    g, init, mask, gt = outlier_graph()

    robust, _ = fg.solve(
        init, g, mask, max_iterations=30, method="dense", robust_delta=2.0
    )
    quad, _ = fg.solve(init, g, mask, max_iterations=30, method="dense")
    err_robust = float(
        np.linalg.norm(np.asarray(robust[:N, :2]) - gt[:, :2], axis=1).max()
    )
    err_quad = float(
        np.linalg.norm(np.asarray(quad[:N, :2]) - gt[:, :2], axis=1).max()
    )
    assert err_robust < 0.8, f"robust single-chip solve off gt by {err_robust}"
    assert err_quad > 2.5 * err_robust, (
        "outlier closures did not perturb the quadratic solve; the parity "
        f"test is vacuous (quad {err_quad} vs robust {err_robust})"
    )

    mesh = make_mesh(8)
    schur, _, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=32, max_iterations=30, robust_delta=2.0, rel_tol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(schur[:N]), np.asarray(robust[:N]), atol=5e-3
    )


def test_schur_rel_tol_converges_early():
    """The convergence stop must not change the solution (vs the fixed
    iteration budget) on a clean graph."""
    N, cap = 32, 32
    g, init, mask, gt = chain_graph_with_closures(N, cap, n_closures=6, seed=3)
    mesh = make_mesh(8)
    fixed, _, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=32, max_iterations=25,
    )
    early, _, _ = schur_solve(
        mesh, init, mask,
        g.prior_idx, g.prior_val, g.prior_sqrt_info, g.prior_mask,
        g.edge_idx, g.edge_meas, g.edge_sqrt_info, g.edge_mask,
        sep_cap=32, max_iterations=25, rel_tol=1e-7,
    )
    np.testing.assert_allclose(np.asarray(early[:N]), np.asarray(fixed[:N]), atol=1e-3)
