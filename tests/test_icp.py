"""Property tests for batched ICP on synthetic clouds with known transforms
(SURVEY.md §4 prescription)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dpg_slam_tpu import geom
from dpg_slam_tpu.config import PoseGraphParams
from dpg_slam_tpu.ops import icp


def make_room_scan(rng, n=256, noise=0.0):
    """Points on the walls of a 8x6 room, like a lidar would see."""
    t = rng.uniform(0, 4, n)
    side = rng.integers(0, 4, n)
    pts = np.zeros((n, 2))
    pts[side == 0] = np.stack([t[side == 0] * 2 - 4, np.full((side == 0).sum(), -3.0)], 1)
    pts[side == 1] = np.stack([t[side == 1] * 2 - 4, np.full((side == 1).sum(), 3.0)], 1)
    pts[side == 2] = np.stack([np.full((side == 2).sum(), -4.0), t[side == 2] * 1.5 - 3], 1)
    pts[side == 3] = np.stack([np.full((side == 3).sum(), 4.0), t[side == 3] * 1.5 - 3], 1)
    return pts + rng.normal(0, noise, (n, 2))


@pytest.mark.parametrize("point_to_line", [True, False])
def test_icp_recovers_known_transform(point_to_line):
    rng = np.random.default_rng(0)
    tgt = make_room_scan(rng)
    true_pose = np.array([0.3, -0.2, 0.1])  # src frame in tgt frame
    # src points = world points expressed in the src frame.
    src = np.asarray(geom.inv_apply(jnp.array(true_pose), jnp.array(tgt)))

    params = PoseGraphParams(
        icp_point_to_line=point_to_line, icp_use_reciprocal_correspondences=True
    )
    mask = jnp.ones(len(tgt), dtype=bool)
    res = icp.icp_align_single(
        jnp.array(src, jnp.float32),
        mask,
        jnp.array(tgt, jnp.float32),
        mask,
        jnp.zeros(3),
        params,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.transform), true_pose, atol=2e-2)


def test_icp_batched_independent_pairs():
    rng = np.random.default_rng(1)
    B = 4
    tgts, srcs, poses = [], [], []
    for i in range(B):
        tgt = make_room_scan(rng)
        pose = rng.uniform(-0.3, 0.3, 3)
        src = np.asarray(geom.inv_apply(jnp.array(pose), jnp.array(tgt)))
        tgts.append(tgt); srcs.append(src); poses.append(pose)
    params = PoseGraphParams()
    mask = jnp.ones((B, 256), dtype=bool)
    res = icp.icp_align(
        jnp.array(np.stack(srcs), jnp.float32),
        mask,
        jnp.array(np.stack(tgts), jnp.float32),
        mask,
        jnp.zeros((B, 3)),
        params,
    )
    assert res.transform.shape == (B, 3)
    assert bool(res.converged.all())
    np.testing.assert_allclose(np.asarray(res.transform), np.stack(poses), atol=3e-2)


def test_icp_with_noise_and_seed():
    rng = np.random.default_rng(2)
    tgt = make_room_scan(rng, noise=0.01)
    true_pose = np.array([0.8, 0.1, 0.15])
    src = np.asarray(geom.inv_apply(jnp.array(true_pose), jnp.array(make_room_scan(rng, noise=0.01))))
    params = PoseGraphParams()
    mask = jnp.ones(256, dtype=bool)
    # Seed near the truth, like the odometry seed at dpg_slam.cc:364-378.
    seed = jnp.array(true_pose + rng.uniform(-0.1, 0.1, 3))
    # Two independent random samplings of the same walls: reciprocal
    # matching keeps fewer pairs, so relax the overlap gate for this test.
    res = icp.icp_align_single(
        jnp.array(src, jnp.float32), mask, jnp.array(tgt, jnp.float32), mask, seed, params,
        min_overlap=0.3,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.transform), true_pose, atol=0.05)


def test_icp_masks_respected():
    """Padded garbage points must not affect the solution."""
    rng = np.random.default_rng(3)
    tgt = make_room_scan(rng)
    true_pose = np.array([0.2, 0.1, 0.05])
    src = np.asarray(geom.inv_apply(jnp.array(true_pose), jnp.array(tgt)))
    # Corrupt the last 56 points, mask them out.
    src_pad = src.copy(); src_pad[200:] = 1e3
    tgt_pad = tgt.copy(); tgt_pad[200:] = -1e3
    mask = jnp.arange(256) < 200
    params = PoseGraphParams()
    res = icp.icp_align_single(
        jnp.array(src_pad, jnp.float32), mask, jnp.array(tgt_pad, jnp.float32), mask,
        jnp.zeros(3), params,
    )
    assert bool(res.converged)
    assert int(res.num_correspondences) <= 200
    np.testing.assert_allclose(np.asarray(res.transform), true_pose, atol=2e-2)


def test_icp_rejects_garbage():
    """Unrelated clouds must not be accepted (loop-closure gating)."""
    rng = np.random.default_rng(4)
    tgt = make_room_scan(rng)
    src = rng.uniform(50, 60, (256, 2))  # far away random blob
    mask = jnp.ones(256, dtype=bool)
    params = PoseGraphParams()
    res = icp.icp_align_single(
        jnp.array(src, jnp.float32), mask, jnp.array(tgt, jnp.float32), mask,
        jnp.zeros(3), params,
    )
    assert not bool(res.converged)


def test_icp_fixed_covariance_parity():
    """Parity mode returns the reference's constant diagonal
    (cov_func_point_to_point.h:572-575)."""
    rng = np.random.default_rng(5)
    tgt = make_room_scan(rng)
    params = PoseGraphParams(use_fixed_icp_covariance=True)
    mask = jnp.ones(256, dtype=bool)
    res = icp.icp_align_single(
        jnp.array(tgt, jnp.float32), mask, jnp.array(tgt, jnp.float32), mask,
        jnp.zeros(3), params,
    )
    np.testing.assert_allclose(
        np.asarray(res.covariance), np.diag([0.5, 0.5, 0.3]), atol=1e-6
    )


def test_icp_gn_covariance_sensible():
    """GN covariance mode: symmetric positive-definite, scales with noise."""
    rng = np.random.default_rng(6)
    tgt = make_room_scan(rng)
    params = PoseGraphParams(use_fixed_icp_covariance=False)
    mask = jnp.ones(256, dtype=bool)
    res = icp.icp_align_single(
        jnp.array(tgt, jnp.float32), mask, jnp.array(tgt, jnp.float32), mask,
        jnp.zeros(3), params, sensor_noise_std=0.02,
    )
    cov = np.asarray(res.covariance)
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    eigs = np.linalg.eigvalsh(cov)
    assert np.all(eigs > 0)
    assert np.all(eigs < 0.1)  # well-constrained room scan -> small covariance


def test_estimate_normals_wall():
    """Normals of a straight wall are perpendicular to it."""
    pts = jnp.stack([jnp.linspace(0, 5, 64), jnp.full(64, 2.0)], axis=-1)
    mask = jnp.ones(64, dtype=bool)
    n = np.asarray(icp.estimate_normals(pts, mask))
    # Interior points: normal = (0, +-1).
    np.testing.assert_allclose(np.abs(n[5:-5, 1]), 1.0, atol=1e-5)
    np.testing.assert_allclose(n[5:-5, 0], 0.0, atol=1e-5)


def _pp_gn_hessian(src, tgt_matched, transform):
    """Direct point-to-point GN normal matrix H = 2 sum J^T J at the
    given transform (for checking censi_covariance reductions)."""
    moved = np.asarray(geom.apply(jnp.array(transform)[None], jnp.array(src)[None]))[0]
    rp = moved - transform[:2]
    u = np.stack([-rp[:, 1], rp[:, 0]], axis=-1)  # R' p
    H = np.zeros((3, 3))
    for i in range(len(src)):
        J = np.array([[1.0, 0.0, u[i, 0]], [0.0, 1.0, u[i, 1]]])
        H += 2.0 * J.T @ J
    return H


def test_censi_covariance_reduces_to_gn_for_target_noise():
    """Target-only iid noise + zero residuals: the full sandwich equals
    2 sigma^2 H^-1 exactly (cov_func_point_to_point.h sandwich with
    Sigma_z = diag(0, sigma^2 I))."""
    rng = np.random.default_rng(3)
    tgt = make_room_scan(rng, n=128).astype(np.float32)
    transform = np.array([0.0, 0.0, 0.0], np.float32)
    mask = jnp.ones(len(tgt), dtype=bool)
    sigma = 0.03
    cov = icp.censi_covariance(
        jnp.array(tgt)[None],
        mask[None],
        jnp.array(tgt)[None],
        mask[None],
        jnp.array(transform)[None],
        max_correspondence_distance=0.6,
        reciprocal=True,
        src_noise_std=0.0,
        tgt_noise_std=sigma,
    )[0]
    H = _pp_gn_hessian(tgt, tgt, transform)
    expect = 2.0 * sigma**2 * np.linalg.inv(H)
    np.testing.assert_allclose(np.asarray(cov), expect, rtol=1e-3, atol=1e-10)


def test_censi_covariance_both_clouds_doubles():
    """Noise on both clouds at zero residual = exactly twice the
    one-cloud covariance (B_p = -B_q R^T at r=0)."""
    rng = np.random.default_rng(4)
    tgt = make_room_scan(rng, n=128).astype(np.float32)
    mask = jnp.ones(len(tgt), dtype=bool)
    kw = dict(max_correspondence_distance=0.6, reciprocal=True)
    one = icp.censi_covariance(
        jnp.array(tgt)[None], mask[None], jnp.array(tgt)[None], mask[None],
        jnp.zeros((1, 3)), src_noise_std=0.0, tgt_noise_std=0.02, **kw,
    )[0]
    both = icp.censi_covariance(
        jnp.array(tgt)[None], mask[None], jnp.array(tgt)[None], mask[None],
        jnp.zeros((1, 3)), src_noise_std=0.02, tgt_noise_std=0.02, **kw,
    )[0]
    np.testing.assert_allclose(np.asarray(both), 2.0 * np.asarray(one), rtol=1e-4)


def test_censi_covariance_differs_under_residuals():
    """With real residuals (noisy alignment) the d2J/dZdX structure
    departs from the plain GN estimate — the term the reference's dead
    code carries and "gn" mode drops."""
    rng = np.random.default_rng(5)
    tgt = make_room_scan(rng, n=128, noise=0.0).astype(np.float32)
    src = (tgt + rng.normal(0, 0.05, tgt.shape)).astype(np.float32)
    mask = jnp.ones(len(tgt), dtype=bool)
    sigma = 0.05
    cov = np.asarray(
        icp.censi_covariance(
            jnp.array(src)[None], mask[None], jnp.array(tgt)[None], mask[None],
            jnp.zeros((1, 3)),
            max_correspondence_distance=0.6, reciprocal=True,
            src_noise_std=0.0, tgt_noise_std=sigma,
        )[0]
    )
    H = _pp_gn_hessian(src, tgt, np.zeros(3, np.float32))
    gn = 2.0 * sigma**2 * np.linalg.inv(H)
    rel = np.abs(cov - gn).max() / np.abs(gn).max()
    assert rel > 0.01, f"censi should differ from gn under residuals, rel={rel}"
    # ... but stays a valid PSD covariance of the same order of magnitude.
    evals = np.linalg.eigvalsh(cov)
    assert np.all(evals > 0)
    assert np.abs(cov).max() < 100 * np.abs(gn).max()


def test_censi_mode_through_icp_align():
    """End-to-end: icp_covariance_mode='censi' produces finite PSD
    covariances and the same transforms as 'gn' mode."""
    rng = np.random.default_rng(6)
    tgt = make_room_scan(rng)
    true_pose = np.array([0.2, -0.1, 0.05])
    src = np.asarray(geom.inv_apply(jnp.array(true_pose), jnp.array(tgt)))
    mask = jnp.ones(len(tgt), dtype=bool)
    res = {}
    for mode in ("gn", "censi"):
        params = PoseGraphParams(icp_covariance_mode=mode)
        res[mode] = icp.icp_align_single(
            jnp.array(src, jnp.float32), mask, jnp.array(tgt, jnp.float32), mask,
            jnp.zeros(3), params,
        )
    np.testing.assert_allclose(
        np.asarray(res["censi"].transform), np.asarray(res["gn"].transform), atol=1e-6
    )
    assert bool(res["censi"].converged)
    cov = np.asarray(res["censi"].covariance)
    assert np.all(np.isfinite(cov))
    assert np.all(np.linalg.eigvalsh(cov) > 0)


def test_ransac_rejection_clean_data_unchanged():
    """RANSAC on clean rigid data must not perturb the recovered
    transform (all correspondences are inliers to the true model)."""
    rng = np.random.default_rng(7)
    tgt = make_room_scan(rng)
    true_pose = np.array([0.25, -0.15, 0.08])
    src = np.asarray(geom.inv_apply(jnp.array(true_pose), jnp.array(tgt)))
    mask = jnp.ones(len(tgt), dtype=bool)
    params = PoseGraphParams(icp_use_ransac_rejection=True)
    res = icp.icp_align_single(
        jnp.array(src, jnp.float32), mask, jnp.array(tgt, jnp.float32), mask,
        jnp.zeros(3), params,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.transform), true_pose, atol=2e-2)


def test_ransac_rejects_moved_object_correspondences():
    """A displaced object cluster (dynamic scene) biases plain ICP; the
    RANSAC correspondence rejection should reduce that bias."""
    rng = np.random.default_rng(8)
    walls = make_room_scan(rng, n=192)
    # An object present in both scans but DISPLACED between them: its
    # correspondences are consistent with a wrong (translated) model.
    obj = rng.uniform(-0.4, 0.4, (64, 2)) + np.array([1.5, 0.5])
    tgt = np.vstack([walls, obj]).astype(np.float32)
    moved_obj = obj + np.array([0.35, 0.0])  # within the 0.6 m gate
    true_pose = np.array([0.05, 0.02, 0.01])
    src_world = np.vstack([walls, moved_obj])
    src = np.asarray(
        geom.inv_apply(jnp.array(true_pose), jnp.array(src_world))
    ).astype(np.float32)
    mask = jnp.ones(len(tgt), dtype=bool)

    errs = {}
    for use_ransac in (False, True):
        params = PoseGraphParams(
            icp_use_ransac_rejection=use_ransac,
            icp_point_to_line=False,
            icp_use_reciprocal_correspondences=False,
            icp_coarse_gate_multiplier=1.0,
        )
        res = icp.icp_align_single(
            jnp.array(src), mask, jnp.array(tgt), mask, jnp.zeros(3), params,
            gate_multiplier=1.0,
        )
        errs[use_ransac] = float(
            np.linalg.norm(np.asarray(res.transform)[:2] - true_pose[:2])
        )
    assert errs[True] < errs[False] * 0.8, errs
    assert errs[True] < 0.05, errs
