"""Parity tests: Pallas ICP kernel vs the jax reference implementation.

Runs the kernel in interpreter mode on CPU (real Mosaic compilation is
exercised on TPU by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dpg_slam_tpu import geom
from dpg_slam_tpu.config import PoseGraphParams
from dpg_slam_tpu.ops import icp
from dpg_slam_tpu.ops.icp_pallas import icp_align_pallas

from test_icp import make_room_scan


def _batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    tgts, srcs, poses = [], [], []
    for _ in range(B):
        tgt = make_room_scan(rng)
        pose = rng.uniform(-0.3, 0.3, 3)
        src = np.asarray(geom.inv_apply(jnp.array(pose), jnp.array(tgt)))
        tgts.append(tgt); srcs.append(src); poses.append(pose)
    mask = jnp.ones((B, 256), dtype=bool)
    return (
        jnp.array(np.stack(srcs), jnp.float32),
        mask,
        jnp.array(np.stack(tgts), jnp.float32),
        mask,
        jnp.zeros((B, 3)),
        np.stack(poses),
    )


def test_pallas_matches_jax_impl():
    src, smask, tgt, tmask, seeds, true_poses = _batch()
    params = PoseGraphParams()
    ref = icp.icp_align(src, smask, tgt, tmask, seeds, params)
    ker = icp_align_pallas(src, smask, tgt, tmask, seeds, params, interpret=True)

    np.testing.assert_allclose(
        np.asarray(ker.transform), np.asarray(ref.transform), atol=5e-4
    )
    np.testing.assert_array_equal(
        np.asarray(ker.converged), np.asarray(ref.converged)
    )
    np.testing.assert_allclose(
        np.asarray(ker.fitness), np.asarray(ref.fitness), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ker.covariance), np.asarray(ref.covariance), rtol=0.05, atol=1e-5
    )
    # And it actually recovered the transforms.
    np.testing.assert_allclose(np.asarray(ker.transform), true_poses, atol=3e-2)


def test_pallas_masks_and_rejection():
    src, smask, tgt, tmask, seeds, _ = _batch(B=2, seed=3)
    # Pair 1 becomes garbage: disjoint clouds.
    src = src.at[1].add(100.0)
    params = PoseGraphParams()
    ker = icp_align_pallas(src, smask, tgt, tmask, seeds, params, interpret=True)
    assert bool(ker.converged[0])
    assert not bool(ker.converged[1])


def test_pallas_gate_multiplier_per_pair():
    src, smask, tgt, tmask, seeds, true_poses = _batch(B=2, seed=5)
    params = PoseGraphParams()
    # Seed pair 0 badly (needs the coarse gate), pair 1 well.
    seeds = seeds.at[0].set(jnp.array(true_poses[0] + np.array([0.9, 0, 0]), jnp.float32))
    seeds = seeds.at[1].set(jnp.array(true_poses[1], jnp.float32))
    gate = jnp.array([3.0, 1.0], jnp.float32)
    ker = icp_align_pallas(
        src, smask, tgt, tmask, seeds, params, gate_multiplier=gate, interpret=True
    )
    ref = icp.icp_align(
        src, smask, tgt, tmask, seeds, params, gate_multiplier=gate
    )
    np.testing.assert_allclose(
        np.asarray(ker.transform), np.asarray(ref.transform), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(ker.transform), true_poses, atol=5e-2)


def test_pallas_censi_kernel_resident_parity():
    """censi mode under use_pallas_icp accumulates the sandwich terms
    INSIDE the kernel (no (B, P, P) XLA post-pass); parity vs the XLA
    censi path, which evaluates ops.icp.censi_covariance at its own
    final transform."""
    src, smask, tgt, tmask, seeds, _ = _batch(B=4, seed=7)
    params = PoseGraphParams(icp_covariance_mode="censi")
    ref = icp.icp_align(src, smask, tgt, tmask, seeds, params)
    ker = icp_align_pallas(src, smask, tgt, tmask, seeds, params, interpret=True)

    np.testing.assert_allclose(
        np.asarray(ker.transform), np.asarray(ref.transform), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(ker.covariance), np.asarray(ref.covariance), rtol=0.05, atol=1e-7
    )
    # Sanity: censi covariance is a real SPD-ish matrix, not the fixed diag.
    assert np.all(np.linalg.eigvalsh(np.asarray(ker.covariance)) > 0)


def test_pallas_censi_masked_points_excluded():
    """Masked source/target points must not leak into the kernel-resident
    censi accumulators (coordinates are parked at +-1e4)."""
    src, smask, tgt, tmask, seeds, _ = _batch(B=2, seed=9)
    smask = smask.at[:, 200:].set(False)
    tmask = tmask.at[:, 220:].set(False)
    params = PoseGraphParams(icp_covariance_mode="censi")
    ref = icp.icp_align(src, smask, tgt, tmask, seeds, params)
    ker = icp_align_pallas(src, smask, tgt, tmask, seeds, params, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ker.covariance), np.asarray(ref.covariance), rtol=0.05, atol=1e-7
    )
