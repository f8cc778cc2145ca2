"""SE(2) math tests — semantics pinned to reference math_utils.{h,cc}."""

import numpy as np
import jax.numpy as jnp
import pytest

from dpg_slam_tpu import geom


def ref_transform_point(src_point, src_angle, frame_pos, frame_angle):
    """Literal re-statement of reference transformPoint (math_utils.cc:6-19)."""
    c, s = np.cos(frame_angle), np.sin(frame_angle)
    rot = np.array([[c, -s], [s, c]])
    p = frame_pos + rot @ src_point
    a = src_angle + frame_angle
    a -= 2 * np.pi * np.rint(a / (2 * np.pi))
    return p, a


def ref_inverse_transform_point(src_point, src_angle, frame_pos, frame_angle):
    """Literal re-statement of reference inverseTransformPoint (math_utils.cc:21-35)."""
    c, s = np.cos(-frame_angle), np.sin(-frame_angle)
    rot = np.array([[c, -s], [s, c]])
    p = rot @ (src_point - frame_pos)
    a = src_angle - frame_angle
    a -= 2 * np.pi * np.rint(a / (2 * np.pi))
    return p, a


@pytest.mark.parametrize("seed", range(5))
def test_transform_pose_matches_reference(seed):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-5, 5, 3)
    frame = rng.uniform(-5, 5, 3)
    got = np.asarray(geom.transform_pose(jnp.array(src), jnp.array(frame)))
    p, a = ref_transform_point(src[:2], src[2], frame[:2], frame[2])
    np.testing.assert_allclose(got[:2], p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[2], a, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_inv_transform_pose_matches_reference(seed):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-5, 5, 3)
    frame = rng.uniform(-5, 5, 3)
    got = np.asarray(geom.inv_transform_pose(jnp.array(src), jnp.array(frame)))
    p, a = ref_inverse_transform_point(src[:2], src[2], frame[:2], frame[2])
    np.testing.assert_allclose(got[:2], p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[2], a, rtol=1e-5, atol=1e-5)


def test_wrap_angle():
    angles = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi, -7.5, 100.0])
    wrapped = np.asarray(geom.wrap_angle(angles))
    assert np.all(np.abs(wrapped) <= np.pi + 1e-6)
    # Equivalent angle: sin/cos preserved.
    np.testing.assert_allclose(np.sin(wrapped), np.sin(angles), atol=1e-5)
    np.testing.assert_allclose(np.cos(wrapped), np.cos(angles), atol=1e-4)


def test_compose_inverse_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.array(rng.uniform(-3, 3, (32, 3)))
    ident = geom.compose(a, geom.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_between_consistency():
    rng = np.random.default_rng(1)
    a = jnp.array(rng.uniform(-3, 3, (8, 3)))
    b = jnp.array(rng.uniform(-3, 3, (8, 3)))
    rel = geom.between(a, b)
    b2 = geom.compose(a, rel)
    np.testing.assert_allclose(
        np.asarray(geom.wrap_angle(b2[..., 2] - b[..., 2])), 0.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(b2[..., :2]), np.asarray(b[..., :2]), atol=1e-5)


def test_apply_batched_matches_loop():
    rng = np.random.default_rng(2)
    poses = rng.uniform(-3, 3, (4, 3))
    pts = rng.uniform(-5, 5, (4, 7, 2))
    got = np.asarray(geom.apply(jnp.array(poses), jnp.array(pts)))
    for i in range(4):
        c, s = np.cos(poses[i, 2]), np.sin(poses[i, 2])
        rot = np.array([[c, -s], [s, c]])
        want = pts[i] @ rot.T + poses[i, :2]
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_inv_apply_roundtrip():
    rng = np.random.default_rng(3)
    pose = jnp.array(rng.uniform(-3, 3, 3))
    pts = jnp.array(rng.uniform(-5, 5, (9, 2)))
    back = geom.inv_apply(pose, geom.apply(pose, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_pose_matrix_matches_compose():
    rng = np.random.default_rng(4)
    a = jnp.array(rng.uniform(-3, 3, 3))
    b = jnp.array(rng.uniform(-3, 3, 3))
    mat = np.asarray(geom.pose_matrix(a)) @ np.asarray(geom.pose_matrix(b))
    comp = np.asarray(geom.pose_matrix(geom.compose(a, b)))
    np.testing.assert_allclose(mat, comp, atol=1e-5)
