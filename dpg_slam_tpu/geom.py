"""SE(2) geometry core — pure jnp, batched over leading axes.

Replaces the reference's scalar Eigen helpers (src/dpg_slam/math_utils.{h,cc})
with array programs. A pose is a ``(..., 3)`` array ``[x, y, theta]``; a point
set is ``(..., 2)``. Every function broadcasts over leading axes so the same
code serves one pose or a ``(N,)`` batch of them.

Semantics match the reference exactly:
  wrap_angle        ≡ AngleMod          (math_utils.h:12-16)
  angle_dist        ≡ AngleDist         (math_utils.h:18-21)
  angle_diff        ≡ AngleDiff         (math_utils.h:23-26)
  transform_pose    ≡ transformPoint    (math_utils.cc:6-19)
  inv_transform_pose≡ inverseTransformPoint (math_utils.cc:21-35)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "wrap_angle",
    "angle_dist",
    "angle_diff",
    "rotation_matrix",
    "compose",
    "inverse",
    "between",
    "transform_pose",
    "inv_transform_pose",
    "apply",
    "inv_apply",
    "exp_map",
    "pose_matrix",
    "inv_sym3",
]


def inv_sym3(H: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (cofactor) inverse of symmetric 3x3 matrices, batched
    over any leading axes.

    Replaces jnp.linalg.inv on (..., 3, 3): the batched lax.linalg
    primitive is a latency-bound sequential loop on TPU, while this is a
    handful of elementwise VPU ops. Intended for SPD normal/covariance
    blocks (SE(2) dimensions).
    """
    a00 = H[..., 0, 0]
    a01 = H[..., 0, 1]
    a02 = H[..., 0, 2]
    a11 = H[..., 1, 1]
    a12 = H[..., 1, 2]
    a22 = H[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    safe = jnp.abs(det) > 1e-30
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)[..., None, None]
    cof = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c01, c11, c12], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return cof * inv_det


def wrap_angle(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to [-pi, pi] (round-to-nearest-even multiple of 2π,
    matching C rint in math_utils.h:14)."""
    two_pi = 2.0 * jnp.pi
    return angle - two_pi * jnp.round(angle / two_pi)


def angle_diff(a0: jnp.ndarray, a1: jnp.ndarray) -> jnp.ndarray:
    """Signed wrapped difference a0 - a1."""
    return wrap_angle(a0 - a1)


def angle_dist(a0: jnp.ndarray, a1: jnp.ndarray) -> jnp.ndarray:
    """Absolute wrapped distance between angles."""
    return jnp.abs(angle_diff(a0, a1))


def rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """(..., ) angles -> (..., 2, 2) rotation matrices."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SE(2) composition a ∘ b: pose of (b in a's frame) expressed in the
    frame a is expressed in. ``compose(world_T_a, a_T_b) = world_T_b``."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    th = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def inverse(a: jnp.ndarray) -> jnp.ndarray:
    """SE(2) inverse: if a = world_T_frame then inverse(a) = frame_T_world."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    th = wrap_angle(-a[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Relative pose of b in a's frame: a⁻¹ ∘ b (GTSAM BetweenFactor
    prediction; equals inverseTransformPoint(b_loc, b_ang, a_loc, a_ang)
    at dpg_slam.cc:217)."""
    return compose(inverse(a), b)


def transform_pose(src_pose: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
    """Pose of src (given in `frame`'s coordinates) in the frame that
    `frame` itself is expressed in — reference transformPoint
    (math_utils.cc:6-19). Identical to ``compose(frame, src_pose)``."""
    return compose(frame, src_pose)


def inv_transform_pose(src_pose: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
    """Pose of src (expressed in the same frame as `frame`) re-expressed in
    `frame`'s coordinates — reference inverseTransformPoint
    (math_utils.cc:21-35). Identical to ``between(frame, src_pose)``."""
    return compose(inverse(frame), src_pose)


def apply(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply pose(s) to point(s): R(θ) p + t.

    Broadcasts: pose (..., 3) with points (..., P, 2) or (..., 2).
    """
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    if points.ndim > pose.ndim - 1 + 1:  # points have an extra point axis
        c = c[..., None]
        s = s[..., None]
        t = pose[..., None, 0:2]
    else:
        t = pose[..., 0:2]
    x = c * points[..., 0] - s * points[..., 1]
    y = s * points[..., 0] + c * points[..., 1]
    return jnp.stack([x, y], axis=-1) + t


def inv_apply(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply the inverse of pose(s) to point(s): R(-θ)(p - t)."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    if points.ndim > pose.ndim - 1 + 1:
        c = c[..., None]
        s = s[..., None]
        t = pose[..., None, 0:2]
    else:
        t = pose[..., 0:2]
    dx = points[..., 0] - t[..., 0]
    dy = points[..., 1] - t[..., 1]
    x = c * dx + s * dy
    y = -s * dx + c * dy
    return jnp.stack([x, y], axis=-1)


def exp_map(xi: jnp.ndarray) -> jnp.ndarray:
    """First-order retraction used by the GN solver: treat xi=(dx,dy,dθ) as
    an additive update in the global frame with angle wrapping (the same
    parameterization GTSAM's Pose2 uses for its Gauss-Newton steps up to
    the chart; adequate for small steps)."""
    return xi


def pose_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) poses -> (..., 3, 3) homogeneous matrices."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    row0 = jnp.stack([c, -s, pose[..., 0]], axis=-1)
    row1 = jnp.stack([s, c, pose[..., 1]], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
