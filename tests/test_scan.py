"""Scan frontend tests."""

import numpy as np
import jax.numpy as jnp

from dpg_slam_tpu import scan
from dpg_slam_tpu.config import ScanParams, DpgConfig


def test_beam_angles_span():
    p = ScanParams(num_beams=11, angle_min=-1.0, angle_max=1.0)
    a = np.asarray(scan.beam_angles(p))
    assert a.shape == (11,)
    np.testing.assert_allclose(a[0], -1.0, atol=1e-6)
    np.testing.assert_allclose(a[-1], 1.0, atol=1e-6)


def test_initial_labels():
    p = ScanParams(num_beams=6, range_min=0.1, range_max=10.0)
    ranges = jnp.array([0.05, 5.0, 10.0, 11.0, jnp.nan, 3.0])
    labels = np.asarray(scan.initial_labels(ranges, p))
    assert labels[0] == scan.MAX_RANGE  # below range_min
    assert labels[1] == scan.NOT_YET_LABELED
    assert labels[2] == scan.MAX_RANGE  # >= range_max (dpg_measurement.h:43)
    assert labels[3] == scan.MAX_RANGE
    assert labels[4] == scan.MAX_RANGE  # NaN
    assert labels[5] == scan.NOT_YET_LABELED


def test_sector_ids_partition():
    p = ScanParams(num_beams=100)
    sec = np.asarray(scan.sector_ids(p, 5))
    assert sec.shape == (100,)
    assert sec.min() == 0 and sec.max() == 4
    # 100 beams / 5 sectors = 20 per sector, matching i/points_per_sector.
    counts = np.bincount(sec)
    np.testing.assert_array_equal(counts, [20] * 5)


def test_points_in_laser_frame():
    p = ScanParams(num_beams=3, angle_min=0.0, angle_max=np.pi / 2)
    ranges = jnp.array([1.0, 2.0, 3.0])
    pts = np.asarray(scan.points_in_laser_frame(ranges, p))
    np.testing.assert_allclose(pts[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[2], [0.0, 3.0], atol=1e-6)


def test_points_in_base_link_extrinsic():
    p = ScanParams(num_beams=2, angle_min=0.0, angle_max=0.1)
    ranges = jnp.array([1.0, 1.0])
    laser_pose = jnp.array([0.2, 0.0, 0.0])  # reference default extrinsic
    pts = np.asarray(scan.points_in_base_link(ranges, p, laser_pose))
    np.testing.assert_allclose(pts[0], [1.2, 0.0], atol=1e-6)


def test_downsample_shapes_and_stride():
    pts = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    valid = jnp.ones(10, dtype=bool)
    ds_pts, ds_valid = scan.downsample(pts, valid, ratio=3, max_points=8)
    assert ds_pts.shape == (8, 2)
    assert ds_valid.shape == (8,)
    # Beams 0, 3, 6, 9 kept; rest padding.
    np.testing.assert_allclose(np.asarray(ds_pts[0]), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(ds_pts[1]), [6.0, 7.0])
    assert np.asarray(ds_valid).sum() == 4


def test_downsample_batched():
    pts = jnp.zeros((4, 10, 2))
    valid = jnp.ones((4, 10), dtype=bool)
    ds_pts, ds_valid = scan.downsample(pts, valid, ratio=5, max_points=16)
    assert ds_pts.shape == (4, 16, 2)
    assert np.asarray(ds_valid).sum() == 4 * 2


def test_config_roundtrip():
    cfg = DpgConfig()
    cfg2 = DpgConfig.from_json(cfg.to_json())
    assert cfg == cfg2
    assert cfg.pose_graph.icp_max_correspondence_distance == 0.6
    assert cfg.dpg.num_sectors == 5
