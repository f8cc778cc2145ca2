"""Recorded-data on-ramp (io/convert.py): async streams -> .dsl logs.

Round-trips a synthetic fixture through the rosbag-export shapes the
converter accepts (CSV pair / streams npz), checks time alignment,
beam resampling, range sanitation, and that the produced .dsl runs
through a suite session end-to-end (the full on-ramp the reference gets
from playRosbag, dpg_data_runner_main.cc:95-128)."""

import numpy as np
import pytest

from dpg_slam_tpu.engine import DpgSlamEngine
from dpg_slam_tpu.io import convert, dataset, logs, suites
from dpg_slam_tpu.utils import metrics

from test_io_and_runner import tiny_config


@pytest.fixture(scope="module")
def recorded_streams():
    """A synthetic session re-cut as asynchronous recorded streams:
    odometry at ~3x the scan rate with offset stamps, plus quaternion
    encoding — the shape a rosbag export actually has."""
    cfg = tiny_config()
    world = dataset.make_office_world()
    seq = dataset.simulate_sequence(
        world, dataset.office_loop_waypoints()[:5], cfg.scan, step=0.5, seed=2
    )
    T = len(seq.scans)
    scan_stamps = 100.0 + 0.1 * np.arange(T)
    # Odometry stream: denser, offset, spanning past both ends, built by
    # interpolating the true odometry so alignment has an exact answer.
    # Scan stamps are included in the grid so the piecewise-linear source
    # is sampled at its own kinks (otherwise re-interpolation across a
    # kink is inexact by construction, not by converter error).
    odom_stamps = np.union1d(
        100.0 - 0.05 + (0.1 / 3.0) * np.arange(3 * T + 4), scan_stamps
    )
    ts = np.clip((odom_stamps - scan_stamps[0]) / 0.1, 0.0, T - 1)
    x = np.interp(ts, np.arange(T), seq.odometry[:, 0])
    y = np.interp(ts, np.arange(T), seq.odometry[:, 1])
    th = np.interp(ts, np.arange(T), np.unwrap(seq.odometry[:, 2]))
    odom_quat = np.stack(
        [x, y, np.sin(th / 2.0), np.cos(th / 2.0)], axis=1
    )  # x, y, qz, qw
    return cfg, seq, scan_stamps, odom_stamps, odom_quat


def test_csv_roundtrip_alignment(tmp_path, recorded_streams):
    cfg, seq, scan_stamps, odom_stamps, odom_quat = recorded_streams
    scan_csv = tmp_path / "scan.csv"
    odom_csv = tmp_path / "odom.csv"
    np.savetxt(
        scan_csv,
        np.column_stack([scan_stamps, seq.scans]),
        delimiter=",",
        header="stamp,ranges...",
    )
    np.savetxt(
        odom_csv,
        np.column_stack([odom_stamps, odom_quat]),
        delimiter=",",
        header="stamp,x,y,qz,qw",
    )
    out = tmp_path / "session.dsl"
    written = convert.convert(
        scan_csv,
        odom_csv,
        out,
        num_beams=cfg.scan.num_beams,
        range_max=cfg.scan.range_max,
    )
    back = logs.load_sequence(out)
    assert back.scans.shape == seq.scans.shape
    np.testing.assert_allclose(back.scans, seq.scans, atol=1e-4)
    # Interpolated odometry at scan stamps must match the original poses
    # (the odom stream was built from them).
    np.testing.assert_allclose(back.odometry[:, :2], seq.odometry[:, :2], atol=2e-3)
    dth = np.arctan2(
        np.sin(back.odometry[:, 2] - seq.odometry[:, 2]),
        np.cos(back.odometry[:, 2] - seq.odometry[:, 2]),
    )
    assert np.max(np.abs(dth)) < 2e-3
    np.testing.assert_array_equal(back.scans, written.scans)


def test_npz_streams_resample_and_sanitize(tmp_path, recorded_streams):
    cfg, seq, scan_stamps, odom_stamps, odom_quat = recorded_streams
    # Corrupt some readings the way real sensors do: NaN, inf, 0, beyond max.
    scans = seq.scans.copy()
    scans[3, 5] = np.nan
    scans[4, 7] = np.inf
    scans[5, 9] = 0.0
    scans[6, 11] = cfg.scan.range_max * 7
    src = tmp_path / "streams.npz"
    np.savez(
        src,
        scan_stamps=scan_stamps,
        scans=scans,
        odom_stamps=odom_stamps,
        odom=odom_quat,
    )
    out = tmp_path / "session.npz"
    seq2 = convert.convert(
        src, None, out, num_beams=64, range_max=cfg.scan.range_max
    )
    assert seq2.scans.shape == (len(seq.scans), 64)  # resampled 128 -> 64
    assert np.all(np.isfinite(seq2.scans))
    assert np.all(seq2.scans <= cfg.scan.range_max + 1e-6)
    assert np.all(seq2.scans > 0.0)


def test_window_and_stride(tmp_path, recorded_streams):
    cfg, seq, scan_stamps, odom_stamps, odom_quat = recorded_streams
    src = tmp_path / "streams.npz"
    np.savez(
        src,
        scan_stamps=scan_stamps,
        scans=seq.scans,
        odom_stamps=odom_stamps,
        odom=odom_quat,
    )
    out = tmp_path / "w.npz"
    seq2 = convert.convert(
        src,
        None,
        out,
        num_beams=cfg.scan.num_beams,
        range_max=cfg.scan.range_max,
        t_start=0.5,  # relative, playRosbag(bag, rate, start, duration) analog
        duration=1.0,
        stride=2,
    )
    expect = len([t for t in scan_stamps if scan_stamps[0] + 0.5 <= t <= scan_stamps[0] + 1.5])
    assert seq2.scans.shape[0] == (expect + 1) // 2


def test_converted_log_runs_through_suite_session(tmp_path, recorded_streams):
    """The full on-ramp: recorded streams -> .dsl -> SessionSpec(log=...)
    -> engine, and the engine tracks (ATE vs ground truth small)."""
    cfg, seq, scan_stamps, odom_stamps, odom_quat = recorded_streams
    scan_csv = tmp_path / "scan.csv"
    odom_csv = tmp_path / "odom.csv"
    gt_csv = tmp_path / "gt.csv"
    np.savetxt(scan_csv, np.column_stack([scan_stamps, seq.scans]), delimiter=",")
    np.savetxt(odom_csv, np.column_stack([odom_stamps, odom_quat]), delimiter=",")
    np.savetxt(
        gt_csv,
        np.column_stack([scan_stamps, seq.ground_truth]),
        delimiter=",",
    )
    log = tmp_path / "real.dsl"
    convert.convert(
        scan_csv,
        odom_csv,
        log,
        num_beams=cfg.scan.num_beams,
        range_max=cfg.scan.range_max,
        gt_src=gt_csv,
    )
    spec = suites.SessionSpec(log=str(log), scenario=None)
    back = suites.materialize(spec, cfg.scan)
    assert back.ground_truth is not None
    eng = DpgSlamEngine(cfg)
    est = []
    for t in range(len(back.scans)):
        eng.observe_odometry(back.odometry[t])
        eng.observe_laser(back.scans[t])
        est.append(np.asarray(eng.pose()))
    err = metrics.ate_rmse(np.stack(est), back.ground_truth, align=True)
    assert np.isfinite(err) and err < 0.5
