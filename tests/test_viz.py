"""Visualization-primitive tests (component #9 of SURVEY.md §2: the amrl
visualization / gui_helpers drawing API, visualization.cc:65-140)."""

import math

import numpy as np

from dpg_slam_tpu.viz import Canvas, Color4f, draw_session, trajectory_ticks


def test_color4f_constants_and_hex():
    assert Color4f.RED.to_hex() == "#ff0000ff"
    assert Color4f(0.0, 0.0, 0.0, 0.5).to_hex() == "#00000080"


def test_canvas_primitives_accumulate_and_serialize():
    c = Canvas()
    c.draw_point((1.0, 2.0), Color4f.BLUE)
    c.draw_points(np.array([[0.0, 0.0], [1.0, 1.0]]), Color4f.GREEN)
    c.draw_line((0, 0), (1, 0), Color4f.BLACK)
    c.draw_cross((5, 5), 0.5, Color4f.RED)       # two lines
    c.draw_arc((0, 0), 2.0, 0.0, math.pi)
    c.draw_particle((3, 3), math.pi / 2)          # point + heading line
    d = c.to_dict()
    assert d["points"].shape == (4, 2)            # 1 + 2 + particle
    assert d["lines"].shape == (4, 4)             # 1 + cross(2) + particle(1)
    assert d["arcs"].shape == (1, 5)
    c.clear()
    assert c.to_dict()["points"].shape == (0, 2)


def test_path_option_straight_and_curved():
    c = Canvas()
    c.draw_path_option(0.0, 2.0, 0.5)            # straight: 3 lines
    assert c.to_dict()["lines"].shape[0] == 3
    c2 = Canvas()
    c2.draw_path_option(0.5, 2.0, 0.3)           # curved: 3 arcs
    assert c2.to_dict()["arcs"].shape[0] == 3


def test_trajectory_ticks_heading():
    poses = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, math.pi / 2]])
    segs = trajectory_ticks(poses, tick_len=0.2)
    assert segs.shape == (2, 4)
    np.testing.assert_allclose(segs[0], [0, 0, 0.2, 0], atol=1e-6)
    np.testing.assert_allclose(segs[1], [1, 1, 1, 1.2], atol=1e-6)


def test_canvas_renders_png(tmp_path):
    c = Canvas()
    c.draw_cross((0, 0), 1.0)
    c.draw_arc((0, 0), 2.0, 0.0, math.pi, Color4f.BLUE)
    c.draw_text((0.5, 0.5), "hi")
    out = tmp_path / "canvas.png"
    c.render(out_path=str(out))
    assert out.exists() and out.stat().st_size > 500


def test_draw_session_from_engine(tmp_path):
    from dpg_slam_tpu.config import CapacityParams, DpgConfig, PoseGraphParams, ScanParams
    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.io import dataset

    cfg = DpgConfig(
        scan=ScanParams(num_beams=128, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=32, icp_maximum_iterations=10, max_loop_closures_per_node=2
        ),
        capacity=CapacityParams(max_nodes=16, max_edges=128, max_priors=4),
    )
    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()[:4]
    seq = dataset.simulate_sequence(world, wps, cfg.scan, step=0.5, seed=0)
    eng = DpgSlamEngine(cfg)
    eng.process_sequence(seq.odometry, seq.scans, run_dpg=False)
    canvas = draw_session(eng)
    d = canvas.to_dict()
    assert d["points"].shape[0] > 50        # map points
    assert d["lines"].shape[0] >= eng.num_nodes()  # pose ticks
    out = tmp_path / "session.png"
    canvas.render(out_path=str(out))
    assert out.exists()
