"""De-circularized bag-reader evidence: golden ROS1 bags whose bytes are
hand-assembled HERE with struct.pack straight from the public format spec
(http://wiki.ros.org/Bags/Format/2.0 + the ROS1 little-endian message
serialization) — never via io/rosbag1.write_bag. The reader must decode
byte streams it did not produce (reference anchor: the rosbag playback
basis at src/runner/dpg_data_runner_main.cc:38-53).

Deliberately includes container/message features the repo's own writer
never emits: an unchunked layout (top-level connection + message
records), index/chunk-info records to skip, a record-header topic ALIAS
differing from the connection data block's canonical topic, a zero
header stamp (receive-time fallback), non-empty intensities, a full-3D
quaternion (roll+pitch+yaw), an unknown message type carried raw, and a
partial scan with the wrong beam count (dropped by read_bag_streams).
"""

import bz2
import struct

import numpy as np
import pytest

from dpg_slam_tpu.io import rosbag1


# --- spec-level byte assembly (independent of io/rosbag1's writer) -------

def field(name: bytes, value: bytes) -> bytes:
    item = name + b"=" + value
    return struct.pack("<I", len(item)) + item


def record(header_fields: list[tuple[bytes, bytes]], data: bytes) -> bytes:
    hdr = b"".join(field(n, v) for n, v in header_fields)
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def ros_time(secs: int, nsecs: int) -> bytes:
    return struct.pack("<II", secs, nsecs)


def ros_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def std_header(seq: int, secs: int, nsecs: int, frame: bytes) -> bytes:
    return struct.pack("<III", seq, secs, nsecs) + ros_string(frame)


def laserscan_wire(seq, secs, nsecs, ranges, *, angle_min, angle_max,
                   angle_inc, range_min, range_max, intensities=()):
    ranges = np.asarray(ranges, "<f4")
    inten = np.asarray(intensities, "<f4")
    return (
        std_header(seq, secs, nsecs, b"lidar_link")
        + struct.pack("<7f", angle_min, angle_max, angle_inc, 1e-4, 0.08,
                      range_min, range_max)
        + struct.pack("<I", len(ranges)) + ranges.tobytes()
        + struct.pack("<I", len(inten)) + inten.tobytes()
    )


def quat_zyx(roll, pitch, yaw):
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    qw = cr * cp * cy + sr * sp * sy
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    return qx, qy, qz, qw


def odometry_wire(seq, secs, nsecs, x, y, z, q):
    qx, qy, qz, qw = q
    cov36 = np.arange(36, dtype="<f8")  # arbitrary nonzero covariance
    return (
        std_header(seq, secs, nsecs, b"odom")
        + ros_string(b"base_footprint")
        + struct.pack("<7d", x, y, z, qx, qy, qz, qw)
        + cov36.tobytes()
        + struct.pack("<6d", 0.5, 0.0, 0.0, 0.0, 0.0, 0.1)
        + cov36.tobytes()
    )


def connection_record(conn_id, header_topic, canonical_topic, mtype):
    data = (
        field(b"topic", canonical_topic)
        + field(b"type", mtype)
        + field(b"md5sum", b"0" * 32)
        + field(b"message_definition", b"irrelevant")
    )
    return record(
        [(b"op", b"\x07"), (b"conn", struct.pack("<I", conn_id)),
         (b"topic", header_topic)],
        data,
    )


def message_record(conn_id, secs, nsecs, payload):
    return record(
        [(b"op", b"\x02"), (b"conn", struct.pack("<I", conn_id)),
         (b"time", ros_time(secs, nsecs))],
        payload,
    )


def bag_header_record(conn_count, chunk_count):
    hdr = [
        (b"op", b"\x03"),
        (b"index_pos", struct.pack("<Q", 0)),
        (b"conn_count", struct.pack("<I", conn_count)),
        (b"chunk_count", struct.pack("<I", chunk_count)),
    ]
    return record(hdr, b"\x20" * 4096)


RANGES_A = [1.25, 2.5, np.inf, 4.125, 0.0, 7.75, 9.0, 3.5]
RANGES_B = [2.0, 2.25, 2.5, 2.75, 3.0, 3.25, 3.5, 3.75]
SCAN_META = dict(angle_min=-1.5, angle_max=1.5, angle_inc=3.0 / 7,
                 range_min=0.05, range_max=9.5)


def build_records():
    """The shared record stream: 2 connections with remap aliases, one
    unknown-type connection, scans + odometry + skip-records."""
    recs = b""
    # Record-header topic is a remap ALIAS; the canonical topic lives in
    # the connection data block and must win.
    recs += connection_record(7, b"/robot0/scan_alias", b"/base_scan",
                              b"sensor_msgs/LaserScan")
    recs += connection_record(3, b"/robot0/odom_alias", b"/odom_combined",
                              b"nav_msgs/Odometry")
    recs += connection_record(9, b"/tf", b"/tf", b"tf2_msgs/TFMessage")

    # Scan 1: normal stamp.
    recs += message_record(7, 100, 500, laserscan_wire(
        11, 100, 250_000_000, RANGES_A, **SCAN_META))
    # Odometry with full-3D quaternion (roll 0.2, pitch 0.1, yaw 0.7):
    # ZYX yaw extraction must return exactly the constructed yaw.
    recs += message_record(3, 100, 600, odometry_wire(
        21, 100, 300_000_000, 1.5, -2.25, 0.1, quat_zyx(0.2, 0.1, 0.7)))
    # Unknown type: must be carried raw, not crash the parse.
    recs += message_record(9, 100, 700, b"\x01\x02\x03\x04")
    # Index record (op 0x04): must be skipped.
    recs += record(
        [(b"op", b"\x04"), (b"ver", struct.pack("<I", 1)),
         (b"conn", struct.pack("<I", 7)), (b"count", struct.pack("<I", 1))],
        struct.pack("<IIQ", 100, 500, 0),
    )
    # Scan 2: ZERO header stamp -> reader must fall back to the record
    # receive time (101.5).
    recs += message_record(7, 101, 500_000_000, laserscan_wire(
        12, 0, 0, RANGES_B, **SCAN_META))
    # Partial scan (wrong beam count): read_bag_streams must drop it.
    recs += message_record(7, 102, 0, laserscan_wire(
        13, 102, 0, [1.0, 2.0, 3.0], **SCAN_META))
    # Second odometry, planar quaternion.
    recs += message_record(3, 102, 500, odometry_wire(
        22, 102, 100_000_000, 2.5, -1.0, 0.0, quat_zyx(0.0, 0.0, -1.2)))
    return recs


def check_decoded(conns, msgs):
    by_id = {cid: c for cid, c in conns.items()}
    assert by_id[7] == {"topic": "/base_scan", "type": "sensor_msgs/LaserScan"}
    assert by_id[3] == {"topic": "/odom_combined", "type": "nav_msgs/Odometry"}
    assert by_id[9]["type"] == "tf2_msgs/TFMessage"

    scans = [m for m in msgs if m[1] == "sensor_msgs/LaserScan"]
    odoms = [m for m in msgs if m[1] == "nav_msgs/Odometry"]
    raws = [m for m in msgs if m[1] == "tf2_msgs/TFMessage"]
    assert len(scans) == 3 and len(odoms) == 2 and len(raws) == 1
    assert raws[0][2] == b"\x01\x02\x03\x04"

    s1 = scans[0][2]
    np.testing.assert_array_equal(s1.ranges, np.asarray(RANGES_A, "<f4"))
    assert s1.stamp == pytest.approx(100.25)
    assert s1.angle_min == pytest.approx(-1.5)
    assert s1.angle_max == pytest.approx(1.5)
    assert s1.angle_increment == pytest.approx(3.0 / 7)
    assert s1.range_min == pytest.approx(0.05)
    assert s1.range_max == pytest.approx(9.5)
    # Zero header stamp -> record receive time.
    s2 = scans[1][2]
    assert s2.stamp == pytest.approx(101.5)
    np.testing.assert_array_equal(s2.ranges, np.asarray(RANGES_B, "<f4"))

    o1 = odoms[0][2]
    assert o1.x == pytest.approx(1.5) and o1.y == pytest.approx(-2.25)
    # ZYX construction: yaw extraction returns the constructed yaw even
    # with nonzero roll/pitch.
    assert o1.theta == pytest.approx(0.7, abs=1e-12)
    assert o1.stamp == pytest.approx(100.3)
    o2 = odoms[1][2]
    assert o2.theta == pytest.approx(-1.2, abs=1e-12)


def test_golden_unchunked_bag(tmp_path):
    """Top-level (unchunked) record layout — a shape the repo's writer
    never produces."""
    recs = build_records()
    bag = b"#ROSBAG V2.0\n" + bag_header_record(3, 0) + recs
    p = tmp_path / "golden_unchunked.bag"
    p.write_bytes(bag)
    conns, msgs = rosbag1.read_bag(p)
    check_decoded(conns, msgs)


def test_golden_bz2_chunked_bag(tmp_path):
    """bz2-compressed chunk + a chunk-info record to skip, with the
    connections split across two chunks."""
    recs = build_records()
    # Split the stream: connections + first messages / rest.
    # (Chunks must be self-delimiting record streams; any split at a
    # record boundary is legal.)
    split = 0
    count = 0
    off = 0
    while count < 5:  # first 5 records into chunk 1
        (hlen,) = struct.unpack_from("<I", recs, off)
        off += 4 + hlen
        (dlen,) = struct.unpack_from("<I", recs, off)
        off += 4 + dlen
        count += 1
    split = off
    chunks = b""
    for part in (recs[:split], recs[split:]):
        comp = bz2.compress(part)
        chunks += record(
            [(b"op", b"\x05"), (b"compression", b"bz2"),
             (b"size", struct.pack("<I", len(part)))],
            comp,
        )
        # chunk info record (op 0x06): skipped.
        chunks += record(
            [(b"op", b"\x06"), (b"ver", struct.pack("<I", 1)),
             (b"chunk_pos", struct.pack("<Q", 0)),
             (b"start_time", ros_time(100, 0)),
             (b"end_time", ros_time(103, 0)),
             (b"count", struct.pack("<I", 2))],
            struct.pack("<II", 7, 3),
        )
    bag = b"#ROSBAG V2.0\n" + bag_header_record(3, 2) + chunks
    p = tmp_path / "golden_bz2.bag"
    p.write_bytes(bag)
    conns, msgs = rosbag1.read_bag(p)
    check_decoded(conns, msgs)


def test_golden_streams_extraction(tmp_path):
    """read_bag_streams on the golden bag: topic auto-pick via canonical
    topics, wrong-beam-count scan dropped, stamps/meta exact."""
    recs = build_records()
    bag = b"#ROSBAG V2.0\n" + bag_header_record(3, 0) + recs
    p = tmp_path / "golden_streams.bag"
    p.write_bytes(bag)
    scan_stamps, scans, meta, odom_stamps, odom = rosbag1.read_bag_streams(p)
    assert scans.shape == (2, 8)  # partial 3-beam scan dropped
    np.testing.assert_array_equal(scans[0], np.asarray(RANGES_A, "<f4"))
    np.testing.assert_allclose(scan_stamps, [100.25, 101.5])
    assert meta["num_beams"] == 8
    assert meta["angle_increment"] == pytest.approx(3.0 / 7)
    np.testing.assert_allclose(odom[:, 0], [1.5, 2.5])
    np.testing.assert_allclose(odom[:, 2], [0.7, -1.2], atol=1e-12)


def test_golden_lz4_chunk_raises(tmp_path):
    """Unsupported compression must fail with guidance, not garbage."""
    recs = build_records()
    chunk = record(
        [(b"op", b"\x05"), (b"compression", b"lz4"),
         (b"size", struct.pack("<I", len(recs)))],
        b"\x00" * 16,
    )
    p = tmp_path / "golden_lz4.bag"
    p.write_bytes(b"#ROSBAG V2.0\n" + bag_header_record(3, 1) + chunk)
    with pytest.raises(rosbag1.BagError, match="lz4"):
        rosbag1.read_bag(p)
