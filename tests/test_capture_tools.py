"""Capture-era pure-math tail: transforms3d, tf_store, pointcloud,
gps_heatmap, dump_capture CLI.

Reference parity targets:
- data/transformations.py:180-1705 (quaternion/euler/matrix slice)
- data/tf_bag.py:13-517 (BagTfTransformer lookup/interp/average)
- data/lidar_to_numpy.py:18-70 (PointCloud2 → numpy)
- data/plot_gm.py + bag_parser.py saveHeatStats/utm (GPS heatmap)
- data/bag_parser.py:294-558 (PC_Parser dump flow)
"""

import json
import math
import os

import numpy as np
import pytest

from heatnet_tpu.data import transforms3d as t3d
from heatnet_tpu.data.pointcloud import (FLOAT32, UINT16, PointCloud,
                                         PointField, array_to_cloud,
                                         cloud_to_array, fields_to_dtype,
                                         xyz_from_cloud)
from heatnet_tpu.data.tf_store import (StampedTransform, TransformLookupError,
                                       TransformStore)
from heatnet_tpu.utils.gps_heatmap import (collect_heat_stats, latlon_to_utm,
                                           save_heat_stats, utm_to_latlon,
                                           write_heatmap_html)

# ---------------------------------------------------------------------------
# transforms3d
# ---------------------------------------------------------------------------


def test_quaternion_about_axis_known_value():
    # public doctest value of the vendored library (transformations.py)
    q = t3d.quaternion_about_axis(0.123, (1, 0, 0))
    np.testing.assert_allclose(q, [0.06146124, 0, 0, 0.99810947], atol=1e-7)


def test_quaternion_multiply_known_value():
    q = t3d.quaternion_multiply([1, -2, 3, 4], [-5, 6, 7, 8])
    np.testing.assert_allclose(q, [-44, -14, 48, 28])


def test_quaternion_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = t3d.random_quaternion(rng)
        m = t3d.quaternion_matrix(q)
        q2 = t3d.quaternion_from_matrix(m)
        # sign-free comparison
        assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-12
        # rotation matrices are orthonormal
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                   atol=1e-12)


def test_quaternion_multiply_matches_matrix_product():
    rng = np.random.default_rng(1)
    q0, q1 = t3d.random_quaternion(rng), t3d.random_quaternion(rng)
    lhs = t3d.quaternion_matrix(t3d.quaternion_multiply(q1, q0))
    rhs = t3d.quaternion_matrix(q1) @ t3d.quaternion_matrix(q0)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_quaternion_slerp_endpoints_and_midpoint():
    q0 = t3d.quaternion_about_axis(0.0, (0, 0, 1))
    q1 = t3d.quaternion_about_axis(math.pi / 2, (0, 0, 1))
    np.testing.assert_allclose(t3d.quaternion_slerp(q0, q1, 0.0), q0)
    np.testing.assert_allclose(t3d.quaternion_slerp(q0, q1, 1.0), q1)
    mid = t3d.quaternion_slerp(q0, q1, 0.5)
    expect = t3d.quaternion_about_axis(math.pi / 4, (0, 0, 1))
    np.testing.assert_allclose(mid, expect, atol=1e-12)


def test_quaternion_inverse():
    rng = np.random.default_rng(2)
    q = t3d.random_quaternion(rng)
    prod = t3d.quaternion_multiply(q, t3d.quaternion_inverse(q))
    np.testing.assert_allclose(prod, [0, 0, 0, 1], atol=1e-12)


@pytest.mark.parametrize("axes", ["sxyz", "rxyz", "szyx", "szxz", "ryxy"])
def test_euler_roundtrip(axes):
    angles = (0.3, -0.7, 1.1)
    m = t3d.euler_matrix(*angles, axes=axes)
    back = t3d.euler_from_matrix(m, axes=axes)
    m2 = t3d.euler_matrix(*back, axes=axes)
    np.testing.assert_allclose(m, m2, atol=1e-10)


def test_euler_matrix_against_scipy():
    from scipy.spatial.transform import Rotation

    m = t3d.euler_matrix(0.2, 0.4, -0.6, axes="sxyz")
    ref = Rotation.from_euler("xyz", [0.2, 0.4, -0.6]).as_matrix()
    np.testing.assert_allclose(m[:3, :3], ref, atol=1e-12)
    m = t3d.euler_matrix(0.2, 0.4, -0.6, axes="rzyx")
    ref = Rotation.from_euler("ZYX", [0.2, 0.4, -0.6]).as_matrix()
    np.testing.assert_allclose(m[:3, :3], ref, atol=1e-12)


def test_rotation_matrix_about_point():
    p = (1.0, 2.0, 3.0)
    m = t3d.rotation_matrix(0.5, (0, 0, 1), point=p)
    np.testing.assert_allclose(m @ np.array([*p, 1.0]), [*p, 1.0],
                               atol=1e-12)


def test_rigid_inverse_matches_linalg():
    rng = np.random.default_rng(3)
    m = t3d.pair_to_matrix([1.0, -2.0, 0.5], t3d.random_quaternion(rng))
    np.testing.assert_allclose(t3d.rigid_inverse(m), np.linalg.inv(m),
                               atol=1e-12)


# ---------------------------------------------------------------------------
# tf_store
# ---------------------------------------------------------------------------


def _linear_store(n=11, dt=0.1):
    """base_link moves +1m/s in x under odom_combined, rotating about z."""
    store = TransformStore()
    for i in range(n):
        t = 100.0 + i * dt
        angle = 0.1 * i
        store.set_transform("odom_combined", "base_link", t,
                            (i * dt * 1.0, 0.0, 0.0),
                            tuple(t3d.quaternion_about_axis(angle, (0, 0, 1))))
    return store


def test_lookup_follows_latest_common_stamp():
    """Faithful reference semantics: the query evaluates at the chain's
    latest common stamp within the 0.1 s lookahead (tf_bag.py:272-289
    populates to t+0.1 then getLatestCommonTime) — so t=100.5 lands on
    the 100.6 message."""
    store = _linear_store()
    tr, q = store.lookup_transform("odom_combined", "base_link", 100.5)
    np.testing.assert_allclose(tr, (0.6, 0, 0), atol=1e-9)


def test_lookup_interpolates_between_stamps():
    """On multi-edge chains the common time can fall BETWEEN one edge's
    stamps → that edge lerps translation and slerps rotation (tf
    BufferCore interpolation)."""
    store = _linear_store()
    store.set_transform("base_link", "camera", 100.55, (0, 0, 0.5),
                        (0, 0, 0, 1))
    tr, q = store.lookup_transform("odom_combined", "camera", 100.55)
    # common time = 100.55 (the camera edge's only stamp); the base edge
    # interpolates halfway between 100.5 and 100.6
    np.testing.assert_allclose(tr, (0.55, 0, 0.5), atol=1e-9)
    expect_q = t3d.quaternion_about_axis(0.55, (0, 0, 1))
    np.testing.assert_allclose(q, expect_q, atol=1e-9)


def test_lookup_identity_and_reverse():
    store = _linear_store()
    assert store.lookup_transform("base_link", "base_link", 100.0) == (
        (0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0))
    # reverse lookup is the rigid inverse
    tr_f, q_f = store.lookup_transform("odom_combined", "base_link", 100.5)
    tr_r, q_r = store.lookup_transform("base_link", "odom_combined", 100.5)
    Tf = t3d.pair_to_matrix(tr_f, q_f)
    Tr = t3d.pair_to_matrix(tr_r, q_r)
    np.testing.assert_allclose(Tf @ Tr, np.eye(4), atol=1e-9)


def test_lookup_chain_composition():
    """odom→base→camera two-edge chain composes correctly."""
    store = _linear_store()
    # static camera mounted 0.5 m above base, rotated 90° about z
    cam_q = t3d.quaternion_about_axis(math.pi / 2, (0, 0, 1))
    store.set_transform("base_link", "camera", 100.0, (0, 0, 0.5),
                        tuple(cam_q))
    assert store.get_chain("odom_combined", "camera") == [
        "odom_combined", "base_link", "camera"]
    tr, q = store.lookup_transform("odom_combined", "camera", 100.5)
    # the camera edge's single stamp (100.0) pins the chain's common
    # time, so the base edge evaluates at 100.0 → identity pose; the
    # composed transform is just the camera mount
    np.testing.assert_allclose(tr, (0, 0, 0.5), atol=1e-9)
    np.testing.assert_allclose(q, cam_q, atol=1e-9)


def test_lookup_uses_latest_common_time():
    """Lookup past the data end clamps to the last common stamp (the
    reference's getLatestCommonTime behavior) within buffer_length."""
    store = _linear_store()  # data ends at t=101.0
    tr, _ = store.lookup_transform("odom_combined", "base_link", 101.7)
    np.testing.assert_allclose(tr, (1.0, 0, 0), atol=1e-9)
    with pytest.raises(TransformLookupError):
        store.lookup_transform("odom_combined", "base_link", 150.0)


def test_lookup_unconnected_frames_raises():
    store = _linear_store()
    store.set_transform("map", "satellite", 100.0, (0, 0, 0), (0, 0, 0, 1))
    with pytest.raises(TransformLookupError):
        store.lookup_transform("odom_combined", "satellite", 100.5)


def test_wait_for_transform_and_update_times():
    store = _linear_store()
    cam_q = (0.0, 0.0, 0.0, 1.0)
    store.set_transform("base_link", "camera", 100.35, (0, 0, 1), cam_q)
    # full chain only complete once the camera edge appears
    assert store.wait_for_transform("odom_combined", "camera") == \
        pytest.approx(100.35)
    times = store.get_transform_update_times(
        "odom_combined", "camera",
        trigger_orig_frame="odom_combined", trigger_dest_frame="base_link")
    # updates of the trigger edge after the chain is complete
    assert times == pytest.approx([100.4 + 0.1 * i for i in range(7)])
    with pytest.raises(RuntimeError):
        store.get_transform_update_times("odom_combined", "nonexistent")


def test_average_transforms_matches_reference_semantics():
    """Naive normalized component-mean quaternion (tf_bag.py:365-381)."""
    tfs = [((0, 0, 0), (0, 0, 0, 1)),
           ((2, 0, 0), tuple(t3d.quaternion_about_axis(0.2, (0, 0, 1))))]
    tr, q = TransformStore.average_transforms(tfs)
    np.testing.assert_allclose(tr, (1, 0, 0))
    raw = (np.array([0, 0, 0, 1.0])
           + t3d.quaternion_about_axis(0.2, (0, 0, 1))) / 2
    np.testing.assert_allclose(q, raw / np.linalg.norm(raw), atol=1e-12)
    with pytest.raises(RuntimeError):
        TransformStore.average_transforms([])


def test_average_transform_over_time():
    store = _linear_store()
    tr, q = store.average_transform_over_time(
        "odom_combined", "base_link", 100.05, 100.95)
    # updates strictly inside (100.05, 100.95) after wait_for_transform:
    # stamps 100.2..100.9; each lookup lands one stamp ahead via the
    # 0.1 s lookahead (same overshoot as the reference), so the mean is
    # over x = 0.3..1.0
    np.testing.assert_allclose(tr[0], np.mean([0.3 + 0.1 * i
                                               for i in range(8)]),
                               atol=1e-9)


def test_replicate_transform_over_time():
    store = _linear_store()
    store.replicate_transform_over_time(
        ((1.0, 2.0, 3.0), (0, 0, 0, 1)), "base_link", "ir_cam",
        frequency=10.0)
    tr, _ = store.lookup_transform("base_link", "ir_cam", 100.5)
    np.testing.assert_allclose(tr, (1, 2, 3))
    assert ("base_link", "ir_cam") in store.get_transform_frame_tuples()


def test_jsonl_roundtrip(tmp_path):
    store = _linear_store(n=3)
    p = str(tmp_path / "tf.jsonl")
    store.to_jsonl(p)
    store2 = TransformStore.from_jsonl(p)
    a = store.lookup_transform("odom_combined", "base_link", 100.15)
    b = store2.lookup_transform("odom_combined", "base_link", 100.15)
    np.testing.assert_allclose(a[0], b[0], atol=1e-12)
    np.testing.assert_allclose(a[1], b[1], atol=1e-12)


def test_store_introspection():
    store = _linear_store(n=5)
    assert store.get_frame_strings() == {"odom_combined", "base_link"}
    assert store.get_start_time() == pytest.approx(100.0)
    assert store.get_end_time() == pytest.approx(100.4)
    assert store.get_time_at_percent(50) == pytest.approx(100.2)
    msgs = store.get_messages_in_time_range(100.05, 100.35)
    assert [m.stamp for m in msgs] == pytest.approx([100.1, 100.2, 100.3])
    assert store.get_average_update_frequency(
        "odom_combined", "base_link") == pytest.approx(0.1)


# ---------------------------------------------------------------------------
# pointcloud
# ---------------------------------------------------------------------------


def test_fields_to_dtype_inserts_padding():
    fields = [PointField("x", 0, FLOAT32), PointField("ring", 8, UINT16)]
    dt = fields_to_dtype(fields, point_step=12)
    names = [n for n, _ in dt]
    # 4 pad bytes between x (ends at 4) and ring (starts at 8), 2 at tail
    assert names == ["x", "__4", "__5", "__6", "__7", "ring", "__10", "__11"]


def test_cloud_roundtrip_with_padding():
    pts = np.zeros(7, dtype=np.dtype(
        [("x", np.float32), ("y", np.float32), ("z", np.float32),
         ("intensity", np.float32), ("ring", np.uint16)]))
    pts["x"] = np.arange(7)
    pts["ring"] = np.arange(7) % 4
    cloud = array_to_cloud(pts)
    arr = cloud_to_array(cloud)
    np.testing.assert_array_equal(arr["x"], pts["x"])
    np.testing.assert_array_equal(arr["ring"], pts["ring"])
    xyz = xyz_from_cloud(cloud)
    assert xyz.shape == (7, 3)
    np.testing.assert_allclose(xyz[:, 0], np.arange(7))


def test_cloud_manual_packing():
    """Decode a hand-packed buffer with inter-field padding, organized."""
    raw = np.zeros(6, dtype=np.dtype({"names": ["x", "i"],
                                      "formats": [np.float32, np.uint8],
                                      "offsets": [0, 6], "itemsize": 8}))
    raw["x"] = [1, 2, 3, 4, 5, 6]
    raw["i"] = [10, 20, 30, 40, 50, 60]
    cloud = PointCloud(
        fields=[PointField("x", 0, FLOAT32), PointField("i", 6, 2)],
        point_step=8, data=raw.tobytes(), height=2, width=3)
    arr = cloud_to_array(cloud)
    assert arr.shape == (2, 3)
    np.testing.assert_allclose(arr["x"][1], [4, 5, 6])
    np.testing.assert_array_equal(arr["i"][0], [10, 20, 30])


# ---------------------------------------------------------------------------
# gps_heatmap
# ---------------------------------------------------------------------------


def test_utm_known_values():
    """bag_parser.py:306 grid center lands in 32U; absolute accuracy is
    checked against the utm package's published example vector
    (50.77535 N, 6.08389 E → 294409.243, 5628898.134) within 1 m —
    far below the 10 m heatmap granularity the capture stack uses."""
    _, _, zone, letter = latlon_to_utm(48.013551, 7.833116)
    assert (zone, letter) == (32, "U")
    e, n, zone, letter = latlon_to_utm(50.77535, 6.08389)
    assert (zone, letter) == (32, "U")
    assert e == pytest.approx(294409.243, abs=1.0)
    assert n == pytest.approx(5628898.134, abs=1.0)


def test_utm_roundtrip():
    for lat, lon in [(48.0135, 7.8331), (-33.8688, 151.2093),
                     (37.7749, -122.4194), (0.5, 0.5)]:
        e, n, zone, letter = latlon_to_utm(lat, lon)
        lat2, lon2 = utm_to_latlon(e, n, zone, letter)
        assert lat2 == pytest.approx(lat, abs=1e-6)
        assert lon2 == pytest.approx(lon, abs=1e-6)


def test_heat_stats_roundtrip_and_html(tmp_path):
    lats = [48.0 + 0.001 * i for i in range(30)]
    lons = [7.8 + 0.0005 * i for i in range(30)]
    sub = tmp_path / "runs" / "a"
    sub.mkdir(parents=True)
    save_heat_stats(lats[:15], lons[:15], str(sub / "heat_stats_1"))
    save_heat_stats(lats[15:], lons[15:], str(sub / "heat_stats_2"))
    got_lat, got_lon = collect_heat_stats(str(tmp_path))
    assert sorted(got_lat) == pytest.approx(sorted(lats))
    out = write_heatmap_html(got_lat, got_lon, str(tmp_path / "map.html"))
    content = open(out).read()
    assert "base64" in content and "30 points" in content


# ---------------------------------------------------------------------------
# dump_capture CLI (composition)
# ---------------------------------------------------------------------------


def _make_capture(tmp_path, n_frames=12, dt=0.03, lidar=False):
    import cv2

    cap = tmp_path / "capture"
    topics = ["rgb_fl_burst", "ir_left_burst"]
    if lidar:
        topics.append("lidar_burst")
    rng = np.random.default_rng(0)
    base = 1594000000.0  # 2020-07-06 day-time UTC
    for ti, topic in enumerate(topics):
        d = cap / "streams" / topic
        d.mkdir(parents=True)
        for i in range(n_frames):
            t = base + i * dt + ti * 0.001  # 1 ms skew between streams
            secs, nsecs = int(t), int(round((t - int(t)) * 1e9))
            if "lidar" in topic:
                np.save(str(d / f"{secs}_{nsecs}.npy"),
                        rng.standard_normal((16, 4), dtype=np.float32))
            elif "ir" in topic:
                img = rng.integers(21000, 26000, (8, 8),
                                   dtype=np.uint16)
                cv2.imwrite(str(d / f"{secs}_{nsecs}.png"), img)
            else:
                img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                cv2.imwrite(str(d / f"{secs}_{nsecs}.png"), img)
    with open(cap / "tf.jsonl", "w") as f:
        for i in range(n_frames + 2):
            t = base - dt + i * dt
            f.write(json.dumps({
                "t": t, "parent": "odom_combined", "child": "base_link",
                "translation": [20.0 * i * dt, 0.0, 0.0],  # fast: >10m hops
                "rotation": [0.0, 0.0, 0.0, 1.0]}) + "\n")
    with open(cap / "origin.json", "w") as f:
        json.dump({"position": [413135.0, 5318474.0, 0.0]}, f)
    return cap, topics


def test_dump_capture_end_to_end(tmp_path):
    from heatnet_tpu.cli.dump_capture import main as dump_main

    cap, topics = _make_capture(tmp_path)
    out = tmp_path / "dumped"
    save_dir = dump_main([
        "--capture", str(cap), "--out", str(out),
        "--topics", *topics, "--prefixes", "fl_rgb", "fl_ir",
        "--heatmap-min-dist", "0.5"])
    assert save_dir is not None
    base = os.path.basename(save_dir)
    assert base.startswith("drive_day_") or base.startswith("drive_night_")

    rgb_pngs = os.listdir(os.path.join(save_dir, "fl_rgb"))
    ir_pngs = os.listdir(os.path.join(save_dir, "fl_ir"))
    assert rgb_pngs and ir_pngs
    assert all(p.startswith("fl_rgb_") and p.endswith(".png")
               for p in rgb_pngs)

    # IR frames keep 16-bit depth through the dump
    import cv2
    ir = cv2.imread(os.path.join(save_dir, "fl_ir", ir_pngs[0]),
                    cv2.IMREAD_UNCHANGED)
    assert ir.dtype == np.uint16

    # vehicle txt: 5 "tx ty tz qx qy qz qw" groups separated by ' / '
    vehicle_files = os.listdir(os.path.join(save_dir, "vehicle"))
    assert len(vehicle_files) == 1
    line = open(os.path.join(save_dir, "vehicle", vehicle_files[0])
                ).readline()
    groups = [g for g in line.strip().split(" / ") if g]
    assert len(groups) == 5 and len(groups[0].split()) == 7

    # paths txt lists QUEUE_SIZE files per line, per topic prefix
    paths_files = sorted(os.listdir(os.path.join(save_dir, "paths")))
    assert len(paths_files) == 2
    first = open(os.path.join(save_dir, "paths", paths_files[0])
                 ).readline().split()
    assert len(first) == 5

    # origin + heatmap side-products
    origin_files = os.listdir(os.path.join(save_dir, "origin"))
    assert len(origin_files) == 1
    assert "/" in open(os.path.join(save_dir, "origin",
                                    origin_files[0])).read()
    assert os.path.isfile(os.path.join(save_dir, "heatmap.html"))

    # re-running detects the already-parsed tree
    assert dump_main([
        "--capture", str(cap), "--out", str(out),
        "--topics", *topics, "--prefixes", "fl_rgb", "fl_ir"]) is None


def test_dump_capture_lidar_manifest(tmp_path):
    """Lidar frames dump as .npy and the paths manifest records the .npy
    names actually on disk (not the pre-rename .png names)."""
    from heatnet_tpu.cli.dump_capture import main as dump_main

    cap, topics = _make_capture(tmp_path, lidar=True)
    out = tmp_path / "dumped"
    save_dir = dump_main([
        "--capture", str(cap), "--out", str(out),
        "--topics", *topics, "--prefixes", "fl_rgb", "fl_ir", "lidar",
        "--heatmap-min-dist", "0.5"])
    assert save_dir is not None

    lidar_files = os.listdir(os.path.join(save_dir, "lidar"))
    assert lidar_files and all(p.endswith(".npy") for p in lidar_files)
    pts = np.load(os.path.join(save_dir, "lidar", lidar_files[0]))
    assert pts.shape == (16, 4)

    paths_files = sorted(os.listdir(os.path.join(save_dir, "paths")))
    lidar_paths = [p for p in paths_files if p.startswith("lidar")]
    assert len(lidar_paths) == 1
    for line in open(os.path.join(save_dir, "paths", lidar_paths[0])):
        for p in line.split():
            assert p.endswith(".npy") and os.path.isfile(p), p


# ---------------------------------------------------------------------------
# Shipped example calibration assets (experiments/calibrations/)
# ---------------------------------------------------------------------------


def test_shipped_calibration_assets_drive_full_chain():
    """The example calibration tree (schema-compatible stand-in for the
    reference's data/calibrations/) parses and drives every consumer:
    kalibr camchain -> StereoRectifier remap, t_calib.json -> thermal
    projection warp field, circlegrid.yaml -> kalibr target spec."""
    import yaml

    from heatnet_tpu.data.calibration import (
        StereoRectifier, load_kalibr_yaml, load_thermal_calib,
        project_thermal_to_rgb)

    root = os.path.join(os.path.dirname(__file__),
                        "../experiments/calibrations")

    cams = load_kalibr_yaml(
        os.path.join(root, "example_rig/front_stereo/camchain.yaml"))
    assert set(cams) == {"left", "right"}
    assert cams["left"].resolution == (1920, 1080)
    assert cams["right"].T_cn_cnm1 is not None

    T = cams["right"].T_cn_cnm1
    rect = StereoRectifier(cams["left"], cams["right"],
                           T[:3, :3], T[:3, 3])
    img = np.random.RandomState(0).randint(
        0, 255, (1080, 1920, 3)).astype(np.uint8)
    left, right = rect.rectify(img, img)
    assert left.shape == img.shape and right.shape == img.shape

    thermal = load_kalibr_yaml(
        os.path.join(root, "example_rig/thermal/camchain.yaml"))["thermal"]
    assert thermal.resolution == (640, 512)

    T_rt, K_ir = load_thermal_calib(
        os.path.join(root, "example_rig/t_calib.json"))
    assert T_rt.shape == (4, 4) and K_ir[0, 0] == 460.0
    depth = np.full((64, 64), 5.0, np.float32)
    warp = project_thermal_to_rgb(depth, cams["left"].K, K_ir, T_rt)
    assert warp.shape == (64, 64, 2) and np.isfinite(warp).all()

    with open(os.path.join(root, "circlegrid.yaml")) as f:
        grid = yaml.safe_load(f)
    assert grid["target_type"] == "circlegrid"
    assert grid["targetCols"] * grid["targetRows"] > 0
    assert grid["spacingMeters"] > 0
