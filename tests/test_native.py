"""Native C++ component tests (build + semantics vs the Python reference)."""

import numpy as np
import pytest

from heatnet_tpu.data.mappings import VISTAS_TO_HEATNET, relabel_vistas_image
from heatnet_tpu.native import (
    BurstSampler,
    Synchronizer,
    gray_binarize,
    relabel_image_native,
    relabel_vistas_image_native,
    thermal_to_8bit,
)


def test_native_relabel_matches_python():
    rng = np.random.RandomState(0)
    img = (rng.randint(0, 66, (32, 48)) * 256 +
           rng.randint(0, 4, (32, 48))).astype(np.uint16)
    ours = relabel_vistas_image_native(img, VISTAS_TO_HEATNET)
    ref = relabel_vistas_image(img, VISTAS_TO_HEATNET)
    np.testing.assert_array_equal(ours, ref)


def test_native_relabel_image_palette():
    palette = np.zeros((256, 3), np.uint8)
    palette[3] = (10, 20, 30)
    seg = np.full((4, 4), 3, np.uint8)
    rgb = relabel_image_native(seg, palette)
    assert rgb.shape == (4, 4, 3)
    np.testing.assert_array_equal(rgb[0, 0], [10, 20, 30])


def test_synchronizer_matches_within_slop():
    s = Synchronizer(num_streams=3, slop_s=0.05)
    # aligned tuple at ~t=1.0 (within 50ms), plus a straggler on stream 2
    s.push(0, 1.00, 100)
    s.push(1, 1.01, 200)
    s.push(2, 0.60, 299)  # too old, must be dropped
    s.push(2, 1.02, 300)
    stamps, ids = s.poll()
    np.testing.assert_array_equal(ids, [100, 200, 300])
    assert s.poll() is None  # queues drained


def test_synchronizer_no_match_outside_slop():
    s = Synchronizer(num_streams=2, slop_s=0.01)
    s.push(0, 1.0, 1)
    s.push(1, 2.0, 2)
    assert s.poll() is None


def test_burst_sampler_gates_per_period():
    b = BurstSampler(num_streams=2, slop_s=0.01, burst_period=1.0,
                     burst_img_count=2)
    # 10 synchronized tuples at 10 Hz over 1 second → only first 2 pass,
    # then the next period's first 2
    got = []
    for k in range(12):
        t = 1.0 + k * 0.1
        b.push(0, t, k)
        b.push(1, t, k)
        out = b.poll()
        if out is not None:
            got.append(int(out[1][0]))
    assert got == [0, 1, 10, 11]


def test_thermal_to_8bit_semantics():
    ir = np.array([[20000, 25000, 30000, 40000]], np.uint16)
    out, mask = thermal_to_8bit(ir, trunc_value=30000.0, bin_thresh=100)
    # 40000 truncates to 30000; min 20000 → 0 → inverted 255
    assert out[0, 0] == 255
    assert out[0, 2] == out[0, 3] == 0  # hottest (after trunc) → inverted 0
    assert mask[0, 0] == 255 and mask[0, 3] == 0


def test_gray_binarize():
    g = np.array([[0, 139, 140, 141, 255]], np.uint8)
    out = gray_binarize(g, thresh=140)
    np.testing.assert_array_equal(out[0], [0, 0, 0, 255, 255])


def test_message_bus_pubsub():
    """firstNode/secondNode scaffolding equivalent (pubsub.cpp)."""
    from heatnet_tpu.native.bindings import MessageBus

    bus = MessageBus()
    sub = bus.subscribe("rgb_0", queue_size=3)
    late_sub = bus.subscribe("rgb_0", queue_size=5)
    other = bus.subscribe("ir_0", queue_size=5)

    # 5 publishes into a queue of 3 → oldest two dropped for `sub`
    for i in range(5):
        bus.publish("rgb_0", stamp_s=i / 30.0, payload=f"RGB image {i}".encode())
    assert bus.pending(sub) == 3
    assert bus.pending(late_sub) == 5
    assert bus.pending(other) == 0

    stamp, payload = bus.poll(sub)
    assert payload == b"RGB image 2"  # drop-oldest kept 2, 3, 4
    assert abs(stamp - 2 / 30.0) < 1e-9
    assert bus.poll(other) is None

    # stamped messages feed the ApproximateTime synchronizer downstream
    msgs = []
    while True:
        m = bus.poll(late_sub)
        if m is None:
            break
        msgs.append(m[1])
    assert msgs == [f"RGB image {i}".encode() for i in range(5)]


def test_message_bus_oversized_message():
    """A message larger than poll's buffer raises (C layer -2) and stays
    queued — returning None would make drain loops spin forever."""
    import pytest

    from heatnet_tpu.native.bindings import MessageBus

    bus = MessageBus()
    sub = bus.subscribe("big", queue_size=2)
    bus.publish("big", stamp_s=1.0, payload=b"x" * 64)
    with pytest.raises(BufferError):
        bus.poll(sub, max_len=16)
    assert bus.pending(sub) == 1  # still queued
    stamp, payload = bus.poll(sub, max_len=128)  # retry with room
    assert payload == b"x" * 64


def test_camera_focus_fde(tmp_path):
    """Sharp frames must score lower (more negative) FDE than blurred ones
    (kalibr_camera_focus:29-39 semantics: minimize for focus)."""
    import cv2

    from heatnet_tpu.cli.camera_focus import frequency_domain_entropy, main

    rng = np.random.RandomState(0)
    sharp = (rng.rand(64, 64) > 0.5).astype(np.uint8) * 255
    blurred = cv2.GaussianBlur(sharp, (11, 11), 5.0)
    assert frequency_domain_entropy(sharp) < frequency_domain_entropy(blurred)

    cv2.imwrite(str(tmp_path / "sharp.png"), sharp)
    cv2.imwrite(str(tmp_path / "blur.png"), blurred)
    results = main(["--images", str(tmp_path)])
    assert len(results) == 2
    assert results[str(tmp_path / "sharp.png")] < results[str(tmp_path / "blur.png")]
