"""Preprocessing-op tests: golden checks against cv2/PIL where the reference
used them (SURVEY.md §7 "bit-compatible preprocessing"), plus distributional
checks for the PRNG-keyed augmentations.
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from heatnet_tpu.ops import preprocess as P

RNG = np.random.RandomState(42)


def test_ir_normalize_window():
    ir = np.array([[20000, 21800, 23400, 25000, 60000]], dtype=np.uint16)
    out = np.asarray(P.ir_normalize(jnp.asarray(ir)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 0.5, 1.0, 1.0]], atol=1e-6)


def test_normalize_roundtrip():
    img = jnp.asarray(RNG.rand(4, 4, 3).astype(np.float32))
    normed = P.normalize(img)
    np.testing.assert_allclose(np.asarray(P.denormalize(normed)), np.asarray(img),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(normed), np.asarray(img) * 2 - 1, atol=1e-6)


def test_resize_bilinear_matches_cv2():
    img = (RNG.rand(32, 96, 3) * 255).astype(np.uint8)
    ours = np.asarray(P.resize(jnp.asarray(img).astype(jnp.float32), (20, 60)))
    ref = cv2.resize(img, (60, 20), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    # identical half-pixel convention; uint8 rounding inside cv2 → tol 1
    assert np.abs(ours - ref).max() <= 1.0


def test_resize_ir16_matches_cv2():
    ir = RNG.randint(20000, 28000, (32, 96)).astype(np.uint16)
    ours = np.asarray(P.resize(jnp.asarray(ir).astype(jnp.float32), (20, 60)))
    ref = cv2.resize(ir, (60, 20), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_window_crop_geometry():
    img = jnp.zeros((320, 960, 3))
    assert P.window_crop(img).shape == (320, 700, 3)
    assert P.window_crop(img, 148, 852).shape == (320, 704, 3)
    ir = jnp.zeros((320, 960))
    assert P.window_crop(ir).shape == (320, 700)


def test_crop_at_matches_slice():
    img = jnp.asarray(RNG.rand(320, 700, 3).astype(np.float32))
    out = P.crop_at(img, 0, 20, (320, 640))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img[:, 20:660]))
    small = P.crop_at(img, 5, 30, (100, 200))
    np.testing.assert_array_equal(np.asarray(small), np.asarray(img[5:105, 30:230]))


def test_random_crop_params_in_range():
    keys = jax.random.split(jax.random.PRNGKey(0), 50)
    for k in keys[:10]:
        i, j = P.random_crop_params(k, (320, 700), (320, 640))
        assert int(i) == 0 and 0 <= int(j) <= 60


def test_hflip_consistency():
    img = jnp.asarray(RNG.rand(8, 10, 3).astype(np.float32))
    lbl = jnp.asarray(RNG.randint(0, 13, (8, 10)).astype(np.uint8))
    f_img, f_lbl = P.maybe_hflip(jax.random.PRNGKey(3), img, lbl)
    flipped = not np.allclose(np.asarray(f_img), np.asarray(img))
    # label must be flipped iff image was
    assert flipped == (not np.array_equal(np.asarray(f_lbl), np.asarray(lbl)))
    np.testing.assert_array_equal(np.asarray(P.hflip(P.hflip(img))), np.asarray(img))


def test_rotate_matches_pil_interior():
    img = (RNG.rand(64, 64) * 255).astype(np.float32)
    angle = 13.0
    ours = np.asarray(P.rotate(jnp.asarray(img), jnp.float32(angle), "bilinear"))
    ref = np.array(Image.fromarray(img).rotate(angle, resample=Image.BILINEAR))
    # compare interior (border fill conventions differ by <1px band)
    c = 12
    diff = np.abs(ours[c:-c, c:-c] - ref[c:-c, c:-c])
    assert np.percentile(diff, 95) < 2.0, diff.max()


def test_rotate_nearest_preserves_labels():
    lbl = RNG.randint(0, 14, (40, 40)).astype(np.uint8)
    out = np.asarray(P.rotate(jnp.asarray(lbl), jnp.float32(15.0), "nearest"))
    assert out.dtype == lbl.dtype
    assert set(np.unique(out)).issubset(set(np.unique(lbl)) | {0})


def test_rect_drop_zeroes_rectangle_only():
    batch = jnp.ones((2, 64, 96, 3))
    params = jnp.asarray([[10, 20, 16, 32], [0, 0, 8, 8]])
    out = np.asarray(P.rect_drop(batch, params))
    assert out[0, 10:26, 20:52].sum() == 0
    assert out[0, :10].min() == 1.0 and out[0, 26:].min() == 1.0
    assert out[1, :8, :8].sum() == 0 and out[1, 8:, 8:].min() == 1.0


def test_rect_drop_params_bounds():
    params = np.asarray(P.rect_drop_params(jax.random.PRNGKey(0), 64, (320, 640)))
    i, j, h, w = params.T
    assert (h >= 100).all() and (h < 300).all()
    assert (w >= 100).all() and (w < 500).all()
    assert (i >= 0).all() and (i + h <= 320).all()
    assert (j >= 0).all() and (j + w <= 640).all()


def test_ir_scale_aug_distribution():
    ir = jnp.ones((4, 8, 8, 1))
    scaled = 0
    for s in range(40):
        out = np.asarray(P.ir_scale_aug(jax.random.PRNGKey(s), ir))
        v = out.flat[0]
        if v != 1.0:
            scaled += 1
            assert 0.1 <= v <= 1.0
    assert 10 < scaled < 30  # p≈0.5


def test_smart_augment_per_class_factors():
    label = jnp.asarray(np.tile(np.arange(4, dtype=np.int32), (1, 8, 2)))  # (1,8,8)
    ir = jnp.ones((1, 8, 8))
    out = np.asarray(P.smart_augment(jax.random.PRNGKey(0), ir, label))
    # same class → same factor; different classes → (a.s.) different factors
    for c in range(4):
        vals = out[np.asarray(label) == c]
        assert np.allclose(vals, vals[0])
        assert 0.1 <= vals[0] <= 1.0
    assert len(np.unique(out.round(6))) == 4


def test_inference_preprocess_shapes_and_range():
    rgb = jnp.asarray(RNG.randint(0, 255, (2, 320, 960, 3)).astype(np.uint8))
    ir = jnp.asarray(RNG.randint(20000, 26000, (2, 320, 960, 1)).astype(np.uint16))
    rgb_o, ir_o = P.inference_preprocess(rgb, ir)
    assert rgb_o.shape == (2, 320, 700, 3) and ir_o.shape == (2, 320, 700, 1)
    assert float(rgb_o.min()) >= -1.0 and float(rgb_o.max()) <= 1.0
    assert float(ir_o.min()) >= -1.0 and float(ir_o.max()) <= 1.0


def test_train_sample_preprocess_end_to_end():
    rgb = jnp.asarray(RNG.randint(0, 255, (320, 960, 3)).astype(np.uint8))
    ir = jnp.asarray(RNG.randint(20000, 26000, (320, 960)).astype(np.uint16))
    lbl = jnp.asarray(RNG.randint(0, 14, (320, 960)).astype(np.uint8))
    out = P.train_sample_preprocess(jax.random.PRNGKey(0), rgb, ir, lbl, rgb, ir)
    assert out["rgb_day"].shape == (320, 640, 3)
    assert out["ir_day"].shape == (320, 640)
    assert out["label_day"].shape == (320, 640)
    assert out["mod_drop_params"].shape == (4,)
    assert float(out["ir_night"].min()) >= -1.0


def test_label_remap_lut_matches_dict():
    from heatnet_tpu.data.mappings import VISTAS_TO_HEATNET, remap_labels
    labels = RNG.randint(0, 66, (16, 16))
    out = remap_labels(labels, VISTAS_TO_HEATNET)
    for src, dst in [(10, 0), (7, 1), (65, 13), (30, 6)]:
        assert (out[labels == src] == dst).all()
    unmapped = ~np.isin(labels, list(VISTAS_TO_HEATNET))
    assert (out[unmapped] == 12).all()


def test_relabel_vistas_image_instances():
    from heatnet_tpu.data.mappings import relabel_vistas_image
    img = np.zeros((4, 4), dtype=np.uint16)
    img[0, 0] = 53 * 256 + 7   # car instance 7
    img[1, 1] = 53 * 256 + 7   # same instance
    img[2, 2] = 53 * 256 + 9   # another car
    img[3, 3] = 1 * 256        # unmapped → background
    out = relabel_vistas_image(img)
    # column-major first-seen instance ids (Cython loop order): combo at
    # (0,0) gets id 0; the background-of-zeros combo (class 0 → person) gets
    # id 1 at (1,0); the second car combo gets id 2.
    assert out[0, 0] == 10 * 256 + 0
    assert out[1, 1] == 10 * 256 + 0
    assert out[2, 2] == 10 * 256 + 2
    assert out[3, 3] == 12 * 256  # class 1 is unmapped → background
    assert out[1, 0] == 9 * 256 + 1  # zeros: Vistas class 0 → person,rider
