"""MFNet/RTFNet harness parity: SegNet baseline, augmentation suite, demo.

Reference: models/external_models/mfnet/{model/SegNet.py, util/augmentation.py,
run_demo.py} (VERDICT round-1 missing #5).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatnet_tpu.models.segnet_baseline import (SegNetBaseline,
                                                pool_with_indices,
                                                unpool_with_indices)


def test_pool_unpool_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    pooled, idx = pool_with_indices(x)
    assert pooled.shape == (2, 4, 4, 3) and idx.shape == (2, 4, 4, 3)
    up = unpool_with_indices(pooled, idx)
    assert up.shape == x.shape
    # every max value lands back on its original position
    mask = np.asarray(up) > 0
    np.testing.assert_allclose(np.asarray(up)[mask],
                               np.asarray(x)[mask])
    # each 2x2 cell holds exactly one nonzero
    cells = np.asarray(up).reshape(2, 4, 2, 4, 2, 3)
    assert ((cells > 0).sum(axis=(2, 4)) == 1).all()


def test_segnet_baseline_unit_test_shape():
    """The reference unit_test contract (SegNet.py:100-106) at reduced res."""
    m = SegNetBaseline(n_class=9)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 96, 128, 4)
                    .astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    y = m.apply(variables, x)
    assert y.shape == (2, 96, 128, 9)


def test_augmentation_suite():
    from heatnet_tpu.data.mf_augment import (RandomBrightness, RandomCrop,
                                             RandomCropOut, RandomFlip,
                                             RandomNoise,
                                             default_train_augmentations)

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (48, 64, 4)).astype(np.uint8)
    label = rng.randint(0, 9, (48, 64)).astype(np.uint8)

    im, lb = RandomFlip(prob=1.0, seed=0)(image, label)
    np.testing.assert_array_equal(im, image[:, ::-1])
    np.testing.assert_array_equal(lb, label[:, ::-1])

    im, lb = RandomCrop(crop_rate=0.1, prob=1.0, seed=0)(image, label)
    assert im.shape[0] <= 48 and im.shape[1] <= 64
    assert im.shape[:2] == lb.shape[:2]

    im, lb = RandomCropOut(crop_rate=0.2, prob=1.0, seed=0)(image, label)
    assert im.shape == image.shape
    assert (im == 0).any() and (lb == 0).any()
    assert (image != 0).sum() > (im != 0).sum()  # zeroed a rectangle

    im, _ = RandomBrightness(bright_range=0.15, prob=1.0, seed=0)(image, label)
    assert im.dtype == image.dtype and im.shape == image.shape

    im, _ = RandomNoise(noise_range=5, prob=1.0, seed=0)(image, label)
    assert im.max() <= 255 and im.min() >= 0

    augs = default_train_augmentations(seed=0)
    assert len(augs) == 2  # train.py:22-26 enables flip + crop only


def test_run_demo_cli(tmp_path):
    from PIL import Image

    from heatnet_tpu.cli.run_demo import main
    from heatnet_tpu.cli.train_baseline import main as train_main
    from heatnet_tpu.data.synthetic import make_mfnet

    # train SegNet for 1 tiny epoch to produce a checkpoint in the
    # weights/<model>/final layout run_demo expects
    data = make_mfnet(str(tmp_path / "mf"), hw=(480, 640))
    model_dir = tmp_path / "weights" / "SegNet"
    os.makedirs(model_dir)
    train_main([
        "--model_name", "SegNet", "--data_dir", data,
        "--batch_size", "1", "--epoch_max", "1", "--max_iters_per_epoch", "1",
        "--checkpointname", str(model_dir / "final"),
        "--log_dir", str(tmp_path / "runs"),
    ])

    # 4-channel demo pngs
    img_dir = tmp_path / "image"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    for i in range(2):
        arr = rng.randint(0, 255, (480, 640, 4)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"frame{i}.png")

    out = main(["--model_name", "SegNet", "--image_dir", str(img_dir),
                "--model_dir", str(tmp_path / "weights")])
    assert len(out) == 2
    assert all(os.path.exists(p) and p.endswith("_pred.png") for p in out)


@pytest.mark.slow
def test_segnet_baseline_torch_parity():
    """Forward parity vs the reference SegNet definition incl. unpooling."""
    import importlib
    import sys
    import types

    torch = pytest.importorskip("torch")
    ref_dir = "/root/reference/models/external_models/mfnet/model"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference not available")
    pkg = types.ModuleType("_ref_mfnet_model")
    pkg.__path__ = [ref_dir]
    sys.modules.setdefault("_ref_mfnet_model", pkg)
    ref = importlib.import_module("_ref_mfnet_model.SegNet")

    from heatnet_tpu.io.torch_import import import_into
    from heatnet_tpu.train.state import init_model

    torch.manual_seed(0)
    model_t = ref.SegNet(n_class=9).eval()
    # randomize BN running stats so the conversion is non-trivial
    g = torch.Generator().manual_seed(3)
    for m in model_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)

    model_j = SegNetBaseline(n_class=9, dtype=jnp.float32)
    x = np.random.RandomState(1).rand(1, 64, 96, 4).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(x),
                                     init_kwargs={"train": True})
    params, batch_stats = import_into(params, batch_stats,
                                      model_t.state_dict())

    with torch.no_grad():
        y_t = model_t(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    y_j = model_j.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y_j),
                               np.moveaxis(y_t.numpy(), 1, -1),
                               rtol=1e-3, atol=2e-3)
