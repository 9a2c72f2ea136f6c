"""Data-pipeline tests over synthetic datasets in the reference layouts."""

import numpy as np
import jax
import pytest

from heatnet_tpu.data import synthetic
from heatnet_tpu.data.loaders import (
    BDDValDataset,
    DeviceAugment,
    FreiburgInferDataset,
    FreiburgThermalDataset,
    FreiburgThermalTestDataset,
    MFNetDataset,
    MFNetTrainDataset,
    VistasDataset,
    batch_iterator,
    filter_test_data,
    get_test_paths,
    get_test_stamps,
    holdout_split,
    sort_day_night,
    stamp_sort_key,
)


@pytest.fixture(scope="module")
def freiburg_train(tmp_path_factory):
    return synthetic.make_freiburg_train(
        str(tmp_path_factory.mktemp("fr_train")), n_day=6, n_night=4)


@pytest.fixture(scope="module")
def freiburg_test(tmp_path_factory):
    return synthetic.make_freiburg_test(str(tmp_path_factory.mktemp("fr_test")))


@pytest.fixture(scope="module")
def mfnet_root(tmp_path_factory):
    return synthetic.make_mfnet(str(tmp_path_factory.mktemp("mfnet")))


def test_freiburg_train_dataset(freiburg_train):
    ds = FreiburgThermalDataset(freiburg_train, split="train")
    assert len(ds) == 5  # 6 day images minus 1% holdout (ceil → 1)
    item = ds[0]
    assert item["rgb_day"].shape == (320, 960, 3)
    assert item["ir_day"].dtype == np.uint16
    assert item["label_day"].shape == (320, 960)
    assert item["rgb_night"].shape == (320, 960, 3)


def test_freiburg_split_disjoint(freiburg_train):
    train = FreiburgThermalDataset(freiburg_train, split="train")
    test = FreiburgThermalDataset(freiburg_train, split="test")
    assert set(train.rgb_day_files).isdisjoint(test.rgb_day_files)
    assert len(train) + len(test) == 6


def test_device_augment_batch(freiburg_train):
    ds = FreiburgThermalDataset(freiburg_train, split="train")
    batches = list(batch_iterator(ds, batch_size=2, seed=0))
    assert len(batches) == 2  # 5 // 2, drop_last
    aug = DeviceAugment(crop_hw=(320, 640))
    out = aug(jax.random.PRNGKey(0), batches[0])
    assert out["rgb_day"].shape == (2, 320, 640, 3)
    assert out["ir_day"].shape == (2, 320, 640, 1)
    assert out["label_day"].shape == (2, 320, 640)
    assert out["mod_drop_params"].shape == (2, 4)
    assert float(np.asarray(out["rgb_day"]).min()) >= -1.0
    assert float(np.asarray(out["ir_night"]).max()) <= 1.0


def test_freiburg_test_dataset(freiburg_test):
    paths = get_test_paths([freiburg_test])
    assert len(paths[0]) == 2
    ds = FreiburgThermalTestDataset(*paths)
    item = ds[0]
    assert item["rgb"].shape == (1, 320, 704, 3)
    assert item["ir"].shape == (1, 320, 704, 1)
    assert item["label"].shape == (1, 320, 704)
    # raw sensor dtypes: normalization is fused on device
    # (eval.validate._device_normalize)
    assert item["rgb"].dtype == np.uint8
    assert item["ir"].dtype == np.uint16
    import jax.numpy as jnp

    from heatnet_tpu.eval.validate import _device_normalize
    ir_n = np.asarray(_device_normalize(jnp.asarray(item["ir"])))
    rgb_n = np.asarray(_device_normalize(jnp.asarray(item["rgb"])))
    assert -1.0 <= ir_n.min() and ir_n.max() <= 1.0
    assert -1.0 <= rgb_n.min() and rgb_n.max() <= 1.0


def test_test_stamps_and_filter(freiburg_test, freiburg_train):
    stamps = get_test_stamps(get_test_paths([freiburg_test])[2])
    assert len(stamps) == 2 and all(len(s) == 2 for s in stamps)
    # filtering removes exact stamp matches only
    paths = [f"/x/fl_ir_aligned_{s}_{n:09d}.png" for s, n in stamps]
    paths.append("/x/fl_ir_aligned_1111111111_000000000.png")
    kept = filter_test_data(paths, stamps)
    assert kept == ["/x/fl_ir_aligned_1111111111_000000000.png"]


def test_infer_dataset_sorted(tmp_path):
    root = synthetic.make_freiburg_infer(str(tmp_path / "inf"), n=3)
    ds = FreiburgInferDataset(root)
    keys = [stamp_sort_key(f) for f in ds.ir_files]
    assert keys == sorted(keys)
    item = ds[0]
    assert item["rgb"].shape == (1, 320, 704, 3)
    assert item["ir"].shape == (1, 320, 704, 1)


def test_mfnet_eval_dataset(mfnet_root):
    ds = MFNetDataset(mfnet_root, split="day")
    assert len(ds) == 2
    item = ds[0]
    assert item["rgb"].shape == (1, 480, 640, 3)
    assert item["ir"].shape == (1, 480, 640, 1)
    assert item["label"].max() < 9
    with pytest.raises(ValueError):
        MFNetDataset(mfnet_root, split="dusk")


def test_mfnet_train_dataset(mfnet_root):
    ds = MFNetTrainDataset(mfnet_root)
    assert len(ds) == 2  # 2 of 4 train names end with D
    item = ds[0]
    assert item["rgb_day"].shape == (480, 640, 3)
    assert item["ir_night"].shape == (480, 640, 1)
    assert item["label_day"].shape == (480, 640)


def test_bdd_dataset(tmp_path):
    root = synthetic.make_bdd(str(tmp_path / "bdd"))
    ds = BDDValDataset(root)
    item = ds[0]
    assert item["rgb"].shape == (1, 320, 704, 3)
    assert item["label"].shape == (1, 320, 704)
    assert 255 in np.unique(item["label"])  # ignore id survives to remap


def test_vistas_dataset(tmp_path):
    root = synthetic.make_vistas(str(tmp_path / "vistas"), n=3, hw=(64, 128))
    ds = VistasDataset(root, width=96, height=48)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (48, 96, 3)
    assert item["label"].shape == (48, 96)
    assert item["label"].max() <= 13
    # eval mode: deterministic resize
    ds_eval = VistasDataset(root, width=96, height=48, augment_data=False)
    a, b = ds_eval[1], ds_eval[1]
    np.testing.assert_array_equal(a["image"], b["image"])


def test_batch_iterator_tail_and_order():
    class Dummy:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    batches = list(batch_iterator(Dummy(), 2, shuffle=False, drop_last=False))
    assert len(batches) == 3
    assert batches[2]["x"].shape == (1, 2)
    np.testing.assert_array_equal(batches[0]["x"][:, 0], [0, 1])


def test_thermal_drive_dataset(tmp_path):
    from heatnet_tpu.data.loaders import ThermalDriveDataset
    from heatnet_tpu.data.synthetic import make_drive_dump

    root = make_drive_dump(str(tmp_path / "drives"), n_drives=2, n_bursts=2,
                           burst=2)
    ds = ThermalDriveDataset(root)
    assert len(ds) == 4  # 2 drives x 2 bursts
    item = ds[0]
    assert len(item["rgb_fl"]) == 2 and len(item["ir_fl"]) == 2
    assert item["rgb_fl"][0].shape == (48, 64, 3)
    assert item["rgb_fl"][0].dtype == np.float32
    assert 0.0 <= item["rgb_fl"][0].min() and item["rgb_fl"][0].max() <= 1.0
    assert item["ir_fl"][0].shape == (48, 64, 1)
    assert item["ir_fl"][0].max() > 255  # raw radiometric counts
    assert item["org_left"].dtype == np.uint8

    # CLAHE + aligned-IR remap + no right camera
    ds2 = ThermalDriveDataset(root, contrast_enhancement=True,
                              load_aligned_ir=True, load_right=False)
    item2 = ds2[0]
    assert item2["rgb_fr"] is None and item2["ir_fr"] == []
    assert len(item2["ir_fl"]) == 2  # remapped fl_ir_aligned files exist


def test_vistas_borders_dataset(tmp_path):
    from heatnet_tpu.data.loaders import VistasBordersDataset
    from heatnet_tpu.data.synthetic import make_vistas_borders

    paths = make_vistas_borders(str(tmp_path / "vb"), n=3, hw=(64, 96))
    ds = VistasBordersDataset(paths, width=64, height=48)
    assert len(ds) == 3
    item = ds[0]
    # the reference 8-tuple, as a dict
    for k in ("borders", "ids", "inst", "image", "borders_clip",
              "image_org", "dt_borders", "dt"):
        assert k in item, k
    assert item["image"].shape == (48, 64, 3)
    assert item["ids"].shape == (48, 64)
    assert set(np.unique(item["borders_clip"])) <= {0, 1}
    # distance transform: zero exactly on border pixels, positive elsewhere
    on_border = item["borders"] > 0
    if on_border.any():
        assert item["dt_borders"][on_border].max() == 0.0
    assert item["dt_borders"].max() > 0

    # eval mode: no augmentation, CLAHE off
    ds_eval = VistasBordersDataset(paths, width=64, height=48,
                                   contrast_enhancement=False,
                                   augment_data=False)
    a = ds_eval[1]["image"]
    b = ds_eval[1]["image"]
    np.testing.assert_array_equal(a, b)  # deterministic

    # eval mode must enforce (width, height) on frames LARGER than the
    # target — real Vistas frames vary in size, and passing them through
    # at native resolution forces one XLA recompile per frame
    big = make_vistas_borders(str(tmp_path / "vb_big"), n=1, hw=(128, 192))
    ds_big = VistasBordersDataset(big, width=64, height=48,
                                  contrast_enhancement=False,
                                  augment_data=False)
    item_big = ds_big[0]
    assert item_big["image"].shape == (48, 64, 3)
    for k in ("ids", "inst", "borders", "dt"):
        assert item_big[k].shape == (48, 64), k


def test_vistas_clahe_option(tmp_path):
    from heatnet_tpu.data.loaders import VistasDataset
    from heatnet_tpu.data.synthetic import make_vistas

    root = make_vistas(str(tmp_path / "v"), n=2, hw=(96, 160))
    plain = VistasDataset(root, width=96, height=64, augment_data=False,
                          seed=3)[0]["image"]
    clahe = VistasDataset(root, width=96, height=64, augment_data=False,
                          contrast_enhancement=True, seed=3)[0]["image"]
    assert plain.shape == clahe.shape
    assert not np.allclose(plain, clahe)  # CLAHE changed the histogram
