"""Smoke tests for the remaining CLIs (plain/baseline/cyclegan-test/eval_hotnet)
and the calibration/profiling utilities."""

import json
import os

import numpy as np
import pytest

from heatnet_tpu.data import synthetic


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli2")
    return {
        "train": synthetic.make_freiburg_train(str(base / "fr"), n_day=4, n_night=3),
        "mfnet": synthetic.make_mfnet(str(base / "mf"), hw=(480, 640)),
        "kaist": synthetic.make_kaist(str(base / "kaist"), hw=(64, 64)),
        "day": synthetic.make_freiburg_test(str(base / "day"), n=1),
        "night": synthetic.make_freiburg_test(str(base / "night"), n=1),
        "base": str(base),
    }


def test_train_plain_cli(roots):
    from heatnet_tpu.cli.train_plain import main

    loss = main([
        "--dataroot", roots["train"], "--n_epochs", "1", "--batch_size", "2",
        "--max_iters_per_epoch", "2", "--structure", "1", "1", "1", "1",
        "--checkpointname", os.path.join(roots["base"], "plain_ckpt"),
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    assert np.isfinite(loss)
    assert os.path.exists(os.path.join(roots["base"], "plain_ckpt"))


@pytest.mark.slow
def test_cyclegan_train_then_test_cli(roots):
    from heatnet_tpu.cli.train_cyclegan import main as train_main
    from heatnet_tpu.cli.test_cyclegan import main as test_main

    ckpt_dir = os.path.join(roots["base"], "cg")
    train_main([
        "--dataroot", roots["kaist"], "--n_epochs", "1", "--batchSize", "1",
        "--size", "64", "--max_iters_per_epoch", "1",
        "--n_residual_blocks", "1", "--seg_structure", "1", "1", "1", "1",
        "--checkpoint_dir", ckpt_dir,
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    out_dir = os.path.join(roots["base"], "cg_out")
    n = test_main([
        "--dataroot", roots["kaist"], "--checkpoint_dir", ckpt_dir,
        "--output_dir", out_dir, "--size", "64", "--limit", "1",
        "--n_residual_blocks", "1", "--seg_structure", "1", "1", "1", "1",
        "--run_seg",
    ])
    assert n == 1
    assert os.path.exists(os.path.join(out_dir, "A", "0000.png"))
    assert os.path.exists(os.path.join(out_dir, "seg_0000.png"))


def test_train_baseline_mfnet_cli(roots):
    from heatnet_tpu.cli.train_baseline import main

    main([
        "--model_name", "MFNet", "--data_dir", roots["mfnet"],
        "--batch_size", "2", "--epoch_max", "1", "--max_iters_per_epoch", "1",
        "--checkpointname", os.path.join(roots["base"], "mfnet_ckpt"),
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    assert os.path.exists(os.path.join(roots["base"], "mfnet_ckpt"))


def test_baseline_calculate_result_protocol():
    from heatnet_tpu.cli.train_baseline import calculate_result

    cf = np.zeros((3, 3), np.int64)
    cf[1, 1] = 8
    cf[1, 2] = 2
    cf[2, 2] = 5
    cf[0, 0] = 100  # unlabelled excluded from overall acc
    overall, acc, iou = calculate_result(cf)
    assert overall == pytest.approx(13 / 15)
    assert iou[1] == pytest.approx(8 / 10)
    assert iou[2] == pytest.approx(5 / 7)  # 5/(5 + (2+5) - 5)


@pytest.mark.slow
def test_eval_hotnet_cli(roots, tmp_path):
    from heatnet_tpu.cli.eval_hotnet import main
    import jax
    import jax.numpy as jnp
    from heatnet_tpu.io.checkpoint import save_checkpoint
    from heatnet_tpu.models import ConfSegnet
    from heatnet_tpu.train.state import init_model

    # fabricate a "run": config.json + checkpoint_best
    run_dir = tmp_path / "run_a"
    run_dir.mkdir()
    cfg = {"modalities": "ir_rgb", "arch": "custom",
           "structure": [1, 1, 1, 1], "cert_branch": False,
           "late_fusion": False}
    (run_dir / "config.json").write_text(json.dumps(cfg))
    model = ConfSegnet(disc_arch="resnet18", num_critics=2,
                       structure=(1, 1, 1, 1))
    ins = [jnp.zeros((1, 64, 128, 3)), jnp.zeros((1, 64, 128, 1))]
    params, bs = init_model(model, jax.random.PRNGKey(0), ins, ins,
                            init_kwargs={"train": True})
    save_checkpoint({"state_dict": {"params": params, "batch_stats": bs}},
                    str(run_dir / "checkpoint_best"))

    results = main([
        "--runs", str(run_dir),
        "--testroot_day", roots["day"], "--testroot_night", roots["night"],
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    assert "run_a" in results


def test_calibration_utils(tmp_path):
    from heatnet_tpu.data.calibration import (
        load_kalibr_yaml, load_thermal_calib, project_thermal_to_rgb)

    yml = tmp_path / "cam.yaml"
    yml.write_text(
        "cam0:\n  camera_model: pinhole\n  intrinsics: [400, 400, 320, 240]\n"
        "  distortion_model: equidistant\n"
        "  distortion_coeffs: [0.1, 0.01, 0.0, 0.0]\n  resolution: [640, 480]\n"
        "cam1:\n  intrinsics: [380, 380, 310, 230]\n"
        "  distortion_coeffs: [0.1, 0.01, 0.0, 0.0]\n  resolution: [640, 480]\n"
        "  T_cn_cnm1:\n  - [1, 0, 0, 0.1]\n  - [0, 1, 0, 0]\n"
        "  - [0, 0, 1, 0]\n  - [0, 0, 0, 1]\n")
    cams = load_kalibr_yaml(str(yml))
    assert cams["cam0"].K[0, 0] == 400
    assert cams["cam1"].T_cn_cnm1[0, 3] == pytest.approx(0.1)

    tj = tmp_path / "t_calib.json"
    tj.write_text(json.dumps({
        "translation": [0.1, 0, 0], "rotation": [0, 0, 0, 1],
        "intrinsic": [500, 500, 320, 240]}))
    T, K = load_thermal_calib(str(tj))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
    assert K[0, 0] == 500

    depth = np.full((10, 10), 5.0)
    uv = project_thermal_to_rgb(depth, K, K, T)
    assert uv.shape == (10, 10, 2)
    # x-translation of 0.1m at 5m depth shifts u by fx*0.1/5 = 10 px
    assert uv[5, 5, 0] == pytest.approx(5 + 500 * 0.1 / 5, abs=1e-3)


def test_step_timer():
    from heatnet_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.data_loaded()
    t.step_done()
    d = t.log_dict("train_")
    assert "train_batch_time" in d and d["train_steps_per_sec"] > 0


@pytest.mark.slow
def test_dataset_qa_validate_and_stats(roots, capsys):
    from heatnet_tpu.cli.dataset_qa import main

    miou = main(["freiburg", "--data", roots["night"],
                 "--structure", "1", "1", "1", "1"])
    assert np.isfinite(miou) or np.isnan(miou)
    out = capsys.readouterr().out
    assert "mean IoU" in out and "road,parking" in out

    miou = main(["mfnet", "--data", roots["mfnet"], "--split", "day",
                 "--structure", "1", "1", "1", "1"])
    assert np.isfinite(miou) or np.isnan(miou)

    total = main(["stats", "--train-root", roots["train"],
                  "--test-day", roots["day"], "--test-night", roots["night"]])
    assert total > 0
    out = capsys.readouterr().out
    assert "TRAINING DATASET STATS" in out
    assert "of all DAY pixels" in out


def test_robust_loss_barron():
    import jax.numpy as jnp

    from heatnet_tpu.train.supervised import robust_loss

    x = np.linspace(0.0, 4.0, 17).astype(np.float32)
    ours = np.asarray(robust_loss(jnp.asarray(x), a=0.5, c=1.0))
    # reference formula (utils.py:21-24), numpy transliteration for the test
    a, c, e = 0.5, 1.0, 1e-05
    b = abs(2.0 - a) + e
    d = a + e
    want = (b / d) * (np.power(np.square(x / c) / b + 1.0, 0.5 * d) - 1.0)
    np.testing.assert_allclose(ours, want, rtol=1e-5)  # f32 vs f64
    assert ours[0] == 0.0 and np.all(np.diff(ours) > 0)


def test_visualize_data_cli(tmp_path):
    from heatnet_tpu.cli.visualize_data import main
    from heatnet_tpu.data.synthetic import make_drive_dump

    root = make_drive_dump(str(tmp_path / "drv"), n_drives=1, n_bursts=2,
                           burst=2)
    save = tmp_path / "overlays"
    n = main(["-s", root, "--save-dir", str(save), "--limit", "2"])
    assert n == 2
    files = sorted(os.listdir(save))
    assert len(files) == 6  # 2 bursts x (ir, rgb, overlay)
    assert any(f.endswith("_overlay.png") for f in files)
    import cv2
    ov = cv2.imread(str(save / [f for f in files if "overlay" in f][0]))
    assert ov is not None and ov.ndim == 3


def test_generate_vistas_print_labels(capsys):
    from heatnet_tpu.cli.generate_vistas import main

    assert main(["--print_labels"]) == 0
    out = capsys.readouterr().out
    assert "ID: 0: road,parking" in out
    assert "Mapping" in out and "vistas ids" in out
