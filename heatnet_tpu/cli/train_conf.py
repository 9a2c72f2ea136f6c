"""HeatNet adversarial trainer CLI — ``train_trgb_segnet_conf.py`` parity.

Reference: ``/root/reference/models/confusion_maximization/train_trgb_segnet_conf.py``
— flag surface (:139-188), model setup (:204-234), losses/optimizer
RMSprop + StepLR gamma .5 (:236-274), resume (:276-283), --infer/--eval
dispatch (:311-359), two-phase train loop (:361-592), periodic eval +
best-checkpoint (:594-654).

TPU-native: jitted seg/critic steps with per-phase masked optimizers
(heatnet_tpu.train.adversarial); host PhaseMachine; batch augmentation on
device; loaders decode on host threads. ``--cuda``/``--gpus`` are accepted
for parity and ignored (mesh uses all local devices).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('--epoch', type=int, default=0, help='starting epoch')
    parser.add_argument('--n_epochs', type=int, default=100)
    parser.add_argument('--dataroot', type=str, default='/mnt/hpc.shared/ir_rgb_data/')
    parser.add_argument('--testroot_day', type=str, default='')
    parser.add_argument('--testroot_night', type=str, default='')
    parser.add_argument('--testroot_fence', type=str, default='')
    parser.add_argument('--testroot_mfnet', type=str, default='')
    parser.add_argument('--discarch', type=str, default='cyclegan')
    parser.add_argument('--lr', type=float, default=0.0001)
    parser.add_argument('--lr_disc', type=float, default=0.0001)
    parser.add_argument('--conf_weight', type=float, default=0.1)
    parser.add_argument('--size', type=int, default=256)
    parser.add_argument('--input_nc', type=int, default=1)
    parser.add_argument('--output_nc', type=int, default=1)
    parser.add_argument('--cuda', action='store_true',
                        help='parity no-op (TPU mesh is always used)')
    parser.add_argument('--n_cpu', type=int, default=8)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--iter_seg_phase', type=int, default=50)
    parser.add_argument('--iter_critic_phase', type=int, default=500)
    parser.add_argument('--iter_initial_critic_phase', type=int, default=1000)
    parser.add_argument('--moddrop', action='store_true')
    parser.add_argument('--irscale', action='store_true')
    parser.add_argument('--smartirscale', action='store_true')
    parser.add_argument('--no_conf', action='store_true')
    parser.add_argument('--vis', action='store_true',
                        help='save visual panels to the logger instead of cv2 windows')
    parser.add_argument('--gpus', nargs='+', type=int, help='parity no-op')
    parser.add_argument('--num_critics', type=int, default=6)
    parser.add_argument('--half_lr_every_epoch', type=int, default=30)
    parser.add_argument('--feedback_seg', action='store_true')
    parser.add_argument('--checkpointname', type=str, default='checkpoint')
    parser.add_argument('--modalities', default='ir_rgb', type=str)
    parser.add_argument('--pretraining', action='store_true')
    parser.add_argument('--pretraining_path', type=str,
                        default='models_finished/training_nc_irrgb_best',
                        help='checkpoint used when --pretraining')
    parser.add_argument('--night_supervision_model', type=str, default="")
    parser.add_argument('--night_supervision_model_modalities', type=str, default="")
    parser.add_argument('--resume', type=str, default="")
    parser.add_argument('--train_input_adapter', action='store_true')
    parser.add_argument('--cert_branch', action='store_true')
    parser.add_argument('--weight_ir_sup', action='store_true')
    parser.add_argument('--late_fusion', action='store_true')
    parser.add_argument('--arch', default='custom', type=str)
    parser.add_argument('--critic_weights', nargs='+', type=float,
                        default=[1., 1., 1., 1., 1., 1., 1.])
    parser.add_argument('--adv_loss', default='MSE', type=str)
    parser.add_argument('--multidir', action='store_true')
    parser.add_argument('--trainsetname', type=str, default="FR")
    parser.add_argument('--bdd_dir', type=str, default="")
    parser.add_argument('--eval', type=str, default="")
    parser.add_argument('--infer', type=str, default="")
    parser.add_argument('--im_save_dir', type=str, default="")
    # additive knobs for smoke/debug runs
    parser.add_argument('--max_iters_per_epoch', type=int, default=None)
    parser.add_argument('--eval_everyn', type=int, default=None)
    parser.add_argument('--log_everyn', type=int, default=10,
                        help='host-sync/log metrics every N iters')
    parser.add_argument('--log_dir', type=str, default='runs')
    parser.add_argument('--crop_height', type=int, default=320)
    parser.add_argument('--crop_width', type=int, default=640)
    parser.add_argument('--structure', nargs=4, type=int, default=[3, 4, 6, 3],
                        help='backbone block counts (debug/smoke)')
    parser.add_argument('--bn_groups', type=int, default=1,
                        help='reference-BN mode: compute train-time BN stats '
                             'per batch/N group, emulating nn.DataParallel '
                             'over N GPUs (4 = the reference rig); 1 = '
                             'global-batch stats (default)')
    return parser


def main(argv=None) -> float:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core.cache import enable_compilation_cache
    from ..data.loaders import (
        BDDValDataset, DeviceAugment, FreiburgThermalDataset,
        FreiburgThermalTestDataset, MFNetDataset, MFNetTrainDataset,
        batch_iterator, get_test_paths, get_test_stamps)
    from ..eval.validate import (inference, validate_model, validate_model_bdd,
                                 validate_model_mfnet)
    from ..io.checkpoint import (best_iou_tracker, load_checkpoint,
                                 resolve_auto_resume, restore_partial,
                                 restore_renamed, save_checkpoint)
    from ..io.logging import AverageMeter, RunLogger
    from ..models import ConfSegnet, ResNeXtSeg
    from ..models.registry import build_network
    from ..train.adversarial import (AdversarialConfig, AdversarialTrainState,
                                     PhaseMachine, make_adversarial_steps,
                                     make_phase_optimizers)
    from ..train.optim import step_lr
    from ..train.state import init_model
    from ..parallel.mesh import (create_mesh, maybe_initialize_distributed,
                                 mesh_for_batch, replicate, shard_batch)

    # multi-host: join the jax.distributed world BEFORE any device
    # use (VERDICT r1: only cli/main.py initialized multi-host; on a
    # multi-host slice the other trainers ran per-host islands)
    maybe_initialize_distributed()
    enable_compilation_cache()
    logger = RunLogger("hotnet", entity="team-awesome", log_dir=opt.log_dir)
    logger.update_config(opt)

    if opt.eval != "":
        print('##############EVALUATING MODE##############')
    if opt.infer != "":
        print('##############INFERENCE MODE##############')

    dtype = jnp.bfloat16
    model = ConfSegnet(
        disc_arch=opt.discarch, num_critics=opt.num_critics,
        feedback_seg=opt.feedback_seg, no_conf=opt.no_conf,
        modalities=opt.modalities, input_adapter=opt.train_input_adapter,
        cert_branch=opt.cert_branch, arch=opt.arch,
        late_fusion=opt.late_fusion, structure=tuple(opt.structure),
        bn_groups=opt.bn_groups, dtype=dtype, remat=True)

    h, w = opt.crop_height, opt.crop_width
    n_rgb = 3 if "rgb" in opt.modalities else 0
    n_ir = 1 if "ir" in opt.modalities else 0
    example_in = []
    if n_rgb:
        example_in.append(jnp.zeros((1, h, w, 3)))
    if n_ir:
        example_in.append(jnp.zeros((1, h, w, 1)))

    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     example_in, example_in,
                                     init_kwargs={"train": True})

    if opt.pretraining:
        # pretrained supervised segnet into the trgb_segnet subtree
        # (conf_segnet.py:80-81, initModelRenamed 'module.' -> '')
        saved = load_checkpoint(opt.pretraining_path)
        sd = saved.get("state_dict", saved)
        params = dict(params)
        params["trgb_segnet"] = restore_partial(
            params["trgb_segnet"], sd.get("params", sd))

    # frozen night-supervision teacher (:210-229)
    teacher = teacher_vars = None
    cfg_night_sup = bool(opt.night_supervision_model)
    if cfg_night_sup:
        ns_mod = opt.night_supervision_model_modalities or "ir"
        ns_in = (3 if "rgb" in ns_mod else 0) + (1 if "ir" in ns_mod else 0)
        if opt.arch == "custom":
            teacher = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=ns_in,
                                 cert_branch=opt.cert_branch, dtype=dtype)
        else:
            teacher = build_network("resnet50", in_channels=ns_in,
                                    late_fusion=ns_in >= 4, dtype=dtype)
        t_in = [jnp.zeros((1, h, w, c)) for c in ([3, 1] if ns_in == 4 else [ns_in])]
        t_params, t_bs = init_model(teacher, jax.random.PRNGKey(1), *t_in)
        saved = load_checkpoint(opt.night_supervision_model)
        sd = saved.get("state_dict", saved)
        t_params = restore_renamed(t_params, sd.get("params", sd),
                                   "trgb_segnet/", "")
        teacher_vars = {"params": t_params}
        if t_bs is not None:
            if "batch_stats" in sd:
                t_bs = restore_renamed(t_bs, sd["batch_stats"], "trgb_segnet/", "")
            teacher_vars["batch_stats"] = t_bs

    cfg = AdversarialConfig(
        adv_loss=opt.adv_loss, conf_weight=opt.conf_weight,
        critic_weights=tuple(opt.critic_weights), multidir=opt.multidir,
        cert_branch=opt.cert_branch, weight_ir_sup=opt.weight_ir_sup,
        night_supervision=cfg_night_sup, modalities=opt.modalities,
        moddrop=opt.moddrop, irscale=opt.irscale,
        smartirscale=opt.smartirscale,
        night_sup_modalities=opt.night_supervision_model_modalities or "ir",
        iter_seg_phase=opt.iter_seg_phase,
        iter_critic_phase=opt.iter_critic_phase,
        iter_initial_critic_phase=opt.iter_initial_critic_phase)

    # n_epochs doubles when training both nets (:257-259)
    n_epochs, half_every = opt.n_epochs, opt.half_lr_every_epoch
    if not opt.no_conf:
        n_epochs *= 2
        half_every *= 2

    best_track = best_iou_tracker()
    start_epoch = opt.epoch
    opt.resume = resolve_auto_resume(opt.resume, opt.checkpointname)
    if opt.resume:
        saved = load_checkpoint(opt.resume)
        params = restore_partial(params, saved["state_dict"]["params"])
        batch_stats = restore_partial(batch_stats,
                                      saved["state_dict"]["batch_stats"])
        start_epoch = int(saved.get("epoch", 0))
        best_track.state["best"] = float(saved.get("best_iou", 0.0))

    # the eval path runs the bare segnet (reference passes
    # conf_segnet_model.module.trgb_segnet, :331)
    if opt.arch == "custom":
        segnet = ResNeXtSeg(
            structure=tuple(opt.structure),
            input_channels=model.num_input_channels,
            cert_branch=opt.cert_branch, late_fusion=opt.late_fusion,
            dtype=dtype)
    else:
        segnet = build_network(
            "resnet50", in_channels=model.num_input_channels,
            late_fusion=opt.late_fusion, dtype=dtype)

    def fresh_variables(live_state=None):
        """Segnet-subtree variables for eval.

        With ``live_state`` (an AdversarialTrainState) the *current trained*
        parameters are used — the reference evaluates
        ``conf_segnet_model.module.trgb_segnet`` live (:594-654). Without it
        (the pre-training --eval/--infer dispatch) the freshly
        restored/initialized ``params`` are used.
        """
        if live_state is not None:
            p = jax.device_get(live_state.params)
            bs = (jax.device_get(live_state.batch_stats)
                  if live_state.batch_stats is not None else None)
        else:
            p, bs = params, batch_stats
        v = {"params": p["trgb_segnet"]}
        if bs is not None and "trgb_segnet" in bs:
            v["batch_stats"] = bs["trgb_segnet"]
        return v

    def iter_ds(ds):
        # threaded decode-ahead: PNG decode overlaps the device forward
        # (the reference's DataLoader(num_workers) analog for eval)
        from ..data.loaders import prefetch_items

        return prefetch_items(ds)

    # eval rides every device: batch dim sharded over a pure-data mesh
    # (bit-identical IoUs — eval/validate._forward_factory). The reference
    # evals frame-at-a-time regardless of its GPU count.
    eval_mesh = create_mesh() if jax.device_count() > 1 else None

    # --infer dispatch (:311-324)
    if opt.infer != "":
        from ..data.loaders import FreiburgInferDataset

        print('Starting inference on: %s....' % opt.infer)
        ds = FreiburgInferDataset(opt.infer)
        inference(segnet, fresh_variables(), iter_ds(ds), opt.modalities,
                  save_dir=opt.im_save_dir, mesh=eval_mesh)
        print('Inference successfull !!!!')
        return 0.0

    def make_fr_loader(roots):
        return FreiburgThermalTestDataset(*get_test_paths(roots))

    # --eval dispatch (:326-359)
    if opt.eval != "":
        print('Starting evaluation on: %s....' % opt.eval)
        night = "night" in opt.eval
        if "FR" in opt.eval:
            roots = ([opt.testroot_night, opt.testroot_fence] if night
                     else [opt.testroot_day])
            roots = [r for r in roots if r]
            ds = make_fr_loader(roots)
            ious = validate_model(segnet, fresh_variables(), iter_ds(ds),
                                  opt.modalities,
                                  mode="night" if night else "day",
                                  logger=logger, save_dir=opt.im_save_dir,
                                  mesh=eval_mesh)
        elif "MF" in opt.eval:
            ds = MFNetDataset(opt.testroot_mfnet,
                              split="night" if night else "day")
            ious = validate_model_mfnet(segnet, fresh_variables(), iter_ds(ds),
                                        opt.modalities,
                                        mode="night" if night else "day",
                                        logger=logger,
                                        save_dir=opt.im_save_dir,
                                        mesh=eval_mesh)
        elif "BDD" in opt.eval:
            ds = BDDValDataset(opt.bdd_dir)
            ious = validate_model_bdd(segnet, fresh_variables(), iter_ds(ds),
                                      logger=logger, save_dir=opt.im_save_dir,
                                      mesh=eval_mesh)
        else:
            print('Eval dataset %s not known... exiting' % opt.eval)
            return 0.0
        print(ious)
        print(np.nanmean(ious))
        print('Eval successfull!')
        return float(np.nanmean(ious))

    # ----- training -----
    if opt.trainsetname == 'MF':
        train_ds = MFNetTrainDataset(opt.dataroot)
        crop_hw = (384, 384)
        augment = DeviceAugment(crop_hw=crop_hw, mfnet=True)
    elif opt.trainsetname == 'FR':
        from ..data.loaders import open_freiburg_train

        roots = [r for r in (opt.testroot_night, opt.testroot_day) if r]
        test_stamps = get_test_stamps(get_test_paths(roots)[2]) if roots else None
        # dataroot may be a decode-free raw pack (cli/pack_frames.py --train)
        train_ds = open_freiburg_train(opt.dataroot, split='train',
                                       test_stamps=test_stamps)
        crop_hw = (h, w)
        augment = DeviceAugment(crop_hw=crop_hw)
    else:
        print('Dataset %s not known ... ' % opt.trainsetname)
        return 0.0

    steps_per_epoch = max(len(train_ds) // opt.batch_size, 1)
    if opt.max_iters_per_epoch:
        steps_per_epoch = min(steps_per_epoch, opt.max_iters_per_epoch)
    # StepLR(step_size=half_every, gamma=.5) over epochs (:270-274)
    lr_schedule = step_lr(opt.lr, step_size=half_every, gamma=0.5,
                          steps_per_epoch=steps_per_epoch)
    seg_tx, critic_tx = make_phase_optimizers(lr_schedule)
    state = AdversarialTrainState.create(params, batch_stats, seg_tx, critic_tx)

    mesh = mesh_for_batch(opt.batch_size)
    state = replicate(mesh, state)
    seg_step, critic_step = make_adversarial_steps(model, cfg, teacher,
                                                   teacher_vars)
    pm = PhaseMachine(cfg, no_conf=opt.no_conf)
    eval_everyn = opt.eval_everyn or (2 if opt.trainsetname == 'FR' else 20)
    log_everyn = max(opt.log_everyn, 1)

    # --vis: the reference pops cv2 windows per iteration with the day/night
    # predictions + per-critic verdict dots (:493-523); headless equivalent
    # renders the same panels to <log_dir>/vis/ at every log point.
    vis_forward = None
    if opt.vis:
        from ..utils.vis import (color_code_labels, draw_critic_labels,
                                 save_image, vis_depth)

        vis_dir = os.path.join(opt.log_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)

        @jax.jit
        def vis_forward(state, batch):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            ins_day = [batch[k] for k in ("rgb_day", "ir_day")
                       if k.split("_")[0] in opt.modalities]
            ins_night = [batch[k] for k in ("rgb_night", "ir_night")
                         if k.split("_")[0] in opt.modalities]
            out = model.apply(variables, ins_day, ins_night, train=False)
            res = {
                "pred_day": jnp.argmax(out["pred_label_a"], -1)[0],
                "pred_night": jnp.argmax(out["pred_label_b"], -1)[0],
            }
            for side in ("a", "b"):
                if f"critics_{side}" in out:
                    res[f"verdicts_{side}"] = jnp.stack(
                        [jnp.mean(c) > 0.5 for c in out[f"critics_{side}"]])
            if opt.cert_branch and out.get("cert_a") is not None:
                res["cert_day"] = out["cert_a"][0, ..., 0]
            return res

        def render_vis(it, state, batch):
            v = jax.device_get(vis_forward(state, batch))
            pd = color_code_labels(v["pred_day"])
            pn = color_code_labels(v["pred_night"])
            if "verdicts_a" in v:  # visSegDisc-style dots
                pd = draw_critic_labels(pd, v["verdicts_a"].tolist())
                pn = draw_critic_labels(pn, v["verdicts_b"].tolist())
            save_image(os.path.join(vis_dir, f"{it:07d}_label_day.png"), pd)
            save_image(os.path.join(vis_dir, f"{it:07d}_label_night.png"), pn)
            if "rgb" in opt.modalities:
                save_image(os.path.join(vis_dir, f"{it:07d}_rgb_day.png"),
                           np.asarray(batch["rgb_day"])[0] * 0.5 + 0.5)
            if "ir" in opt.modalities:
                save_image(os.path.join(vis_dir, f"{it:07d}_ir_day.png"),
                           vis_depth(np.asarray(batch["ir_day"])[0]))
            if "cert_day" in v:
                save_image(os.path.join(vis_dir, f"{it:07d}_cert_day.png"),
                           vis_depth(v["cert_day"]))

    meters = {k: AverageMeter() for k in
              ("total_phase1", "total_phase2", "seg", "conf", "critic")}

    rng = jax.random.PRNGKey(42)
    for epoch in range(start_epoch, n_epochs):
        for i, raw in enumerate(batch_iterator(train_ds, opt.batch_size,
                                               shuffle=True, seed=epoch)):
            if opt.max_iters_per_epoch and i >= opt.max_iters_per_epoch:
                break
            rng, k_aug, k_step = jax.random.split(rng, 3)
            batch = augment(k_aug, raw)
            batch = shard_batch(mesh, batch)
            phase = pm.tick()
            # metrics stay on device between log points; a float()/log every
            # iteration would force a host sync per step and serialize the
            # pipeline (reference prints per-iter, :548-560 — we log every
            # --log_everyn and keep the same keys/averages).
            if phase == "train_seg":
                state, m = seg_step(state, batch, k_step)
            else:
                state, m = critic_step(state, batch)
            if (i % log_everyn) == 0 or i == steps_per_epoch - 1:
                mh = jax.device_get(m)
                if phase == "train_seg":
                    meters["total_phase1"].update(float(mh["total_loss"]))
                    meters["seg"].update(float(mh["seg_loss"]))
                    meters["conf"].update(float(mh["conf_loss"]))
                    logger.log({"epoch": epoch,
                                "total_loss_phase1": meters["total_phase1"].avg,
                                "seg_loss": meters["seg"].avg,
                                "conf_loss": float(mh["conf_loss"])})
                else:
                    meters["total_phase2"].update(float(mh["total_loss"]))
                    meters["critic"].update(float(mh["critic_loss"]))
                    logger.log({"epoch": epoch,
                                "total_loss_phase2": meters["total_phase2"].avg,
                                "critic_loss": meters["critic"].avg})
                print("Current loss: %f " % (
                    meters["total_phase1" if phase == "train_seg"
                           else "total_phase2"].avg))
                if vis_forward is not None:
                    render_vis(int(state.step), state, batch)

        if (epoch % eval_everyn) == 0 and opt.testroot_night and opt.testroot_day:
            v = fresh_variables(state)
            ious_night = validate_model(
                segnet, v, iter_ds(make_fr_loader(
                    [r for r in (opt.testroot_night, opt.testroot_fence) if r])),
                opt.modalities, mode="night", logger=logger, mesh=eval_mesh)
            ious_day = validate_model(
                segnet, v, iter_ds(make_fr_loader([opt.testroot_day])),
                opt.modalities, mode="day", logger=logger, mesh=eval_mesh)
            ious_combined = (ious_day + ious_night) / 2
            iou_mean = float(np.nanmean(ious_combined))
            logger.log({"combined_Test mean IoU": iou_mean})
            is_best = best_track(iou_mean)
            host = jax.device_get({"params": state.params,
                                   "batch_stats": state.batch_stats})
            save_checkpoint({"epoch": epoch + 1, "state_dict": host,
                             "best_iou": best_track.state["best"]},
                            opt.checkpointname, is_best=is_best, logger=logger)
    logger.finish()
    return best_track.state["best"]



if __name__ == "__main__":
    main()
