"""Plain supervised RGB+IR trainer — ``train_trgb_segnet_plain.py`` surface.

Reference (:30-133): early-fusion RGB+IR segnet, CE on day labels only,
Adam(0.5, 0.999) + CycleGAN LambdaLR decay, per-epoch checkpoint.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('--epoch', type=int, default=0)
    p.add_argument('--n_epochs', type=int, default=200)
    p.add_argument('--batchSize', type=int, default=2, help='parity alias')
    p.add_argument('--dataroot', type=str, required=True)
    p.add_argument('--lr', type=float, default=0.0002)
    p.add_argument('--decay_epoch', type=int, default=100)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--input_nc', type=int, default=1)
    p.add_argument('--output_nc', type=int, default=1)
    p.add_argument('--cuda', action='store_true', help='parity no-op')
    p.add_argument('--n_cpu', type=int, default=8)
    p.add_argument('--batch_size', type=int, default=10)
    # additive knobs
    p.add_argument('--structure', nargs=4, type=int, default=[3, 4, 6, 3])
    p.add_argument('--max_iters_per_epoch', type=int, default=None)
    p.add_argument('--resume_partial', type=str, default='',
                   help='checkpoint for initModelPartial-style warm start')
    p.add_argument('--checkpointname', type=str, default='trgb_segnet')
    p.add_argument('--log_dir', type=str, default='runs')
    return p


def main(argv=None) -> float:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..core.cache import enable_compilation_cache
    from ..data.loaders import DeviceAugment, batch_iterator, open_freiburg_train
    from ..io.checkpoint import load_checkpoint, restore_partial, save_checkpoint
    from ..io.logging import AverageMeter, RunLogger
    from ..models import ResNeXtSeg
    from ..parallel.mesh import maybe_initialize_distributed, mesh_for_batch, replicate, shard_batch
    from ..train.optim import lambda_linear_decay, maybe_flatten
    from ..train.state import TrainState, init_model
    from ..train.supervised import cross_entropy_ignore

    # multi-host: join the jax.distributed world BEFORE any device
    # use (VERDICT r1: only cli/main.py initialized multi-host; on a
    # multi-host slice the other trainers ran per-host islands)
    maybe_initialize_distributed()
    enable_compilation_cache()
    logger = RunLogger("HotNetConf", log_dir=opt.log_dir)
    logger.update_config(opt)

    model = ResNeXtSeg(structure=tuple(opt.structure), input_channels=4,
                       dtype=jnp.bfloat16, remat=True)
    ds = open_freiburg_train(opt.dataroot, split="train")
    augment = DeviceAugment(crop_hw=(320, 640))

    rgb = jnp.zeros((1, 320, 640, 3))
    ir = jnp.zeros((1, 320, 640, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), rgb, ir,
                                     init_kwargs={"train": True})
    if opt.resume_partial:
        saved = load_checkpoint(opt.resume_partial)
        sd = saved.get("state_dict", saved)
        params = restore_partial(params, sd.get("params", sd))

    steps_per_epoch = max(len(ds) // opt.batch_size, 1)
    if opt.max_iters_per_epoch:
        steps_per_epoch = min(steps_per_epoch, opt.max_iters_per_epoch)
    sched = lambda_linear_decay(opt.n_epochs, opt.epoch, opt.decay_epoch,
                                opt.lr, steps_per_epoch)
    state = TrainState.create(model.apply, params, batch_stats,
                              maybe_flatten(
                                  optax.adam(sched, b1=0.5, b2=0.999)))

    mesh = mesh_for_batch(opt.batch_size)
    state = replicate(mesh, state)

    def loss_fn(p, bs, batch):
        variables = {"params": p, "batch_stats": bs}
        (seg, _, _), new_vars = model.apply(
            variables, batch["rgb_day"], batch["ir_day"], train=True,
            mutable=["batch_stats"])
        return (cross_entropy_ignore(seg, batch["label_day"], ignore_index=-1),
                new_vars["batch_stats"])

    @jax.jit
    def train_step(state, batch):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, new_bs), loss

    meter = AverageMeter()
    rng = jax.random.PRNGKey(0)
    for epoch in range(opt.epoch, opt.n_epochs):
        for i, raw in enumerate(batch_iterator(ds, opt.batch_size, seed=epoch)):
            if opt.max_iters_per_epoch and i >= opt.max_iters_per_epoch:
                break
            rng, k = jax.random.split(rng)
            batch = shard_batch(mesh, augment(k, raw))
            state, loss = train_step(state, batch)
            meter.update(float(loss))
            print("Current loss: %f " % meter.avg)
            logger.log({"epoch": epoch, "loss": meter.avg})
        host = jax.device_get({"params": state.params,
                               "batch_stats": state.batch_stats})
        save_checkpoint({"epoch": epoch + 1, "state_dict": host},
                        opt.checkpointname)
    logger.finish()
    return meter.avg


if __name__ == "__main__":
    main()
