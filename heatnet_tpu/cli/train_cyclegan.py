"""CycleGAN training CLI — ``models/cyclegan/train.py`` flag surface.

Reference flags (:22-36): --epoch --n_epochs --batchSize --dataroot --lr
--decay_epoch --size --input_nc --output_nc --cuda --n_cpu --n_classes.
Per-epoch checkpoints of all five nets (:315-320).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('--epoch', type=int, default=0)
    p.add_argument('--n_epochs', type=int, default=200)
    p.add_argument('--batchSize', type=int, default=2)
    p.add_argument('--dataroot', type=str, default='datasets/thermal/KAIST/')
    p.add_argument('--lr', type=float, default=0.0002)
    p.add_argument('--decay_epoch', type=int, default=100)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--input_nc', type=int, default=1)
    p.add_argument('--output_nc', type=int, default=1)
    p.add_argument('--cuda', action='store_true', help='parity no-op')
    p.add_argument('--n_cpu', type=int, default=8)
    p.add_argument('--n_classes', type=int, default=12)
    # additive smoke/debug knobs
    p.add_argument('--max_iters_per_epoch', type=int, default=None)
    p.add_argument('--n_residual_blocks', type=int, default=9)
    p.add_argument('--seg_structure', nargs=4, type=int, default=[3, 4, 6, 3])
    p.add_argument('--checkpoint_dir', type=str, default='cyclegan_ckpts')
    p.add_argument('--log_dir', type=str, default='runs')
    return p


def main(argv=None) -> float:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..core.cache import enable_compilation_cache
    from ..parallel.mesh import maybe_initialize_distributed
    from ..data.loaders import KAISTCycleGANDataset, batch_iterator
    from ..io.checkpoint import save_checkpoint
    from ..io.logging import AverageMeter, RunLogger
    from ..models import Discriminator, Generator, ResNeXtSeg
    from ..train.cyclegan import (CycleGANState, DeviceReplayBuffer,
                                  make_cyclegan_steps)
    from ..train.optim import lambda_linear_decay, maybe_flatten

    # multi-host: join the jax.distributed world BEFORE any device
    # use (VERDICT r1: only cli/main.py initialized multi-host; on a
    # multi-host slice the other trainers ran per-host islands)
    maybe_initialize_distributed()
    enable_compilation_cache()
    logger = RunLogger("cyclegan", log_dir=opt.log_dir)
    logger.update_config(opt)

    gen_a2b = Generator(output_nc=opt.output_nc,
                        n_residual_blocks=opt.n_residual_blocks)
    gen_b2a = Generator(output_nc=opt.input_nc,
                        n_residual_blocks=opt.n_residual_blocks)
    disc_a, disc_b = Discriminator(), Discriminator()
    # joint segmentation net: the reference's broken ResNeXt import is
    # replaced by the real trgb backbone (SURVEY §7 known defects)
    seg_net = ResNeXtSeg(structure=tuple(opt.seg_structure),
                         input_channels=opt.input_nc, classes=opt.n_classes)

    ds = KAISTCycleGANDataset(opt.dataroot)
    dummy = jnp.zeros((opt.batchSize, opt.size, opt.size, opt.input_nc))

    key = jax.random.PRNGKey(0)
    g_params = {
        "netG_A2B": jax.jit(gen_a2b.init)({"params": key}, dummy)["params"],
        "netG_B2A": jax.jit(gen_b2a.init)({"params": key}, dummy)["params"],
    }
    seg_vars = jax.jit(lambda k, x: seg_net.init({"params": k}, x, None,
                                                 train=True))(key, dummy)
    g_params["netSeg"] = seg_vars["params"]
    d_a_params = jax.jit(disc_a.init)({"params": key}, dummy, None)["params"]
    d_b_params = jax.jit(disc_b.init)({"params": key}, dummy, None)["params"]

    steps_per_epoch = max(len(ds) // opt.batchSize, 1)
    if opt.max_iters_per_epoch:
        steps_per_epoch = min(steps_per_epoch, opt.max_iters_per_epoch)
    sched = lambda_linear_decay(opt.n_epochs, opt.epoch, opt.decay_epoch,
                                opt.lr, steps_per_epoch)
    adam = lambda: maybe_flatten(optax.adam(sched, b1=0.5, b2=0.999))
    state = CycleGANState.create(g_params, seg_vars.get("batch_stats"),
                                 d_a_params, d_b_params, adam(), adam())

    g_step, d_a_step, d_b_step = make_cyclegan_steps(
        gen_a2b, gen_b2a, disc_a, disc_b, seg_net)
    # device-resident replay buffers: the host variant costs a device_get
    # (one relay round-trip) per step (train/cyclegan.DeviceReplayBuffer);
    # shapes come from the first generator output (the loader's frame size)
    buf_a = buf_b = None
    replay = jax.jit(lambda ba, bb, fa, fb, k: (
        *ba.push_and_pop(fa, jax.random.fold_in(k, 0)),
        *bb.push_and_pop(fb, jax.random.fold_in(k, 1))))
    rng = jax.random.PRNGKey(opt.epoch)

    meters = {k: AverageMeter() for k in ("loss_G", "loss_D")}
    os.makedirs(opt.checkpoint_dir, exist_ok=True)
    last_g = 0.0
    for epoch in range(opt.epoch, opt.n_epochs):
        for i, batch in enumerate(batch_iterator(ds, opt.batchSize, seed=epoch)):
            if opt.max_iters_per_epoch and i >= opt.max_iters_per_epoch:
                break
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, fake_a, fake_b, metrics = g_step(state, jb)
            if buf_a is None:
                buf_a = DeviceReplayBuffer.create(50, fake_a.shape[1:])
                buf_b = DeviceReplayBuffer.create(50, fake_b.shape[1:])
            rng, k = jax.random.split(rng)
            buf_a, fa, buf_b, fb = replay(buf_a, buf_b, fake_a, fake_b, k)
            state, loss_da = d_a_step(state, jb["A"], fa)
            state, loss_db = d_b_step(state, jb["B"], fb)
            meters["loss_G"].update(float(metrics["loss_G"]))
            meters["loss_D"].update(float(loss_da) + float(loss_db))
            last_g = float(metrics["loss_G"])
            logger.log({"epoch": epoch,
                        **{k: float(v) for k, v in metrics.items()},
                        "loss_D": float(loss_da) + float(loss_db)})

        host = jax.device_get({
            "netG_A2B": state.g_params["netG_A2B"],
            "netG_B2A": state.g_params["netG_B2A"],
            "netD_A": state.d_a_params,
            "netD_B": state.d_b_params,
            "netSeg": {"params": state.g_params["netSeg"],
                       "batch_stats": state.seg_batch_stats},
        })
        for name in ("netG_A2B", "netG_B2A", "netD_A", "netD_B", "netSeg"):
            save_checkpoint(host[name], os.path.join(opt.checkpoint_dir, name))

    logger.finish()
    return last_g


if __name__ == "__main__":
    main()
