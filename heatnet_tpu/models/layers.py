"""Shared building blocks for the heatnet_tpu model zoo.

TPU-first conventions used by every model here:

- **NHWC layout** (TPU-native; the reference is NCHW torch).
- **Mixed precision**: ``dtype`` is the activation/compute dtype (bfloat16 by
  default at call sites), ``param_dtype`` stays float32.
- **BatchNorm** uses flax's running statistics; pass ``axis_name="data"``
  to make train-time statistics cross-replica (the reference's per-GPU BN of
  ``nn.DataParallel`` corresponds to ``axis_name=None``).
- Submodule attribute names mirror the reference torch module names
  (``bn1``, ``convs.conv1``, ``mod2_1`` ...) so the torch→jax checkpoint
  converter is a mechanical rename.

Reference blocks rebuilt here:
- ``ABN`` (BatchNorm+activation)      — models/segnet.py:20-41
- ``IdentityResidualBlock``           — models/segnet.py:44-124
- ``ASPP`` (+cert head)               — models/confusion_maximization/models/trgb_segnet.py:133-179
- ``fuseModule``                      — models/segnet.py:188-196
- ``initBlock``                       — models/confusion_maximization/models/trgb_segnet.py:231-240
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Norm + activation configuration ("norm_act" factory of helper/utils.py:33-46)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NormAct:
    """Configuration bundle for ABN blocks (replaces the torch partial)."""

    activation: str = "relu"  # relu | leaky_relu | elu | none
    leaky_slope: float = 0.01
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum (0.1)
    bn_epsilon: float = 1e-5
    axis_name: Optional[str] = None  # "data" → cross-replica batch stats
    # reference-BN mode: > 1 computes train-mode BN statistics per
    # contiguous batch group of N/bn_groups samples (nn.DataParallel's
    # per-GPU BN; 4 emulates the reference's 4-GPU split exactly — see
    # StatNamedBatchNorm). 1 = global-batch stats (default).
    bn_groups: int = 1

    def act(self, x: jax.Array) -> jax.Array:
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=self.leaky_slope)
        if self.activation == "elu":
            return nn.elu(x)
        if self.activation == "none":
            return x
        raise ValueError(f"unknown activation {self.activation}")


class StatNamedBatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` whose train-mode batch stats carry a checkpoint name.

    Under per-stage rematerialization the backward re-forward reruns every
    BN's mean/var reduce — a full HBM re-read of each conv output (the
    B=16 adversarial seg-step device trace attributes 172 ms to BN
    batch-stat reduces, tools/bench_train_step.py). Naming the per-channel
    stats ``"bn_stats"`` lets the stage remat run with
    ``jax.checkpoint_policies.save_only_these_names("bn_stats")``: the
    reduces run once and their (tiny, 2xC float32) results are saved,
    while the cheap fusible normalize/activation elementwise work still
    rematerializes. Identical math, params, and batch_stats layout to
    ``nn.BatchNorm`` — the body is flax 0.12.3's, plus the two
    ``checkpoint_name`` calls. It vendors flax private internals
    (``_canonicalize_axes``/``_compute_stats``/``_normalize``), so a flax
    upgrade past the pinned minor is caught deliberately by the version
    assertion below rather than as a trace-time TypeError in every model
    (ADVICE r2); the identity-parity leg of ``tests/test_models.py``
    guards behavioral drift.

    ``stats_groups > 1`` is the opt-in **reference-BN mode** (VERDICT r2
    item 5): normalization statistics are computed per contiguous batch
    group of ``N / stats_groups`` samples — exactly ``nn.DataParallel``'s
    per-GPU BN over ``batch/num_gpus`` chunks (scripts/main.py:120
    splits batch 30 over 4 GPUs) — and the running stats are updated
    from group 0 only, matching DataParallel's discard of non-master
    replica buffer updates (replicate() copies buffers each forward; only
    the device-0 module's in-place updates persist). Groups are formed by
    reshape, so the mode is device-layout independent: it reproduces
    reference BN dynamics on ANY mesh, including a single chip.
    Default 1 = global-batch stats (the documented intentional deviation,
    now optional).
    """

    stats_groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None, *,
                 mask=None, fused_act=None):
        import flax

        from flax.linen.normalization import (_canonicalize_axes,
                                              _compute_stats, _normalize)
        from jax.ad_checkpoint import checkpoint_name

        assert flax.__version__.startswith("0.12."), (
            "StatNamedBatchNorm vendors flax 0.12.x normalization "
            f"internals; found flax {flax.__version__} — re-validate "
            "_compute_stats/_normalize signatures before bumping this pin")

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (jnp.float32 if self.force_float32_reductions
                       else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stats_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stats_dtype),
                               feature_shape)

        grouped = (self.stats_groups > 1 and not use_running_average
                   and not self.is_initializing())
        if grouped:
            return self._grouped_train_call(
                x, reduction_axes, feature_axes, ra_mean, ra_var)

        # Lean fused BN+act (ops/lean_bn.py, HEATNET_BN_IMPL=lean): the
        # train-mode byte-minimal path — hand-shaped VJP whose residuals
        # are exactly the conv output + per-channel stats. Only valid for
        # the plain train path (global-batch stats over axis 0, no
        # cross-replica axis_name, no masking); callers opt in by passing
        # ``fused_act`` (ABN does when the env knob is set).
        # use_fast_variance/force_float32_reductions must be at their
        # defaults: lean_bn_act hard-codes fast-variance f32 stats and
        # drops mean/var cotangents, so non-default configs fall through
        # to the flax path instead of being silently overridden.
        if (fused_act is not None and not use_running_average
                and self.axis_name is None and mask is None
                and self.use_fast_variance and self.force_float32_reductions
                and feature_axes == (x.ndim - 1,)):
            from ..ops.lean_bn import lean_bn_act

            feat = tuple(feature_shape)
            scale = (self.param("scale", self.scale_init, feat,
                                self.param_dtype) if self.use_scale
                     else jnp.ones(feat, self.param_dtype))
            bias = (self.param("bias", self.bias_init, feat,
                               self.param_dtype) if self.use_bias
                    else jnp.zeros(feat, self.param_dtype))
            act_name, act_slope = fused_act
            a, mean, var = lean_bn_act(x, scale, bias, float(self.epsilon),
                                       act_name, float(act_slope))
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
            if self.dtype is not None:
                a = a.astype(self.dtype)
            return a

        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            mean, var = _compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")

            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        return _normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)

    def _grouped_train_call(self, x, reduction_axes, feature_axes,
                            ra_mean, ra_var):
        """Per-group train-mode path (reference-BN mode, see class doc).

        Statistics/normalization are per contiguous batch group; gradients
        flow through the per-group stats exactly as torch's per-replica
        batch_norm backward does. Parameter registration (scale/bias,
        names, shapes, init) mirrors flax ``_normalize`` so checkpoints
        and init are identical to the ungrouped path.
        """
        from flax.linen.normalization import _compute_stats
        from jax.ad_checkpoint import checkpoint_name

        g = self.stats_groups
        n = x.shape[0]
        if 0 in feature_axes:
            raise ValueError("stats_groups requires batch axis 0 to be a "
                             "reduction axis")
        if n % g != 0:
            raise ValueError(f"batch {n} not divisible by stats_groups {g}")
        xg = x.reshape((g, n // g) + x.shape[1:])
        red_g = tuple(a + 1 for a in reduction_axes)  # group axis kept
        mean_g, var_g = _compute_stats(
            xg, red_g, dtype=self.dtype, axis_name=None,
            axis_index_groups=None,
            use_fast_variance=self.use_fast_variance, mask=None,
            force_float32_reductions=self.force_float32_reductions)
        mean_g = checkpoint_name(mean_g, "bn_stats")  # (g, *feature_shape)
        var_g = checkpoint_name(var_g, "bn_stats")

        # DataParallel buffer semantics: only the master replica's (group
        # 0's) running-stat updates persist
        ra_mean.value = (self.momentum * ra_mean.value
                         + (1 - self.momentum) * mean_g[0])
        ra_var.value = (self.momentum * ra_var.value
                        + (1 - self.momentum) * var_g[0])

        # broadcast the per-group stats over the grouped view: shape
        # (g, 1, ..., *features*)
        stat_shape = [1] * xg.ndim
        stat_shape[0] = g
        for ax in feature_axes:
            stat_shape[ax + 1] = x.shape[ax]
        feature_shape = tuple(x.shape[ax] for ax in feature_axes)
        mean_b = mean_g.reshape(stat_shape)
        var_b = var_g.reshape(stat_shape)

        # manual _normalize (same math/param registration, grouped stats)
        stats_dtype = mean_g.dtype
        y = xg - mean_b
        mul = jax.lax.rsqrt(var_b + jnp.asarray(self.epsilon, stats_dtype))
        args = [x]
        if self.use_scale:
            scale = self.param("scale", self.scale_init, feature_shape,
                               self.param_dtype).reshape(
                [1] + stat_shape[1:])
            mul *= scale
            args.append(scale)
        y *= mul
        if self.use_bias:
            bias = self.param("bias", self.bias_init, feature_shape,
                              self.param_dtype).reshape(
                [1] + stat_shape[1:])
            y += bias
            args.append(bias)
        dtype = nn.dtypes.canonicalize_dtype(*args, dtype=self.dtype)
        return jnp.asarray(y, dtype).reshape(x.shape)


#: Remat policy for stage checkpointing: save only the named BN batch
#: stats so the backward re-forward skips every stat reduce (see
#: StatNamedBatchNorm). Memory cost: 2 float32 vectors per BN.
BN_STATS_SAVE_POLICY = jax.checkpoint_policies.save_only_these_names(
    "bn_stats")

#: Remat policy for the ``c`` stage mode (trgb_segnet.HEATNET_REMAT_STAGES):
#: additionally save every residual-block conv output
#: (IdentityResidualBlock names them "conv_out"). Backward then needs NO
#: conv recompute at all — BN backward gets its input (the conv output)
#: directly, and the weight-grad convs take BN outputs that recompute
#: elementwise from the saved conv outputs — so the stage re-forward
#: shrinks from a full second forward to a cheap normalize/act sweep.
#: Holds ~1/3 of the stage's "save everything" footprint (conv outputs
#: only, not post-act copies / residual sums).
CONV_SAVE_POLICY = jax.checkpoint_policies.save_only_these_names(
    "bn_stats", "conv_out")


class ABN(nn.Module):
    """Activated Batch Normalization: BN then activation (segnet.py:20-41)."""

    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 skip_act: bool = False) -> jax.Array:
        import os

        bn = StatNamedBatchNorm(
            use_running_average=not train,
            momentum=self.norm_act.bn_momentum,
            epsilon=self.norm_act.bn_epsilon,
            axis_name=self.norm_act.axis_name if train else None,
            stats_groups=self.norm_act.bn_groups,
            dtype=self.dtype,
            name="bn",
        )
        # HEATNET_BN_IMPL=lean: fused train-mode BN+act with the
        # byte-minimal hand-shaped VJP (ops/lean_bn.py). Falls back to the
        # flax path wherever the lean preconditions don't hold (eval,
        # cross-replica stats, bn_groups, skip_act).
        if (train and not skip_act
                and os.environ.get("HEATNET_BN_IMPL") == "lean"
                and self.norm_act.axis_name is None
                and self.norm_act.bn_groups == 1):
            return bn(x, fused_act=(self.norm_act.activation,
                                    self.norm_act.leaky_slope))
        x = bn(x)
        return x if skip_act else self.norm_act.act(x)


class GroupedConvDense(nn.Module):
    """Grouped conv: block-diagonal dense kernel below 16 channels/group,
    XLA's native grouped path at or above.

    TPU performance core. XLA maps ``feature_group_count=64`` convs onto the
    MXU with tiny per-group contractions; expanding the grouped kernel into
    a block-diagonal dense kernel wastes ``groups``x FLOPs on structural
    zeros but runs at dense MXU throughput. Which wins depends on channels
    per group AND total work volume — measured per grouped 3x3 conv,
    ResNeXt-50 trgb stages, bf16, v5e (tools/bench_grouped_conv.py):

    ========== ========= ================= ===================
    stage      ch/group  batch 8 dense/nat batch 128 dense/nat
    ========== ========= ================= ===================
    mod2       2         **2.08** / 5.56   **5.80** / 7.63
    mod3       4         **2.58** / 2.68   5.65 / **3.52**
    mod4 (d2)  8         **3.20** / 5.32   14.6 / **5.66**
    mod5 (d4)  16        11.25 / **4.66**  50.1 / **10.8**
    ========== ========= ================= ===================

    Native grouped needs enough spatial elements to fill MXU tiles per
    group; the dispatch rule fitting all measured points is
    ``native iff cpg >= 4 and N*H*W*cpg >= 4e5`` (trace-time, static
    shapes). All paths share the grouped parameter layout
    (kh, kw, cin/g, features), so torch checkpoints import unchanged and
    the choice never affects numerics beyond bf16 accumulation order.

    Third path, opt-in only: for the C==128 / dilation-1 / stride-1
    regime (ResNeXt mod2, cpg=2) a Pallas kernel doing the same
    block-diagonal matmuls with the image staged once in VMEM beats
    XLA's im2col dense lowering at the STAGE level by ~8% (5.40ms vs
    5.84ms per conv, batch 128, v5e) but LOSES end-to-end (353 vs 414
    fps on the flagship bench): the opaque custom call breaks XLA's
    fusion of the surrounding BN/activation elementwise work, costing
    more than the kernel saves. ``auto`` therefore never picks it;
    ``HEATNET_GC_IMPL=pallas`` forces it where applicable, and
    ops/pallas_grouped_conv.py records the full measurement story.
    ``HEATNET_GC_IMPL=dense|native`` force the XLA forms.
    """

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int = 0
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    min_cpg_native: int = 4       # below this the MXU can't win per group
    min_work_native: int = 400_000  # N*H*W*cpg crossover (see table)

    @nn.compact
    def __call__(self, x: jax.Array, epilogue=None,
                 train: bool = False) -> jax.Array:
        """``epilogue=(scale, bias, norm_act)`` fuses the following
        inference-mode BN affine + activation into this conv (set by
        IdentityResidualBlock under ``HEATNET_GC_IMPL=pallas_fused``):
        the pallas_fused path applies it inside the kernel's output
        write; every other path applies it as a manual per-channel
        affine right after the conv (numerically the same BN).

        ``train=True`` switches to the training dispatch rule: native
        grouped only at ``cpg >= 16`` (mod5) AND work volume
        ``N*H*W*cpg >= 1.5e6``. The inference table above does not
        transfer to training — the two gradient convs inherit the
        forward's formulation, and XLA gives the native-grouped forms
        batch-minor layouts whose transposes and following BN stat
        reduces dominate the step (B=16 adversarial seg-step trace:
        conv fusions 272 ms, BN stat reduces 172 ms, layout copies
        168 ms). Measured scan-differenced on v5e
        (tools/sweep_train_dispatch.py, 2026-08-19):

        ===================  ================  ===========
        training rule        adv seg B=16      vistas B=30
        ===================  ================  ===========
        inference rule       726.1 ms          815.8 ms
        native mod5 always   588.2 ms          **701.9 ms**
        all dense            **516.4 ms**      720.5 ms
        ===================  ================  ===========

        i.e. mod5's winner is work-dependent in training too: dense at
        the adv step's 819k volume, native at the Vistas step's 2.2M —
        the 1.5e6 threshold (HEATNET_GC_TRAIN_MIN_WORK) picks the
        winner at every measured point. Same grouped parameter layout
        either way; numerics unchanged beyond bf16 accumulation
        order."""
        import os

        g = self.groups
        n, h, w, cin = x.shape
        cin_pg, out_pg = cin // g, self.features // g
        kern = self.param(
            "kernel", self.kernel_init,
            (self.kernel, self.kernel, cin_pg, self.features), jnp.float32)
        pad = ((self.padding, self.padding),) * 2

        impl = os.environ.get("HEATNET_GC_IMPL", "auto")
        if os.environ.get("HEATNET_NATIVE_GROUPS", "0") == "1":
            impl = "native"  # back-compat alias
        interp = os.environ.get("HEATNET_PALLAS_INTERPRET") == "1"
        backend_ok = ((self.dtype == jnp.bfloat16
                       and jax.default_backend() == "tpu") or interp)
        quant = os.environ.get("HEATNET_QUANT", "") == "int8"

        def finish(y):
            if epilogue is None:
                return y
            s, b, na = epilogue
            return na.act(y * s.astype(y.dtype) + b.astype(y.dtype))

        pallas_fused_ok = (
            epilogue is not None and impl == "pallas_fused"
            and self.kernel == 3 and self.stride == 1 and self.dilation == 1
            and cin == self.features and cin % 128 == 0 and cin <= 256
            and not quant and backend_ok)
        if pallas_fused_ok:
            from heatnet_tpu.ops.pallas_grouped_conv import \
                grouped_conv3x3_fused
            s, b, na = epilogue
            return grouped_conv3x3_fused(
                x, kern, s, b, groups=g, dilation=self.dilation,
                dtype=self.dtype, act=na.activation, slope=na.leaky_slope,
                interpret=interp)

        pallas_ok = (
            self.kernel == 3 and self.stride == 1 and self.dilation == 1
            and cin == self.features and cin == 128
            and self.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and impl == "pallas")
        if pallas_ok:
            from heatnet_tpu.ops.pallas_grouped_conv import grouped_conv3x3
            return finish(grouped_conv3x3(x, kern, g, self.dilation,
                                          self.dtype))

        if isinstance(n, int):
            work = n * h * w * cin_pg
        else:
            # symbolic batch (jax.export artifacts): the volume rule can't
            # compare b-dependent work, so assume the throughput regime
            # (batch >= 8, the smallest measured point in the table)
            work = 8 * h * w * cin_pg
        # any unrecognized impl (incl. pallas_fused at the layers it does
        # not cover) dispatches like auto. The thresholds are trace-time
        # env-overridable (HEATNET_GC_MIN_CPG / HEATNET_GC_MIN_WORK) so
        # dispatch-rule sweeps don't need code edits.
        min_cpg = int(os.environ.get("HEATNET_GC_MIN_CPG",
                                     self.min_cpg_native))
        min_work = float(os.environ.get("HEATNET_GC_MIN_WORK",
                                        self.min_work_native))
        if train:
            # training rule (see docstring): dense except cpg >= 16 AND
            # work >= 1.5e6 — a train-specific work gate, NOT the
            # inference 4e5 one (ADVICE r2: the inference gate silently
            # applied in training; now explicit, measured, documented)
            min_cpg = int(os.environ.get("HEATNET_GC_TRAIN_MIN_CPG", 16))
            min_work = float(os.environ.get("HEATNET_GC_TRAIN_MIN_WORK",
                                            1.5e6))
        use_native = (impl == "native"
                      or (impl not in ("dense",)
                          and cin_pg >= min_cpg
                          and work >= min_work))
        if quant:
            # The quant scale variable must exist whenever int8 serving is
            # on — dispatch below is batch-dependent, and a model
            # calibrated at one batch size must restore/serve at any other
            # without a missing-collection error.
            scale_var = self.variable("quant", "x_scale",
                                      lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("quant"):
                scale_var.value = jnp.maximum(
                    scale_var.value,
                    jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0)
        # int8 serving quantizes ONLY the dense block-diag formulation.
        # Native grouped convs REGRESS under int8 on v5e (measured at the
        # flagship batch-128 shapes: mod3 80x241x256/g64 15.0 -> 23.2 ms,
        # mod4 40x121x512/g64/dil2 8.8 -> 11.9 ms — the tiny 4-8 channel
        # per-group contractions can't feed the MXU's int8 rate and the
        # int32 accumulator doubles the write bytes), and the dense-int8
        # alternative doesn't catch native-bf16 either (18.3 / 16.1 ms):
        # the ~2x MXU int8 rate doesn't pay for 16x/8x structural-zero
        # MACs. Dense block-diag convs (cpg < 4, e.g. mod2) DO win under
        # int8 (mod2 stage x1.21) — they are real 128x128 matmuls.
        # Batch-gated like Int8Conv: int8 is a throughput mode.
        quant = quant and not use_native and _int8_batch_ok(n)
        comp_dtype = jnp.float32 if quant else self.dtype
        if use_native:
            rhs, fgc = kern.astype(comp_dtype), g
        else:
            k5 = kern.astype(comp_dtype).reshape(
                self.kernel, self.kernel, cin_pg, g, out_pg)
            eye = jnp.eye(g, dtype=comp_dtype)
            rhs = jnp.einsum("hkcgo,Gg->hkGcgo", k5, eye).reshape(
                self.kernel, self.kernel, cin, self.features)
            fgc = 1

        if quant:
            # int8 serving path (see Int8Conv): per-output-channel weight
            # scales on the expanded kernel, static activation scale.
            w_amax = jnp.max(jnp.abs(rhs), axis=(0, 1, 2))
            w_scale = jnp.maximum(w_amax / 127.0, 1e-12)
            w_q = jnp.clip(jnp.round(rhs / w_scale), -127, 127).astype(jnp.int8)
            xf = x.astype(jnp.float32)

            def _int8(xf):
                x_scale = jnp.maximum(scale_var.value, 1e-12)
                x_q = jnp.clip(jnp.round(xf / x_scale),
                               -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    x_q, w_q,
                    window_strides=(self.stride, self.stride),
                    padding=pad,
                    rhs_dilation=(self.dilation, self.dilation),
                    feature_group_count=fgc,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return (y.astype(self.dtype)
                        * (x_scale * w_scale).astype(self.dtype))

            def _float(xf):
                # uncalibrated scale: serve the float conv (see Int8Conv)
                return jax.lax.conv_general_dilated(
                    xf.astype(self.dtype), rhs.astype(self.dtype),
                    window_strides=(self.stride, self.stride),
                    padding=pad,
                    rhs_dilation=(self.dilation, self.dilation),
                    feature_group_count=fgc,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            return finish(
                _calibrated_branch(scale_var.value, _int8, _float, xf))

        return finish(jax.lax.conv_general_dilated(
            x.astype(self.dtype), rhs,
            window_strides=(self.stride, self.stride),
            padding=pad,
            rhs_dilation=(self.dilation, self.dilation),
            feature_group_count=fgc,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))


def banded_dilated_conv(x, kern, dilation: int, dtype,
                        mode: str = "auto"):
    """Dilated 3x3 conv that skips the out-of-bounds taps XLA computes.

    At ASPP geometry (trgb_segnet.py:143-150: rates [12,24,36] on the
    1/8-res grid — 40x88 at the flagship 320x964 input) a dilated 3x3
    conv's +/-r row taps land in zero padding for most of the grid: at
    rate 36 on 40 rows, the side-row taps are valid for only 4 of 40
    output rows, yet XLA's dense conv runs all 9 taps everywhere — the
    device trace shows the three ASPP branch convs at ~95% MXU
    occupancy, 22.6 ms each (tools/profile_infer.py --trace, batch
    128), a third of it multiplying padding.

    This computes the SAME zero-padded conv (padding == dilation) as
    row/column bands: the center kernel row over the full grid, the
    side rows only on their (S - r)-row valid slices, summed in f32.
    Savings are real only when the valid band is small — the side-band
    input slices materialize (a conv operand cannot host a fused
    slice), costing ~3 extra passes over the band's bytes. An axis is
    decomposed iff the modeled MXU time saved exceeds the added HBM
    traffic with margin:

        saved  = (2/3) * (r/S) * FLOPs/PEAK        (2 of k side taps idle)
        extra  = 6 * ((S-r)/S) * bytes(x)/BW       (2 bands x slice r+w+read)
        ratio  = saved/extra
               = (2*K*cout*BW*r) / (9*esize*PEAK*(S-r)),  K = kh*kw

    independent of batch/other-axis size (so symbolic-batch exports
    dispatch identically). With margin 1.3 this decomposes rates 36 and
    24 along H at the flagship grid (ratios 9.6 and 1.6) and correctly
    rejects rate 12 (0.49) and all column decompositions — measured
    e2e on the chip: **414.6 -> 447.1 fps** (bench.py, batch 128, MFU
    0.66 -> 0.71). ``r >= S`` (side taps never valid) always
    decomposes: the side bands vanish and only the center row is
    computed at all.

    Numerics: each partial conv rounds to ``dtype`` (keeping operands
    and output the same dtype so the conv transpose rule applies under
    autodiff), the band sum runs in f32 and rounds once; deviation from
    the monolithic conv is at ``dtype`` rounding level (the forward-
    parity suite's tolerance covers it). int8 inputs accumulate/sum in
    int32 — exact, so the int8
    serving path is bit-identical banded or not (the esize halving and
    the int8 MXU-rate doubling cancel in ``ratio``, so the same
    geometries split). ``mode``: "auto" (cost model) | "off" |
    "force" (tests).
    """
    integer = jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)
    # band sums accumulate at >= f32; NEVER downcast (the f64 training-
    # dynamics parity proofs rely on f64 staying f64 end to end)
    accum = jnp.int32 if integer else jnp.promote_types(jnp.float32, dtype)
    bw, peak = 819e9, 197e12  # v5e HBM B/s, bf16 FLOP/s
    esize = jnp.dtype(dtype).itemsize
    margin = 1.3

    def should_split(r: int, size: int, k_elems: int, cout: int) -> bool:
        if mode == "off" or k_elems <= 1:
            return False
        if r >= size:
            return True
        if mode == "force":
            return True
        ratio = (2 * k_elems * cout * bw * r) / (
            9 * esize * peak * (size - r))
        return ratio >= margin

    r = dilation
    cout = kern.shape[-1]

    def conv_part(x, k, pad_h, pad_w):
        # partials stay in the compute dtype (a f32 preferred_element_type
        # on bf16 operands breaks the conv transpose rule under autodiff
        # — mixed-dtype transposed conv); the int path accumulates int32
        if not integer:
            x, k = x.astype(dtype), k.astype(dtype)
        return jax.lax.conv_general_dilated(
            x, k,
            window_strides=(1, 1),
            padding=((pad_h, pad_h), (pad_w, pad_w)),
            rhs_dilation=(r, r),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if integer else None)

    def rec(x, k):
        # always returns the accumulation dtype (f32 / int32); partial
        # conv outputs are upcast at the leaves so band sums don't round
        kh, kw = k.shape[0], k.shape[1]
        h, w = x.shape[1], x.shape[2]
        k_elems = kh * kw
        if kh == 3 and should_split(r, h, k_elems, cout):
            out = rec(x, k[1:2])
            if h > r:
                top = rec(x[:, : h - r], k[0:1])      # -> out rows [r, h)
                bot = rec(x[:, r:], k[2:3])           # -> out rows [0, h-r)
                out = (out
                       + jnp.pad(top, ((0, 0), (r, 0), (0, 0), (0, 0)))
                       + jnp.pad(bot, ((0, 0), (0, r), (0, 0), (0, 0))))
            return out
        if kw == 3 and should_split(r, w, k_elems, cout):
            out = rec(x, k[:, 1:2])
            if w > r:
                lft = rec(x[:, :, : w - r], k[:, 0:1])
                rgt = rec(x[:, :, r:], k[:, 2:3])
                out = (out
                       + jnp.pad(lft, ((0, 0), (0, 0), (r, 0), (0, 0)))
                       + jnp.pad(rgt, ((0, 0), (0, 0), (0, r), (0, 0))))
            return out
        return conv_part(x, k, r if kh == 3 else 0,
                         r if kw == 3 else 0).astype(accum)

    kh, kw = kern.shape[0], kern.shape[1]
    h, w = x.shape[1], x.shape[2]
    if not (should_split(r, h, kh * kw, cout)
            or should_split(r, w, kh * kw, cout)):
        # no decomposition: exactly the plain dilated conv
        return conv_part(x, kern, r, r)
    out = rec(x, kern)
    return out if integer else out.astype(dtype)


class DilatedConvBanded(nn.Module):
    """3x3 dilated conv with OOB-tap elimination (see banded_dilated_conv).

    Drop-in for ``nn.Conv`` at the ``padding == dilation`` (shape-
    preserving) call sites: same ``kernel`` param name/shape/init, so
    checkpoints, the torch importer and TP sharding are unaffected.
    ``HEATNET_BANDED_DILATED=off`` restores the monolithic conv.
    """

    features: int
    dilation: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        kern = self.param("kernel", self.kernel_init,
                          (3, 3, x.shape[-1], self.features), jnp.float32)
        mode = os.environ.get("HEATNET_BANDED_DILATED", "auto")
        out = banded_dilated_conv(x, kern, self.dilation, self.dtype,
                                  mode=mode)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


def _int8_batch_ok(n) -> bool:
    """int8 serving is a throughput mode — below the measured crossover
    batch it REGRESSES, so serve the float conv there even under
    ``HEATNET_QUANT=int8``. Measured on the flagship graph (v5e,
    320x960, ms/frame bf16 vs int8): batch 1: 27.5 vs 35.4, batch 2:
    17.1 vs 20.1, batch 4: 10.8 vs 10.9 (tie), batch 8: 6.89 vs 6.60,
    batch 128: 2.42 vs 2.00. At small batch every conv is launch/HBM-
    latency-bound — halving MAC cost buys nothing while the
    quantize/dequantize elementwise passes add pure overhead. Override
    with ``HEATNET_INT8_MIN_BATCH`` (default 8, the first measured win).
    Re-validated round 5 ON the subpixel-dispatch graphs
    (tools/bench_small_batch_crossover.py, scan-differenced device ms):
    batch 1 bf16+subpix 9.58 vs int8+subpix 15.47 (int8 still regresses
    below 8), batch 8 int8+lhs 45.57 vs bf16+lhs 47.11 (int8 wins at 8)
    — the gate stays 8 as a measured optimum of the four-corner sweep.
    A symbolic batch (jax.export artifacts) counts as the throughput
    regime, consistent with GroupedConvDense's dispatch assumption."""
    import os

    min_b = int(os.environ.get("HEATNET_INT8_MIN_BATCH", "8"))
    return not isinstance(n, int) or n >= min_b


def _calibrated_branch(scale, int8_fn, float_fn, xf):
    """Serve int8 iff the calibration scale is set, WITHOUT lax.cond when
    the answer is known at trace time.

    The uncalibrated guard (ADVICE r1: x_scale==0 straight from init must
    not clamp to 1e-12 and saturate) was first built as ``lax.cond``, but
    a cond is a fusion barrier: XLA materializes the operand — the conv's
    full activation, in f32, 2x the bf16 bytes — to HBM at EVERY conv,
    and the quantize can no longer fuse into the preceding BN/act chain.
    In the standard serving pattern variables are jit closure constants
    (bench.py, cli/inference.py, export), so the scale is concrete at
    trace time and the branch can be picked in Python for free. The cond
    remains only when variables are traced jit *arguments* (e.g. the
    calibration step itself).
    """
    pred = scale > 0
    if isinstance(pred, jax.core.Tracer):
        return jax.lax.cond(pred, int8_fn, float_fn, xf)
    return int8_fn(xf) if bool(pred) else float_fn(xf)


class Int8Conv(nn.Module):
    """Inference-only int8 conv: int8 x int8 -> int32 on the MXU.

    v5e's MXU runs int8 at ~2x the bf16 rate (measured 1.85x on
    dependency-chained 4096-matmuls through the relay: 170 TF/s bf16 vs
    ~310 TOP/s int8). Quantization scheme: symmetric per-output-channel
    weight scales (from the SAME f32 ``kernel`` param layout as nn.Conv,
    so bf16-trained checkpoints are served unchanged) and a static
    symmetric per-tensor activation scale from calibration. The
    pre-activation ResNeXt blocks feed BN outputs into every conv, so
    activations are near-zero-mean and symmetric quantization is the
    right shape.

    Activation scales are STATIC, from a one-time calibration pass: a
    dynamic per-tensor max would be an unfusable two-pass reduction per
    conv, and measured e2e it LOSES to bf16 (398.6 vs 417.8 fps at batch
    128) — every conv pays two extra HBM sweeps of its activation. With
    calibrated static scales the quantize is a pure elementwise op XLA
    fuses into the preceding BN/activation chain, and the int8
    activation write is half the bytes of bf16. Calibration: apply the
    model with ``mutable=["quant"]`` on representative batches; each
    Int8Conv records max(|x|)/127 into its ``quant/x_scale`` variable
    (running max across batches via ``calibrate_int8``).

    This is the opt-in serving mode behind ``HEATNET_QUANT=int8``
    (see :func:`conv`): NOT differentiable (round has no gradient) and
    NOT the headline bench path, which stays bf16 to preserve the
    mIoU-parity contract. bench.py reports its fps as the extra
    ``int8_fps`` key with the measured argmax agreement vs bf16.
    """

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()

    # Full-resolution layers stay bf16: their int32 accumulator buffer is
    # 2x the bf16 bytes (the stem OOMed batch 128 on v5e), they are
    # HBM-bound (3->64 ch) so int8 gains least there, and keeping the
    # first conv float is standard quantization practice. 100k pixels
    # admits 1/2-res (320*964/4 = 77k) and below.
    max_hw_int8: int = 100_000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        cin = x.shape[-1]
        kern = self.param(
            "kernel", self.kernel_init,
            (self.kernel, self.kernel, cin, self.features), jnp.float32)

        h, w = x.shape[1], x.shape[2]
        max_hw = int(os.environ.get("HEATNET_QUANT_MAX_HW",
                                    self.max_hw_int8))
        if isinstance(h, int) and h * w > max_hw:
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),) * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                out = out + bias.astype(self.dtype)
            return out

        w_amax = jnp.max(jnp.abs(kern), axis=(0, 1, 2))  # (features,)
        w_scale = jnp.maximum(w_amax / 127.0, 1e-12)
        w_q = jnp.clip(jnp.round(kern / w_scale), -127, 127).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        scale_var = self.variable("quant", "x_scale",
                                  lambda: jnp.zeros((), jnp.float32))
        if self.is_mutable_collection("quant"):
            # calibration pass: running max over calibration batches
            batch_scale = jnp.max(jnp.abs(xf)) / 127.0
            scale_var.value = jnp.maximum(scale_var.value, batch_scale)

        pad = ((self.padding, self.padding),) * 2
        # shape-preserving dilated 3x3 (the int8 ASPP branches): band-
        # decompose exactly like the bf16 path — int32 accumulation makes
        # it bit-identical to the monolithic int8 conv (see
        # banded_dilated_conv; the esize/int8-rate corrections cancel, so
        # the same geometries split)
        banded_ok = (self.kernel == 3 and self.dilation > 1
                     and self.padding == self.dilation and self.stride == 1)

        def _int8(xf):
            x_scale = jnp.maximum(scale_var.value, 1e-12)
            x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
            if banded_ok:
                y = banded_dilated_conv(x_q, w_q, self.dilation, self.dtype)
            else:
                y = jax.lax.conv_general_dilated(
                    x_q, w_q,
                    window_strides=(self.stride, self.stride),
                    padding=pad,
                    rhs_dilation=(self.dilation, self.dilation),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
            return y.astype(self.dtype) * (x_scale * w_scale).astype(self.dtype)

        def _float(xf):
            # uncalibrated x_scale==0 (e.g. variables straight from init
            # under HEATNET_QUANT=int8): quantizing would saturate every
            # activation to ±127 and silently emit garbage — serve the
            # float conv instead (ADVICE r1)
            if banded_ok:
                return banded_dilated_conv(xf, kern, self.dilation,
                                           self.dtype)
            return jax.lax.conv_general_dilated(
                xf.astype(self.dtype), kern.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=pad,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # scale registration/calibration above runs at ANY batch size;
        # only the serving dispatch is batch-gated (calibrate small,
        # serve large is the normal pattern)
        if _int8_batch_ok(x.shape[0]):
            out = _calibrated_branch(scale_var.value, _int8, _float, xf)
        else:
            out = _float(xf)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: Optional[int] = None,
    use_bias: bool = False,
    name: Optional[str] = None,
    dtype: Any = jnp.float32,
    kernel_init: Optional[Callable] = None,
):
    """2D conv with torch-style explicit integer padding (NHWC).

    Grouped convs route through :class:`GroupedConvDense`, which picks
    block-diagonal-dense vs native-grouped per layer by channels/group
    (see its measured table); ``HEATNET_NATIVE_GROUPS=1`` forces native.

    ``HEATNET_QUANT=int8`` routes dense (groups==1) convs through
    :class:`Int8Conv` — the opt-in inference-only serving mode. Grouped
    convs quantize inside :class:`GroupedConvDense` with the same scheme
    (per-output-channel weight scales survive the block-diagonal
    expansion: each expanded column's |max| equals its block's |max|).
    """
    import os

    if padding is None:
        # torch default in these models: padding = dilation for 3x3, 0 for 1x1
        padding = dilation if kernel == 3 else 0

    if groups == 1 and os.environ.get("HEATNET_QUANT", "") == "int8":
        return Int8Conv(
            features=features, kernel=kernel, stride=stride,
            dilation=dilation, padding=padding, use_bias=use_bias,
            dtype=dtype, name=name,
            kernel_init=kernel_init or nn.initializers.lecun_normal(),
        )

    if groups == 1 and kernel == 3 and dilation > 1 and padding == dilation:
        # shape-preserving dilated 3x3 (ASPP branches, dilated extractors):
        # skip the all-padding taps where profitable (cost model inside)
        return DilatedConvBanded(
            features=features, dilation=dilation, use_bias=use_bias,
            dtype=dtype, name=name,
            kernel_init=kernel_init or nn.initializers.lecun_normal(),
        )

    if groups > 1:
        return GroupedConvDense(
            features=features, kernel=kernel, stride=stride,
            dilation=dilation, groups=groups, padding=padding,
            dtype=dtype, name=name,
            kernel_init=kernel_init or nn.initializers.lecun_normal(),
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        name=name,
        kernel_init=kernel_init or nn.initializers.lecun_normal(),
    )


class SubpixelConvTranspose(nn.Module):
    """ConvTranspose2d(k=2s, s, p=s/2) as a SAME 3x3 conv + depth-to-space.

    Same math, same parameter (name ``kernel``, shape ``(k, k, cin,
    features)`` — checkpoints and torch imports are untouched), different
    lowering: XLA's TPU backend scalarizes small-channel lhs-dilated
    convolutions at batch 1 — the flagship's final 8x8-stride-4 deconv
    (13 channels) compiles to a kLoop fusion costing **13.76 ms of the
    23.1 ms batch-1 frame** (device trace, tools/bench_latency.py). The
    subpixel form computes, for each of the s*s output phases, the 2x2
    kernel taps that phase actually touches — laid into a 3x3 window over
    the input (offsets -1..+1, exactly the taps ``(t - (f - r)) % s == 0``
    with ``f = k-1-p``) — as ONE standard 3x3 conv to ``s*s*features``
    channels, then rearranges phases to space. A real MXU convolution at
    any batch.

    Derivation: out[s*q + r] = sum_d K[t_r(d)] x[q + w_r(d) - 1] where
    t_r(d) = ((f - r) mod s) + s*d and w_r(d) in {0,1,2} is the window
    slot of that tap's input offset. Verified element-exact against
    ``nn.ConvTranspose`` for both geometries used in the zoo
    ((8,4,2) and (4,2,1)) in tests/test_layers_subpixel.py.
    """

    features: int
    kernel: int
    stride: int
    padding: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        k, s, p = self.kernel, self.stride, self.padding
        assert k == 2 * s and 2 * p == s, (k, s, p)
        f = k - 1 - p
        cin = x.shape[-1]
        kern = self.param("kernel",
                          self.kernel_init or nn.initializers.lecun_normal(),
                          (k, k, cin, self.features), jnp.float32)

        # Batch-gated dispatch (both branches share the parameter): the
        # subpixel form spends 9*s^2 window taps against the transposed
        # conv's k^2 = 4s^2, i.e. 2.25x the MACs — a pure loss wherever
        # XLA already lowers the lhs-dilated conv onto the MXU. Measured
        # on the flagship (v5e): batch 128 throughput 447.7 -> 432.6 fps
        # under subpixel, while batch 1 latency 24.1 -> 9.49 ms (the
        # kLoop scalarization only strikes small batches). Subpixel
        # serves batches BELOW HEATNET_SUBPIXEL_MAX_BATCH (an EXCLUSIVE
        # threshold despite the name — batch 8 serves lhs-dilated under
        # the default of 8; round-4 ADVICE). The round-5 four-corner
        # sweep (tools/bench_small_batch_crossover.py, README table)
        # confirms 8 is the measured crossover: subpix wins through
        # batch 4 (22.3 vs 34.3 ms pipelined), lhs-dilated from batch 8
        # (47.1 vs 48.1 scan device ms).
        try:
            lhs_dilated = bool(
                x.shape[0] >= int(os.environ.get("HEATNET_SUBPIXEL_MAX_BATCH",
                                                 "8")))
        except Exception:
            # symbolic batch (jax.export polymorphic shapes): the gate is
            # inconclusive — serve the lhs-dilated form, correct at every
            # batch (subpixel is a small-batch latency optimization)
            lhs_dilated = True
        if lhs_dilated:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern.astype(self.dtype),
                window_strides=(1, 1), padding=((f, f), (f, f)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + bias.astype(y.dtype)
            return y

        # Kp[wy, wx, cin, ry, rx, cout]: the 3x3-window kernel per phase
        rows = []
        for w in range(3):
            cols_r = []
            for r in range(s):
                t0 = (f - r) % s
                # taps of phase r at window slot w (input offset w-1)
                d_valid = [d for d in range(k // s)
                           if (r + (t0 + s * d) - f) // s == w - 1]
                if d_valid:
                    cols_r.append(kern[t0 + s * d_valid[0]])
                else:
                    cols_r.append(jnp.zeros_like(kern[0]))
            rows.append(jnp.stack(cols_r, axis=0))  # (s, kw, cin, cout)
        kp = jnp.stack(rows, axis=0)  # (3, s, kw, cin, cout)

        # same selection along the second spatial axis
        cols = []
        for w in range(3):
            phase_w = []
            for r in range(s):
                t0 = (f - r) % s
                d_valid = [d for d in range(k // s)
                           if (r + (t0 + s * d) - f) // s == w - 1]
                if d_valid:
                    phase_w.append(kp[:, :, t0 + s * d_valid[0]])
                else:
                    phase_w.append(jnp.zeros_like(kp[:, :, 0]))
            cols.append(jnp.stack(phase_w, axis=2))  # (3, s, s, cin, cout)
        kpp = jnp.stack(cols, axis=1)  # (3, 3, s, s, cin, cout)

        # -> (3, 3, cin, s*s*cout) with phase-major output channels
        kpp = jnp.transpose(kpp, (0, 1, 4, 2, 3, 5))
        kconv = kpp.reshape(3, 3, cin, s * s * self.features)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kconv.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n, h, w_, _ = y.shape
        y = y.reshape(n, h, w_, s, s, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        y = y.reshape(n, h * s, w_ * s, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def deconv(
    features: int,
    kernel: int,
    stride: int,
    padding: int,
    use_bias: bool = False,
    name: Optional[str] = None,
    dtype: Any = jnp.float32,
    kernel_init: Optional[Callable] = None,
):
    """Transposed conv matching torch ``ConvTranspose2d(k, s, p)`` geometry.

    For inputs of size n, torch emits ``(n-1)*s - 2p + k``. Flax pads the
    stride-dilated input and runs a VALID conv, so torch's ``p`` corresponds
    to a flax per-side padding of ``k - 1 - p``.

    For the ``k = 2s, p = s/2`` upsampling geometry (every decoder deconv
    in the zoo) the default implementation is ``SubpixelConvTranspose``
    (same parameter, MXU-lowered at any batch — see its docstring);
    ``HEATNET_SUBPIXEL_DECONV=0`` restores ``nn.ConvTranspose``.
    """
    import os

    if (kernel == 2 * stride and 2 * padding == stride
            and os.environ.get("HEATNET_SUBPIXEL_DECONV", "1") == "1"):
        return SubpixelConvTranspose(
            features=features, kernel=kernel, stride=stride, padding=padding,
            use_bias=use_bias, dtype=dtype, name=name,
            kernel_init=kernel_init)
    f = kernel - 1 - padding
    return nn.ConvTranspose(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((f, f), (f, f)),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
        kernel_init=kernel_init or nn.initializers.lecun_normal(),
    )


def bilinear_kernel_init(key, shape, dtype=jnp.float32):
    """Bilinear-interpolation initializer for upsampling deconvs.

    Equivalent of ``get_upsample_filter`` (scripts/main.py:346-361): each
    (in==out) channel pair gets the separable triangle filter.
    """
    kh, kw, cin, cout = shape  # flax ConvTranspose kernel: (kh, kw, in, out)
    factor_h, factor_w = (kh + 1) // 2, (kw + 1) // 2
    center_h = factor_h - 1 if kh % 2 == 1 else factor_h - 0.5
    center_w = factor_w - 1 if kw % 2 == 1 else factor_w - 0.5
    og = np.ogrid[:kh, :kw]
    filt = (1 - abs(og[0] - center_h) / factor_h) * (1 - abs(og[1] - center_w) / factor_w)
    kernel = np.zeros(shape, dtype=np.float32)
    for c in range(min(cin, cout)):
        kernel[:, :, c, c] = filt
    return jnp.asarray(kernel, dtype)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """``nn.MaxPool2d(3, stride=2, padding=1)`` equivalent (NHWC)."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """Mean over H, W (segnet.py GlobalAvgPool2d)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """``F.adaptive_avg_pool2d`` with exact torch bin arithmetic (NHWC).

    Output bins span ``[floor(i*H/out), ceil((i+1)*H/out))``. Shapes are
    static under jit, so the bin averaging matrices are trace-time numpy
    constants and the op lowers to two small matmuls (MXU-friendly).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def bin_matrix(size: int, out: int) -> np.ndarray:
        m = np.zeros((out, size), dtype=np.float32)
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return m

    mh = jnp.asarray(bin_matrix(h, oh), x.dtype)  # (oh, h)
    mw = jnp.asarray(bin_matrix(w, ow), x.dtype)  # (ow, w)
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("pw,nowc->nopc", mw, x)


def resize_bilinear(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize (half-pixel centers, NO antialiasing) to (H, W), NHWC.

    ``antialias=False`` matches torch ``F.interpolate(mode='bilinear',
    align_corners=False)`` exactly — including 0.5x downscales (DownNet's
    Interpolate, downscale_network.py:5-13); jax's default antialias=True
    widens the kernel on downscale and diverges. Torch's
    ``UpsamplingBilinear2d`` uses align_corners=True; for the places the
    reference upsamples with it (constant global-pool branches, critic score
    maps, PSP priors) the half-pixel convention is an accepted deviation —
    documented here once.
    """
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c),
                            method="bilinear", antialias=False)


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), method="nearest")


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch ``InstanceNorm2d`` default (affine=False): per-sample, per-channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


# initializer equal to the reference's weights_init_normal
# (models/confusion_maximization/utils.py:126-132)
normal002 = nn.initializers.normal(stddev=0.02)


# ---------------------------------------------------------------------------
# Residual / ASPP / fusion blocks
# ---------------------------------------------------------------------------


class IdentityResidualBlock(nn.Module):
    """Pre-activation (identity-mapping) residual block (segnet.py:44-124).

    ``channels`` of length 2 → two 3x3 convs; length 3 → 1x1/3x3(grouped)/1x1
    bottleneck. The projection shortcut (when stride != 1 or channel change)
    consumes the *normalized* input, as in the reference.
    """

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from jax.ad_checkpoint import checkpoint_name

        chans = tuple(self.channels)
        if len(chans) not in (2, 3):
            raise ValueError("channels must contain either two or three values")
        if len(chans) == 2 and self.groups != 1:
            raise ValueError("groups > 1 are only valid if len(channels) == 3")
        is_bottleneck = len(chans) == 3
        in_channels = x.shape[-1]
        need_proj = self.stride != 1 or in_channels != chans[-1]

        bn1 = ABN(self.norm_act, self.dtype, name="bn1")(x, train)
        # "conv_out" names make each conv's output saveable under
        # CONV_SAVE_POLICY (the 'c' stage-remat mode); a no-op under any
        # other policy or outside remat.
        shortcut = (
            checkpoint_name(
                conv(chans[-1], 1, stride=self.stride, name="proj_conv",
                     dtype=self.dtype)(bn1), "conv_out")
            if need_proj
            else x
        )

        if not is_bottleneck:
            out = checkpoint_name(
                conv(chans[0], 3, stride=self.stride, dilation=self.dilation,
                     name="conv1", dtype=self.dtype)(bn1), "conv_out")
            out = ABN(self.norm_act, self.dtype, name="bn2")(out, train)
            out = checkpoint_name(
                conv(chans[1], 3, dilation=self.dilation, name="conv2",
                     dtype=self.dtype)(out), "conv_out")
        else:
            import os

            out = checkpoint_name(
                conv(chans[0], 1, stride=self.stride, name="conv1",
                     dtype=self.dtype)(bn1), "conv_out")
            out = ABN(self.norm_act, self.dtype, name="bn2")(out, train)
            conv2 = conv(chans[1], 3, dilation=self.dilation, groups=self.groups,
                         name="conv2", dtype=self.dtype)
            fused_epi = (not train and self.groups > 1 and chans[0] == chans[1]
                         and os.environ.get("HEATNET_GC_IMPL") == "pallas_fused"
                         and isinstance(conv2, GroupedConvDense))
            # when fused, bn3 computes ONLY the 2-row probe below — run it
            # in float32 so recovering scale as BN(1)-BN(0) doesn't lose
            # precision to cancellation (a bf16 probe carries ~2^-8 relative
            # rounding into the subtraction when |running_mean| >> gamma)
            bn3 = ABN(self.norm_act, jnp.float32 if fused_epi else self.dtype,
                      name="bn3")
            if fused_epi:
                # VERDICT r1 item 6: hand bn3's inference affine to the
                # grouped conv so BN+act ride the kernel epilogue (or a
                # manual affine on the XLA paths) instead of a separate
                # elementwise pass. Extract scale/bias via a 2-row probe
                # — BN(0)=bias, BN(1)-BN(0)=scale — which registers
                # bn3's variables with identical names/shapes, so
                # checkpoints are unaffected.
                probe = jnp.concatenate(
                    [jnp.zeros((1, 1, 1, chans[1]), jnp.float32),
                     jnp.ones((1, 1, 1, chans[1]), jnp.float32)])
                tb = bn3(probe, train=False, skip_act=True)
                bias_v, scale_v = tb[0, 0, 0], tb[1, 0, 0] - tb[0, 0, 0]
                out = conv2(out, epilogue=(scale_v, bias_v, self.norm_act))
            else:
                out = checkpoint_name(
                    conv2(out, train=train)
                    if isinstance(conv2, GroupedConvDense) else conv2(out),
                    "conv_out")
                out = bn3(out, train)
            out = checkpoint_name(
                conv(chans[2], 1, name="conv3", dtype=self.dtype)(out),
                "conv_out")

        return out + shortcut.astype(out.dtype)


class ConvABN(nn.Module):
    """conv → ABN, the ``createConv`` unit of ASPP (trgb_segnet.py:152-163)."""

    features: int
    kernel: int = 1
    dilation: int = 1
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (1 if self.kernel == 3 else 0)
        if self.dilation != 1:
            pad = self.dilation
        x = conv(self.features, self.kernel, dilation=self.dilation, padding=pad,
                 name="conv1", dtype=self.dtype)(x)
        return ABN(self.norm_act, self.dtype, name="bn1")(x, train)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, rates [1, 12, 24, 36] + global branch.

    Reference trgb_segnet.py:133-179. Returns ``(out, fusion, out_cert)``;
    ``out_cert`` is None unless ``cert_head`` (the Vistas segnet.py:128-172
    variant has no cert head and ignores fusion).
    """

    out_channels: int
    rates: Sequence[int] = (1, 12, 24, 36)
    kernels: Sequence[int] = (1, 3, 3, 3)
    cert_head: bool = False
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        branches = []
        for i, (r, k) in enumerate(zip(self.rates, self.kernels)):
            branches.append(
                ConvABN(256, k, r, self.norm_act, self.dtype, name=f"conv{i + 1}")(x, train)
            )
        # global-average branch, broadcast back to the spatial grid
        g = global_avg_pool(x)  # (N,1,1,C)
        g = ConvABN(256, 1, 1, self.norm_act, self.dtype, name="conv5")(g, train)
        g = jnp.broadcast_to(g, branches[-1].shape[:3] + (g.shape[-1],))
        branches.append(g)

        fusion = ConvABN(256, 1, 1, self.norm_act, self.dtype, name="fuse_conv")(
            jnp.concatenate(branches, axis=-1), train
        )
        out = ConvABN(self.out_channels, 1, 1, self.norm_act, self.dtype,
                      name="final_conv")(fusion, train)
        out_cert = None
        if self.cert_head:
            out_cert = ConvABN(1, 1, 1, self.norm_act, self.dtype,
                               name="final_conv2")(fusion, train)
        return out, fusion, out_cert


class FuseModule(nn.Module):
    """Three 3x3 conv(+ABN) stages then a 4x learned upsample.

    Reference ``fuseModule`` (segnet.py:188-196): conv(ch_in→ch_in)+ABN ×2,
    conv(ch_in→ch_out), ConvTranspose2d(8, 4, 2).
    """

    out_channels: int
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch_in = x.shape[-1]
        x = conv(ch_in, 3, name="conv1", dtype=self.dtype)(x)
        x = ABN(self.norm_act, self.dtype, name="bn1")(x, train)
        x = conv(ch_in, 3, name="conv2", dtype=self.dtype)(x)
        x = ABN(self.norm_act, self.dtype, name="bn2")(x, train)
        x = conv(self.out_channels, 3, name="conv3", dtype=self.dtype)(x)
        return deconv(self.out_channels, 8, 4, 2, name="up", dtype=self.dtype)(x)


class InitBlock(nn.Module):
    """Input stem: 3x3 s2 → ABN → 3x3 → ABN → 3x3 → maxpool s2 (4x downsample).

    Reference ``initBlock`` (trgb_segnet.py:231-240); also segnet.py's
    ``input_3x3`` stem (segnet.py:263-271).
    """

    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = conv(64, 3, stride=2, name="conv1", dtype=self.dtype)(x)
        x = ABN(self.norm_act, self.dtype, name="bn1")(x, train)
        x = conv(64, 3, name="conv2", dtype=self.dtype)(x)
        x = ABN(self.norm_act, self.dtype, name="bn2")(x, train)
        x = conv(64, 3, name="conv3", dtype=self.dtype)(x)
        return max_pool_3x3_s2(x)


def stride_dilation(mod_id: int, block_id: int, dilation) -> Tuple[int, int]:
    """Per-block (stride, dilation) schedule (segnet.py:354-366)."""
    if dilation == 1:
        return (2 if mod_id > 0 and block_id == 0 else 1), 1
    d = dilation[mod_id]
    if d == 1:
        return (2 if mod_id > 0 and block_id == 0 else 1), 1
    try:
        d = d[block_id]
    except TypeError:
        pass
    return 1, d
