"""torch checkpoint → heatnet_tpu parameter conversion.

The reference loads torchvision-pretrained backbones and its own ``.pth``
checkpoints (``models/extractors.py:369-408``, ``utils.py:59-90``). To let a
reference user carry weights over, this module converts a torch
``state_dict`` (tensor name → tensor) into our flax param/batch_stats trees:

layout rules (torch → flax NHWC):
- Conv2d weight      (O, I, kh, kw)  → kernel (kh, kw, I, O)
- grouped Conv2d     (O, I/g, kh, kw) → kernel (kh, kw, I/g, O) (flax
  ``feature_group_count`` uses the same reduced input-channel layout)
- ConvTranspose2d    (I, O, kh, kw)  → kernel (kh, kw, I, O) **spatially
  flipped** (torch's transposed conv scatters the unflipped kernel; flax's
  default formulation correlates, so the kernel flips)
- Linear weight      (O, I)          → kernel (I, O)
- BatchNorm2d weight/bias → scale/bias (params); running_mean/var →
  mean/var (batch_stats)
- PReLU weight → negative_slope

name rules: ``.convs.`` Sequential nesting is flattened
(``block1.convs.conv1`` → ``block1/conv1``), the trgb initBlock's
``conv1_2``/``bn1_2`` map to our ``conv1``/``bn1``, and ABN's inner
``bn.{...}`` is preserved. Prefix rewriting (``module.`` etc.) composes via
``heatnet_tpu.io.checkpoint.restore_renamed``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def _rename_path(parts) -> list:
    if parts and parts[0] == "blocks":
        # DenseNet registers every block twice: in the ModuleList ``blocks``
        # AND as denseblockN/transitionN attributes (extractors.py:274-292);
        # keep only the named aliases.
        return []
    out = []
    for p in parts:
        prev = out[-1] if out else ""
        if p in ("convs", "start_features"):
            continue  # Sequential containers flattened in our modules
        if p == "conv1_2" and prev.startswith("mod1"):
            # trgb initBlock names its first pair conv1_2/bn1_2
            # (trgb_segnet.py:230-239); covers both stems mod1 and mod1_2.
            # Top-level conv1_2/bn1_2 (late-fusion extractors.py:123-126)
            # keep their names.
            p = "conv1"
        elif p == "bn1_2" and prev.startswith("mod1"):
            p = "bn1"
        elif p.isdigit():
            d = int(p)
            if prev.startswith("layer"):
                # torchvision Sequential block index (extractors.py:168-182)
                p = f"block{d + 1}"
            elif prev == "downsample":
                # downsample = Sequential(Conv2d, BatchNorm2d)
                out.pop()
                p = "downsample_conv" if d == 0 else "downsample_bn"
            elif prev == "stages":
                # PSPModule.stages[i] = Sequential(AdaptiveAvgPool2d, Conv2d)
                # (pspnet.py:11-19) → our psp/stage{i+1}_conv
                out.pop()
                p = f"stage{d + 1}"
            elif prev.startswith("stage") and prev[5:].isdigit():
                out[-1] = out[-1] + "_conv"  # the inner Sequential's Conv2d
                continue
            elif prev == "conv" and len(out) >= 2 and out[-2].startswith("up_"):
                # PSPUpsample.conv = Sequential(Conv2d, BatchNorm2d, PReLU)
                out.pop()
                p = ("conv", "bn", "prelu")[d]
            elif prev == "final":
                continue  # final = Sequential(Conv2d) (pspnet.py:57-59)
            elif prev in ("norm", "conv", "relu"):
                # DenseNet _DenseLayer's dotted names norm.1/conv.2
                # (extractors.py:208-217) → norm1/conv2
                out[-1] = prev + p
                continue
            elif (prev[:4] == "down" or prev[:2] == "up") and \
                    prev.lstrip("downup").isdigit():
                # SegNet baseline stages downN/upN = Sequential(ConvBnRelu2d…)
                # (mfnet/model/SegNet.py:25-70) → our downN/m{i}
                p = f"m{d}"
            elif prev.startswith("feat_"):
                # SqueezeNet Sequentials (extractors.py:334-351):
                # feat_1.0=conv; feat_2/3.{1,2}=Fire (0=pool); feat_4.{0-3}=Fire
                n = prev[-1]
                out.pop()
                if n == "1":
                    p = "feat1_conv"
                elif n == "4":
                    p = f"feat4_fire{d + 1}"
                else:
                    p = f"feat{n}_fire{d}"
        out.append(p)
    return out


def convert_state_dict(state_dict: Dict[str, Any],
                       transpose_deconv_names: Tuple[str, ...] = (
                           "up", "up_seg_2", "up_seg_2_cert", "up_borders_3",
                           "up_inst_2", "deconv", "upsample"),
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch state_dict → (params_flat, batch_stats_flat).

    Keys in the result are '/'-joined paths compatible with
    ``heatnet_tpu.io.checkpoint`` flattened trees. Tensors become numpy.
    """
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    for key, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        parts = _rename_path(key.split("."))
        if not parts:
            continue
        leaf = parts[-1]
        path = parts[:-1]

        if leaf in _BN_STATS:
            stats["/".join(path + [_BN_STATS[leaf]])] = t
            continue
        if leaf == "num_batches_tracked":
            continue

        is_bn = path and path[-1] == "bn"
        if is_bn and leaf in _BN_PARAM:
            params["/".join(path + [_BN_PARAM[leaf]])] = t
            continue

        if leaf == "weight":
            if t.ndim == 4:
                last = path[-1] if path else ""
                if any(last.startswith(n) for n in transpose_deconv_names):
                    # ConvTranspose2d (I, O, kh, kw) → (kh, kw, I, O), flipped
                    k = np.flip(t, axis=(2, 3)).transpose(2, 3, 0, 1)
                else:
                    k = t.transpose(2, 3, 1, 0)  # (kh, kw, I, O)
                params["/".join(path + ["kernel"])] = k
            elif t.ndim == 2:
                params["/".join(path + ["kernel"])] = t.T
            elif t.ndim == 1 and path and "bn" in path[-1]:
                # plain BatchNorm module not wrapped in ABN (e.g. extractors)
                params["/".join(path + ["scale"])] = t
            elif "prelu" in (path[-1] if path else "") and t.size == 1:
                # torch PReLU(num_parameters=1) is shape (1,); flax
                # nn.PReLU's negative_slope is a scalar
                params["/".join(path + ["negative_slope"])] = t.reshape(())
            else:
                params["/".join(path + ["weight"])] = t
            continue
        if leaf == "bias":
            params["/".join(path + ["bias"])] = t
            continue

        params["/".join(parts)] = t

    return params, stats


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pth/.pth.tar file (CPU) and return its state_dict."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(saved, dict) and "state_dict" in saved:
        saved = saved["state_dict"]
    return saved


def import_into(target_params, target_stats, state_dict,
                to_rename: str = "", rename: str = "") -> Tuple[Any, Any]:
    """Full pipeline: convert names/layouts, optional prefix rewrite,
    intersect into the target trees (initModelRenamed/Partial semantics)."""
    from .checkpoint import _flatten, _unflatten, _shape_ok

    p_flat, s_flat = convert_state_dict(state_dict)
    if to_rename or rename:
        p_flat = {k.replace(to_rename, rename): v for k, v in p_flat.items()}
        s_flat = {k.replace(to_rename, rename): v for k, v in s_flat.items()}

    tgt_p = _flatten(target_params)
    new_p = {k: p_flat[k] if k in p_flat and _shape_ok(p_flat[k], v) else v
             for k, v in tgt_p.items()}
    n_hit = sum(1 for k, v in tgt_p.items()
                if k in p_flat and _shape_ok(p_flat[k], v))
    print(f"Loaded dict with {n_hit} entries...")

    new_s = None
    if target_stats is not None:
        tgt_s = _flatten(target_stats)
        new_s = _unflatten(
            {k: s_flat[k] if k in s_flat and _shape_ok(s_flat[k], v) else v
             for k, v in tgt_s.items()})
    return _unflatten(new_p), new_s
