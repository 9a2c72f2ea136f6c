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
            if "layer" in prev:
                # torchvision Sequential block index (extractors.py:168-182;
                # also RTFNet's encoder_{rgb,thermal}_layerN, RTFNet.py:50-57)
                p = f"block{d + 1}"
            elif prev.startswith("deconv") and prev[6:].isdigit():
                # RTFNet decoder stages deconvN = Sequential(TransBottleneck…)
                p = f"block{d + 1}"
            elif prev == "upsample":
                # TransBottleneck.upsample = Sequential(ConvTranspose2d|Conv2d,
                # BatchNorm2d) (RTFNet.py:68-80)
                out.pop()
                p = "upsample_conv" if d == 0 else "upsample_bn"
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


def cyclegan_generator_renames(n_residual_blocks: int = 9) -> Dict[str, str]:
    """Dotted-key prefix map: reference Generator Sequential indices
    (cyclegan/models.py:26-67) → our named modules (models/cyclegan.py)."""
    m = {"model.1": "inconv", "model.4": "down1", "model.7": "down2"}
    for i in range(n_residual_blocks):
        m[f"model.{10 + i}.conv_block.1"] = f"res{i + 1}.conv1"
        m[f"model.{10 + i}.conv_block.5"] = f"res{i + 1}.conv2"
    base = 10 + n_residual_blocks
    m[f"model.{base}"] = "up1"
    m[f"model.{base + 3}"] = "up2"
    m[f"model.{base + 7}"] = "outconv"
    return m


# reference patch Discriminator Sequential (cyclegan/models.py:69-97 ==
# discriminator_model.py:5-33) → our conv1..conv5 (InstanceNorms carry no
# parameters)
PATCHGAN_DISC_RENAMES = {
    "model.0": "conv1", "model.2": "conv2", "model.5": "conv3",
    "model.8": "conv4", "model.11": "conv5",
}


def downnet_renames(downsampling: int) -> Dict[str, str]:
    """DownNet Sequential (downscale_network.py:23-35) → downN_conv names."""
    return {f"net.{i}.conv1": f"down{i + 1}_conv"
            for i in range(downsampling)}


def unet_adapter_renames() -> Dict[str, str]:
    """input_adapter UNet Sequential names (input_adapter.py:5-101) → ours.

    DoubleConv = Sequential(conv, bn, relu, conv, bn, relu); Down wraps it
    under ``maxpool_conv.1``; Up under ``conv``; OutConv under ``conv``.
    """
    m = {"inc.double_conv.0": "inc.conv1", "inc.double_conv.1": "inc.bn1",
         "inc.double_conv.3": "inc.conv2", "inc.double_conv.4": "inc.bn2",
         "outc.conv": "outc"}
    for i in (1, 2, 3, 4):
        for j, (c, b) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            m[f"down{i}.maxpool_conv.1.double_conv.{j * 3}"] = f"down{i}.conv.{c}"
            m[f"down{i}.maxpool_conv.1.double_conv.{j * 3 + 1}"] = f"down{i}.conv.{b}"
    for i in (1, 2, 3, 4):
        for j, (c, b) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            m[f"up{i}.conv.double_conv.{j * 3}"] = f"up{i}.conv.{c}"
            m[f"up{i}.conv.double_conv.{j * 3 + 1}"] = f"up{i}.conv.{b}"
    return m


def _apply_rename_map(key: str, rename_map: Dict[str, str]) -> str:
    for old in sorted(rename_map, key=len, reverse=True):
        if key == old or key.startswith(old + "."):
            return rename_map[old] + key[len(old):]
    return key


def convert_state_dict(state_dict: Dict[str, Any],
                       transpose_deconv_names: Tuple[str, ...] = (
                           "up", "up_seg_2", "up_seg_2_cert", "up_borders_3",
                           "up_inst_2", "deconv", "upsample"),
                       rename_map: Dict[str, str] = None,
                       transpose_paths: Tuple[str, ...] = (),
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch state_dict → (params_flat, batch_stats_flat).

    Keys in the result are '/'-joined paths compatible with
    ``heatnet_tpu.io.checkpoint`` flattened trees. Tensors become numpy.
    ``rename_map`` applies model-specific dotted-prefix renames (longest
    prefix wins) before the generic name rules. ``transpose_paths`` lists
    exact '/'-joined module paths that are ConvTranspose2d despite a name
    the heuristics treat as Conv2d (e.g. RTFNet's stride-2 TransBottleneck
    ``conv2``, RTFNet.py:150-156).
    """
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    for key, tensor in state_dict.items():
        # np.array (not asarray): torch's .numpy() returns a VIEW sharing
        # the tensor's storage, so without the copy a later in-place torch
        # update (optimizer.step) silently mutates the converted tree
        # before jit materializes it on device
        t = np.array(tensor.detach().cpu().numpy()
                     if hasattr(tensor, "detach") else tensor)
        if rename_map:
            key = _apply_rename_map(key, rename_map)
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
                if ("/".join(path) in transpose_paths
                        or any(last.startswith(n)
                               for n in transpose_deconv_names)):
                    # ConvTranspose2d (I, O, kh, kw) → (kh, kw, I, O), flipped
                    k = np.flip(t, axis=(2, 3)).transpose(2, 3, 0, 1)
                else:
                    k = t.transpose(2, 3, 1, 0)  # (kh, kw, I, O)
                params["/".join(path + ["kernel"])] = k
            elif t.ndim == 2:
                params["/".join(path + ["kernel"])] = t.T
            elif t.ndim == 1 and path and ("bn" in path[-1]
                                           or path[-1].startswith("norm")):
                # plain BatchNorm module not wrapped in ABN (e.g. the
                # ResNet extractors' bnN and DenseNet's norm0/normN/norm)
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


def rtfnet_transpose_paths(num_deconv: int = 5) -> Tuple[str, ...]:
    """RTFNet's upsampling TransBottlenecks use a ConvTranspose2d named
    ``conv3`` (RTFNet.py:199-202) — only the final block of each deconv
    stage (block2 of 2)."""
    return tuple(f"deconv{n}/block2/conv3" for n in range(1, num_deconv + 1))


def import_into(target_params, target_stats, state_dict,
                to_rename: str = "", rename: str = "",
                rename_map: Dict[str, str] = None,
                transpose_paths: Tuple[str, ...] = (),
                prepend: str = "") -> Tuple[Any, Any]:
    """Full pipeline: convert names/layouts, optional prefix rewrite,
    intersect into the target trees (initModelRenamed/Partial semantics).

    ``prepend`` prefixes every converted key — the pretrained-backbone
    ingestion path: a bare torchvision ``resnet50(weights=...)``
    state_dict has keys relative to the backbone (``layer1.0.conv1``),
    while the extractor lives under a submodule of the full model (PSPNet
    names it ``feats``); ``prepend="feats/"`` lands the backbone weights
    there, reproducing the reference's torchvision-URL pretrained init
    (extractors.py:369-408, critic_resnet.py:11-21) from a local file.
    """
    from .checkpoint import _flatten, _unflatten, _shape_ok

    p_flat, s_flat = convert_state_dict(state_dict, rename_map=rename_map,
                                        transpose_paths=transpose_paths)
    if to_rename or rename:
        # callers pass torch dotted prefixes (initModelRenamed convention,
        # utils.py:59-78: "module.trgb_segnet." -> "module."); converted
        # keys are '/'-joined, so normalize the separators
        to_rename = to_rename.replace(".", "/")
        rename = rename.replace(".", "/")
        p_flat = {k.replace(to_rename, rename): v for k, v in p_flat.items()}
        s_flat = {k.replace(to_rename, rename): v for k, v in s_flat.items()}
    if prepend:
        prepend = prepend.replace(".", "/")
        p_flat = {prepend + k: v for k, v in p_flat.items()}
        s_flat = {prepend + k: v for k, v in s_flat.items()}

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
