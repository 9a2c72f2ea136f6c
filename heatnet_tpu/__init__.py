"""heatnet_tpu — a TPU-native JAX framework for RGB+thermal semantic segmentation.

A from-scratch rebuild of the capabilities of jzuern/heatnet-pub (IROS 2020
"HeatNet: Bridging the day-night domain gap in semantic segmentation with
thermal images") designed TPU-first:

- NHWC tensor layout, bfloat16 compute on the MXU, float32 parameters.
- Models in flax.linen compiled by XLA; hot preprocessing in Pallas.
- Data parallelism over a ``jax.sharding.Mesh`` (ICI collectives) instead of
  ``nn.DataParallel`` scatter/gather.
- A functional two-step adversarial trainer instead of in-place
  ``requires_grad`` phase flipping.

Package map (mirrors the reference's de-facto layering; see SURVEY.md):

- ``heatnet_tpu.utils``    config / factories / vis (reference ``helper/``)
- ``heatnet_tpu.eval``     IoU metrics + validators (``scripts/iou_eval.py``,
  ``models/confusion_maximization/{utils,validation_bdd_mf}.py``)
- ``heatnet_tpu.ops``      pure array ops: preprocessing, label remap, Pallas kernels
- ``heatnet_tpu.models``   model zoo (``models/``)
- ``heatnet_tpu.data``     host-side dataset pipeline (``data/``, ``thermal_loader.py``)
- ``heatnet_tpu.train``    train states + step functions (``scripts/main.py``,
  ``train_trgb_segnet_conf.py``, ``cyclegan/train.py``)
- ``heatnet_tpu.parallel`` mesh / sharding utilities (replaces L8 DataParallel/DDP)
- ``heatnet_tpu.io``       checkpointing + logging (torch.save / wandb equivalents)
- ``heatnet_tpu.cli``      argparse entry points with the reference flag surface
- ``heatnet_tpu.native``   C++ runtime pieces (burst sampler, sync queues, relabeller)
"""

__version__ = "0.1.0"
