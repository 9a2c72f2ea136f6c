"""Native C++ runtime components (ctypes-bound).

TPU-era rebuilds of the reference's native layer (SURVEY.md §2.4):
- ``relabeller.cpp`` — the Cython label-remap kernel (c_relabeller)
- ``burst_sampler.cpp`` — the image_sampler ROS node's ApproximateTime
  multi-stream synchronizer + burst gate, ROS-free
- ``thermal_preproc.cpp`` — combinedNode's 16-bit thermal contrast +
  binarization operators

The shared library builds on first use (g++ -O3 -shared); see
:mod:`heatnet_tpu.native.bindings`.
"""

from .bindings import (  # noqa: F401
    BurstSampler,
    Synchronizer,
    gray_binarize,
    relabel_image_native,
    relabel_vistas_image_native,
    thermal_to_8bit,
)
