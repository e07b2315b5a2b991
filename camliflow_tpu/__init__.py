"""CamLiFlow-TPU: a TPU-native (JAX/XLA/Pallas) framework for joint optical flow
and scene flow estimation with bidirectional camera-LiDAR fusion.

Re-designed from scratch for TPU hardware with the capabilities of the
CamLiFlow / CamLiRAFT reference (MCG-NJU/CamLiFlow):

- ``ops``      low-level kernels (KNN, FPS, correlation, grid sampling, ...)
- ``nn``       neural building blocks (point convs, CLFM fusion, GRUs, ...)
- ``models``   model families (CamLiRAFT, CamLiPWC, RAFT, PWC and LiDAR-only)
- ``data``     dataset pipelines + file-format codecs
- ``parallel`` device-mesh sharding utilities (pjit data parallelism)
- ``runtime``  trainer / evaluator entry points
- ``utils``    config system, logging, misc

Conventions (deliberately different from the PyTorch reference, which is
channel-first): images are NHWC, point clouds are ``[B, N, 3]`` and point
features are ``[B, N, C]`` (channel-last), so that feature matmuls and convs
tile directly onto the TPU MXU. All shapes are static under ``jax.jit``.
"""

__version__ = "0.1.0"
