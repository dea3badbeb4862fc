"""image_to_pointcloud_tpu — a TPU-native image→point-cloud framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
web service ``Samsonboadi/Image_to_pointCloud`` (FastAPI + PyTorch +
OpenCV/Open3D): monocular ViT depth estimation, pinhole back-projection to
colored point clouds, statistical outlier removal, PLY/LAS/XYZ/GLB export,
and an async job HTTP API with previews — all running as fused jitted
graphs on TPU with data/tensor/context parallelism over a device mesh.

Layout:
  core/      typed config tree, device-mesh helpers
  ops/       pure jitted kernels (resize, depthnorm, unproject, outlier, ...)
  models/    Flax DINOv2+DPT depth models (Depth-Anything family), Pallas attention
  parallel/  shardings (DP/TP/SP-CP/PP), ring attention, high-res tiling
  pipeline/  fused end-to-end jitted graphs
  io/        first-party exporters (PLY, LAS, XYZ, GLB) + image codecs
  serve/     first-party asyncio HTTP server speaking the reference API contract
  train/     fine-tuning losses + sharded train step
  native/    C++ host-side geometry/runtime components (ctypes-bound)
"""

__version__ = "0.1.0"
