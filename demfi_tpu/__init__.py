"""DeMFI-TPU: a TPU-native JAX/Flax/Pallas framework for joint video
deblurring and multi-frame interpolation (DeMFI, ECCV 2022).

This is a ground-up TPU-first rebuild of the capabilities of the PyTorch
reference implementation (JihyongOh/DeMFI). The compute path is pure
JAX/XLA with Pallas TPU kernels for the irregular-memory warping ops; the
surrounding framework (data pipeline, experiment management, tiled
inference engine, distributed meshes) is designed for TPU pods rather
than translated from the single-GPU reference.

Layout conventions (TPU-native, differs from the NCHW reference):
  - images / feature maps: NHWC  [B, H, W, C]
  - frame stacks:          [B, T, H, W, C]
  - flows:                 [B, H, W, 2] with channel 0 = dx (along W)
                           and channel 1 = dy (along H)  (matches the
                           reference's flow channel semantics, see
                           /root/reference/DeMFInet.py:744-757)
  - pixel range:           [-1, 1], BGR channel order (reference parity)
"""

__version__ = "0.1.0"

from demfi_tpu.config import DeMFIConfig  # noqa: F401
