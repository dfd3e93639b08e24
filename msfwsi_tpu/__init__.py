"""MSF-WSI/TPU — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multi-resolution self-supervised learning on whole-slide images.

This is a ground-up TPU-first rebuild with the capabilities of the
reference PyTorch research codebase ``Dylan-H-Wang/msf-wsi`` (Pattern
Recognition 2024): dual-branch multi-resolution SimSiam pretraining,
HookNet semantic segmentation fine-tuning, per-slide evaluation, and
WSI tile preparation — redesigned around XLA's compilation model
(static shapes, fused on-device augmentation, GSPMD data parallelism
over a `jax.sharding.Mesh`) rather than translated from CUDA/DDP.

Layers (bottom-up):
  utils/     logging, run-dir management, meters
  ops/       geometry (tiling/jigsaw), on-device augmentation, losses,
             metrics (smp-compatible), Pallas TPU kernels
  parallel/  device mesh + sharding policy + cross-replica batch norm
  models/    multi-scale ResNet encoders, MSFWSI SSL module, HookNet
  data/      WSI tile preparation, CSV/manifest datasets, host loader
  train/     jitted SSL / finetune / evaluate steps, checkpointing
  tools/     CLI entry points mirroring the reference's argparse surface
"""

__version__ = "0.1.0"
