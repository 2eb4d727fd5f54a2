"""TPU-native multimodal abdominal-organ segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``fransiskusbudi/multimodal_segmentation_project`` (PyTorch/CUDA):
cross-modality (MRI->CT) 3D U-Net segmentation of spleen/liver/kidneys
from 192^3 NIfTI volumes, with four training workloads (baseline,
fine-tune, knowledge distillation, DANN domain adaptation) plus a
full-volume evaluation pipeline.

Design notes (TPU-first, not a port):
  * channel-first (B, C, D, H, W) layout everywhere — the reference's
    torch layout AND the TPU-storage-efficient one (see models/unet3d.py)
  * bf16 compute / fp32 params+optimizer precision policy (no loss scaling)
  * one shared training engine (the reference duplicates its loop 4x)
  * data parallelism via a ``jax.sharding.Mesh`` + jit shardings (the
    reference uses DDP/NCCL through HF Accelerate); optional spatial
    sharding of the volume over a second mesh axis
  * on-device metric accumulation (the reference all-gathers 4 scalars
    per step, forcing a device sync: train_unet.py:235-238)
  * first-party NIfTI-1 IO (the reference depends on nibabel)
  * jit-compiled jax.random augmentations (the reference uses MONAI)
"""

__version__ = "0.1.0"

NUM_CLASSES = 4  # background, spleen=1, liver=2, kidneys=3
CLASS_NAMES = ("background", "spleen", "liver", "kidneys")
ORGAN_NAMES = ("spleen", "liver", "kidneys")
