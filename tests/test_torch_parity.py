"""Cross-framework numerical parity: reference-architecture forward in
torch functional ops vs this framework's UNet3D with imported weights.

This is the strongest parity check available without the medical
datasets: the SAME weights (reference .pth layout, converted by
engine/interop.py) produce the SAME eval-mode output volume through
both stacks, validating conv padding semantics, BatchNorm inference
semantics, max-pool, the transpose-conv == einsum+depth-to-space
equivalence, and the 1x1x1 head — i.e. the whole eval path that
BASELINE.md's "Dice parity" target depends on.

The torch side is written procedurally against torch.nn.functional from
the state_dict (not as an nn.Module), mirroring the reference's
documented architecture (models/unet.py:34-90 structure).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from multimodal_segmentation_project_tpu.engine.interop import (  # noqa: E402
    torch_state_dict_to_trees,
)
from multimodal_segmentation_project_tpu.models import UNet3D  # noqa: E402
from tests.test_interop import reference_shaped_state_dict  # noqa: E402

FEATURES = (4, 8)


def torch_reference_forward(sd, x):
    """Eval-mode forward of the reference UNet3D, written functionally."""

    def double_conv(prefix, h):
        for conv_i, bn_i in ((0, 1), (4, 5)):
            h = F.conv3d(
                h, sd[f"{prefix}.double_conv.{conv_i}.weight"],
                sd[f"{prefix}.double_conv.{conv_i}.bias"], padding=1,
            )
            h = F.batch_norm(
                h,
                sd[f"{prefix}.double_conv.{bn_i}.running_mean"],
                sd[f"{prefix}.double_conv.{bn_i}.running_var"],
                sd[f"{prefix}.double_conv.{bn_i}.weight"],
                sd[f"{prefix}.double_conv.{bn_i}.bias"],
                training=False,
                eps=1e-5,
            )
            h = F.relu(h)
            # Dropout3d is identity in eval mode
        return h

    skips = []
    h = x
    for i in range(len(FEATURES)):
        h = double_conv(f"encoder.{i}", h)
        skips.append(h)
        h = F.max_pool3d(h, kernel_size=2, stride=2)
    h = double_conv("bottleneck", h)
    for i in range(len(FEATURES)):
        h = F.conv_transpose3d(
            h, sd[f"upconvs.{i}.weight"], sd[f"upconvs.{i}.bias"], stride=2
        )
        skip = skips[-(i + 1)]
        if h.shape != skip.shape:
            h = F.interpolate(h, size=skip.shape[2:])
        h = torch.cat([skip, h], dim=1)
        h = double_conv(f"decoder.{i}", h)
    return F.conv3d(h, sd["final_conv.weight"], sd["final_conv.bias"])


@pytest.mark.parametrize("conv_impl", ["xla", "pallas"])
def test_eval_forward_parity_with_torch(conv_impl):
    sd = reference_shaped_state_dict(features=FEATURES, seed=11)
    # scale conv weights down so activations stay in a well-conditioned range
    sd = {k: (v * 0.3 if v.ndim == 5 else v) for k, v in sd.items()}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = torch_reference_forward(sd, torch.from_numpy(x)).numpy()

    params, stats = torch_state_dict_to_trees(sd, num_levels=len(FEATURES))
    model = UNet3D(
        out_channels=4, features=FEATURES, dropout_rate=0.1,
        dtype=jnp.float32, conv_impl=conv_impl,
    )
    got = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    )
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


def test_train_mode_bn_matches_torch_batch_stats():
    """Training-mode BN uses batch statistics in both frameworks."""
    sd = reference_shaped_state_dict(features=FEATURES, seed=5)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32)

    # torch: one DoubleConv in train mode (batch stats), dropout off
    h = torch.from_numpy(x)
    with torch.no_grad():
        for conv_i, bn_i in ((0, 1), (4, 5)):
            h = F.conv3d(h, sd[f"encoder.0.double_conv.{conv_i}.weight"],
                         sd[f"encoder.0.double_conv.{conv_i}.bias"], padding=1)
            h = F.batch_norm(
                h,
                sd[f"encoder.0.double_conv.{bn_i}.running_mean"].clone(),
                sd[f"encoder.0.double_conv.{bn_i}.running_var"].clone(),
                sd[f"encoder.0.double_conv.{bn_i}.weight"],
                sd[f"encoder.0.double_conv.{bn_i}.bias"],
                training=True, eps=1e-5,
            )
            h = F.relu(h)
    want = h.numpy()

    from multimodal_segmentation_project_tpu.models.unet3d import DoubleConv

    params, stats = torch_state_dict_to_trees(sd, num_levels=len(FEATURES))
    block = DoubleConv(FEATURES[0], dropout_rate=0.0, dtype=jnp.float32, conv_impl="xla")
    got, _ = block.apply(
        {"params": params["enc0"], "batch_stats": stats["enc0"]},
        jnp.asarray(x),
        True,
        mutable=["batch_stats"],
    )
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(np.asarray(got) / scale, want / scale, atol=5e-5)
