"""Checkpoint interop: import reference PyTorch ``.pth`` weights.

Lets a user of the reference stack (fransiskusbudi/multimodal_segmentation_project)
bring trained models across. Maps the reference UNet3D state_dict
(models/unet.py:34-62 module structure) onto this framework's param /
batch_stats trees:

  reference (torch, NCDHW)                      this framework
  ------------------------------------------   -------------------------------
  encoder.{i}.double_conv.{0|4}.weight          enc{i}/conv{0|1}/kernel (DHWIO)
  encoder.{i}.double_conv.{1|5}.{weight,bias}   enc{i}/bn{0|1}/{scale,bias}
  encoder.{i}.double_conv.{1|5}.running_*       batch_stats enc{i}/bn{0|1}/*
  bottleneck.double_conv...                     bottleneck/...
  upconvs.{i}.{weight,bias}                     dec{i}/up/{kernel,bias}
  decoder.{i}.double_conv...                    dec{i}/conv/...
  module. prefixes (DDP)                        stripped (test_model.py:384)
  final_conv.{weight,bias}                      head_kernel/head_bias

Weight layout conversions: Conv3d OIDHW -> DHWIO; ConvTranspose3d
(Cin, Cout, kD,kH,kW) -> (kD,kH,kW,Cin,Cout); 1x1x1 head -> (Cin, Cout).
"""

from __future__ import annotations

import numpy as np


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def torch_state_dict_to_trees(state_dict: dict, num_levels: int = 4):
    """Convert a reference UNet3D state_dict into (params, batch_stats) dicts."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def convert_double_conv(src_prefix: str, dst: tuple):
        for j, conv_idx, bn_idx in ((0, 0, 1), (1, 4, 5)):
            w = _to_numpy(sd[f"{src_prefix}.double_conv.{conv_idx}.weight"])
            b = _to_numpy(sd[f"{src_prefix}.double_conv.{conv_idx}.bias"])
            put(params, dst + (f"conv{j}", "kernel"),
                np.transpose(w, (2, 3, 4, 1, 0)).astype(np.float32))
            put(params, dst + (f"conv{j}", "bias"), b.astype(np.float32))
            put(params, dst + (f"bn{j}", "scale"),
                _to_numpy(sd[f"{src_prefix}.double_conv.{bn_idx}.weight"]).astype(np.float32))
            put(params, dst + (f"bn{j}", "bias"),
                _to_numpy(sd[f"{src_prefix}.double_conv.{bn_idx}.bias"]).astype(np.float32))
            put(stats, dst + (f"bn{j}", "mean"),
                _to_numpy(sd[f"{src_prefix}.double_conv.{bn_idx}.running_mean"]).astype(np.float32))
            put(stats, dst + (f"bn{j}", "var"),
                _to_numpy(sd[f"{src_prefix}.double_conv.{bn_idx}.running_var"]).astype(np.float32))

    for i in range(num_levels):
        convert_double_conv(f"encoder.{i}", (f"enc{i}",))
    convert_double_conv("bottleneck", ("bottleneck",))
    for i in range(num_levels):
        tw = _to_numpy(sd[f"upconvs.{i}.weight"])  # (Cin, Cout, 2, 2, 2)
        put(params, (f"dec{i}", "up", "kernel"),
            np.transpose(tw, (2, 3, 4, 0, 1)).astype(np.float32))
        put(params, (f"dec{i}", "up", "bias"),
            _to_numpy(sd[f"upconvs.{i}.bias"]).astype(np.float32))
        convert_double_conv(f"decoder.{i}", (f"dec{i}", "conv"))

    fw = _to_numpy(sd["final_conv.weight"])  # (Cout, Cin, 1, 1, 1)
    params["head_kernel"] = fw[:, :, 0, 0, 0].T.astype(np.float32)
    params["head_bias"] = _to_numpy(sd["final_conv.bias"]).astype(np.float32)
    return params, stats


def load_torch_checkpoint(path: str, params_target, batch_stats_target):
    """Load a reference ``.pth`` checkpoint into this framework's trees."""
    import torch
    from flax import serialization

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    num_levels = len([k for k in params_target if k.startswith("enc")])
    raw_params, raw_stats = torch_state_dict_to_trees(sd, num_levels=num_levels)
    params = serialization.from_state_dict(
        params_target, serialization.to_state_dict(raw_params)
    )
    batch_stats = serialization.from_state_dict(
        batch_stats_target, serialization.to_state_dict(raw_stats)
    )
    return params, batch_stats
