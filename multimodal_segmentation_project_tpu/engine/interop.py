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


def torch_state_dict_to_trees(state_dict: dict, num_levels: int = 4, strict: bool = True):
    """Convert a reference UNet3D state_dict into (params, batch_stats) dicts.

    ``strict=False`` tolerates missing source keys (a PARTIAL reference
    checkpoint): present keys are converted, absent ones are simply left
    out of the returned trees so the caller can keep its target values —
    the reference's ``load_state_dict(..., strict=False)`` pretrained
    path for DANN (train_dann.py:410-412).
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        if value is None:
            return
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def get(key, transform=None):
        if key not in sd:
            if strict:
                raise KeyError(f"torch checkpoint missing key '{key}'")
            return None
        arr = _to_numpy(sd[key])
        if transform is not None:
            arr = transform(arr)
        return arr.astype(np.float32)

    def convert_double_conv(src_prefix: str, dst: tuple):
        for j, conv_idx, bn_idx in ((0, 0, 1), (1, 4, 5)):
            put(params, dst + (f"conv{j}", "kernel"),
                get(f"{src_prefix}.double_conv.{conv_idx}.weight",
                    lambda w: np.transpose(w, (2, 3, 4, 1, 0))))
            put(params, dst + (f"conv{j}", "bias"),
                get(f"{src_prefix}.double_conv.{conv_idx}.bias"))
            put(params, dst + (f"bn{j}", "scale"),
                get(f"{src_prefix}.double_conv.{bn_idx}.weight"))
            put(params, dst + (f"bn{j}", "bias"),
                get(f"{src_prefix}.double_conv.{bn_idx}.bias"))
            put(stats, dst + (f"bn{j}", "mean"),
                get(f"{src_prefix}.double_conv.{bn_idx}.running_mean"))
            put(stats, dst + (f"bn{j}", "var"),
                get(f"{src_prefix}.double_conv.{bn_idx}.running_var"))

    for i in range(num_levels):
        convert_double_conv(f"encoder.{i}", (f"enc{i}",))
    convert_double_conv("bottleneck", ("bottleneck",))
    for i in range(num_levels):
        put(params, (f"dec{i}", "up", "kernel"),
            get(f"upconvs.{i}.weight",  # (Cin, Cout, 2, 2, 2)
                lambda w: np.transpose(w, (2, 3, 4, 0, 1))))
        put(params, (f"dec{i}", "up", "bias"), get(f"upconvs.{i}.bias"))
        convert_double_conv(f"decoder.{i}", (f"dec{i}", "conv"))

    put(params, ("head_kernel",),
        get("final_conv.weight", lambda w: w[:, :, 0, 0, 0].T))  # (Cout,Cin,1,1,1)
    put(params, ("head_bias",), get("final_conv.bias"))
    return params, stats


def _merge_into(target: dict, saved: dict, strict: bool, path: str = ""):
    """Recursively overlay ``saved`` leaves onto ``target`` structure.

    Missing or shape-mismatched leaves keep the target value in
    non-strict mode and raise KeyError in strict mode."""
    out = {}
    for k, v in target.items():
        here = f"{path}/{k}" if path else k
        sk = saved.get(k) if isinstance(saved, dict) else None
        if isinstance(v, dict):
            out[k] = _merge_into(v, sk if isinstance(sk, dict) else {}, strict, here)
        elif sk is not None and np.shape(sk) == np.shape(v):
            out[k] = np.asarray(sk).astype(np.asarray(v).dtype)
        else:
            if strict:
                raise KeyError(f"checkpoint missing or mismatched param '{here}'")
            out[k] = v
    return out


def load_torch_checkpoint(path: str, params_target, batch_stats_target, strict: bool = True):
    """Load a reference ``.pth`` checkpoint into this framework's trees.

    ``strict=False`` merges whatever the checkpoint carries and keeps
    target values for anything missing (train_dann.py:410-412 semantics).
    """
    import torch
    from flax import serialization

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    num_levels = len([k for k in params_target if k.startswith("enc")])
    raw_params, raw_stats = torch_state_dict_to_trees(
        sd, num_levels=num_levels, strict=strict
    )
    params = serialization.from_state_dict(
        params_target,
        _merge_into(serialization.to_state_dict(params_target), raw_params, strict),
    )
    batch_stats = serialization.from_state_dict(
        batch_stats_target,
        _merge_into(serialization.to_state_dict(batch_stats_target), raw_stats, strict),
    )
    return params, batch_stats
