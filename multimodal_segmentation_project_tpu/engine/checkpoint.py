"""Checkpointing: single-file msgpack save/restore with true resume.

The reference saves torch ``.pth`` dicts (epoch, model/optimizer state,
scalar metrics, encoder_frozen flag) every 25 epochs plus a best-model
file (train_unet.py:471-504) but never reloads optimizer state — there
is NO mid-run resume anywhere in it (SURVEY.md section 5.4). This
engine's checkpoints are a strict superset: the full TrainState
(params, batch_stats, optimizer state, step), the LR-scheduler state,
the epoch counter and best metric, so a killed run resumes exactly.

Format: flax.serialization msgpack in one file + a JSON sidecar with
scalar metadata (inspectable without deserializing arrays). Single-file
msgpack keeps checkpoints trivially portable between hosts; there is no
torch dependency anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    # jax.device_get starts copy_to_host_async on every leaf before
    # converting: transfers overlap. A per-leaf np.asarray loop issues
    # ~300 serial device round trips (minutes over a remote TPU relay).
    return jax.device_get(tree)


def save_checkpoint(path: str, tree: dict, metadata: dict | None = None) -> str:
    """Serialize a pytree (+ JSON metadata sidecar) to ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=float)
    return path


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree. With ``target``, array leaves are restored into
    the target's structure (validating shapes); without, returns the raw
    nested state dict."""
    with open(path, "rb") as f:
        payload = f.read()
    if target is not None:
        return serialization.from_bytes(target, payload)
    return serialization.msgpack_restore(payload)


def load_metadata(path: str) -> dict:
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {}


def state_checkpoint_tree(state, extra: dict | None = None) -> dict:
    """The serializable view of a TrainState (+ scheduler/loop state)."""
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "trainable_mask": state.trainable_mask,
        "lr": state.lr,
    }
    if extra:
        tree.update(extra)
    return tree


def restore_train_state(state, tree: dict):
    """Rebuild a TrainState from a restored checkpoint tree."""
    return state.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        trainable_mask=tree["trainable_mask"],
        lr=tree["lr"],
    )


def load_params_only(path: str, params_target, strict: bool = True):
    """Initialize params (and batch_stats when present) from a checkpoint.

    ``strict=False`` keeps target leaves whose names are missing from the
    checkpoint (the reference's strict=False pretrained load for DANN,
    train_dann.py:410-412). Shape-mismatched leaves are also skipped in
    non-strict mode.
    """
    raw = load_checkpoint(path)
    saved_params = raw.get("params", raw)

    def merge(target, saved):
        if not isinstance(target, dict):
            return target
        out = {}
        for k, v in target.items():
            sk = saved.get(k) if isinstance(saved, dict) else None
            if isinstance(v, dict):
                out[k] = merge(v, sk if isinstance(sk, dict) else {})
            elif sk is not None and np.shape(sk) == np.shape(v):
                out[k] = np.asarray(sk).astype(np.asarray(v).dtype)
            else:
                if strict:
                    raise KeyError(f"checkpoint missing or mismatched param '{k}'")
                out[k] = v
        return out

    merged_params = merge(serialization.to_state_dict(params_target), saved_params)
    params = serialization.from_state_dict(params_target, merged_params)
    batch_stats = raw.get("batch_stats")
    return params, batch_stats


def load_params_any(path: str, params_target, batch_stats_target, strict: bool = True):
    """Initialize params/batch_stats from either a native msgpack
    checkpoint or a reference torch ``.pth`` (auto-detected by suffix).

    Returns (params, batch_stats); batch_stats may be the unchanged
    target when the source carries none.
    """
    if str(path).endswith((".pth", ".pt")):
        from multimodal_segmentation_project_tpu.engine.interop import (
            load_torch_checkpoint,
        )

        return load_torch_checkpoint(
            path, params_target, batch_stats_target, strict=strict
        )
    params, stats = load_params_only(path, params_target, strict=strict)
    batch_stats = batch_stats_target
    if stats:
        from flax import serialization

        batch_stats = serialization.from_state_dict(batch_stats_target, stats)
    return params, batch_stats
