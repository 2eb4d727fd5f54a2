#!/usr/bin/env python3
"""Headline benchmark: full-volume 192^3 inference throughput per chip.

The reference's own headline measurement is exactly this: one full
192^3 volume through the 3D U-Net per forward, batch 1, no sliding
window, timed per sample (test_model.py:247-251,358 of
fransiskusbudi/multimodal_segmentation_project). BASELINE.json's metric
line lists "AMOS volumes/sec ... inference per chip" first.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec", "vs_baseline": N}

Also measured and written to BENCH_DETAILS.json:
  * train step throughput (forward+loss+backward+AdamW+metrics+
    on-device augmentation) at the largest volume that fits a single
    v5e chip today. Full 192^3 single-chip training currently exceeds
    the 15.75 GB HBM because XLA stores conv activations lane-padded
    (C=16 -> 8x expansion; see models/unet3d.py docstring); 192^3
    training runs multi-chip via spatial sharding (--n_spatial 2), and
    the in-progress Pallas conv path targets single-chip 192^3.

Baseline note: the reference publishes NO numbers (BASELINE.md;
result sheets not committed). ``REFERENCE_BASELINE_VPS`` is a
documented estimate of the reference's per-A100 inference throughput
for this model/volume: the forward moves ~3-4 GB of activations per
volume through HBM plus ~0.8 TFLOP of conv work; PyTorch eager with
cuDNN at these small channel counts lands around 3-5 volumes/s on an
A100. We take 4.0 volumes/s as a charitable reference point.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_BASELINE_VPS = 4.0  # est. reference volumes/sec per A100 (see docstring)
REFERENCE_BASELINE_TRAIN_SPS = 2.0  # est. reference train samples/sec per A100

SIZE = int(os.environ.get("BENCH_SIZE", "192"))
TRAIN_SIZES = (192, 160, 128)
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_segmentation_project_tpu.engine import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from multimodal_segmentation_project_tpu.models import UNet3D
    from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn
    from multimodal_segmentation_project_tpu.ops.metrics import per_class_dice_iou

    model = UNet3D(out_channels=4, dropout_rate=0.1, dtype=jnp.bfloat16, remat=True)
    tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=1)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 1, 32, 32, 32), jnp.float32), tx, 1e-3
    )
    details = {"device": str(jax.devices()[0]), "volume": SIZE}

    def synth(size):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 4, size=(1, size, size, size)).astype(np.int32)
        images = (
            labels[:, None] * 0.25 + rng.normal(0, 0.1, (1, 1, size, size, size))
        ).astype(np.float32)
        return jnp.asarray(images), jnp.asarray(labels)

    # ---- headline: full-volume inference (test_model.py workload) ----
    @jax.jit
    def predict(variables, images, labels):
        logits = model.apply(variables, images, train=False)
        pred = jnp.argmax(logits, axis=1)
        return pred, per_class_dice_iou(pred, labels, num_classes=4)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images, labels = synth(SIZE)
    t0 = time.time()
    jax.block_until_ready(predict(variables, images, labels))
    details["inference_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    for _ in range(ITERS):
        out = predict(variables, images, labels)
    jax.block_until_ready(out)
    infer_vps = ITERS / (time.time() - t0)
    details["inference_volumes_per_sec"] = round(infer_vps, 4)
    details["inference_ms_per_volume"] = round(1000 / infer_vps, 2)

    # ---- train step at the largest size that fits one chip ----
    step = make_train_step(get_loss_fn("ce_tversky"), augment=True)
    for tsize in TRAIN_SIZES:
        try:
            images, labels = synth(tsize)
            t0 = time.time()
            state, metrics = step(state, images, labels, jax.random.key(0))
            jax.block_until_ready(metrics)
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(ITERS):
                state, metrics = step(state, images, labels, jax.random.key(i))
            jax.block_until_ready(metrics)
            sps = ITERS / (time.time() - t0)
            details.update(
                {
                    "train_volume": tsize,
                    "train_compile_s": round(compile_s, 1),
                    "train_samples_per_sec": round(sps, 4),
                    "train_step_ms": round(1000 / sps, 2),
                    "train_loss": float(metrics["loss"]),
                    "train_vs_reference_est": round(sps / REFERENCE_BASELINE_TRAIN_SPS, 3),
                }
            )
            break
        except Exception as e:  # OOM at this size: fall back
            details[f"train_{tsize}_failed"] = str(e).split("\n")[0][:200]

    details["reference_baseline_vps"] = REFERENCE_BASELINE_VPS
    with open(
        os.path.join(os.path.dirname(__file__) or ".", "BENCH_DETAILS.json"), "w"
    ) as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "inference_volumes_per_sec_192cube_bf16",
                "value": round(infer_vps, 4),
                "unit": "volumes/sec",
                "vs_baseline": round(infer_vps / REFERENCE_BASELINE_VPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
