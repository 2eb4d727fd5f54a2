"""A/B the 192^3 train step under the current env (one config per
process — env flags affect trace-time dispatch, so each variant runs in
its own interpreter; drive with scripts/bench/ab_step.sh-style loops).

Methodology per docs/PERFORMANCE.md "Benchmark hygiene": distinct
inputs per call, host-scalar read closes every timing window.

Usage:  [FLAGS...] python scripts/bench/ab_step.py [--size 192] [--steps 8]
Prints one JSON line {"label": $MMSEG_AB_LABEL, "step_ms": ..., ...}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from multimodal_segmentation_project_tpu.engine import (
        create_train_state, make_optimizer, make_train_step,
    )
    from multimodal_segmentation_project_tpu.models import UNet3D
    from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn

    model = UNet3D(out_channels=4, dropout_rate=0.1, dtype=jnp.bfloat16, remat=True)
    tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=1)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 1, 32, 32, 32), jnp.float32), tx, 1e-3
    )
    step = make_train_step(get_loss_fn("ce_tversky"), augment=True)

    rng = np.random.default_rng(0)
    def batch():
        labels = rng.integers(0, 4, size=(1, args.size) + (args.size,) * 2).astype(np.int32)
        images = (
            labels[:, None] * 0.25
            + rng.normal(0, 0.1, (1, 1, args.size, args.size, args.size))
        ).astype(np.float32)
        return jnp.asarray(images), jnp.asarray(labels)

    data = [batch() for _ in range(args.steps + 2)]
    jax.block_until_ready(data)
    t0 = time.time()
    state, m = step(state, *data[0], jax.random.key(0))
    float(m["loss"])
    compile_s = time.time() - t0
    state, m = step(state, *data[1], jax.random.key(1))
    float(m["loss"])
    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, *data[2 + i], jax.random.key(100 + i))
    float(m["loss"])
    dt = (time.time() - t0) / args.steps
    print(json.dumps({
        "label": os.environ.get("MMSEG_AB_LABEL", "?"),
        "step_ms": round(dt * 1000, 1),
        "samples_per_sec": round(1 / dt, 4),
        "compile_s": round(compile_s, 1),
        "loss": float(m["loss"]),
    }))


if __name__ == "__main__":
    main()
