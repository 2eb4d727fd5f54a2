"""Verdict r2 item 10: demonstrate 256^3 single-chip training.

Measures compile + steady-state step time of the full train step
(UNet3D [16,32,64,128], bf16, remat, batch 1) at 256^3 — the
memory-architecture claim (5.4 GB @192^3, ~3x headroom) turned into a
measured capability. Distinct inputs per call; host-scalar reads close
the timing windows (relay caching rules, docs/PERFORMANCE.md)."""
import os, sys, time, json

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.engine import (
    create_train_state, make_optimizer, make_train_step,
)
from multimodal_segmentation_project_tpu.models import UNet3D
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn

SIZE = 256
model = UNet3D(out_channels=4, dropout_rate=0.1, dtype=jnp.bfloat16, remat=True)
tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=1)
state = create_train_state(
    model, jax.random.key(0), jnp.zeros((1, 1, 32, 32, 32), jnp.float32), tx, 1e-3
)
rng = np.random.default_rng(0)


def batch():
    labels = rng.integers(0, 4, size=(1, SIZE, SIZE, SIZE)).astype(np.int32)
    images = (
        labels[:, None] * 0.25 + rng.normal(0, 0.1, (1, 1, SIZE, SIZE, SIZE))
    ).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(labels)


step = make_train_step(get_loss_fn("ce_tversky"), augment=True)

batches = [batch() for _ in range(6)]
jax.block_until_ready(batches)
t0 = time.time()
state, m = step(state, *batches[0], jax.random.key(0))
float(m["loss"])
compile_s = time.time() - t0
state, m = step(state, *batches[1], jax.random.key(1))
float(m["loss"])
t0 = time.time()
n = 0
for i in range(4):
    state, m = step(state, *batches[2 + i], jax.random.key(100 + i))
    n += 1
float(m["loss"])
dt = (time.time() - t0) / n
res = {
    "train_256cube_step_ms": round(dt * 1000, 1),
    "train_256cube_samples_per_sec": round(1 / dt, 4),
    "train_256cube_compile_s": round(compile_s, 1),
    "loss": float(m["loss"]),
}
print(json.dumps(res))

# merge the perf keys into the official details file (same pattern as
# bench.py's _write_details; 'loss' is run-local, not merged)
details_path = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "BENCH_DETAILS.json"
)
try:
    with open(details_path) as f:
        merged = json.load(f)
except (OSError, ValueError):
    merged = {}
merged.update({k: v for k, v in res.items() if k != "loss"})
with open(details_path, "w") as f:
    json.dump(merged, f, indent=2)
