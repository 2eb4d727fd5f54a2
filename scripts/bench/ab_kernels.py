"""A/B the round-3 kernel switches on the real TPU (one jitted 192^3
train step per configuration, distinct data per timed call per the
relay-caching rules, host-scalar read to close each timing window).

Run: PYTHONPATH=/root/repo:/root/.axon_site python /tmp/ab_kernels.py
(under the default axon platform; takes ~5-10 min of remote compiles
per config — run configs in order of expected value.)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = [
    ("base", {}),
    ("kwstack", {"MMSEG_KW_STACK": "1"}),
    ("dwshared", {"MMSEG_DW_SHARED": "1"}),
    ("boundary", {"MMSEG_FUSE_BOUNDARY": "1"}),
    ("boundary+epi", {"MMSEG_FUSE_BOUNDARY": "1", "MMSEG_BOUNDARY_EPILOGUE": "1"}),
    ("all", {"MMSEG_KW_STACK": "1", "MMSEG_DW_SHARED": "1",
             "MMSEG_FUSE_BOUNDARY": "1", "MMSEG_BOUNDARY_EPILOGUE": "1"}),
]

which = sys.argv[1] if len(sys.argv) > 1 else None


def run_config(name, env):
    import subprocess

    child_env = dict(os.environ)
    child_env.update(env)
    child_env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    code = r"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from multimodal_segmentation_project_tpu.engine import (
    create_train_state, make_optimizer, make_train_step,
)
from multimodal_segmentation_project_tpu.models import UNet3D
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn

SIZE = 192
model = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=True)
tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=1)
state = create_train_state(
    model, jax.random.key(0), jnp.zeros((1, 1, 16, 16, 16), jnp.bfloat16),
    tx, lr=1e-3,
)
step = make_train_step(get_loss_fn("ce_tversky"), augment=True)
rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.normal(size=(1, 1, SIZE, SIZE, SIZE)).astype(np.float32), jnp.bfloat16) for _ in range(6)]
lbls = [jnp.asarray(rng.integers(0, 4, size=(1, SIZE, SIZE, SIZE)).astype(np.int32)) for _ in range(6)]
t0 = time.time()
state, m = step(state, imgs[0], lbls[0], jax.random.key(1))
float(m["loss"])
print(f"compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
N = 5
for i in range(N):
    state, m = step(state, imgs[1 + i], lbls[1 + i], jax.random.key(2 + i))
float(m["loss"])  # host read closes the window
dt = (time.time() - t0) / N
print(f"train step {dt*1000:.1f} ms  ({1.0/dt:.4f} samples/s)", flush=True)
"""
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code], env=child_env,
        capture_output=True, text=True, timeout=1800,
    )
    tail = "\n".join(out.stdout.strip().splitlines()[-2:])
    print(f"== {name} ({time.time()-t0:.0f}s wall) ==\n{tail}", flush=True)
    if out.returncode != 0:
        print(out.stderr[-2000:], flush=True)


for name, env in CONFIGS:
    if which and which != name:
        continue
    run_config(name, env)
