"""AOT-compile the spatially-sharded train step for a REAL TPU topology.

Round-2 verdict item 8: all halo/shard_map evidence had only ever
lowered to interpret-mode CPU, while Mosaic compilation of
``pallas_call`` inside ``shard_map`` on an actual TPU backend is
exactly the step that historically throws surprises. This test
compiles the full n_spatial=2 train step (Pallas convs inside
halo-exchange shard_map islands, ops/halo.py) against a v5e 2x4
topology via ``jax.experimental.topologies`` — a compile-only libtpu
client, so no TPU devices are needed. ``MMSEG_FORCE_MOSAIC=1`` makes
the kernels trace for real Mosaic even though the process's default
backend is CPU.

Runs in a subprocess: the conftest pins this process to the
8-virtual-device CPU platform, and topology compilation must configure
JAX before any backend initialization.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


WORKER = r"""
import os, sys
os.environ["MMSEG_FORCE_MOSAIC"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
except Exception as e:
    print("SKIP_NO_TOPOLOGY:", e)
    sys.exit(0)

from multimodal_segmentation_project_tpu.engine import (
    create_train_state, make_optimizer, make_train_step,
)
from multimodal_segmentation_project_tpu.models import UNet3D
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn
from multimodal_segmentation_project_tpu.parallel.mesh import (
    DATA_AXIS, SPATIAL_AXIS, make_mesh, set_active_mesh,
)

n_data, n_spatial = 4, 2
mesh = make_mesh(n_data=n_data, n_spatial=n_spatial, devices=topo.devices)
set_active_mesh(mesh)

model = UNet3D(out_channels=4, features=(8, 16), dropout_rate=0.1,
               dtype=jnp.bfloat16, conv_impl="pallas")
tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=1)
state_shape = jax.eval_shape(
    lambda: create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1, 1, 16, 16, 16), jnp.bfloat16), tx, lr=1e-3,
    )
)
repl = NamedSharding(mesh, P())
state_abs = jax.tree.map(
    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), state_shape
)
img = jax.ShapeDtypeStruct(
    (n_data, 1, 16, 16, 16), jnp.bfloat16,
    sharding=NamedSharding(mesh, P(DATA_AXIS, None, SPATIAL_AXIS)),
)
lbl = jax.ShapeDtypeStruct(
    (n_data, 16, 16, 16), jnp.int32,
    sharding=NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)),
)
rng_abs = jax.eval_shape(lambda: jax.random.key(1))
rng_abs = jax.ShapeDtypeStruct(rng_abs.shape, rng_abs.dtype, sharding=repl)

step = make_train_step(get_loss_fn("ce_tversky"), augment=True)
lowered = jax.jit(step).lower(state_abs, img, lbl, rng_abs)
hlo = lowered.as_text()
assert "custom_call" in hlo, "expected a Mosaic custom call in the lowered HLO"
compiled = lowered.compile()
mem = compiled.memory_analysis()
print("AOT_TOPOLOGY_OK temp_bytes=%d" % mem.temp_size_in_bytes)
"""


def test_sharded_pallas_train_step_compiles_for_v5e_topology():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p
    )
    out = subprocess.run(
        [sys.executable, "-c", WORKER],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=580,
    )
    if "SKIP_NO_TOPOLOGY" in out.stdout:
        pytest.skip("no TPU topology/libtpu support in this environment")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "AOT_TOPOLOGY_OK" in out.stdout, out.stdout + out.stderr


WORKER_FUSED = r"""
import os, sys
os.environ["MMSEG_FORCE_MOSAIC"] = "1"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
except Exception as e:
    print("SKIP_NO_TOPOLOGY:", e)
    sys.exit(0)

from multimodal_segmentation_project_tpu.models.unet3d import DoubleConv

mesh = Mesh(np.array(topo.devices[:1]), ("x",))
repl = NamedSharding(mesh, P())

mod = DoubleConv(features=8, dropout_rate=0.1, dtype=jnp.bfloat16,
                 conv_impl="pallas")
x_abs = jax.ShapeDtypeStruct((1, 4, 16, 16, 16), jnp.bfloat16, sharding=repl)
v_shape = jax.eval_shape(
    lambda r, x: mod.init(r, x, train=False), {"params": jax.random.key(0)}, x_abs
)
v_abs = jax.tree.map(
    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), v_shape
)
key_abs = jax.eval_shape(lambda: jax.random.key(1))
key_abs = jax.ShapeDtypeStruct(key_abs.shape, key_abs.dtype, sharding=repl)


def loss(v, x, key):
    out, _ = mod.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": key})
    return jnp.sum(out.astype(jnp.float32) ** 2)


lowered = jax.jit(jax.grad(loss)).lower(v_abs, x_abs, key_abs)
hlo = lowered.as_text()
assert "custom_call" in hlo, "expected Mosaic custom calls in the lowered HLO"
compiled = lowered.compile()
print("AOT_FUSED_OK temp_bytes=%d" % compiled.memory_analysis().temp_size_in_bytes)
"""


def test_fused_boundary_kernels_compile_for_tpu_target():
    """Mosaic-compile the full default kernel set for a real v5e target
    (kw-stacked dot, shared-pg dw, fused boundary fwd + dx-epilogue
    backward) — interpret mode is permissive; this is the acceptance
    gate a first real-TPU run would otherwise hit."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p
    )
    out = subprocess.run(
        [sys.executable, "-c", WORKER_FUSED],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=580,
    )
    if "SKIP_NO_TOPOLOGY" in out.stdout:
        pytest.skip("no TPU topology/libtpu support in this environment")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "AOT_FUSED_OK" in out.stdout, out.stdout + out.stderr


WORKER_WIDE_LANES = r"""
import os, sys
os.environ["MMSEG_FORCE_MOSAIC"] = "1"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
except Exception as e:
    print("SKIP_NO_TOPOLOGY:", e)
    sys.exit(0)

from multimodal_segmentation_project_tpu.ops import pallas_conv as pc

mesh = Mesh(np.array(topo.devices[:1]), ("x",))
repl = NamedSharding(mesh, P())

# The beyond-192^3 lane-width family (wp=384 at W=380): the kernels'
# scoped-VMEM use depends only on (cin, cout, td, th, wp), not on D,
# so a shallow volume compiles fast while exercising the exact tile
# picks a 256^3 run would use. Round-4 regression: the budget-driven
# td picker chose td=8 here and overflowed the Mosaic scoped stack by
# 2.71M (the unrolled fp32 dot temps are priced only for wide-C or
# wp > 256 shapes — this test pins that gate).
def abs_(shape, dt=jnp.bfloat16):
    return jax.ShapeDtypeStruct(shape, dt, sharding=repl)

CASES = (
    (32, 16, 16, 380, "stats32"),   # 256^3 full-res stats conv (wp=384)
    (16, 16, 16, 380, "plain16"),   # 256^3 full-res plain conv (wp=384)
    (64, 32, 16, 254, "stats64"),   # 256^3 second-level dw (wp=256, C=64; W=254 -> wp=round_up(256,128)=256)
    # In-ENVELOPE td=8 extremes (_stack_temps returns 0 here): the two
    # heaviest stack configurations the exemption can admit — max_c=64
    # with th=16 (cin=32) and with cin=64 — at a D/H divisibility NOT in
    # the benched 192^3 set. Advisor r4 item 4: the exemption boundary
    # is pinned by compilation, not only by the shapes already benched.
    (32, 64, 16, 126, "env32to64"),  # wp=128, th=16, picker must take td=8
    (64, 64, 8, 126, "env64"),       # wp=128, th=8,  picker must take td=8
)
for cin, cout, H, W, tag in CASES:
    x = abs_((1, cin, 8, H, W))
    w = abs_((3, 3, 3, cin, cout))
    b = abs_((cout,))
    if tag.startswith("env"):
        wp = ((W + 127) // 128) * 128
        th = pc._pick_tile_h(H, cin, wp)
        assert pc._pick_tile_d(8, cin, th, wp, 2, cout, 1) == 8, (tag, "fwd")
        # the dw pick may be smaller (its budget formula differs); the
        # grad compile below exercises whatever it picks
    if tag.startswith("stats"):
        a = abs_((1, cin), jnp.float32)
        t = abs_((1, cin), jnp.float32)

        def loss(x, w, b, a, t):
            y, s1, s2 = pc.conv3x3x3_cf_boundary_stats(x, w, b, a, t)
            return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s1) + jnp.sum(s2)

        lowered = jax.jit(jax.grad(loss, argnums=(0, 1, 3, 4))).lower(x, w, b, a, t)
    else:
        def loss(x, w, b):
            return jnp.sum(pc.conv3x3x3_cf(x, w, b).astype(jnp.float32) ** 2)

        lowered = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(x, w, b)
    lowered.compile()
    print("WIDE_LANES_OK", tag)
"""


def test_wide_lane_tile_picks_compile_for_tpu_target():
    """Beyond-192^3 (wp=384) conv tile picks must fit the Mosaic scoped
    stack — guards the budget formulas' temp terms against the 256^3
    OOM regression found in round 4 (see _fwd_vmem_bytes)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p
    )
    out = subprocess.run(
        [sys.executable, "-c", WORKER_WIDE_LANES],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=580,
    )
    if "SKIP_NO_TOPOLOGY" in out.stdout:
        pytest.skip("no TPU topology/libtpu support in this environment")
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.count("WIDE_LANES_OK") == 5, out.stdout + out.stderr
