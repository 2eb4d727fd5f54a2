"""Per-kernel device-time accounting of the 192^3 train step.

Runs a few steps under ``jax.profiler.trace`` and buckets XLA-op device
time from the perfetto trace JSON — the methodology behind the
docs/PERFORMANCE.md "where the step goes" tables (round 2/3). Distinct
inputs per call; host-scalar reads close timing windows (relay caching
rules, docs/PERFORMANCE.md "Benchmark hygiene").

Usage:  python scripts/bench/profile_step.py [--size 192] [--steps 3]
Prints a JSON bucket table plus the top-25 ops by device time.
"""
import argparse
import collections
import glob
import gzip
import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def build_step():
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
    return state, step


def batches(size, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        labels = rng.integers(0, 4, size=(1, size, size, size)).astype(np.int32)
        images = (
            labels[:, None] * 0.25 + rng.normal(0, 0.1, (1, 1, size, size, size))
        ).astype(np.float32)
        out.append((jnp.asarray(images), jnp.asarray(labels)))
    return out


BUCKETS = [
    ("pallas_conv", re.compile(r"pallas|custom-call|custom_call", re.I)),
    ("conv_xla", re.compile(r"^%?(convolution|conv)", re.I)),
    ("copy", re.compile(r"copy|transpose|bitcast", re.I)),
    ("pad", re.compile(r"^%?pad", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("fusion", re.compile(r"fusion|loop_", re.I)),
    ("dot", re.compile(r"dot|einsum", re.I)),
]


def bucket_of(name: str) -> str:
    for b, rx in BUCKETS:
        if rx.search(name):
            return b
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/step_trace")
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    state, step = build_step()
    warm = batches(args.size, 2, seed=99)
    t0 = time.time()
    state, m = step(state, *warm[0], jax.random.key(0))
    float(m["loss"])
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)
    state, m = step(state, *warm[1], jax.random.key(1))
    float(m["loss"])

    data = batches(args.size, args.steps)
    with jax.profiler.trace(args.trace_dir):
        for i, (x, y) in enumerate(data):
            state, m = step(state, x, y, jax.random.key(100 + i))
        float(m["loss"])

    traces = sorted(glob.glob(args.trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print(json.dumps({"error": "no trace produced", "dir": args.trace_dir}))
        return
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    # device-track events: pid names containing "TPU"/"device"
    pids = {
        ev["pid"]
        for ev in tr["traceEvents"]
        if ev.get("ph") == "M"
        and ev.get("name") == "process_name"
        and re.search(r"tpu|device|/device:", str(ev.get("args", {}).get("name", "")), re.I)
    }
    # leaf XLA ops only: drop container events (the jit_* wrapper and
    # the bare-numeric per-step module events that re-count the whole
    # step) so buckets sum to the step time instead of 3x it
    meta = re.compile(r"^(jit_|\d+$)")
    per_op = collections.Counter()
    long_of = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in pids and "dur" in ev:
            if meta.match(ev["name"]):
                continue
            per_op[ev["name"]] += ev["dur"]
            a = ev.get("args") or {}
            ln = a.get("long_name") or a.get("tf_op") or a.get("hlo_op") or ""
            if ln and ev["name"] not in long_of:
                long_of[ev["name"]] = str(ln)
    buckets = collections.Counter()
    for name, dur in per_op.items():
        buckets[bucket_of(name)] += dur
    total = sum(buckets.values())
    n = args.steps
    print(json.dumps({
        "total_device_ms_per_step": round(total / 1e3 / n, 1),
        "buckets_ms_per_step": {
            k: round(v / 1e3 / n, 1)
            for k, v in buckets.most_common()
        },
    }))
    for name, dur in per_op.most_common(args.top):
        print(f"{dur / 1e3 / n:8.2f} ms  {name[:60]:60s}  {long_of.get(name, '')[:120]}")


if __name__ == "__main__":
    main()
