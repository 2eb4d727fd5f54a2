"""Worker process for tests/test_multihost.py.

Each of 2 OS processes initializes ``jax.distributed`` on CPU (the
TPU-native replacement for the reference's
``accelerate launch --num_processes=2`` NCCL group,
run_training.sh:66 / train_unet.py:384-386), runs the SAME short
Trainer loop over a 2-device global mesh, and reports a digest of its
final replicated parameters so the test can assert both ranks computed
identical params and only rank 0 wrote CSV/checkpoints.

Usage: python multihost_worker.py <rank> <port> <outdir>
"""

from __future__ import annotations

import json
import os
import sys


class BlobDataset:
    """Deterministic synthetic segmentation task (both ranks build the
    identical dataset — the multi-host contract is same-global-batch
    per step, sharded over the mesh's data axis)."""

    def __init__(self, n=4, seed=0, size=8):
        import numpy as np

        rng = np.random.default_rng(seed)
        self.items = []
        for _ in range(n):
            lbl = np.zeros((size, size, size), np.int32)
            lbl[2:6, 2:6, 2:6] = 1
            lbl[0:2, 0:2, 0:2] = 2
            img = lbl[None] * 0.5 + rng.normal(0, 0.05, (1, size, size, size))
            self.items.append((img.astype(np.float32), lbl))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def main() -> None:
    rank, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank

    import numpy as np

    from multimodal_segmentation_project_tpu.engine.trainer import (
        Trainer,
        TrainerConfig,
    )

    # separate experiment_dir per rank simulates per-host filesystems:
    # rank 1's tree must stay empty (every write is rank-0 gated)
    cfg = TrainerConfig(
        experiment_dir=os.path.join(outdir, f"rank{rank}"),
        experiment_name="mh",
        epochs=2,
        batch_size=2,
        lr=3e-3,
        loss="ce_tversky",
        dropout_rate=0.0,
        features=(4, 8),
        precision="fp32",
        remat=False,
        num_workers=0,
        verbose=False,
        checkpoint_every=1,
        auto_spatial=False,
        use_scheduler=True,
    )
    t = Trainer(cfg, BlobDataset(4), BlobDataset(2, seed=1))
    assert t.mesh.size == 2, t.mesh
    summary = t.run()

    params = jax.device_get(t.state.params)
    digest = float(sum(np.abs(leaf).sum() for leaf in jax.tree.leaves(params)))
    print(
        "MHRESULT "
        + json.dumps(
            {
                "rank": rank,
                "digest": digest,
                "best_val_dice": summary["best_val_dice"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
