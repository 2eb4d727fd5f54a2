"""The shared training engine: ONE epoch loop for all four workloads.

The reference duplicates its loop, logging, checkpointing and plotting
code across train_unet.py, finetune_ct.py, distill_unet.py and
train_dann.py (SURVEY.md section 1). Here a single Trainer owns the
loop; the workloads differ only in their jitted step, their datasets,
and a handful of config flags:

  * baseline   = Trainer(step=train, augment=True, plateau scheduler)
  * fine-tune  = Trainer(step=train, pretrained init, freeze mask over
                 encoder+bottleneck, no scheduler, no augmentation)
  * distill    = Trainer(step=distill, frozen teacher variables)
  * DANN       = DannTrainer (two states, zipped source/target streams)

Loop-semantics parity with the reference:
  * epoch metrics = mean of per-batch metric means
    (train_unet.py:254-257);
  * plateau scheduler stepped on val dice (train_unet.py:381,442);
  * freeze at epoch N / unfreeze at N+1 with a FRESH optimizer at each
    boundary (train_unet.py:413-431);
  * checkpoint every 25 epochs + best-by-val-dice
    (train_unet.py:471-504);
  * early stopping on val-dice patience (train_unet.py:505-511);
  * CSV schema and experiments/<name>/{checkpoints,logs,plots} layout.

TPU-first differences:
  * metrics accumulate ON DEVICE as running sums; the host reads them
    once per epoch (the reference NCCL-gathers 4 scalars every step,
    train_unet.py:235-238 — a per-step device sync);
  * one TrainState donated through the jitted step (no DDP wrapper, no
    GradScaler);
  * true resume (--resume) restores params, optimizer, scheduler and
    epoch — the reference saves optimizer state but can never reload it
    (SURVEY.md section 5.4).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_segmentation_project_tpu.data.pipeline import DataLoader
from multimodal_segmentation_project_tpu.engine import checkpoint as ckpt
from multimodal_segmentation_project_tpu.engine.schedule import ReduceLROnPlateau
from multimodal_segmentation_project_tpu.engine.state import (
    create_train_state,
    freeze_mask,
    make_optimizer,
    ones_mask,
)
from multimodal_segmentation_project_tpu.engine.steps import (
    make_dann_step,
    make_distill_step,
    make_sharded_eval_step,
    make_train_step,
)
from multimodal_segmentation_project_tpu.models import UNet3D
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn
from multimodal_segmentation_project_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    set_active_mesh,
)
from multimodal_segmentation_project_tpu.utils.experiment import (
    ExperimentPaths,
    format_time,
    log_device_usage,
    write_config,
)
from multimodal_segmentation_project_tpu.utils.plotting import plot_training_metrics


@dataclass
class TrainerConfig:
    experiment_dir: str
    experiment_name: str
    epochs: int = 100
    batch_size: int = 1
    lr: float = 1e-3
    weight_decay: float = 0.01
    grad_accum: int = 1
    loss: str = "ce_tversky"
    dropout_rate: float = 0.1
    seed: int = 42
    augment: bool = False
    use_scheduler: bool = False
    freeze_encoder_epoch: int | None = None
    freeze_at_start: bool = False
    freeze_prefixes: tuple = ("enc",)
    early_stopping: bool = False
    patience: int = 10
    precision: str = "bf16"
    remat: bool = True
    features: tuple = (16, 32, 64, 128)
    num_classes: int = 4
    n_spatial: int = 1
    # when the global batch cannot fill the device count, auto-raise
    # n_spatial (halo-exchange volume sharding) to use the idle chips
    auto_spatial: bool = True
    checkpoint_every: int = 25
    log_name: str = "train_log.csv"
    ckpt_prefix: str = "checkpoint"
    best_prefix: str = "best_model"
    resume: str | None = None
    nan_guard: bool = True
    profile_first_epoch: bool = False
    pretrained_model: str | None = None
    pretrained_strict: bool = True
    num_workers: int = 2
    n_data: int | None = None  # data-parallel axis size (None = auto)
    verbose: bool = True
    plot_title: str = "Training Metrics"
    extra_config: dict = field(default_factory=dict)


def build_model(cfg: TrainerConfig) -> UNet3D:
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    return UNet3D(
        out_channels=cfg.num_classes,
        features=cfg.features,
        dropout_rate=cfg.dropout_rate,
        dtype=dtype,
        remat=cfg.remat,
    )


class Trainer:
    """Shared engine for baseline / fine-tune / distillation workloads."""

    CSV_COLUMNS = [
        "epoch", "time", "train_loss", "val_loss", "train_dice", "val_dice",
        "train_iou", "val_iou", "train_acc", "val_acc", "encoder_frozen",
    ]

    def __init__(
        self,
        cfg: TrainerConfig,
        train_dataset,
        val_dataset,
        sample_shape: tuple | None = None,
        teacher_variables: dict | None = None,
        kd_loss_fn: Callable | None = None,
    ):
        self.cfg = cfg
        # every filesystem write is rank-0-gated: on a multi-host pod the
        # other processes compute the identical replicated state and
        # write nothing (reference parity: accelerator.is_main_process)
        is_main = jax.process_index() == 0
        self.paths = ExperimentPaths.create(
            cfg.experiment_dir, cfg.experiment_name, make_dirs=is_main
        )
        if is_main:
            write_config(
                os.path.join(self.paths.root, "config.txt"),
                {**cfg.__dict__, **cfg.extra_config},
            )
        self.device_log = os.path.join(self.paths.logs, "device_usage.log")
        if is_main:
            log_device_usage(self.device_log)

        if sample_shape is None:
            img0, _ = train_dataset[0]
            sample_shape = (1,) + img0.shape

        n_total = max(len(jax.devices()), 1)
        n_data = cfg.n_data
        n_spatial = cfg.n_spatial
        avail = max(n_total // n_spatial, 1)
        if n_data is None:
            # largest data-parallel degree that divides the global batch.
            # NOTE: batch_size is the GLOBAL batch (the reference's is
            # per-device, run_training.sh:24 x num_processes).
            n_data = next(d for d in range(avail, 0, -1) if cfg.batch_size % d == 0)
            if (
                cfg.auto_spatial
                and n_spatial == 1
                and n_data < n_total
                and n_total % n_data == 0
            ):
                # the batch alone cannot fill the mesh (the shipped
                # default BATCH_SIZE=1 on an N-chip pod): auto-raise the
                # spatial axis so halo-exchange sharding of the volume's
                # D dimension uses the idle chips instead of warning
                # about them. Candidate must divide D at EVERY pooling
                # level or the deep convs fall back to replicated work.
                cand = n_total // n_data
                depth = sample_shape[2]
                depths = [depth >> i for i in range(len(cfg.features) + 1)]
                while cand > 1 and any(d % cand for d in depths):
                    cand //= 2
                if cand > 1:
                    n_spatial = cand
                    self._print(
                        f"[MESH] global batch {cfg.batch_size} fills only "
                        f"{n_data}/{n_total} chips with data parallelism — "
                        f"auto-raising spatial sharding to n_spatial={cand} "
                        f"({n_data}x{cand} mesh, volume D split across chips)"
                    )
        if n_data * n_spatial < n_total:
            self._warn_idle_chips(n_data * n_spatial, n_total)
        self.mesh = make_mesh(n_data=n_data, n_spatial=n_spatial)
        # convs consult the active mesh at trace time: with n_spatial>1
        # they run inside halo-exchange shard_map islands (ops/halo.py)
        set_active_mesh(self.mesh)
        data_par = self.mesh.shape["data"]
        self.train_loader = DataLoader(
            train_dataset,
            batch_size=cfg.batch_size,
            shuffle=True,
            seed=cfg.seed,
            num_workers=cfg.num_workers,
            drop_last=data_par > 1,
        )
        # validation: n_data DISTINCT volumes per step, one per
        # data-parallel group (round 1 replicated each batch-1 volume
        # over the mesh — 1/N useful eval work per chip)
        self.val_loader = DataLoader(
            val_dataset,
            batch_size=data_par,
            shuffle=False,
            num_workers=cfg.num_workers,
        )

        model = build_model(cfg)
        self.model = model
        tx = make_optimizer(cfg.weight_decay, cfg.grad_accum)
        state = create_train_state(
            model,
            jax.random.key(cfg.seed),
            jnp.zeros(sample_shape, jnp.float32),
            tx,
            cfg.lr,
        )

        if cfg.pretrained_model:
            # accepts native .msgpack or reference torch .pth checkpoints
            params, batch_stats = ckpt.load_params_any(
                cfg.pretrained_model,
                state.params,
                state.batch_stats,
                strict=cfg.pretrained_strict,
            )
            state = state.replace(params=params, batch_stats=batch_stats)

        self.encoder_frozen = False
        if cfg.freeze_at_start:
            state = state.with_mask(freeze_mask(state.params, cfg.freeze_prefixes))
            self.encoder_frozen = True
            self._report_freeze(state)

        self.state = replicate_state(self.mesh, state)
        self.teacher_variables = (
            replicate_state(self.mesh, teacher_variables) if teacher_variables else None
        )

        loss_fn = get_loss_fn(cfg.loss)
        self.loss_fn = loss_fn
        if teacher_variables is not None:
            assert kd_loss_fn is not None
            self.train_step = make_distill_step(
                kd_loss_fn, augment=cfg.augment, nan_guard=cfg.nan_guard
            )
        else:
            self.train_step = make_train_step(
                loss_fn, augment=cfg.augment, nan_guard=cfg.nan_guard
            )
        self.eval_step = make_sharded_eval_step(loss_fn)

        self.scheduler = (
            ReduceLROnPlateau(cfg.lr, mode="max", patience=10, factor=0.1, min_lr=1e-6)
            if cfg.use_scheduler
            else None
        )
        self.log_file = os.path.join(self.paths.logs, cfg.log_name)
        self.best_val_dice = 0.0
        self.start_epoch = 0
        self._base_key = jax.random.key(cfg.seed + 1)

        if cfg.resume:
            self._resume(cfg.resume)
            # resumed runs land in a freshly timestamped experiment dir,
            # so their log starts empty and still needs the header
            if not os.path.exists(self.log_file):
                self._write_csv_header()
        else:
            self._write_csv_header()

    # ---------- helpers ----------

    def _print(self, *args):
        if self.cfg.verbose and jax.process_index() == 0:
            print(*args, flush=True)

    def _warn_idle_chips(self, used: int, total: int):
        msg = (
            f"[WARN] the {used}-device mesh uses only {used} of {total} "
            f"available chips — {total - used} sit IDLE every step. "
            f"batch_size here is the GLOBAL batch (the reference's "
            f"--batch_size is per-device); raise batch_size, or n_spatial, "
            f"so n_data * n_spatial = {total}."
        )
        if jax.process_index() == 0:
            print("=" * 72, flush=True)
            print(msg, flush=True)
            print("=" * 72, flush=True)

    def _report_freeze(self, state):
        mask = state.trainable_mask
        frozen = trainable = 0
        for p, m in zip(jax.tree.leaves(state.params), jax.tree.leaves(mask)):
            if float(m) == 0.0:
                frozen += int(np.prod(p.shape))
            else:
                trainable += int(np.prod(p.shape))
        total = frozen + trainable
        self._print(
            f"[FREEZE] frozen={frozen:,} ({frozen / total * 100:.1f}%) "
            f"trainable={trainable:,} ({trainable / total * 100:.1f}%)"
        )

    def _write_csv_header(self):
        if jax.process_index() != 0:
            return
        with open(self.log_file, "w") as f:
            f.write(",".join(self.CSV_COLUMNS) + "\n")

    def _append_csv(self, row):
        if jax.process_index() != 0:  # rank gating (multi-host pods)
            return
        with open(self.log_file, "a") as f:
            f.write(",".join(str(v) for v in row) + "\n")

    def _step_key(self, epoch: int, step: int):
        return jax.random.fold_in(jax.random.fold_in(self._base_key, epoch), step)

    def _put_train(self, images, labels):
        return (
            jax.device_put(images, batch_sharding(self.mesh, images.ndim)),
            jax.device_put(labels, batch_sharding(self.mesh, labels.ndim)),
        )

    @staticmethod
    def _accumulate(total, metrics):
        if total is None:
            return {k: v for k, v in metrics.items()}
        return {k: total[k] + metrics[k] for k in total}

    @staticmethod
    def _finalize(total, n):
        """One host sync per epoch. device_get here also anchors the
        per-epoch wall time: without it the async dispatch queue would
        drain into the NEXT epoch's first sync and skew the CSV `time`
        column."""
        if total is None or n == 0:
            return {}
        host = jax.device_get(total)
        return {k: float(v) / n for k, v in host.items()}

    # ---------- freeze schedule (train_unet.py:413-431 semantics) ----------

    def _apply_freeze_schedule(self, epoch: int):
        fe = self.cfg.freeze_encoder_epoch
        if fe is None:
            return
        if epoch == fe and not self.encoder_frozen:
            self._print(f"[INFO] freezing {self.cfg.freeze_prefixes} at epoch {epoch + 1}")
            self.state = self.state.with_mask(
                freeze_mask(self.state.params, self.cfg.freeze_prefixes)
            )
            self.encoder_frozen = True
            self._report_freeze(self.state)
        elif epoch == fe + 1 and self.encoder_frozen:
            self._print(f"[INFO] unfreezing at epoch {epoch + 1}")
            self.state = self.state.with_mask(ones_mask(self.state.params))
            self.encoder_frozen = False

    # ---------- epochs ----------

    def train_epoch(self, epoch: int) -> dict:
        total, n = None, 0
        for step_idx, (images, labels) in enumerate(self.train_loader):
            images, labels = self._put_train(images, labels)
            key = self._step_key(epoch, step_idx)
            if self.teacher_variables is not None:
                self.state, metrics = self.train_step(
                    self.state, self.teacher_variables, images, labels, key
                )
            else:
                self.state, metrics = self.train_step(self.state, images, labels, key)
            total = self._accumulate(total, metrics)
            n += 1
        return self._finalize(total, n)

    def eval_epoch(self) -> dict:
        """Validation over distinct volumes sharded across the data axis.

        A ragged final batch is padded by repeating its first volume;
        pad entries carry weight 0 so they never influence the metrics
        (the repeated forward is wasted FLOPs on up to n_data-1 chips of
        ONE step per epoch — the padding keeps shapes static so the step
        compiles once).
        """
        data_par = self.mesh.shape["data"]
        total = None
        for images, labels in self.val_loader:
            b = images.shape[0]
            weights = np.ones((b,), np.float32)
            if b < data_par:
                pad = data_par - b
                images = np.concatenate([images, np.repeat(images[:1], pad, 0)], 0)
                labels = np.concatenate([labels, np.repeat(labels[:1], pad, 0)], 0)
                weights = np.concatenate([weights, np.zeros((pad,), np.float32)])
            images, labels = self._put_train(images, labels)
            weights = jax.device_put(
                weights, batch_sharding(self.mesh, ndim=weights.ndim)
            )
            metrics = self.eval_step(self.state, images, labels, weights)
            total = self._accumulate(total, metrics)
        if total is None:
            return {}
        host = jax.device_get(total)
        n = max(float(host.pop("n")), 1.0)
        return {k: float(v) / n for k, v in host.items()}

    # ---------- checkpoints ----------

    def _ckpt_extra(self, epoch, train_metrics, val_metrics):
        return {
            "epoch": jnp.asarray(epoch + 1),
            "best_val_dice": jnp.asarray(self.best_val_dice),
        }

    def _metadata(self, epoch, train_metrics, val_metrics):
        return {
            "epoch": epoch + 1,
            "train_loss": train_metrics.get("loss"),
            "val_loss": val_metrics.get("loss"),
            "train_dice": train_metrics.get("dice"),
            "val_dice": val_metrics.get("dice"),
            "encoder_frozen": self.encoder_frozen,
            "scheduler": self.scheduler.state_dict() if self.scheduler else None,
        }

    def save_checkpoint(self, path, epoch, train_metrics, val_metrics):
        if jax.process_index() != 0:  # params replicated; rank 0 writes
            return
        ckpt.save_checkpoint(
            path,
            ckpt.state_checkpoint_tree(
                self.state, self._ckpt_extra(epoch, train_metrics, val_metrics)
            ),
            metadata=self._metadata(epoch, train_metrics, val_metrics),
        )

    def _resume(self, path: str):
        tree = ckpt.load_checkpoint(
            path, ckpt.state_checkpoint_tree(self.state, self._ckpt_extra(0, {}, {}))
        )
        self.state = ckpt.restore_train_state(self.state, tree)
        self.start_epoch = int(tree["epoch"])
        self.best_val_dice = float(tree["best_val_dice"])
        meta = ckpt.load_metadata(path)
        if self.scheduler and meta.get("scheduler"):
            self.scheduler.load_state_dict(meta["scheduler"])
        self.encoder_frozen = bool(meta.get("encoder_frozen", False))
        self._print(f"[RESUME] from {path} at epoch {self.start_epoch}")
        return tree

    # ---------- the loop ----------

    def run(self) -> dict:
        cfg = self.cfg
        patience_counter = 0
        run_start = time.time()
        summary = {}
        for epoch in range(self.start_epoch, cfg.epochs):
            epoch_start = time.time()
            self._apply_freeze_schedule(epoch)

            if cfg.profile_first_epoch and epoch == self.start_epoch:
                profile_dir = os.path.join(self.paths.logs, "profile")
                self._print(f"[PROFILE] tracing epoch {epoch + 1} -> {profile_dir}")
                with jax.profiler.trace(profile_dir):
                    train_metrics = self.train_epoch(epoch)
            else:
                train_metrics = self.train_epoch(epoch)
            val_metrics = self.eval_epoch()
            if not val_metrics:
                # empty validation loader: skip scheduler/best-model logic
                # instead of KeyError-ing after a full training epoch (the
                # reference crashes here too — train_unet.py:442 on an
                # empty val split; "the reference also crashes" is not
                # the bar)
                if epoch == self.start_epoch:
                    self._print(
                        "[WARN] validation set is empty — scheduler, best-model "
                        "checkpointing and early stopping are disabled"
                    )
            if train_metrics.get("nonfinite", 0) > 0:
                self._print(
                    f"[WARN] {train_metrics['nonfinite'] * 100:.1f}% of steps "
                    f"in epoch {epoch + 1} had non-finite gradients (skipped)"
                )

            if self.scheduler is not None and "dice" in val_metrics:
                new_lr = self.scheduler.step(val_metrics["dice"])
                self.state = self.state.with_lr(new_lr)
                self._print(f"[LR] learning rate after epoch {epoch + 1}: {new_lr}")

            epoch_time = time.time() - epoch_start
            self._log_epoch(epoch, epoch_time, train_metrics, val_metrics)
            if jax.process_index() == 0:
                log_device_usage(self.device_log, tag=f"epoch={epoch + 1}")

            if (epoch + 1) % cfg.checkpoint_every == 0:
                name = f"{cfg.ckpt_prefix}_epoch{epoch + 1}_{cfg.experiment_name}.msgpack"
                self.save_checkpoint(
                    os.path.join(self.paths.checkpoints, name),
                    epoch, train_metrics, val_metrics,
                )

            if val_metrics.get("dice", -1.0) > self.best_val_dice:
                self.best_val_dice = val_metrics["dice"]
                patience_counter = 0
                name = f"{cfg.best_prefix}_{cfg.experiment_name}.msgpack"
                self.save_checkpoint(
                    os.path.join(self.paths.checkpoints, name),
                    epoch, train_metrics, val_metrics,
                )
            elif cfg.early_stopping:
                patience_counter += 1
                if patience_counter >= cfg.patience:
                    self._print(
                        f"[EARLY STOPPING] no val-dice improvement for "
                        f"{cfg.patience} epochs; stopping at epoch {epoch + 1}"
                    )
                    break

            summary = {"train": train_metrics, "val": val_metrics, "epoch": epoch + 1}

        if jax.process_index() == 0:
            try:
                plot_training_metrics(
                    self.log_file, self.paths.plots, title=cfg.plot_title
                )
            except Exception as e:  # plotting must never kill a finished run
                self._print(f"[WARN] plotting failed: {e}")
        total = time.time() - run_start
        self._print(
            f"[END] training completed in {format_time(total)}; "
            f"best val dice {self.best_val_dice:.4f}"
        )
        summary["best_val_dice"] = self.best_val_dice
        return summary

    def _log_epoch(self, epoch, epoch_time, tm, vm):
        if not vm:  # empty validation loader: NaN columns, keep the schema
            vm = {k: float("nan") for k in ("loss", "dice", "iou", "acc")}
        self._print(
            f"[EPOCH] {epoch + 1}/{self.cfg.epochs} - {format_time(epoch_time)} | "
            f"Train Loss: {tm['loss']:.4f} | Val Loss: {vm['loss']:.4f} | "
            f"Train Dice: {tm['dice']:.4f} | Val Dice: {vm['dice']:.4f} | "
            f"Train IoU: {tm['iou']:.4f} | Val IoU: {vm['iou']:.4f} | "
            f"Train Acc: {tm['acc']:.4f} | Val Acc: {vm['acc']:.4f} | "
            f"Frozen: {self.encoder_frozen}"
        )
        self._append_csv(
            [
                epoch + 1, epoch_time, tm["loss"], vm["loss"], tm["dice"], vm["dice"],
                tm["iou"], vm["iou"], tm["acc"], vm["acc"], self.encoder_frozen,
            ]
        )


class DannTrainer(Trainer):
    """DANN: zipped source/target streams, seg + discriminator states.

    Loop parity with train_dann.py:225-301 (epoch length = min of the
    two loaders, metrics on the source stream, validation on the target
    modality's val split).
    """

    CSV_COLUMNS = [
        "epoch", "time", "train_loss", "task_loss", "domain_loss", "val_loss",
        "train_dice", "val_dice", "train_iou", "val_iou", "train_acc", "val_acc",
        "encoder_frozen",
    ]

    def __init__(
        self,
        cfg: TrainerConfig,
        source_dataset,
        target_dataset,
        val_dataset,
        lambda_domain: float = 0.1,
        sample_shape: tuple | None = None,
    ):
        self.lambda_domain = lambda_domain
        super().__init__(cfg, source_dataset, val_dataset, sample_shape=sample_shape)
        self.target_loader = DataLoader(
            target_dataset,
            batch_size=cfg.batch_size,
            shuffle=True,
            seed=cfg.seed + 1000,
            num_workers=cfg.num_workers,
            drop_last=self.mesh.shape["data"] > 1,
        )

        from multimodal_segmentation_project_tpu.engine.state import TrainState
        from multimodal_segmentation_project_tpu.models import DomainDiscriminator

        disc = DomainDiscriminator()
        feat_dim = self.model.bottleneck_features
        disc_vars = disc.init({"params": jax.random.key(cfg.seed + 7)},
                              jnp.zeros((1, feat_dim)))
        tx = make_optimizer(cfg.weight_decay, cfg.grad_accum)
        disc_state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=disc_vars["params"],
            batch_stats={},
            opt_state=tx.init(disc_vars["params"]),
            trainable_mask=ones_mask(disc_vars["params"]),
            lr=jnp.asarray(cfg.lr, jnp.float32),
            apply_fn=disc.apply,
            tx=tx,
        )
        self.disc_state = replicate_state(self.mesh, disc_state)
        self.dann_step = make_dann_step(
            self.loss_fn, lambda_domain, nan_guard=cfg.nan_guard
        )

    def train_epoch(self, epoch: int) -> dict:
        total, n = None, 0
        for step_idx, ((src_img, src_lbl), (tgt_img, _)) in enumerate(
            zip(self.train_loader, self.target_loader)
        ):
            src_img, src_lbl = self._put_train(src_img, src_lbl)
            tgt_img = jax.device_put(tgt_img, batch_sharding(self.mesh, tgt_img.ndim))
            key = self._step_key(epoch, step_idx)
            self.state, self.disc_state, metrics = self.dann_step(
                self.state, self.disc_state, src_img, src_lbl, tgt_img, key
            )
            total = self._accumulate(total, metrics)
            n += 1
        return self._finalize(total, n)

    def _ckpt_extra(self, epoch, train_metrics, val_metrics):
        extra = super()._ckpt_extra(epoch, train_metrics, val_metrics)
        extra["disc_params"] = self.disc_state.params
        extra["disc_opt_state"] = self.disc_state.opt_state
        return extra

    def _metadata(self, epoch, tm, vm):
        meta = super()._metadata(epoch, tm, vm)
        meta.update(
            {"task_loss": tm.get("task_loss"), "domain_loss": tm.get("domain_loss"),
             "lambda_domain": self.lambda_domain}
        )
        return meta

    def _resume(self, path: str):
        tree = super()._resume(path)  # tree already restored against our target
        from flax import serialization

        self.disc_state = self.disc_state.replace(
            params=serialization.from_state_dict(
                self.disc_state.params, serialization.to_state_dict(tree["disc_params"])
            ),
            opt_state=serialization.from_state_dict(
                self.disc_state.opt_state,
                serialization.to_state_dict(tree["disc_opt_state"]),
            ),
        )
        return tree

    def _log_epoch(self, epoch, epoch_time, tm, vm):
        if not vm:
            vm = {k: float("nan") for k in ("loss", "dice", "iou", "acc")}
        train_total = tm["task_loss"] + self.lambda_domain * tm["domain_loss"]
        self._print(
            f"[EPOCH] {epoch + 1}/{self.cfg.epochs} - {format_time(epoch_time)} | "
            f"Train Loss: {train_total:.4f} | Task: {tm['task_loss']:.4f} | "
            f"Domain: {tm['domain_loss']:.4f} | Val Loss: {vm['loss']:.4f} | "
            f"Train Dice: {tm['dice']:.4f} | Val Dice: {vm['dice']:.4f}"
        )
        self._append_csv(
            [
                epoch + 1, epoch_time, train_total, tm["task_loss"], tm["domain_loss"],
                vm["loss"], tm["dice"], vm["dice"], tm["iou"], vm["iou"],
                tm["acc"], vm["acc"], self.encoder_frozen,
            ]
        )
