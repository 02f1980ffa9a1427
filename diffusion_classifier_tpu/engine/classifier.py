"""Discriminative classifier engine (supervised baseline).

API parity with the reference `classifier/classifier.py:28-407`: a backbone +
linear head trained with cross-entropy, epoch loop with eval cadence, argmax
``classify``, checkpointing in the same latest layout. TPU-native internals:
one jitted train step (fwd/bwd + clip 1.0 + Adam + BatchNorm running-stat
update), batch sharded over the 'data' mesh axis.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..parallel.mesh import local_rows, make_mesh, replicated, shard_batch
from ..parallel.sharding import (
    reshard_restored,
    restore_placement,
    shard_params,
)
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.config import ExperimentConfig
from ..utils.profiling import enable_compilation_cache
from ..utils.tracking import make_tracker
from .diffusion_classifier import _first_batch
from .state import make_optimizer


class BackboneWithHead(nn.Module):
    """Backbone features + linear head (reference `:10-26`)."""

    backbone: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        features = self.backbone(x, train=train)
        return nn.Dense(self.num_classes, name="head")(features)


class Classifier:
    """Supervised classifier engine (reference `Classifier`, `:28-407`)."""

    def __init__(self, backbone, config: ExperimentConfig, *, mesh=None):
        self.config = config.validate()
        if config.compilation_cache_dir:
            enable_compilation_cache(config.compilation_cache_dir)
        self.model = BackboneWithHead(backbone, config.classes)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.variables = None  # {'params': ..., 'batch_stats': ...}
        self._opt_state = None
        self._tx = None
        self._rng = jax.random.PRNGKey(config.seed)
        self._build_eval_fns()

    def _build_eval_fns(self):
        """Jitted predict/eval-loss — optimizer-free, so the eval-only flow
        (init_params → load_checkpoint → classify) works without ever
        building a train step."""
        model = self.model

        @jax.jit
        def predict(variables, x):
            logits = model.apply(variables, x, train=False)
            # top_k instead of argmax: argmax over these logits trips an XLA
            # fusion-emitter CHECK (`window.pad_low == 0`) on this TPU
            # backend; top_k lowers through sort and avoids the bad fusion.
            _, idx = jax.lax.top_k(logits, 1)
            return idx[:, 0]

        self._predict = predict

        @jax.jit
        def eval_loss(variables, x, labels):
            logits = model.apply(variables, x, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        self._eval_loss = eval_loss

    @property
    def is_main_process(self) -> bool:
        return jax.process_index() == 0

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def init_params(self, sample_batch):
        if self.variables is not None:
            return
        x = jnp.asarray(np.asarray(sample_batch["images"], np.float32))
        self.variables = self.model.init(self._next_rng(), x, train=False)
        if self.config.pretrained_path:
            # local-weights completion of the reference's ImageNet pretrained
            # path (`nets/resnet.py:31-47`): load into the backbone subtree
            # (the head stays fresh — the reference strips torchvision's fc
            # and trains its own head, `:66` + `nets/classifier.py`)
            from ..models.resnet import load_pretrained_resnet

            sub = {
                "params": self.variables["params"]["backbone"],
                "batch_stats": self.variables.get("batch_stats", {}).get(
                    "backbone", {}
                ),
            }
            loaded = load_pretrained_resnet(
                sub,
                self.config.pretrained_path,
                in_channels=int(x.shape[-1]),
            )
            self.variables = {
                "params": {
                    **self.variables["params"],
                    "backbone": loaded["params"],
                },
                "batch_stats": {
                    **self.variables.get("batch_stats", {}),
                    "backbone": loaded["batch_stats"],
                },
            }
            if self.is_main_process:
                print(f"Loaded pretrained backbone: {self.config.pretrained_path}")
        self.variables = shard_params(
            self.mesh, self.variables, self.config.param_sharding
        )
        n = sum(
            int(np.prod(p.shape))
            for p in jax.tree.leaves(self.variables["params"])
        )
        if self.is_main_process:
            print(f"Parameter count: {n}")

    def _build_train_step(self, total_steps: int):
        cfg = self.config
        self._tx = make_optimizer(
            cfg.learning_rate, cfg.lr_warmup_steps, total_steps,
            state_dtype=cfg.optimizer_state_dtype,
        )
        self._opt_state = self._tx.init(self.variables["params"])
        model, tx = self.model, self._tx

        def loss_fn(params, batch_stats, x, labels):
            logits, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, updates["batch_stats"]

        @jax.jit
        def step(params, batch_stats, opt_state, x, labels):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, x, labels
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        self._step = step

    # ------------------------------------------------------------- public API
    def classify(self, x):
        """Argmax over logits (reference `:335-349`)."""
        x = jnp.asarray(np.asarray(x, np.float32))
        return self._predict(self.variables, x)

    def train_one_epoch(self, train_dataloader):
        total_loss, total = 0.0, 0
        for batch in train_dataloader:
            dev = shard_batch(
                self.mesh,
                {
                    "images": np.asarray(batch["images"], np.float32),
                    "prompt": np.asarray(batch["prompt"], np.int32),
                },
            )
            params, stats, self._opt_state, loss = self._step(
                self.variables["params"],
                self.variables.get("batch_stats", {}),
                self._opt_state,
                dev["images"],
                dev["prompt"],
            )
            self.variables = {"params": params, "batch_stats": stats}
            b = batch["images"].shape[0]
            total_loss += float(loss) * b
            total += b
        return total_loss / max(total, 1)

    def evaluate(self, val_dataloader, stop_idx=None, metrics=None):
        total_loss, total = 0.0, 0
        for idx, batch in enumerate(val_dataloader):
            dev = shard_batch(
                self.mesh,
                {
                    "images": np.asarray(batch["images"], np.float32),
                    "prompt": np.asarray(batch["prompt"], np.int32),
                },
            )
            loss = self._eval_loss(self.variables, dev["images"], dev["prompt"])
            preds = self._predict(self.variables, dev["images"])
            b = batch["images"].shape[0]
            total_loss += float(loss) * b
            total += b
            if metrics is not None:
                for metric in metrics:
                    metric.update((local_rows(preds), batch))
            if stop_idx is not None and idx == stop_idx:
                break
        return total_loss / max(total, 1), metrics

    def train_loop(
        self,
        train_dataloader,
        val_dataloader,
        metrics: Optional[Sequence] = None,
    ):
        cfg = self.config
        total_steps = len(train_dataloader) * cfg.num_epochs
        self.init_params(_first_batch(train_dataloader, "train"))
        self._build_train_step(total_steps)

        start_epoch, experiment_key = 0, None
        if cfg.resume:
            # resume reads the live 'checkpoints' dir saves write to
            # (reference classifier `:218` hardcodes it); checkpoint_folder
            # is the inference-selection knob
            ckpt = os.path.join(cfg.experiment_path, "checkpoints")
            if os.path.exists(ckpt):
                start_epoch, _, experiment_key = self.load_checkpoint(ckpt)
            else:
                print("No checkpoint directory found. Starting from scratch.")

        tracker = make_tracker(
            cfg.use_comet,
            cfg.experiment_path,
            is_main_process=self.is_main_process,
            resume_key=experiment_key,
            name=cfg.comet_experiment_name,
            comet_api_key=cfg.comet_api_key,
            comet_project_name=cfg.comet_project_name,
            comet_workspace=cfg.comet_workspace,
        )

        if self.is_main_process:
            print(f"Config:\n{cfg.to_json()}")

        for epoch in range(start_epoch, cfg.num_epochs):
            epoch_start = time.time()
            avg_train_loss = self.train_one_epoch(train_dataloader)
            if self.is_main_process:
                print(
                    f"Epoch {epoch}/{cfg.num_epochs - 1}, "
                    f"Train Loss: {avg_train_loss:.4f}, "
                    f"Time: {time.time() - epoch_start:.2f}s"
                )
                if tracker is not None:
                    tracker.log_metric("train_loss", avg_train_loss, epoch=epoch)

            if epoch % cfg.eval_period == 0 or epoch == cfg.num_epochs - 1:
                val_loss, val_metrics = self.evaluate(
                    val_dataloader,
                    stop_idx=cfg.evaluation_batches,
                    metrics=metrics,
                )
                if val_metrics is not None:
                    for metric in val_metrics:
                        metric.sync_across_processes()
                        out = metric.get_output()
                        if self.is_main_process:
                            print(out)
                            if tracker is not None:
                                tracker.log_metrics(
                                    {f"val_{k}": v for k, v in out.items()},
                                    step=epoch,
                                )
                        metric.reset()
                if self.is_main_process and tracker is not None:
                    tracker.log_metric("val_loss", val_loss, epoch=epoch)
                # collective save: every rank participates (Orbax barrier,
                # `utils/checkpoint.py`); rank 0 alone writes the sidecar
                self.save_checkpoint(
                    epoch, tracker.get_key() if tracker else None
                )

    def inference(self, val_dataloader, metrics=None):
        cfg = self.config
        self.init_params(_first_batch(val_dataloader, "val"))
        self._build_train_step(total_steps=max(1, len(val_dataloader)))
        self.load_checkpoint(
            os.path.join(cfg.experiment_path, cfg.checkpoint_folder)
        )
        val_loss, val_metrics = self.evaluate(
            val_dataloader, stop_idx=cfg.evaluation_batches, metrics=metrics
        )
        metric_output = []
        if val_metrics is not None:
            for metric in val_metrics:
                metric.sync_across_processes()
                metric_output.append(metric.get_output())
        return val_loss, metric_output

    # ---------------------------------------------------------- checkpointing
    def _ckpt_state(self):
        return {"variables": self.variables, "opt_state": self._opt_state}

    def save_checkpoint(self, epoch, experiment_key=None):
        path = save_checkpoint(
            self.config.experiment_path,
            self._ckpt_state(),
            epoch=epoch,
            experiment_key=experiment_key,
        )
        if self.is_main_process:
            print(f"Checkpoint saved to {path}")

    def load_checkpoint(self, checkpoint_path):
        state, epoch, best, key = load_checkpoint(
            checkpoint_path, self._ckpt_state()
        )
        # keep each mesh-placed leaf's live placement (TP/FSDP shards) on
        # restore; uncommitted scalars replicate (restore_placement),
        # assembled from local data under multi-process (reshard_restored —
        # a cross-host device_put would be refused by the backend)
        self.variables = reshard_restored(
            state["variables"], restore_placement(self.mesh, self.variables)
        )
        self._opt_state = (
            reshard_restored(
                state["opt_state"],
                restore_placement(self.mesh, self._opt_state),
            )
            if self._opt_state is not None
            else reshard_restored(
                state["opt_state"],
                jax.tree.map(
                    lambda _: replicated(self.mesh), state["opt_state"]
                ),
            )
        )
        if self.is_main_process:
            print(f"Checkpoint loaded. Resuming from epoch {epoch}.")
        return epoch, best, key
