"""LoRA trainer: jitted data-parallel train step, grad accumulation, adapter
checkpoints, val loop, JSON-lines stats.

Re-design of the reference's native LoRA trainer
(``train_sam3_lora_native.py:697-1016``) and the relevant slice of the DDP
``Trainer`` (``sam3/train/trainer.py``): AMP autocast -> bf16 compute dtype in
the model spec; DDP + no_sync grad accumulation -> one jitted step that
``lax.scan``s over microbatches and lets XLA insert the gradient psum from
sharding annotations; GradScaler -> unnecessary (bf16, no fp16 scaling);
NaN-loss FloatingPointError -> jnp.isfinite guard on the host copy of the loss;
best/last adapter-only checkpoints + val_stats.json mirror
``train_sam3_lora_native.py:949-1016``.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LoRAConfig, ModelConfig, TrainConfig
from ..models import build_sam3_image_model, init_model
from ..models.lora import count_parameters
from ..models.sam3_image import Batch
from ..parallel import batch_sharding, make_mesh, param_shardings, replicated, shard_batch
from .data import COCOSegmentDataset, DataLoader
from .losses import LossConfig, compute_losses

log = logging.getLogger("sam3_lora_tpu")


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    total = max(1, cfg.num_epochs * steps_per_epoch // max(1, cfg.gradient_accumulation_steps))
    warmup = min(cfg.warmup_steps, max(total - 1, 1))
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=total,
            end_value=cfg.learning_rate * 0.01,
        )
    if cfg.lr_scheduler == "inverse_sqrt":
        # reference InverseSquareRootParamScheduler (schedulers.py:6-41)
        def sched(step):
            s = jnp.maximum(step, 1)
            scale = jnp.where(
                step < warmup,
                step / jnp.maximum(warmup, 1),
                jnp.sqrt(warmup / s.astype(jnp.float32)) if warmup > 0 else 1.0 / jnp.sqrt(s.astype(jnp.float32)),
            )
            return cfg.learning_rate * scale

        return sched
    if cfg.lr_scheduler == "constant":
        return lambda step: cfg.learning_rate
    raise ValueError(f"unknown lr_scheduler: {cfg.lr_scheduler}")


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """AdamW + clip over the TRAINABLE (adapter) subtree only — the train
    step never materializes frozen grads, so no masking is needed."""
    sched = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=sched,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.weight_decay,
        ),
    )
    return tx, sched


@dataclass
class TrainState:
    trainable: Any  # tuple-keyed flat dict of adapter leaves
    frozen: Any     # tuple-keyed flat dict of base leaves
    opt_state: Any
    step: int = 0

    @property
    def params(self):
        return merge_trainable(self.trainable, self.frozen)


def _split_microbatches(batch: Batch, accum: int) -> Batch:
    """(B, ...) -> (accum, B/accum, ...) on every leaf for lax.scan."""

    def r(x):
        if x is None:
            return None
        return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

    return jax.tree_util.tree_map(r, batch)


def split_trainable(params) -> Tuple[Dict, Dict]:
    """-> (trainable, frozen): tuple-keyed flat dicts (both are pytrees)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if k[-1] in ("lora_a", "lora_b")}
    frozen = {k: v for k, v in flat.items() if k[-1] not in ("lora_a", "lora_b")}
    return trainable, frozen


def merge_trainable(trainable: Dict, frozen: Dict):
    from flax import traverse_util

    return traverse_util.unflatten_dict({**frozen, **trainable})


def make_train_step(
    model,
    tx,
    loss_cfg: LossConfig,
    accum: int = 1,
    mesh: Optional[Mesh] = None,
):
    """Build the jitted train step over (trainable, frozen) param split.

    Differentiating ONLY w.r.t. the adapter leaves lets XLA dead-code-eliminate
    every frozen dW matmul and never allocate the 3.4 GB frozen-grad tree (the
    analogue of the reference's requires_grad=False, trainer memory note
    README.md:1174-1179). With ``mesh``: shardings are taken from the committed
    inputs; XLA inserts the gradient all-reduce. Grad accumulation scans over a
    leading microbatch axis (reference no_sync accumulation,
    trainer.py:922-943).
    """

    def loss_fn(trainable, frozen, mb: Batch, rng):
        params = merge_trainable(trainable, frozen)
        out = model.apply(
            {"params": params}, mb, train=True, rngs={"dropout": rng}
        )
        losses = compute_losses(out, mb.targets, loss_cfg)
        return losses["core_loss"], losses

    def step_fn(trainable, frozen, opt_state, batch: Batch, rng):
        if accum > 1:
            mbs = _split_microbatches(batch, accum)

            def scan_body(carry, xs):
                acc_grads, acc_losses = carry
                mb, key = xs
                (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    trainable, frozen, mb, key
                )
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_losses = jax.tree_util.tree_map(jnp.add, acc_losses, losses)
                return (acc_grads, acc_losses), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            keys = jax.random.split(rng, accum)
            # zero-init the full per-component loss dict so accum keeps the
            # same stats surface as accum=1 (the reference logs every loss key
            # regardless of no_sync accumulation)
            mb0 = jax.tree_util.tree_map(lambda x: x[0], mbs)
            aux_shape = jax.eval_shape(loss_fn, trainable, frozen, mb0, keys[0])[1]
            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), aux_shape
            )
            (grads, losses), _ = jax.lax.scan(
                scan_body, (zero, zero_losses), (mbs, keys)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            losses = jax.tree_util.tree_map(lambda l: l / accum, losses)
        else:
            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, batch, rng
            )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, losses

    # Shardings are taken from the (committed) inputs: params carry whatever
    # param_shardings() placed (replicated or fsdp), the batch carries
    # P("data") from shard_batch(). jit then propagates and XLA inserts the
    # gradient reduce automatically — no explicit in_shardings needed, and the
    # same step works single-chip and multi-chip.
    return jax.jit(step_fn, donate_argnums=(0, 2))


def make_eval_step(model, loss_cfg: LossConfig, mesh: Optional[Mesh] = None):
    del mesh  # shardings come from committed inputs (see make_train_step)

    def step_fn(trainable, frozen, batch: Batch):
        # train=False: dropout off; matching/DAC/matched-masks still run
        # because targets are present (see Sam3Image.__call__).
        params = merge_trainable(trainable, frozen)
        out = model.apply({"params": params}, batch, train=False)
        losses = compute_losses(out, batch.targets, loss_cfg)
        return losses

    return jax.jit(step_fn)


class Trainer:
    """End-to-end LoRA finetuning driver (CLI: ``sam3_lora_tpu.cli.train``)."""

    def __init__(
        self,
        model_cfg: Optional[ModelConfig] = None,
        lora_cfg: Optional[LoRAConfig] = None,
        train_cfg: Optional[TrainConfig] = None,
        base_checkpoint: Optional[str] = None,
        mesh: Optional[Mesh] = None,
        loss_cfg: Optional[LossConfig] = None,
    ):
        self.mcfg = model_cfg or ModelConfig()
        self.lcfg = lora_cfg or LoRAConfig()
        self.tcfg = train_cfg or TrainConfig()
        self.loss_cfg = loss_cfg or LossConfig()
        if mesh is None:
            # largest device count that divides the global batch (batch is
            # sharded over the data axis; leftover devices idle rather than
            # erroring — single-chip: mesh of 1)
            n_dev = len(jax.devices())
            bs = self.tcfg.batch_size
            n = max(d for d in range(1, n_dev + 1) if bs % d == 0)
            mesh = make_mesh(n_devices=n)
            if n < n_dev:
                log.warning(
                    "batch_size %d not divisible by %d devices; using %d-device mesh",
                    bs, n_dev, n,
                )
        self.mesh = mesh
        self.model = build_sam3_image_model(self.mcfg, lora=self.lcfg)
        self.base_checkpoint = base_checkpoint
        # NOTE: switching dropout keys to the rbg PRNG was MEASURED SLOWER
        # end-to-end (1.79 vs 1.83 img/s/chip) — threefry is not a bottleneck
        # in this model; keep the default impl.
        self.rng = jax.random.PRNGKey(self.tcfg.seed)

        os.makedirs(self.tcfg.output_dir, exist_ok=True)
        self._stats_f: Dict[str, Any] = {}

    # ------------------------------------------------------------------ #
    def setup(self, steps_per_epoch: int):
        rep = replicated(self.mesh)
        with self.mesh:
            init_rng, self.rng = jax.random.split(self.rng)
            params = init_model(self.model, init_rng, train=False)
        if self.base_checkpoint:
            from ..utils.checkpoint import load_base_checkpoint

            params, n = load_base_checkpoint(params, self.base_checkpoint)
            log.info("loaded %d base tensors from %s", n, self.base_checkpoint)
        params = jax.device_put(params, param_shardings(params, self.mesh))
        stats = count_parameters(params)
        log.info(
            "params: total=%s trainable=%s (%.2f%%)",
            f"{stats['total_parameters']:,}",
            f"{stats['trainable_parameters']:,}",
            stats["trainable_percentage"],
        )
        trainable, frozen = split_trainable(params)
        if self.model.spec.model.base_quant != "none":
            # quantize the frozen base once, offline (ops/quant.py): identical
            # numerics to the dynamic path, minus the per-step (and per-remat-
            # replay) weight-quantization pass, and int8 weights halve the
            # frozen tree's HBM footprint
            from ..ops.quant import prequantize_base

            frozen = prequantize_base(
                frozen, min_dim=self.model.spec.model.base_quant_min_dim
            )
        self.tx, self.sched = make_optimizer(self.tcfg, steps_per_epoch)
        opt_state = jax.device_put(self.tx.init(trainable), rep)
        self.state = TrainState(
            trainable=trainable, frozen=frozen, opt_state=opt_state
        )
        self.train_step = make_train_step(
            self.model, self.tx, self.loss_cfg,
            accum=self.tcfg.gradient_accumulation_steps, mesh=self.mesh,
        )
        self.eval_step = make_eval_step(self.model, self.loss_cfg, mesh=self.mesh)
        return stats

    # ------------------------------------------------------------------ #
    def _write_stats(self, name: str, record: Dict[str, Any]):
        # multi-host: only process 0 writes stats/checkpoints (reference
        # rank==0 guards, trainer.py:362-398); single-host always writes
        from ..parallel import multihost

        if not multihost.is_primary():
            return
        path = os.path.join(self.tcfg.output_dir, f"{name}.json")
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ------------------------------------------------------------------ #
    def fit(
        self,
        train_loader: DataLoader,
        val_loader: Optional[DataLoader] = None,
        num_epochs: Optional[int] = None,
    ) -> Dict[str, Any]:
        epochs = num_epochs or self.tcfg.num_epochs
        if not hasattr(self, "state"):
            self.setup(steps_per_epoch=len(train_loader))

        best_val = float("inf")
        history = {"train_loss": [], "val_loss": []}
        global_step = 0
        start_epoch = 0
        t_start = time.time()

        from ..utils.logging import MemMeter, TensorBoardLogger

        tb = TensorBoardLogger(os.path.join(self.tcfg.output_dir, "tb"))
        mem = MemMeter()

        # auto-resume (reference trainer.py:400-463)
        state_path = os.path.join(self.tcfg.output_dir, "train_state.npz")
        if os.path.exists(state_path):
            meta = self.load_state()
            start_epoch = meta.get("epoch", -1) + 1
            best_val = meta.get("best_val", best_val)
            global_step = self.state.step
            log.info("resumed from %s at epoch %d step %d", state_path, start_epoch, global_step)

        for epoch in range(start_epoch, epochs):
            epoch_losses = []
            t_epoch = time.time()
            t_data = 0.0
            t_iter = time.time()
            # device prefetch: start batch i+1's H2D transfer (bit-packed
            # bool masks on the wire; per-row packing keeps them
            # batch-shardable on a multi-chip mesh) while step i computes
            stream = train_loader.epoch(epoch)
            if self.tcfg.device_prefetch > 0:
                from .prefetch import prefetch_to_device

                multi = self.mesh.devices.size > 1
                stream = prefetch_to_device(
                    stream,
                    size=self.tcfg.device_prefetch,
                    sharding=batch_sharding(self.mesh) if multi else None,
                    pack_bool=True,
                )
            with self.mesh:
                for batch in stream:
                    t_data += time.time() - t_iter
                    if self.tcfg.device_prefetch <= 0:
                        batch = shard_batch(batch, self.mesh)
                    self.rng, sub = jax.random.split(self.rng)
                    (
                        self.state.trainable,
                        self.state.opt_state,
                        losses,
                    ) = self.train_step(
                        self.state.trainable, self.state.frozen,
                        self.state.opt_state, batch, sub,
                    )
                    global_step += 1
                    if global_step % self.tcfg.logging_steps == 0 or global_step == 1:
                        # one device_get for the WHOLE loss dict (one tunnel
                        # round-trip), full per-component breakdown regardless
                        # of accum (reference logs every Losses/* scalar)
                        loss_np = {
                            k: float(v) for k, v in jax.device_get(losses).items()
                        }
                        loss = loss_np["core_loss"]
                        if not np.isfinite(loss):
                            raise FloatingPointError(
                                f"Loss is {loss} at step {global_step}"
                            )
                        epoch_losses.append(loss)
                        lr = float(self.sched(global_step))
                        log.info(
                            "epoch %d step %d loss %.4f lr %.2e data_t %.2fs",
                            epoch, global_step, loss, lr, t_data,
                        )
                        self._write_stats(
                            "train_stats",
                            {
                                "epoch": epoch,
                                "step": global_step,
                                "loss": loss,
                                "lr": lr,
                                "data_time_s": round(t_data, 3),
                                "elapsed_s": round(time.time() - t_start, 1),
                                "mem_peak_gb": round(mem.peak_gb, 3),
                                **{
                                    f"loss/{k}": round(v, 5)
                                    for k, v in loss_np.items()
                                    if k != "core_loss"
                                },
                            },
                        )
                        tb.log_dict(loss_np, global_step, prefix="loss/")
                        tb.log("lr", lr, global_step)
                    t_iter = time.time()

            train_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
            history["train_loss"].append(train_loss)
            log.info(
                "epoch %d done in %.1fs train_loss %.4f",
                epoch, time.time() - t_epoch, train_loss,
            )

            if val_loader is not None:
                val_loss = self.evaluate(val_loader)
                history["val_loss"].append(val_loss)
                self._write_stats(
                    "val_stats",
                    {"epoch": epoch, "val_loss": val_loss, "train_loss": train_loss},
                )
                tb.log("val_loss", val_loss, global_step)
                if val_loss < best_val:
                    best_val = val_loss
                    self.save_adapters("best_lora.npz")
            self.save_adapters("last_lora.npz")
            self.state.step = global_step
            self.save_state(epoch=epoch, best_val=best_val)

        tb.close()
        return {
            "history": history,
            "best_val_loss": best_val,
            "steps": global_step,
            "wall_s": time.time() - t_start,
        }

    # ------------------------------------------------------------------ #
    def evaluate(self, val_loader: DataLoader) -> float:
        # Keep per-batch losses on device and fetch ONCE at the end: through
        # the axon tunnel every float() is a host round-trip, so a per-batch
        # fetch serializes the val loop on network latency.
        losses = []
        with self.mesh:
            for batch in val_loader.epoch(0):
                batch = shard_batch(batch, self.mesh)
                out = self.eval_step(
                    self.state.trainable, self.state.frozen, batch
                )
                losses.append(out["core_loss"])
        if not losses:
            return float("nan")
        return float(np.mean(jax.device_get(losses)))

    # ------------------------------------------------------------------ #
    def save_state(self, filename: str = "train_state.npz", **meta) -> str:
        """Full resumable checkpoint: adapters + optimizer state + rng + meta
        (reference trainer checkpoints model/optimizer/epoch/steps,
        trainer.py:362-398; frozen base is NOT saved — it reloads from the
        converted base checkpoint, like the reference re-downloading from HF)."""
        import pickle

        from ..parallel import multihost

        path = os.path.join(self.tcfg.output_dir, filename)
        if not multihost.is_primary():
            return path
        leaves, treedef = jax.tree_util.tree_flatten(self.state.opt_state)
        payload = {
            f"opt_{i}": np.asarray(x) for i, x in enumerate(leaves)
        }
        payload.update(
            {f"lora::{'.'.join(k)}": np.asarray(v) for k, v in self.state.trainable.items()}
        )
        payload["rng"] = np.asarray(self.rng)
        payload["meta"] = np.frombuffer(
            pickle.dumps({"step": self.state.step, **meta}), dtype=np.uint8
        )
        tmp = path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, path)
        return path

    def load_state(self, filename: str = "train_state.npz") -> Dict[str, Any]:
        """Restore adapters + optimizer state + rng; returns the meta dict."""
        import pickle

        path = os.path.join(self.tcfg.output_dir, filename)
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(self.state.opt_state)
        n = sum(1 for k in data.files if k.startswith("opt_"))
        assert n == len(leaves), f"optimizer state mismatch: {n} vs {len(leaves)}"
        new_leaves = [
            jnp.asarray(data[f"opt_{i}"], dtype=leaves[i].dtype)
            for i in range(len(leaves))
        ]
        self.state.opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        by_name = {".".join(k): k for k in self.state.trainable}
        for f in data.files:
            if f.startswith("lora::"):
                k = by_name[f[len("lora::"):]]
                self.state.trainable[k] = jnp.asarray(
                    data[f], dtype=self.state.trainable[k].dtype
                )
        self.rng = jnp.asarray(data["rng"])
        meta = pickle.loads(data["meta"].tobytes())
        self.state.step = meta.get("step", 0)
        return meta

    def save_adapters(self, filename: str) -> str:
        from ..parallel import multihost

        path = os.path.join(self.tcfg.output_dir, filename)
        if not multihost.is_primary():
            return path
        tmp = path + ".tmp.npz"  # np.savez appends .npz to foreign suffixes
        np.savez(
            tmp, **{".".join(k): np.asarray(v) for k, v in self.state.trainable.items()}
        )
        os.replace(tmp, path)  # atomic, reference trainer.py:381-398
        return path

    def load_adapters(self, path: str) -> int:
        data = np.load(path)
        by_name = {".".join(k): k for k in self.state.trainable}
        n = 0
        for name in data.files:
            k = by_name.get(name)
            if k is None:
                raise KeyError(f"LoRA checkpoint key not in model: {name}")
            self.state.trainable[k] = jnp.asarray(
                data[name], dtype=self.state.trainable[k].dtype
            )
            n += 1
        return n
