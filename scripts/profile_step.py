"""Bisect train-step time: ViT fwd / full eval fwd / train fwd+matching /
full train step, each jitted and timed on the real chip.

Honors the same BENCH_* envs as bench.py (BENCH_BATCH/QUANT/REMAT/
ENC_REMAT/DEC_REMAT/PREQUANT) so the anatomy measured here is the anatomy
of the headline bench config, not of library defaults."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.config import LoRAConfig, ModelConfig, TrainConfig
from sam3_lora_tpu.models import build_sam3_image_model, init_model_fast
from sam3_lora_tpu.models.builder import dummy_batch
from sam3_lora_tpu.train.losses import LossConfig, compute_losses
from sam3_lora_tpu.train.trainer import (
    make_optimizer,
    make_train_step,
    merge_trainable,
    split_trainable,
)

B = int(os.environ.get("B", os.environ.get("BENCH_BATCH", "8")))
REPS = int(os.environ.get("REPS", "5"))


def _enc_remat_env():
    v = os.environ.get("BENCH_ENC_REMAT", "1")
    if v not in ("0", "1", "ffn"):
        raise SystemExit(f"BENCH_ENC_REMAT must be 0|1|ffn, got {v!r}")
    return v


def _fetch(out):
    """Force real device execution. Through the axon tunnel
    ``block_until_ready`` returns before the computation actually runs, so a
    tiny host fetch of (a leaf of) the output is the only reliable barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def bench_fn(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    _fetch(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:34s} compile {compile_t:7.1f}s   steady {dt * 1e3:9.1f} ms")
    return dt


def main():
    cfg = ModelConfig(
        dtype="bfloat16",
        param_dtype=os.environ.get("BENCH_PARAM_DTYPE", "bfloat16"),
        base_quant=os.environ.get("BENCH_QUANT", "int8"),
        vit_remat_policy=os.environ.get("BENCH_REMAT", "windows_only"),
        enc_remat=_enc_remat_env() == "1",
        enc_remat_ffn=_enc_remat_env() == "ffn",
        dec_remat=os.environ.get("BENCH_DEC_REMAT", "0") == "1",
    )
    lcfg = LoRAConfig(
        rank=32, alpha=64.0,
        target_modules=("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2",
                        "linear1", "linear2"),
        apply_to_geometry_encoder=True, apply_to_mask_decoder=True,
    )
    model = build_sam3_image_model(cfg, lora=lcfg)
    rng = np.random.RandomState(0)
    batch_t = dummy_batch(cfg, batch_size=B, with_targets=True)
    batch_t = batch_t.replace(
        images=jnp.asarray(rng.randn(B, 3, cfg.img_size, cfg.img_size), jnp.float32)
    )
    batch_e = batch_t.replace(targets=None)
    params = init_model_fast(model)
    trainable, frozen = split_trainable(params)
    if cfg.base_quant != "none" and os.environ.get("BENCH_PREQUANT", "1") == "1":
        from sam3_lora_tpu.ops.quant import prequantize_base

        frozen = prequantize_base(frozen, min_dim=cfg.base_quant_min_dim)
        params = merge_trainable(trainable, frozen)

    # 1. ViT trunk forward only
    vit_fwd = jax.jit(
        lambda p, x: model.apply(
            {"params": p}, x, train=False,
            method=lambda m, img, train: m.trunk(img, train=train),
        )
    )
    bench_fn("vit_fwd (eval)", vit_fwd, params, batch_t.images)

    # 2. full eval forward
    eval_fwd = jax.jit(
        lambda p, b: model.apply({"params": p}, b, train=False)["pred_logits"]
    )
    bench_fn("full_fwd (eval, no targets)", eval_fwd, params, batch_e)

    # 3. train-mode forward incl. on-device matching + loss (no grad)
    def fwd_loss(p, b, key):
        out = model.apply({"params": p}, b, train=True, rngs={"dropout": key})
        return compute_losses(out, b.targets, LossConfig())["core_loss"]

    floss = jax.jit(fwd_loss)
    bench_fn("train_fwd + matching + loss", floss, params, batch_t, jax.random.PRNGKey(0))

    # 3b. forward+backward WITHOUT the optimizer update: isolates the
    # grad computation from clip-by-global-norm + masked AdamW + donation
    # copies (full-step time minus this = the update tail)
    def fwd_bwd(tr, fr, b, key):
        def loss_fn(t):
            p = merge_trainable(t, fr)
            out = model.apply({"params": p}, b, train=True, rngs={"dropout": key})
            return compute_losses(out, b.targets, LossConfig())["core_loss"]

        return jax.value_and_grad(loss_fn)(tr)

    fb = jax.jit(fwd_bwd)
    bench_fn("train fwd+bwd (no opt)", fb, trainable, frozen, batch_t,
             jax.random.PRNGKey(0))

    # 4. full train step (fwd+bwd+opt). The step donates (trainable,
    # opt_state), so reps must thread the outputs back in — passing the same
    # arrays twice reuses donated buffers (INVALID_ARGUMENT on TPU).
    tx, _ = make_optimizer(TrainConfig(num_epochs=1), steps_per_epoch=10)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, LossConfig())
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    trainable, opt_state, losses = step(trainable, frozen, opt_state, batch_t, key)
    _fetch(losses["core_loss"])
    print(f"{'full train step':34s} compile {time.time() - t0:7.1f}s", end="")
    t0 = time.time()
    for _ in range(REPS):
        trainable, opt_state, losses = step(trainable, frozen, opt_state, batch_t, key)
    _fetch(losses["core_loss"])
    dt = (time.time() - t0) / REPS
    print(f"   steady {dt * 1e3:9.1f} ms")
    print(f"train img/s/chip: {B / dt:.2f}")


if __name__ == "__main__":
    main()
