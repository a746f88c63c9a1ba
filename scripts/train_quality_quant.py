"""int8-base vs bf16-base LoRA training quality (VERDICT r2 weak #6/item 7).

The headline bench defaults to base_quant=int8 (QLoRA-style: adapters train
against the quantized frozen base). This script proves that tier trains as
well as bf16: two runs with IDENTICAL seeds/data — (a) bf16 base, (b)
prequantized int8 base — over N steps of the real input pipeline on a
synthetic crack-COCO dataset, comparing loss curves and final val loss.

Usage (TPU, quiet host):   python scripts/train_quality_quant.py
Env: QQ_STEPS (default 300), QQ_BATCH (8), QQ_VAL_BATCHES (4).
Writes JSON lines to stdout and a summary to /tmp/quant_quality.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(os.environ.get("QQ_STEPS", "300"))
BATCH = int(os.environ.get("QQ_BATCH", "8"))
VAL_BATCHES = int(os.environ.get("QQ_VAL_BATCHES", "4"))
TINY = os.environ.get("QQ_TINY") == "1"


def run(base_quant: str, root: str):
    import jax

    from sam3_lora_tpu.config import LoRAConfig, ModelConfig, TrainConfig
    from sam3_lora_tpu.models import build_sam3_image_model, init_model_fast
    from sam3_lora_tpu.train.data import COCOSegmentDataset, DataLoader
    from sam3_lora_tpu.train.losses import LossConfig
    from sam3_lora_tpu.train.trainer import (
        make_eval_step,
        make_optimizer,
        make_train_step,
        split_trainable,
    )

    if TINY:
        from sam3_lora_tpu.config import tiny_model_config

        cfg = tiny_model_config(base_quant=base_quant, base_quant_min_dim=16)
    else:
        cfg = ModelConfig(
            dtype="bfloat16",
            param_dtype="bfloat16",
            base_quant=base_quant,
            vit_remat_policy="windows_only",
            dec_remat=False,
        )
    lcfg = LoRAConfig(
        rank=32, alpha=64.0,
        target_modules=("q_proj", "k_proj", "v_proj", "out_proj", "fc1",
                        "fc2", "linear1", "linear2"),
        apply_to_geometry_encoder=True, apply_to_mask_decoder=True,
    )
    model = build_sam3_image_model(cfg, lora=lcfg)
    params = init_model_fast(model)
    trainable, frozen = split_trainable(params)
    del params
    if base_quant != "none":
        from sam3_lora_tpu.ops.quant import prequantize_base

        frozen = prequantize_base(frozen, min_dim=cfg.base_quant_min_dim)

    ds = COCOSegmentDataset(root, "train", model_config=cfg)
    val_ds = COCOSegmentDataset(root, "valid", model_config=cfg)
    loader = DataLoader(ds, BATCH, shuffle=True, seed=0, num_workers=4,
                        prefetch=2, drop_last=True)
    val_loader = DataLoader(val_ds, BATCH, shuffle=False, num_workers=2,
                            drop_last=True)

    tx, _ = make_optimizer(
        TrainConfig(num_epochs=1, learning_rate=1e-4, warmup_steps=20),
        steps_per_epoch=STEPS,
    )
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, LossConfig())
    eval_step = make_eval_step(model, LossConfig())

    import jax

    key = jax.random.PRNGKey(0)
    losses = []
    t0 = time.time()
    n = 0
    epoch = 0
    while n < STEPS:
        for b in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            trainable, opt_state, out = step(trainable, frozen, opt_state, b, sub)
            losses.append(float(np.asarray(out["core_loss"])))
            n += 1
            if n % 25 == 0:
                print(json.dumps({
                    "quant": base_quant, "step": n,
                    "loss": round(losses[-1], 4),
                    "loss_ma25": round(float(np.mean(losses[-25:])), 4),
                }), flush=True)
            if n >= STEPS:
                break
        epoch += 1

    val_losses = []
    for i, b in enumerate(val_loader.epoch(0)):
        if i >= VAL_BATCHES:
            break
        out = eval_step(trainable, frozen, b)
        val_losses.append(float(np.asarray(out["core_loss"])))
    return {
        "quant": base_quant,
        "steps": STEPS,
        "train_time_s": round(time.time() - t0, 1),
        "loss_first25_mean": round(float(np.mean(losses[:25])), 4),
        "loss_last25_mean": round(float(np.mean(losses[-25:])), 4),
        "val_loss": round(float(np.mean(val_losses)), 4),
        "curve_every10": [round(float(x), 3) for x in losses[::10]],
    }


def main():
    import tempfile

    from sam3_lora_tpu.train.data import make_synthetic_coco

    img_size = 64 if TINY else 1008
    root = os.environ.get("QQ_DATA_DIR") or tempfile.mkdtemp(prefix="qqds_")
    for split, n in (("train", BATCH * 40), ("valid", BATCH * VAL_BATCHES)):
        if not os.path.exists(os.path.join(root, split, "_annotations.coco.json")):
            make_synthetic_coco(root, split, num_images=n, img_size=img_size)

    out = {}
    for q in os.environ.get("QQ_QUANTS", "none,int8").split(","):
        out[q] = run(q, root)
        print(json.dumps(out[q]), flush=True)

    if "none" in out and "int8" in out:
        d_final = out["int8"]["loss_last25_mean"] - out["none"]["loss_last25_mean"]
        d_val = out["int8"]["val_loss"] - out["none"]["val_loss"]
        out["summary"] = {
            "final_train_loss_delta_int8_minus_bf16": round(d_final, 4),
            "val_loss_delta_int8_minus_bf16": round(d_val, 4),
        }
        print(json.dumps(out["summary"]), flush=True)
    with open("/tmp/quant_quality.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
