"""Headline benchmark: crack-COCO LoRA finetune throughput (images/sec/chip).

Runs the FULL 848M SAM3 image model (bf16 compute) with full-config LoRA
adapters through the real jitted train step (forward + on-device Hungarian
matching + losses + masked AdamW) on synthetic device-resident data, and
reports images/sec/chip.

BENCH_DATA=real additionally drives the REAL input pipeline: a generated
1008^2 JPEG crack dataset on disk (polygon masks), decoded + rasterized by
the threaded DataLoader, so the number includes JPEG decode, mask
rasterization, static-shape collation and host->device transfer (SURVEY
hard-part #4). data_time is reported alongside.

Baseline: the reference's observed full-config training on an RTX 3090 is
98 steps x bs 8 in ~7.5 min = 1.74 img/s (README.md:242-249). BASELINE.json's
north star is >=2x *A100* img/s/chip; no A100 number is published for this
workload, so we take A100 ~= 2x RTX 3090 on this bf16-heavy model:
baseline = 3.5 img/s/chip, target >= 7.0.

Prints ONE JSON line with {"metric", "value", "unit", "vs_baseline"} plus
diagnostics: step_time_median_s (the headline basis), step_time_min/max_s,
per-group times (step_time_groups_s), steps_per_fetch, a "contended" flag
when the max/median ratio indicates host interference, and data_time_s
under BENCH_DATA=real.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_S = 3.5  # estimated A100 full-config LoRA train throughput


def _enc_remat_env() -> str:
    # Default "ffn": remat only the encoder FFN sub-block, leave the 6 long
    # self-attentions unrematted. Fits HBM only because the long-attention
    # kernel's residuals are lean bf16 (ops/long_attention.py; the library
    # flash path OOM'd this config by 1.27 GB) and saves the 6x ~13 ms
    # attention forward replay: 3.441 vs 3.38 img/s/chip (v5e bs8,
    # 2026-08-20 queue E).
    v = os.environ.get("BENCH_ENC_REMAT", "ffn")
    if v not in ("0", "1", "ffn"):
        # a typo'd value silently disabling all encoder remat would OOM the
        # v5e bench with no pointer at the cause — fail loudly instead
        raise SystemExit(f"BENCH_ENC_REMAT must be 0|1|ffn, got {v!r}")
    return v


def bench_model_config():
    """The EXACT headline-bench ModelConfig, env-overridable. Shared with the
    profiling scripts (scripts/profile_bwd.py etc.) so step anatomy is
    measured at the same config the driver benches."""
    from sam3_lora_tpu.config import ModelConfig

    return ModelConfig(
        dtype="bfloat16",
        # Frozen-base storage dtype. Compute is bf16 either way, so bf16
        # storage is numerically identical in the compute path (the fp32->bf16
        # cast happened per-use before) and halves base HBM: 3.4 GB -> 1.7 GB.
        param_dtype=os.environ.get("BENCH_PARAM_DTYPE", "bfloat16"),
        # int8 frozen-base GEMM tier (ops/quant.py): the QLoRA-style
        # recommended training tier — adapters train against the quantized
        # base (no train/serve mismatch), measured +2.9% on top of
        # windows_only remat (2.722 -> 2.80 img/s/chip, v5e bs8).
        base_quant=os.environ.get("BENCH_QUANT", "int8"),
        # wo_block_mid (windows_only globals + block_mid windowed blocks)
        # measured 3.135 vs 2.99 windows_only on v5e bs8 (PARITY session 6)
        vit_remat_policy=os.environ.get("BENCH_REMAT", "wo_block_mid"),
        # "1" = full layer remat (default), "0" = no remat (flash residuals
        # saved), "ffn" = remat only the FFN sub-block (attention unrematted)
        enc_remat=_enc_remat_env() == "1",
        enc_remat_ffn=_enc_remat_env() == "ffn",
        # measured on v5e bs8: decoder remat OFF is a pure win (config.py:62-68)
        dec_remat=os.environ.get("BENCH_DEC_REMAT", "0") == "1",
        # Default "0" = flat per-block layout (no nn.scan): XLA schedules the
        # 28 windowed blocks' backward with cross-block overlap — measured
        # 3.679 vs 3.636 img/s/chip (step 2.1747 vs 2.2001, r5 queue B
        # FLAT_BS8) now that the r4/r5 memory fixes let it fit (r1: OOM'd).
        # nn.scan remains the ModelConfig default for compile-time-sensitive
        # training flows; "1" restores it here.
        vit_scan_blocks=os.environ.get("BENCH_SCAN", "0") == "1",
    )


def bench_lora_config():
    """full_lora_config surface: rank 32, alpha 64, all six components."""
    from sam3_lora_tpu.config import LoRAConfig

    return LoRAConfig(
        rank=32,
        alpha=64.0,
        target_modules=(
            "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2",
            "linear1", "linear2",
        ),
        apply_to_geometry_encoder=True,
        apply_to_mask_decoder=True,
    )


def main():
    import jax
    import numpy as np

    from sam3_lora_tpu.config import TrainConfig
    from sam3_lora_tpu.models import build_sam3_image_model, init_model_fast
    from sam3_lora_tpu.models.builder import dummy_batch
    from sam3_lora_tpu.train.losses import LossConfig
    from sam3_lora_tpu.train.trainer import (
        make_optimizer,
        make_train_step,
        split_trainable,
    )

    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    accum = int(os.environ.get("BENCH_ACCUM", "1"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    # Steps per host-fetch barrier. The axon tunnel ignores
    # block_until_ready, so a scalar fetch is the only reliable barrier —
    # but it costs a full HTTP round-trip (scripts/probe_rtt.py measures
    # it). Fetching once per GROUP of steps amortizes that RTT out of the
    # per-step number while keeping enough samples for a robust median.
    group = max(1, int(os.environ.get("BENCH_GROUP", "4")))

    if os.environ.get("BENCH_TINY") == "1":
        # CPU smoke mode: validates the bench harness itself (incl. the real
        # data pipeline loop) without the 848M model / TPU. sitecustomize
        # force-prefers the axon platform, so pin CPU explicitly (the env
        # var alone is ignored once jax is imported).
        jax.config.update("jax_platforms", "cpu")
        from sam3_lora_tpu.config import tiny_model_config

        cfg = tiny_model_config()
        run_tiny = True
    else:
        run_tiny = False
    n_chips = max(1, len(jax.devices()))
    cfg = cfg if run_tiny else bench_model_config()
    lcfg = bench_lora_config()
    model = build_sam3_image_model(cfg, lora=lcfg)

    rng = np.random.RandomState(0)
    batch = dummy_batch(cfg, batch_size=batch_size, with_targets=True)
    # randomize images so nothing constant-folds
    import jax.numpy as jnp

    # uint8 images: same dtype the production pipeline ships (the ViT
    # normalizes on device), so synthetic and real modes compile one step
    batch = batch.replace(
        images=jnp.asarray(
            rng.randint(0, 256, (batch_size, 3, cfg.img_size, cfg.img_size)),
            jnp.uint8,
        )
    )

    params = init_model_fast(model)
    trainable, frozen = split_trainable(params)
    del params  # would otherwise pin the bf16 kernels alongside the int8 tree
    if cfg.base_quant != "none" and os.environ.get("BENCH_PREQUANT", "1") == "1":
        from sam3_lora_tpu.ops.quant import prequantize_base

        frozen = prequantize_base(frozen, min_dim=cfg.base_quant_min_dim)
    tx, _ = make_optimizer(TrainConfig(num_epochs=1), steps_per_epoch=steps)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, LossConfig(), accum=accum)

    key = jax.random.PRNGKey(1)

    def _summarize(per_step_times):
        """Median per-step statistics: robust to one-core host contention.

        Round 2 lost its headline to this: the driver recorded 2.17 while the
        clean measurement was 2.99, because a single aggregate wall-clock over
        10 steps lets one contended step poison the mean. The median step is
        the honest device-rate signal; min/max + spread are reported so a
        contaminated run is visible in the JSON instead of silent.
        """
        ts = sorted(per_step_times)
        n = len(ts)
        med = ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])
        spread = (ts[-1] - ts[0]) / med if med else 0.0
        out = {
            "step_time_median_s": round(med, 4),
            "step_time_min_s": round(ts[0], 4),
            "step_time_max_s": round(ts[-1], 4),
            "steps_per_fetch": group,
            # per-group means in run order: locates an outlier (group 0 =
            # residual warmup/load work; mid-run = host contention)
            "step_time_groups_s": [round(t, 4) for t in per_step_times],
        }
        if spread > 0.2:
            out["contended"] = True
        return med, out

    extra = {}
    real = os.environ.get("BENCH_DATA", "synthetic") == "real"
    if real:
        # drive the REAL input pipeline: 1008^2 JPEGs + polygon masks on disk,
        # threaded decode/rasterize/collate, bit-packed bool masks on the
        # wire and async H2D transfer overlapping device compute
        # (train/prefetch.py) — the production trainer path.
        from sam3_lora_tpu.train.data import (
            COCOSegmentDataset,
            DataLoader,
            make_synthetic_coco,
        )
        from sam3_lora_tpu.train.prefetch import prefetch_to_device

        workers = int(os.environ.get("BENCH_WORKERS", "8"))
        n_imgs = batch_size * (steps + 3)
        # stable default dir so re-runs skip the one-time JPEG generation
        root = os.environ.get("BENCH_DATA_DIR") or (
            f"/tmp/benchds_{cfg.img_size}_{n_imgs}"
        )
        if not os.path.exists(os.path.join(root, "train", "_annotations.coco.json")):
            make_synthetic_coco(root, "train", num_images=n_imgs, img_size=cfg.img_size)
        ds = COCOSegmentDataset(root, "train", model_config=cfg)
        loader = DataLoader(
            ds, batch_size, shuffle=False, num_workers=workers,
            prefetch=int(os.environ.get("BENCH_PREFETCH", "3")), drop_last=True,
        )
        it = prefetch_to_device(
            iter(loader.epoch(0)),
            size=int(os.environ.get("BENCH_DEVBUF", "2")),
            pack_bool=True,
        )
        # warm up with a REAL batch: a synthetic warmup batch can differ in
        # dtype/layout and silently recompile on the first timed step (seen
        # on v5e: one 400 s "step" in an otherwise 3.3 s run)
        batch = next(it)
    t_data = 0.0

    # warmup / compile. NOTE: through the axon TPU tunnel block_until_ready
    # returns before the computation actually runs; a host fetch of a scalar
    # is the only reliable barrier. Steps chain through `trainable`, so one
    # fetch forces everything dispatched before it.
    trainable, opt_state, losses = step(trainable, frozen, opt_state, batch, key)
    float(np.asarray(losses["core_loss"]))
    # second warmup step: the first EXECUTION after the tunnel's AOT compile
    # can still carry one-time server-side load/link work that the compile
    # fetch doesn't cover (seen as a single +2.6 s/step first group in
    # otherwise tight runs, 2026-08-20), and fetching `losses` does not force
    # the warmup step's optimizer tail
    key, sub = jax.random.split(key)
    trainable, opt_state, losses = step(trainable, frozen, opt_state, batch, sub)
    float(np.asarray(losses["core_loss"]))

    group_times = []
    for _ in range(max(1, steps // group)):
        t0 = time.time()
        for _ in range(group):
            if real:
                td = time.time()
                batch = next(it)
                t_data += time.time() - td
            key, sub = jax.random.split(key)
            trainable, opt_state, losses = step(
                trainable, frozen, opt_state, batch, sub
            )
        # one barrier per group; the steps in between chain on `trainable`
        float(np.asarray(losses["core_loss"]))
        group_times.append((time.time() - t0) / group)
    med, stats = _summarize(group_times)
    img_per_s_per_chip = batch_size / med / n_chips
    extra = {**stats}
    if real:
        extra = {"data_time_s": round(t_data, 3), "pipeline": "real", **stats}

    print(
        json.dumps(
            {
                "metric": "full_lora_train_images_per_sec_per_chip",
                "value": round(img_per_s_per_chip, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s_per_chip / BASELINE_IMG_PER_S, 3),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
