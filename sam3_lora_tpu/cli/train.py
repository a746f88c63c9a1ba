"""Train CLI — ``python -m sam3_lora_tpu.cli.train --config <yaml>``.

Preserves the reference's YAML surface (``train_sam3_lora_native.py:1052-1063``
+ ``configs/*_lora_config.yaml``): ``model:``/``lora:``/``training:``/
``output:`` sections with rank/alpha/dropout/target_modules and the six
component flags. Extra (TPU-only) keys under ``model:``: ``base_checkpoint``
(converted base weights npz), ``tiny: true`` (test architecture), ``dtype``.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train SAM3 with LoRA (TPU)")
    parser.add_argument(
        "--config", type=str, default="configs/full_lora_config.yaml",
        help="Path to YAML configuration file",
    )
    parser.add_argument(
        "--num-epochs", type=int, default=None, help="Override training.num_epochs"
    )
    args = parser.parse_args(argv)

    from ..config import (
        LoRAConfig, ModelConfig, TrainConfig, load_yaml_config, tiny_model_config,
    )
    from ..parallel import multihost
    from ..train.data import COCOSegmentDataset, DataLoader
    from ..train.trainer import Trainer
    from ..utils import setup_logging

    # pod scale-out: join the multi-host runtime BEFORE any backend use
    # (no-op single-host; reference analogue: submitit/torchrun process
    # groups, sam3/train/train.py:45-339)
    multihost.initialize()

    cfg = load_yaml_config(args.config)
    lcfg = LoRAConfig.from_dict(cfg.get("lora", {}))
    tcfg = TrainConfig.from_yaml_dict(cfg)
    if args.num_epochs is not None:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, num_epochs=args.num_epochs)
    msec = cfg.get("model", {}) or {}
    if msec.get("tiny"):
        mcfg = tiny_model_config()
    else:
        mcfg = ModelConfig(dtype=str(msec.get("dtype", "bfloat16")))

    log = setup_logging(tcfg.output_dir)
    log.info("config: %s", args.config)
    log.info("lora: rank=%d alpha=%s targets=%s", lcfg.rank, lcfg.alpha, lcfg.target_modules)

    trainer = Trainer(
        model_cfg=mcfg,
        lora_cfg=lcfg,
        train_cfg=tcfg,
        base_checkpoint=msec.get("base_checkpoint"),
    )
    train_ds = COCOSegmentDataset(
        tcfg.data_dir, "train", model_config=mcfg,
        per_category_queries=tcfg.per_category_queries,
        include_negatives=tcfg.include_negatives,
    )
    try:
        val_ds = COCOSegmentDataset(tcfg.data_dir, "valid", model_config=mcfg)
        val_loader = DataLoader(
            val_ds, tcfg.batch_size, shuffle=False, num_workers=tcfg.num_workers
        )
    except FileNotFoundError:
        log.warning("no valid split found; training without validation")
        val_loader = None
    train_loader = DataLoader(
        train_ds, tcfg.batch_size, num_workers=tcfg.num_workers, seed=tcfg.seed,
        host_shard=(
            multihost.host_shard() if multihost.process_count() > 1 else None
        ),
    )
    result = trainer.fit(train_loader, val_loader)
    log.info("done: best_val=%.4f steps=%d", result["best_val_loss"], result["steps"])
    with open(os.path.join(tcfg.output_dir, "result.json"), "w") as f:
        json.dump(
            {k: v for k, v in result.items() if k != "history"}
            | {"history": result["history"]},
            f, indent=2,
        )


if __name__ == "__main__":
    main()
