"""LoRA-vs-base comparison sweep (reference ``compare_lora_base_batch.py``):
run N validation images through the SAME resident model twice — base adapters
zeroed vs trained adapters hot-swapped in — and write a per-image + combined
visualization grid. The frozen 848M base is loaded once; the swap is a
10-50 MB host->HBM copy (the reference rebuilds both models).

``python -m sam3_lora_tpu.cli.compare --config cfg.yaml --weights best.npz
--val_data_dir data/valid --num-images 5``
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="LoRA vs base comparison sweep")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--val_data_dir", type=str, required=True)
    parser.add_argument("--num-images", type=int, default=5)
    parser.add_argument("--threshold", type=float, default=0.3)
    parser.add_argument("--output-dir", type=str, default="comparison_output")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..config import (
        LoRAConfig, ModelConfig, load_yaml_config, tiny_model_config,
    )
    from ..inference import SAM3LoRAInference
    from ..train.data import COCOSegmentDataset

    cfg = load_yaml_config(args.config)
    msec = cfg.get("model", {}) or {}
    mcfg = (
        tiny_model_config()
        if msec.get("tiny")
        else ModelConfig(dtype=str(msec.get("dtype", "bfloat16")))
    )
    lcfg = LoRAConfig.from_dict(cfg.get("lora", {}))

    engine = SAM3LoRAInference(
        model_cfg=mcfg, lora_cfg=lcfg, base_checkpoint=msec.get("base_checkpoint"),
        threshold=args.threshold,
    )
    # snapshot the zero-init adapters (== base behaviour), then the trained set
    from ..models.lora import split_params

    _, base_adapters = split_params(engine.params)

    data_dir, split = os.path.split(os.path.normpath(args.val_data_dir))
    ds = COCOSegmentDataset(data_dir, split, model_config=mcfg)
    os.makedirs(args.output_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image as PILImage

    n = min(args.num_images, len(ds))
    rows = []
    for idx in range(n):
        sample = ds.load(idx)
        info = ds.images[ds.image_ids[idx]]
        img_path = str(ds.split_dir / info["file_name"])
        pil = PILImage.open(img_path).convert("RGB")

        # base: zero adapters (forward == frozen base, zero-init-B identity)
        engine.params = _set_adapters(engine.params, base_adapters)
        base_res = engine.predict(pil, [sample.text])[0]
        # lora: hot-swap trained adapters
        engine.load_adapters(args.weights)
        lora_res = engine.predict(pil, [sample.text])[0]

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        axes[0].imshow(pil); axes[0].set_title(f"input  ('{sample.text}')")
        for ax, res, title in (
            (axes[1], base_res, "base"),
            (axes[2], lora_res, "LoRA"),
        ):
            ax.imshow(pil)
            ax.set_title(f"{title}: {res['num_detections']} dets")
            if res["num_detections"]:
                for i in range(res["num_detections"]):
                    m = res["masks"][i]
                    overlay = np.zeros((*m.shape, 4))
                    overlay[m] = (1.0, 0.2, 0.2, 0.45)
                    ax.imshow(overlay)
        for ax in axes:
            ax.axis("off")
        out_path = os.path.join(args.output_dir, f"comparison_{idx:03d}.png")
        fig.savefig(out_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        rows.append((idx, sample.text, base_res["num_detections"], lora_res["num_detections"]))
        print(
            f"[{idx + 1}/{n}] '{sample.text}': base {base_res['num_detections']} "
            f"vs lora {lora_res['num_detections']} dets -> {out_path}"
        )

    # combined grid
    fig, axes = plt.subplots(n, 1, figsize=(15, 5 * n))
    if n == 1:
        axes = [axes]
    for ax, (idx, *_rest) in zip(axes, rows):
        ax.imshow(
            PILImage.open(os.path.join(args.output_dir, f"comparison_{idx:03d}.png"))
        )
        ax.axis("off")
    combined = os.path.join(args.output_dir, "combined_comparison_all.png")
    fig.savefig(combined, bbox_inches="tight", dpi=100)
    plt.close(fig)
    print(f"combined grid -> {combined}")


def _set_adapters(params, adapters_flat):
    """Replace adapter leaves from a flat {'a.b.lora_a': array} dict."""
    import jax.numpy as jnp
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    by_name = {".".join(k): k for k in flat}
    for name, v in adapters_flat.items():
        flat[by_name[name]] = jnp.asarray(v)
    return traverse_util.unflatten_dict(flat)


if __name__ == "__main__":
    main()
