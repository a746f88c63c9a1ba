"""Validation CLI — post-hoc metrics (reference ``validate_sam3_lora.py``):
model predictions -> sigmoid scores -> mask-NMS -> top-100, GT masks at the
seg-head resolution, then class-agnostic COCO segm mAP + cgF1.

``python -m sam3_lora_tpu.cli.validate --config <yaml> --weights <npz>
--val_data_dir <dir-with-_annotations.coco.json>``
"""

from __future__ import annotations

import argparse
import json
import os
import time


def merge_overlapping_masks(masks, scores, iou_threshold: float):
    """Union-merge overlapping predictions (reference
    validate_sam3_lora.py:232-301, for crack-like elongated objects):
    greedily group masks by pairwise IoU > threshold, OR the masks in a
    group, keep the max score."""
    import numpy as np

    n = len(masks)
    if n == 0:
        return masks, scores
    flat = masks.reshape(n, -1).astype(np.float32)
    inter = flat @ flat.T
    area = flat.sum(1)
    union = area[:, None] + area[None, :] - inter
    iou = inter / np.maximum(union, 1e-9)
    used = np.zeros(n, bool)
    out_masks, out_scores = [], []
    order = np.argsort(-scores)
    for i in order:
        if used[i]:
            continue
        group = ~used & (iou[i] > iou_threshold)
        group[i] = True
        used |= group
        out_masks.append(masks[group].any(0))
        out_scores.append(float(scores[group].max()))
    return np.stack(out_masks), np.asarray(out_scores)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="SAM3 LoRA validation: segm mAP + cgF1 with SAM3 NMS (TPU)"
    )
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--val_data_dir", type=str, required=True)
    parser.add_argument("--use-base-model", action="store_true")
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--prob-threshold", type=float, default=0.3)
    parser.add_argument("--nms-iou", type=float, default=0.7)
    parser.add_argument("--merge", action="store_true")
    parser.add_argument("--merge-iou", type=float, default=0.15)
    parser.add_argument("--output-json", type=str, default=None)
    parser.add_argument("--dump-preds", type=str, default=None,
                        help="also stream predictions to this dir "
                             "(PredictionDumper; re-evaluable offline)")
    parser.add_argument("--tide", action="store_true",
                        help="append TIDE error decomposition "
                             "(Loc/Dup/Bkg/Miss + oracle dAP)")
    args = parser.parse_args(argv)

    if not args.use_base_model and (args.config is None or args.weights is None):
        parser.error("--config and --weights required unless --use-base-model")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import (
        LoRAConfig, ModelConfig, load_yaml_config, tiny_model_config,
    )
    from ..eval import evaluate_cgf1, evaluate_coco_map
    from ..inference import SAM3LoRAInference
    from ..ops.nms import nms_masks
    from ..train.data import COCOSegmentDataset, downsample_mask

    cfg = load_yaml_config(args.config) if args.config else {}
    msec = cfg.get("model", {}) or {}
    mcfg = (
        tiny_model_config()
        if msec.get("tiny")
        else ModelConfig(dtype=str(msec.get("dtype", "bfloat16")))
    )
    lcfg = None if args.use_base_model else LoRAConfig.from_dict(cfg.get("lora", {}))

    engine = SAM3LoRAInference(
        model_cfg=mcfg,
        lora_cfg=lcfg,
        weights=None if args.use_base_model else args.weights,
        base_checkpoint=msec.get("base_checkpoint"),
    )

    # dataset rooted at parent of val_data_dir
    data_dir, split = os.path.split(os.path.normpath(args.val_data_dir))
    ds = COCOSegmentDataset(data_dir, split, model_config=mcfg)
    m_res = mcfg.mask_loss_resolution
    n_samples = len(ds) if args.num_samples is None else min(args.num_samples, len(ds))

    nms = jax.jit(
        lambda m, s: nms_masks(m, s, args.nms_iou), static_argnums=()
    )

    gts, dts = {}, {}
    t0 = time.time()
    for idx in range(n_samples):
        sample = ds.load(idx)
        img_id = sample.coco_image_id
        # GT at the mask-loss resolution (reference GT path,
        # validate_sam3_lora.py:463-533)
        gts[img_id] = [
            {"mask": sample.masks[i] > 0.5, "iscrowd": 0}
            for i in range(len(sample.valid))
            if sample.valid[i] and sample.mask_valid[i]
        ]
        # model forward on the preprocessed image; prompt = category text
        img = sample.image[None]
        token_ids = engine.tokenizer(
            [sample.text], context_length=mcfg.text_context_length
        )
        scores, presence, boxes, masks = engine._forward(
            engine.params, jnp.asarray(img), jnp.asarray(token_ids)
        )
        s = np.asarray(scores, np.float32)[0]  # (Q,)
        m = np.asarray(masks, np.float32)[0] > 0.5  # (Q, mr, mr) bool
        keep_thr = s >= args.prob_threshold
        # mask NMS over thresholded candidates (apply_sam3_nms, :303-350)
        keep_nms = np.asarray(
            nms(jnp.asarray(m), jnp.asarray(s))
        )
        keep = keep_thr & keep_nms & (m.sum(axis=(1, 2)) > 0)
        order = np.argsort(-s[keep])[:100]
        sel_masks = m[keep][order]
        sel_scores = s[keep][order]
        if args.merge and len(sel_masks):
            sel_masks, sel_scores = merge_overlapping_masks(
                sel_masks, sel_scores, args.merge_iou
            )
        dts[img_id] = [
            {"mask": sel_masks[i], "score": float(sel_scores[i])}
            for i in range(len(sel_scores))
        ]
        if (idx + 1) % 25 == 0:
            print(f"  [{idx + 1}/{n_samples}] {time.time() - t0:.1f}s")

    if args.dump_preds:
        from ..eval.writer import PredictionDumper

        dumper = PredictionDumper(args.dump_preds, top_k=100)
        for iid, recs in dts.items():
            if recs:
                dumper.add(
                    iid, [r["score"] for r in recs],
                    masks=np.stack([r["mask"] for r in recs]),
                )
        path = dumper.finalize()
        print(f"predictions dumped to {path}")

    map_res = evaluate_coco_map(gts, dts, iou_type="segm")
    cgf1_res = evaluate_cgf1(gts, dts, iou_type="segm")
    results = {
        "num_images": n_samples,
        "mAP": map_res["mAP"],
        "mAP_50": map_res["mAP_50"],
        "mAP_75": map_res["mAP_75"],
        **{k: v for k, v in cgf1_res.items()},
        "prob_threshold": args.prob_threshold,
        "nms_iou": args.nms_iou,
        "merged": bool(args.merge),
    }
    if args.tide:
        from ..eval.tide import tide_errors

        results.update(
            {k: float(v) for k, v in tide_errors(gts, dts).items()
             if k != "mAP"}
        )
    print(json.dumps(results, indent=2))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
