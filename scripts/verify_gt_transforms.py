"""Render GT boxes/masks after the transform pipeline for visual inspection.

Port of the reference's ``verify_gt_transforms.py`` (repo root, 201 LoC):
loads N samples through the SAME pipeline the trainer uses (including
augmentation when --augment), denormalizes, and writes overlay images so a
human can confirm boxes still frame their masks after resize/flip/crop.

Usage:
    python scripts/verify_gt_transforms.py --data_dir data --out /tmp/gtviz \
        [--augment] [--num 8] [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from sam3_lora_tpu.config import ModelConfig, tiny_model_config
    from sam3_lora_tpu.train.data import COCOSegmentDataset, IMAGE_MEAN, IMAGE_STD
    from sam3_lora_tpu.train.transforms import train_transforms
    from sam3_lora_tpu.viz import draw_boxes, overlay_masks

    cfg = tiny_model_config() if args.tiny else ModelConfig()
    tf = (
        train_transforms(cfg.img_size, hflip=True, color_jitter=True)
        if args.augment
        else None
    )
    ds = COCOSegmentDataset(args.data_dir, args.split, model_config=cfg,
                            transforms=tf)
    os.makedirs(args.out, exist_ok=True)

    r = cfg.img_size
    for i in range(min(args.num, len(ds))):
        s = ds.load(i, epoch=0)
        img = (s.image.transpose(1, 2, 0) * IMAGE_STD + IMAGE_MEAN)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        boxes = []
        for b, v in zip(s.boxes, s.valid):
            if not v:
                continue
            cx, cy, w, h = b
            boxes.append([(cx - w / 2) * r, (cy - h / 2) * r,
                          (cx + w / 2) * r, (cy + h / 2) * r])
        masks = [m > 0.5 for m, mv in zip(s.masks, s.mask_valid) if mv]
        out = overlay_masks(img, masks)
        out = draw_boxes(out, boxes, labels=[s.text] * len(boxes))
        path = os.path.join(args.out, f"gt_{i:03d}.png")
        Image.fromarray(out).save(path)
        print(f"{path}: {len(boxes)} boxes, {len(masks)} masks, text={s.text!r}")
    print(f"wrote {min(args.num, len(ds))} overlays to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
