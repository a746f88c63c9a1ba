"""COCO-format data pipeline (host side) with static-shape batching.

Re-design of the reference's data path for the native LoRA trainer
(``train_sam3_lora_native.py:46-232`` COCOSegmentDataset +
``sam3/train/data/collator.py`` collate_fn_api): per image —

* decode + bilinear-resize to 1008^2, normalize mean/std 0.5,
* decode polygon/RLE masks at original res, nearest-resize to 1008^2
  (reference semantics), then area-downsample to ``mask_loss_resolution``
  for the mask loss,
* boxes scaled + normalized to [0, 1] xyxy -> cxcywh,
* category-aware query text: the single (or most common) category name
  lowercased, "object" if no annotations (train_sam3_lora_native.py:196-210).

Batching is fully static: targets pad to ``max_targets`` slots with validity
masks (replacing pad-to-longest), so the TPU train step compiles once.

Throughput design: decoding runs in a thread pool ahead of the training loop
(double-buffered prefetch) — JPEG decode + mask rasterization overlap with
device compute, mirroring the reference's DataLoader workers.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from collections import Counter
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import ModelConfig
from ..models.geometry import GeoPrompt
from ..models.sam3_image import Batch, Targets
from ..models.tokenizer import SimpleTokenizer, get_default_tokenizer
from ..ops.rle import segmentation_to_mask

IMAGE_MEAN = 0.5
IMAGE_STD = 0.5


@dataclass
class Sample:
    """One decoded query: image + padded targets + query text."""

    image: np.ndarray          # (3, R, R): uint8 (device-side normalize) or
                               # float32 already normalized
    text: str
    boxes: np.ndarray          # (T, 4) normalized cxcywh
    valid: np.ndarray          # (T,) bool
    masks: np.ndarray          # (T, m, m) bool — losses cast at use; bool
                               # quarters the per-batch host->device bytes
    mask_valid: np.ndarray     # (T,) bool
    is_exhaustive: bool
    coco_image_id: int
    original_size: Tuple[int, int]  # (h, w)


def downsample_mask(mask: np.ndarray, out: int) -> np.ndarray:
    """Area-average downsample then threshold at 0.5 (matches the eval GT
    path, validate_sam3_lora.py:463-533)."""
    h, w = mask.shape
    if h == out and w == out:
        return mask.astype(np.float32)
    fy, fx = h // out, w // out
    if fy * out == h and fx * out == w:
        m = mask[: fy * out, : fx * out].reshape(out, fy, out, fx).mean(axis=(1, 3))
    else:  # generic fallback via PIL bilinear
        from PIL import Image

        m = np.asarray(
            Image.fromarray((mask * 255).astype(np.uint8)).resize(
                (out, out), Image.BILINEAR
            ),
            dtype=np.float32,
        ) / 255.0
    return (m > 0.5).astype(np.float32)


class COCOSegmentDataset:
    """Reads ``<data_dir>/<split>/_annotations.coco.json`` (Roboflow layout).

    ``transforms`` (optional) is a datapoint-level augmentation pipeline from
    :mod:`.transforms` — a callable ``(Datapoint, rng) -> Datapoint`` applied
    at native resolution before static-shape padding. When None, the
    reference native trainer's resize-only path is used
    (train_sam3_lora_native.py:95-232 semantics, unchanged).
    """

    def __init__(
        self,
        data_dir: str,
        split: str = "train",
        model_config: Optional[ModelConfig] = None,
        transforms=None,
        seed: int = 0,
        per_category_queries: bool = False,
        include_negatives: bool = False,
    ):
        self.cfg = model_config or ModelConfig()
        self.transforms = transforms
        self.seed = seed
        self.split_dir = Path(data_dir) / split
        ann_file = self.split_dir / "_annotations.coco.json"
        if not ann_file.exists():
            raise FileNotFoundError(f"COCO annotation file not found: {ann_file}")
        with open(ann_file) as f:
            self.coco = json.load(f)
        self.images = {im["id"]: im for im in self.coco["images"]}
        self.image_ids = sorted(self.images.keys())
        self.img_to_anns: Dict[int, List[dict]] = {}
        for ann in self.coco["annotations"]:
            self.img_to_anns.setdefault(ann["image_id"], []).append(ann)
        self.categories = {c["id"]: c["name"] for c in self.coco["categories"]}

        # Datapoint index space (COCO_FROM_JSON semantics,
        # sam3/train/data/coco_json_loaders.py:102-280): default is one
        # category-aware query per image; with ``per_category_queries`` each
        # (image, category) pair is its own datapoint — the reference's
        # category chunking with the queries dim unrolled into the batch dim
        # (our static-shape design runs one text query per batch row).
        # ``include_negatives`` adds (image, absent-category) datapoints: the
        # query text names a category with NO instances, targets are empty,
        # and is_exhaustive stays True ("none present" is exhaustive
        # knowledge) — this is what trains "concept absent" for cgF1's
        # image-level term.
        self._datapoints: List[Tuple[int, Optional[int]]] = []
        if per_category_queries:
            for img_id in self.image_ids:
                present = {
                    a.get("category_id", 0) for a in self.img_to_anns.get(img_id, [])
                }
                for cat_id in sorted(self.categories):
                    if cat_id in present or include_negatives:
                        self._datapoints.append((img_id, cat_id))
        else:
            self._datapoints = [(i, None) for i in self.image_ids]

    def __len__(self) -> int:
        return len(self._datapoints)

    def _category_text(self, class_names: List[str]) -> str:
        """Category-aware query text (train_sam3_lora_native.py:196-210)."""
        if not class_names:
            return "object"
        uniq = set(class_names)
        if len(uniq) == 1:
            return class_names[0].lower()
        return Counter(class_names).most_common(1)[0][0].lower()

    def load_datapoint(self, idx: int):
        """Decode one image + annotations at native resolution into a
        transform-ready :class:`~.transforms.Datapoint` (one category-aware
        query, boxes absolute xyxy, full-res masks). In per-category mode the
        annotations are filtered to the datapoint's category and the query
        text is that category's name (possibly with zero instances — a
        negative query)."""
        from PIL import Image as PILImage

        from .transforms import Datapoint, Query

        img_id, cat_id = self._datapoints[idx]
        info = self.images[img_id]
        pil = PILImage.open(self.split_dir / info["file_name"]).convert("RGB")
        orig_w, orig_h = pil.size
        img = np.asarray(pil, dtype=np.uint8)

        anns = self.img_to_anns.get(img_id, [])
        if cat_id is not None:
            anns = [a for a in anns if a.get("category_id", 0) == cat_id]
        boxes, masks, crowds, class_names = [], [], [], []
        for ann in anns:
            bbox = ann.get("bbox")
            if bbox is None:
                continue
            x, y, w, h = bbox
            boxes.append([x, y, x + w, y + h])
            class_names.append(
                self.categories.get(ann.get("category_id", 0), "object")
            )
            crowds.append(bool(ann.get("iscrowd", 0)))
            seg = ann.get("segmentation")
            m = None
            if seg:
                try:
                    m = segmentation_to_mask(seg, orig_h, orig_w).astype(np.uint8)
                except Exception:
                    m = None
            masks.append(
                m if m is not None else np.zeros((orig_h, orig_w), np.uint8)
            )
        query = Query(
            text=(
                self.categories[cat_id].lower()
                if cat_id is not None
                else self._category_text(class_names)
            ),
            boxes=np.array(boxes, np.float32).reshape(-1, 4),
            masks=np.stack(masks) if masks else np.zeros((0, orig_h, orig_w), np.uint8),
            is_crowd=np.array(crowds, bool),
            is_exhaustive=True,
        )
        return Datapoint(
            image=img,
            queries=[query],
            coco_image_id=img_id,
            original_size=(orig_h, orig_w),
        )

    def load(self, idx: int, epoch: int = 0) -> Sample:
        cfg = self.cfg
        r = cfg.img_size
        t_max = cfg.max_targets
        m_res = cfg.mask_loss_resolution

        dp = self.load_datapoint(idx)
        if self.transforms is not None:
            rng = np.random.RandomState(
                (self.seed * 1000003 + epoch * 131071 + idx) % (2**31 - 1)
            )
            dp = self.transforms(dp, rng)
        else:
            from .transforms import eval_transforms

            dp = eval_transforms(r)(dp, np.random.RandomState(0))
        img = dp.image  # (3, R, R): uint8 (device-side normalize) or float
        if img.shape != (3, r, r):
            raise ValueError(
                f"transform pipeline must end at (3,{r},{r}), got {img.shape}"
            )

        boxes = np.zeros((t_max, 4), np.float32)
        valid = np.zeros((t_max,), bool)
        masks = np.zeros((t_max, m_res, m_res), bool)
        mask_valid = np.zeros((t_max,), bool)
        q = dp.queries[0] if dp.queries else None
        n = 0
        if q is not None:
            for i in range(min(q.num_objects, t_max)):
                x0, y0, x1, y1 = q.boxes[i]
                # normalized cxcywh (train_sam3_lora_native.py:131-142)
                boxes[n] = [
                    (x0 + x1) / 2 / r, (y0 + y1) / 2 / r,
                    (x1 - x0) / r, (y1 - y0) / r,
                ]
                valid[n] = True
                if q.masks is not None and q.masks[i].any():
                    masks[n] = downsample_mask(
                        q.masks[i].astype(np.float32), m_res
                    ) > 0.5
                    mask_valid[n] = True
                n += 1

        return Sample(
            # uint8 images stay uint8 across collate + host->device transfer
            # (4x fewer bytes through the tunnel); ViT normalizes on device
            image=np.ascontiguousarray(
                img if img.dtype == np.uint8 else img.astype(np.float32)
            ),
            text=q.text if q is not None else "object",
            boxes=boxes,
            valid=valid,
            masks=masks,
            mask_valid=mask_valid,
            is_exhaustive=q.is_exhaustive if q is not None else True,
            coco_image_id=dp.coco_image_id,
            original_size=dp.original_size,
        )


def collate(
    samples: Sequence[Sample],
    tokenizer: Optional[SimpleTokenizer] = None,
    cfg: Optional[ModelConfig] = None,
) -> Batch:
    """Static-shape batch assembly (the reference's collate_fn_api without
    pad-to-longest: every dim is pre-padded)."""
    cfg = cfg or ModelConfig()
    tok = tokenizer or get_default_tokenizer()
    b = len(samples)
    images = np.stack([s.image for s in samples])
    token_ids = tok([s.text for s in samples], context_length=cfg.text_context_length)
    targets = Targets(
        boxes=np.stack([s.boxes for s in samples]),
        valid=np.stack([s.valid for s in samples]),
        masks=np.stack([s.masks for s in samples]),
        mask_valid=np.stack([s.mask_valid for s in samples]),
        is_exhaustive=np.array([s.is_exhaustive for s in samples], bool),
    )
    return Batch(
        images=images,
        token_ids=token_ids,
        img_ids=np.arange(b, dtype=np.int32),
        geo=GeoPrompt(
            boxes=np.zeros((b, cfg.max_prompt_boxes, 4), np.float32),
            mask=np.ones((b, cfg.max_prompt_boxes), bool),
            labels=np.ones((b, cfg.max_prompt_boxes), np.int32),
        ),
        targets=targets,
    )


class DataLoader:
    """Threaded, prefetching loader over a COCOSegmentDataset."""

    def __init__(
        self,
        dataset: COCOSegmentDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 2,
        drop_last: bool = True,
        tokenizer: Optional[SimpleTokenizer] = None,
        prefetch: int = 2,
        host_shard=None,  # parallel.multihost.HostShard for pod-scale input
    ):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.workers = max(1, num_workers)
        self.drop_last = drop_last
        self.tok = tokenizer or get_default_tokenizer()
        self.prefetch = prefetch
        self.host_shard = host_shard
        self._epoch = 0

    def _host_indices(self, epoch: int) -> np.ndarray:
        """Epoch order, restricted to this host's shard AFTER the seeded
        shuffle so every host draws disjoint samples from the same global
        permutation (DistributedSampler semantics, ref train.py:233-247)."""
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        if self.host_shard is not None:
            order = order[self.host_shard.indices(len(order))]
        return order

    def __len__(self) -> int:
        n = len(self.ds)
        if self.host_shard is not None:
            n = len(self.host_shard.indices(n))
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Batch]:
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        order = self._host_indices(epoch)
        n_batches = len(self)
        batches_idx = [
            order[i * self.bs : (i + 1) * self.bs] for i in range(n_batches)
        ]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        from concurrent.futures import ThreadPoolExecutor

        def produce():
            with ThreadPoolExecutor(max_workers=self.workers) as pool:
                for idxs in batches_idx:
                    samples = list(
                        pool.map(lambda i: self.ds.load(i, epoch=epoch), idxs)
                    )
                    q.put(collate(samples, self.tok, self.ds.cfg))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item


# ---------------------------------------------------------------------------
# Synthetic dataset for tests / benches (no real images needed)
# ---------------------------------------------------------------------------


def make_synthetic_coco(
    root: str,
    split: str = "train",
    num_images: int = 8,
    img_size: int = 64,
    category: str = "crack",
    seed: int = 0,
    extra_categories: Sequence[str] = (),
) -> str:
    """Write a tiny COCO dataset of random rectangles (polygon segmentations).

    ``extra_categories`` adds more category names; objects are assigned round-
    robin across all categories, so with >1 category most images have absent
    categories (negative-query material for per-category mode)."""
    from PIL import Image as PILImage

    rng = np.random.RandomState(seed)
    split_dir = Path(root) / split
    split_dir.mkdir(parents=True, exist_ok=True)
    cat_names = [category, *extra_categories]
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        arr = (rng.rand(img_size, img_size, 3) * 80).astype(np.uint8)
        n_obj = rng.randint(1, 4)
        for _ in range(n_obj):
            w = rng.randint(img_size // 8, img_size // 3)
            h = rng.randint(img_size // 8, img_size // 3)
            x = rng.randint(0, img_size - w)
            y = rng.randint(0, img_size - h)
            arr[y : y + h, x : x + w] = 220
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": 1 + (ann_id - 1) % len(cat_names),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                    "segmentation": [
                        [
                            float(x), float(y), float(x + w), float(y),
                            float(x + w), float(y + h), float(x), float(y + h),
                        ]
                    ],
                }
            )
            ann_id += 1
        fname = f"img_{i:04d}.jpg"
        PILImage.fromarray(arr).save(split_dir / fname, quality=90)
        images.append(
            {"id": i, "file_name": fname, "width": img_size, "height": img_size}
        )
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": j + 1, "name": n} for j, n in enumerate(cat_names)
        ],
    }
    with open(split_dir / "_annotations.coco.json", "w") as f:
        json.dump(coco, f)
    return str(root)
