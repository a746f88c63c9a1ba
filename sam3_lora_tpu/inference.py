"""Text-prompted inference engine (reference ``infer_sam.py:104-321``).

One jitted eval forward per (batch of) prompts; postprocess mirrors the
reference exactly: scores = sigmoid(pred_logits), threshold filter, cxcywh ->
xyxy x original size, masks sigmoid > 0.5, bilinear-resized to the original
resolution, re-thresholded at 0.5 (infer_sam.py:254-298).

Adapter hot-swap: ``load_adapters`` replaces only the LoRA leaves of the
param pytree — the frozen base stays resident on device (the reference
rebuilds the whole model per variant; here a swap is a ~10-50 MB host->HBM
copy).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import LoRAConfig, ModelConfig
from .models import Batch, GeoPrompt, build_sam3_image_model, init_model
from .models.lora import load_lora_weights
from .models.tokenizer import get_default_tokenizer
from .train.data import IMAGE_MEAN, IMAGE_STD
from .utils.checkpoint import load_base_checkpoint

ImageLike = Union[str, np.ndarray, "PIL.Image.Image"]  # noqa: F821


def _to_pil(image: ImageLike):
    from PIL import Image as PILImage

    if isinstance(image, str):
        return PILImage.open(image).convert("RGB")
    if isinstance(image, np.ndarray):
        return PILImage.fromarray(image.astype(np.uint8)).convert("RGB")
    return image.convert("RGB")


class SAM3LoRAInference:
    def __init__(
        self,
        model_cfg: Optional[ModelConfig] = None,
        lora_cfg: Optional[LoRAConfig] = None,
        weights: Optional[str] = None,
        base_checkpoint: Optional[str] = None,
        threshold: float = 0.5,
        seed: int = 0,
    ):
        self.cfg = model_cfg or ModelConfig(dtype="bfloat16")
        self.lcfg = lora_cfg
        self.threshold = threshold
        self.model = build_sam3_image_model(self.cfg, lora=lora_cfg)
        self.tokenizer = get_default_tokenizer()
        self.params = init_model(self.model, jax.random.PRNGKey(seed))
        if base_checkpoint:
            self.params, _ = load_base_checkpoint(self.params, base_checkpoint)
        if weights:
            self.load_adapters(weights)
        if self.cfg.base_quant != "none":
            # quantize the frozen base once at load (bit-identical to the
            # dynamic path, halves frozen HBM, skips per-call weight quant)
            from .ops.quant import prequantize_tree

            self.params = prequantize_tree(
                self.params, self.cfg.base_quant_min_dim
            )

        model = self.model

        @jax.jit
        def _forward(params, images, token_ids):
            b = token_ids.shape[0]
            batch = Batch(
                images=images,
                token_ids=token_ids,
                img_ids=jnp.zeros((b,), jnp.int32),
                geo=GeoPrompt.empty(b, self.cfg.max_prompt_boxes),
                targets=None,
            )
            out = model.apply({"params": params}, batch, train=False)
            scores = jax.nn.sigmoid(out["pred_logits"][-1][..., 0])  # (B, Q)
            presence = jax.nn.sigmoid(out["presence_logit_dec"][-1][..., 0])  # (B,)
            boxes = out["pred_boxes"][-1]  # (B, Q, 4) cxcywh in [0,1]
            masks = jax.nn.sigmoid(out["pred_masks"])  # (B, Q, m, m)
            return scores, presence, boxes, masks

        self._forward = _forward

    # ------------------------------------------------------------------ #
    def load_adapters(self, path: str) -> int:
        self.params, n = load_lora_weights(self.params, path)
        return n

    # ------------------------------------------------------------------ #
    def preprocess(self, image: ImageLike) -> Tuple[np.ndarray, Tuple[int, int]]:
        from PIL import Image as PILImage

        pil = _to_pil(image)
        orig_w, orig_h = pil.size
        r = self.cfg.img_size
        arr = np.asarray(pil.resize((r, r), PILImage.BILINEAR), np.float32) / 255.0
        arr = (arr - IMAGE_MEAN) / IMAGE_STD
        return arr.transpose(2, 0, 1)[None], (orig_h, orig_w)

    # ------------------------------------------------------------------ #
    def predict(
        self,
        image: ImageLike,
        prompts: Sequence[str],
        threshold: Optional[float] = None,
        use_presence: bool = False,
        resize_masks: bool = True,
    ) -> Dict[int, Dict[str, Any]]:
        """Run all prompts against one image (one backbone pass, batched text).

        Returns {prompt_idx: {prompt, boxes (N,4) xyxy orig scale, scores (N,),
        masks (N, H, W) bool at original size, num_detections}}.
        """
        from PIL import Image as PILImage

        thr = self.threshold if threshold is None else threshold
        img, (orig_h, orig_w) = self.preprocess(image)
        token_ids = self.tokenizer(
            [p.lower() for p in prompts], context_length=self.cfg.text_context_length
        )
        scores, presence, boxes, masks = self._forward(
            self.params, jnp.asarray(img), jnp.asarray(token_ids)
        )
        scores = np.asarray(scores, np.float32)
        if use_presence:
            scores = scores * np.asarray(presence, np.float32)[:, None]
        boxes = np.asarray(boxes, np.float32)
        masks = np.asarray(masks, np.float32)

        results: Dict[int, Any] = {}
        for qi, prompt in enumerate(prompts):
            keep = scores[qi] > thr
            n = int(keep.sum())
            if n == 0:
                results[qi] = {
                    "prompt": prompt, "boxes": None, "scores": None,
                    "masks": None, "num_detections": 0,
                }
                continue
            b = boxes[qi][keep]
            cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            xyxy = np.stack(
                [
                    (cx - w / 2) * orig_w, (cy - h / 2) * orig_h,
                    (cx + w / 2) * orig_w, (cy + h / 2) * orig_h,
                ],
                axis=-1,
            )
            m = masks[qi][keep] > 0.5  # (N, mr, mr) bool
            if resize_masks:
                up = np.zeros((n, orig_h, orig_w), bool)
                for i in range(n):
                    mi = PILImage.fromarray((m[i] * 255).astype(np.uint8))
                    up[i] = (
                        np.asarray(
                            mi.resize((orig_w, orig_h), PILImage.BILINEAR), np.float32
                        )
                        > 127.5
                    )
                m = up
            results[qi] = {
                "prompt": prompt,
                "boxes": xyxy,
                "scores": scores[qi][keep],
                "masks": m,
                "num_detections": n,
            }
        return results

    # ------------------------------------------------------------------ #
    def visualize(
        self,
        image: ImageLike,
        results: Dict[int, Dict[str, Any]],
        output_path: str,
        show_boxes: bool = True,
        show_masks: bool = True,
    ):
        """Overlay detections (reference infer_sam.py:323-427)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pil = _to_pil(image)
        fig, ax = plt.subplots(1, 1, figsize=(12, 8))
        ax.imshow(pil)
        cmap = plt.get_cmap("tab10")
        for qi, res in results.items():
            if not isinstance(qi, int) or res["num_detections"] == 0:
                continue
            color = cmap(qi % 10)
            for i in range(res["num_detections"]):
                if show_masks and res["masks"] is not None:
                    mask = res["masks"][i]
                    overlay = np.zeros((*mask.shape, 4))
                    overlay[mask] = (*color[:3], 0.45)
                    ax.imshow(overlay)
                if show_boxes:
                    x1, y1, x2, y2 = res["boxes"][i]
                    ax.add_patch(
                        plt.Rectangle(
                            (x1, y1), x2 - x1, y2 - y1,
                            fill=False, edgecolor=color, linewidth=2,
                        )
                    )
                    ax.text(
                        x1, max(y1 - 4, 0),
                        f"{res['prompt']} {res['scores'][i]:.2f}",
                        color="white", fontsize=9,
                        bbox=dict(facecolor=color, alpha=0.8, pad=1),
                    )
        ax.axis("off")
        fig.savefig(output_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return output_path
