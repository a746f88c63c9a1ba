"""Stateful convenience API (reference ``sam3/model/sam3_image_processor.py``):
``set_image`` runs the ViT+FPN backbone once and caches the features; each
subsequent ``set_text_prompt``/``add_geometric_prompt`` call re-grounds
against the cache (one fusion-encoder+decoder pass, no backbone rerun).

Scores follow the processor semantics: ``sigmoid(logit) * sigmoid(presence)``
thresholded (sam3_image_processor.py:186-205) — note this differs from the
``infer_sam.py`` CLI, which uses plain sigmoid (both surfaces are preserved).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LoRAConfig, ModelConfig
from .inference import ImageLike, _to_pil
from .models import Batch, GeoPrompt, build_sam3_image_model, init_model
from .models.lora import load_lora_weights
from .models.tokenizer import get_default_tokenizer
from .train.data import IMAGE_MEAN, IMAGE_STD
from .utils.checkpoint import load_base_checkpoint


class Sam3Processor:
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
        self.threshold = threshold
        self.model = build_sam3_image_model(self.cfg, lora=lora_cfg)
        self.tokenizer = get_default_tokenizer()
        self.params = init_model(self.model, jax.random.PRNGKey(seed))
        if base_checkpoint:
            self.params, _ = load_base_checkpoint(self.params, base_checkpoint)
        if weights:
            self.params, _ = load_lora_weights(self.params, weights)
        if self.cfg.base_quant != "none":
            # quantize the frozen base once at load (bit-identical to the
            # dynamic path, halves frozen HBM, skips per-call weight quant)
            from .ops.quant import prequantize_tree

            self.params = prequantize_tree(
                self.params, self.cfg.base_quant_min_dim
            )

        model = self.model

        @jax.jit
        def _encode(params, images):
            return model.apply(
                {"params": params}, images, train=False,
                method=lambda m, img, train: m.backbone_image(img, train=train),
            )

        @jax.jit
        def _ground(params, feats, poss, token_ids, geo):
            b = token_ids.shape[0]
            batch = Batch(
                images=jnp.zeros((0,)),  # unused by ground()
                token_ids=token_ids,
                img_ids=jnp.zeros((b,), jnp.int32),
                geo=geo,
                targets=None,
            )
            out = model.apply(
                {"params": params}, feats, poss, batch, train=False,
                method=lambda m, f, p, bt, train: m.ground(f, p, bt, train=train),
            )
            scores = jax.nn.sigmoid(out["pred_logits"][-1][..., 0])
            presence = jax.nn.sigmoid(out["presence_logit_dec"][-1][..., 0])
            boxes = out["pred_boxes"][-1]
            masks = jax.nn.sigmoid(out["pred_masks"])
            return scores, presence, boxes, masks

        self._encode = _encode
        self._ground = _ground
        self._state: Optional[Dict[str, Any]] = None

    # ------------------------------------------------------------------ #
    def set_image(self, image: ImageLike) -> "Sam3Processor":
        from PIL import Image as PILImage

        pil = _to_pil(image)
        orig_w, orig_h = pil.size
        r = self.cfg.img_size
        arr = np.asarray(pil.resize((r, r), PILImage.BILINEAR), np.float32) / 255.0
        arr = ((arr - IMAGE_MEAN) / IMAGE_STD).transpose(2, 0, 1)[None]
        feats, poss = self._encode(self.params, jnp.asarray(arr))
        self._state = {
            "feats": feats,
            "poss": poss,
            "orig_size": (orig_h, orig_w),
        }
        return self

    # ------------------------------------------------------------------ #
    def set_text_prompt(
        self,
        prompt: str,
        boxes: Optional[np.ndarray] = None,
        box_labels: Optional[Sequence[int]] = None,
        threshold: Optional[float] = None,
        mask_prompt: Optional[np.ndarray] = None,
    ) -> Dict[str, Any]:
        """Ground one text prompt (+ optional geometric boxes / one mask
        prompt) against the cached image. Boxes are normalized cxcywh in
        [0, 1]; ``mask_prompt`` is an (H, W) binary/float mask at any
        resolution (requires ``ModelConfig.geo_mask_prompts``)."""
        if self._state is None:
            raise RuntimeError("call set_image() first")
        thr = self.threshold if threshold is None else threshold
        cfg = self.cfg
        token_ids = jnp.asarray(
            self.tokenizer([prompt.lower()], context_length=cfg.text_context_length)
        )
        geo = GeoPrompt.empty(1, cfg.max_prompt_boxes)
        if boxes is not None and len(boxes):
            n = min(len(boxes), cfg.max_prompt_boxes)
            labels = (
                np.asarray(box_labels[:n], np.int32)
                if box_labels is not None
                else np.ones((n,), np.int32)
            )
            geo = GeoPrompt(
                boxes=jnp.asarray(
                    np.pad(
                        np.asarray(boxes[:n], np.float32),
                        ((0, cfg.max_prompt_boxes - n), (0, 0)),
                    )
                )[None],
                mask=jnp.asarray(
                    np.arange(cfg.max_prompt_boxes) >= n
                )[None],
                labels=jnp.asarray(
                    np.pad(labels, (0, cfg.max_prompt_boxes - n), constant_values=1)
                )[None],
            )
        if mask_prompt is not None:
            if not cfg.geo_mask_prompts:
                raise ValueError(
                    "mask prompts need ModelConfig(geo_mask_prompts=True)"
                )
            m = np.asarray(mask_prompt, np.float32)
            geo = geo.replace(
                mask_embeddings=jnp.asarray(m)[None, None],
                mask_mask=jnp.zeros((1, 1), bool),
                mask_labels=jnp.ones((1, 1), jnp.int32),
            )
        scores, presence, boxes_out, masks = self._ground(
            self.params,
            self._state["feats"],
            self._state["poss"],
            token_ids,
            geo,
        )
        s = np.asarray(scores, np.float32)[0] * float(presence[0])
        keep = s > thr
        orig_h, orig_w = self._state["orig_size"]
        b = np.asarray(boxes_out, np.float32)[0][keep]
        cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        xyxy = np.stack(
            [
                (cx - w / 2) * orig_w, (cy - h / 2) * orig_h,
                (cx + w / 2) * orig_w, (cy + h / 2) * orig_h,
            ],
            axis=-1,
        )
        return {
            "prompt": prompt,
            "scores": s[keep],
            "boxes": xyxy,
            "masks_lowres": np.asarray(masks, np.float32)[0][keep] > 0.5,
            "presence": float(presence[0]),
            "num_detections": int(keep.sum()),
        }

    # ------------------------------------------------------------------ #
    def add_geometric_prompt(
        self, prompt: str, boxes: np.ndarray, labels: Optional[Sequence[int]] = None
    ) -> Dict[str, Any]:
        return self.set_text_prompt(prompt, boxes=boxes, box_labels=labels)
