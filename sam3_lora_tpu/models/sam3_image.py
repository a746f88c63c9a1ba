"""Sam3Image: the full promptable-detection forward pass.

Re-design of ``sam3/model/sam3_image.py:36-684`` as a single functional
forward with static shapes:

  images --ViT+FPN--> fpn feats        text_ids --text enc--> text tokens
  (geo boxes) --geometry enc--> geo tokens
  prompt = [text | geo] --fusion encoder--> memory (5184 tokens)
  --decoder (DAC in training, presence token, boxRPB)--> hs / boxes / presence
  --dot-product scorer--> logits        --seg head--> masks

Differences from the reference driven by TPU design (all behaviour-preserving):
* batch-first everywhere; one find-stage, one interactive step (the PCS path —
  the reference's interactive loop runs 1 iteration in training and ignores
  point prompts, sam3_image.py:547-576);
* matching (Hungarian + o2m) runs ON DEVICE inside the forward when targets
  are provided (the reference calls scipy on host per output);
* training never materializes all 400 query masks: the seg head consumes only
  the matched queries' embeddings (reference materializes (B, 400, 288^2),
  maskformer_segmentation.py:304-317).

Output container mirrors the reference's dict keys (pred_logits, pred_boxes,
pred_boxes_xyxy, presence_logit_dec, pred_masks, ...) with a leading `layers`
axis instead of aux_outputs lists.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..ops.boxes import box_cxcywh_to_xyxy, inverse_sigmoid
from ..train.matcher import hungarian_match, one_to_many_match
from .decoder import TransformerDecoder
from .fusion_encoder import TransformerEncoderFusion
from .geometry import GeometryEncoder, GeoPrompt
from .layers import Spec
from .neck import FPNNeck
from .scoring import DotProductScoring
from .seg_head import UniversalSegmentationHead
from .text_encoder import VETextEncoder
from .vit import ViT


@struct.dataclass
class Targets:
    """Static-shape per-query ground truth (the reference's BatchedFindTarget,
    data_misc.py:46-209, in padded form)."""

    boxes: jnp.ndarray        # (B, T, 4) normalized cxcywh, zero-padded
    valid: jnp.ndarray        # (B, T) bool
    masks: Optional[jnp.ndarray]       # (B, T, Hm, Wm) float {0,1}
    mask_valid: Optional[jnp.ndarray]  # (B, T) bool
    is_exhaustive: jnp.ndarray  # (B,) bool


@struct.dataclass
class Batch:
    """Model input batch (the reference's BatchedDatapoint, static shapes)."""

    images: jnp.ndarray       # (N_img, 3, R, R) normalized
    token_ids: jnp.ndarray    # (B, ctx) int32 tokenized query text
    img_ids: jnp.ndarray      # (B,) int32 index into images
    geo: Optional[GeoPrompt] = None
    targets: Optional[Targets] = None


class Sam3Image(nn.Module):
    spec: Spec

    def setup(self):
        sp = self.spec
        # module names mirror the reference state-dict prefixes
        # (backbone.vision_backbone.*, backbone.language_backbone.*,
        #  geometry_encoder.*, transformer.{encoder,decoder}.*,
        #  segmentation_head.*, dot_prod_scoring.*)
        self.trunk = ViT(sp, name="backbone.vision_backbone.trunk")
        self.neck = FPNNeck(sp, name="backbone.vision_backbone")
        self.language_backbone = VETextEncoder(sp, name="backbone.language_backbone")
        self.geometry_encoder = GeometryEncoder(sp, name="geometry_encoder")
        self.encoder = TransformerEncoderFusion(sp, name="transformer.encoder")
        self.decoder = TransformerDecoder(sp, name="transformer.decoder")
        self.segmentation_head = UniversalSegmentationHead(sp, name="segmentation_head")
        self.dot_prod_scoring = DotProductScoring(sp, name="dot_prod_scoring")

    # ------------------------------------------------------------------ #
    def backbone_image(self, images: jnp.ndarray, *, train: bool = False):
        """(N, 3, R, R) -> fpn feature list high->low res (scalp applied)."""
        cfg = self.spec.model
        x = self.trunk(images, train=train)
        feats, poss = self.neck(x)
        if cfg.scalp > 0:
            feats, poss = feats[: -cfg.scalp], poss[: -cfg.scalp]
        return feats, poss

    # ------------------------------------------------------------------ #
    def __call__(self, batch: Batch, *, train: bool = False) -> Dict[str, Any]:
        feats, poss = self.backbone_image(batch.images, train=train)
        return self.ground(feats, poss, batch, train=train)

    # ------------------------------------------------------------------ #
    def ground(
        self,
        feats: List[jnp.ndarray],
        poss: List[jnp.ndarray],
        batch: Batch,
        *,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Prompt-conditioned grounding over precomputed image features.

        Split out of ``__call__`` so a stateful processor (reference
        ``Sam3Processor.set_image``, sam3_image_processor.py:42-78) can run
        the backbone ONCE per image and re-ground many prompts against the
        cached features.
        """
        sp = self.spec
        cfg = sp.model
        b = batch.token_ids.shape[0]

        text_mask, text_tokens = self.language_backbone(batch.token_ids, train=train)

        # index per-query image features (img_ids -> batch axis)
        feats = [f[batch.img_ids] for f in feats]
        poss = [p[batch.img_ids] for p in poss]

        lowres = feats[-1]  # (B, D, h, w) stride-14
        h, w = lowres.shape[-2:]
        img_tokens = lowres.reshape(b, cfg.d_model, h * w).transpose(0, 2, 1)
        img_pos = poss[-1].reshape(b, cfg.d_model, h * w).transpose(0, 2, 1)

        # --- geometry prompt ---
        geo = batch.geo or GeoPrompt.empty(b, cfg.max_prompt_boxes)
        geo_tokens, geo_mask = self.geometry_encoder(
            geo, img_tokens, img_pos, (h, w), train=train
        )

        # --- prompt = [text | geometry] (sam3_image.py:169-212) ---
        prompt = jnp.concatenate([text_tokens, geo_tokens], axis=1)
        prompt_mask = jnp.concatenate([text_mask, geo_mask], axis=1)

        # --- fusion encoder ---
        memory = self.encoder(img_tokens, img_pos, prompt, prompt_mask, train=train)

        # --- decoder ---
        # DAC and the matched-seg path follow target presence, not `train`:
        # the val-loss loop needs the full training output (matching, o2m,
        # matched masks) but with dropout off (reference validate loop,
        # train_sam3_lora_native.py:949-1016).
        apply_dac = cfg.dac and batch.targets is not None
        dec = self.decoder(
            memory, img_pos, prompt, prompt_mask, (h, w),
            apply_dac=apply_dac, train=train,
        )
        hs = dec.hs                      # (L, B, nq or 2nq, D)
        refs = dec.reference_boxes       # (L, B, nq or 2nq, 4)
        n_o2o = cfg.num_queries

        # --- scores + boxes for every layer (sam3_image.py:302-386) ---
        logits = self.dot_prod_scoring(hs, prompt, prompt_mask, train=train)
        coords = dec.pred_coords  # box head shared with refinement (decoder)
        out: Dict[str, Any] = {
            "pred_logits": logits[:, :, :n_o2o],      # (L, B, Q, 1)
            "pred_boxes": coords[:, :, :n_o2o],
            "pred_boxes_xyxy": box_cxcywh_to_xyxy(coords[:, :, :n_o2o]),
            "presence_logit_dec": dec.presence_logits,  # (L, B, 1)
            "presence_feats": dec.presence_feats,
            "encoder_hidden_states": memory,
            "prompt": prompt,
            "prompt_mask": prompt_mask,
        }
        if apply_dac:
            out["pred_logits_o2m"] = logits[:, :, n_o2o:]
            out["pred_boxes_o2m"] = coords[:, :, n_o2o:]
            out["pred_boxes_xyxy_o2m"] = box_cxcywh_to_xyxy(coords[:, :, n_o2o:])

        # --- on-device matching (training) ---
        if batch.targets is not None:
            tgt = batch.targets
            L = hs.shape[0]
            tgt_boxes_l = jnp.broadcast_to(tgt.boxes, (L,) + tgt.boxes.shape)
            tgt_valid_l = jnp.broadcast_to(tgt.valid, (L,) + tgt.valid.shape)
            if apply_dac:
                # ONE batched JV call for o2o (all L layers) AND the aux-o2m
                # Hungarian matchings (layers 0..L-2; the last o2m layer uses
                # the greedy DAC matcher). The assignment while-loop has real
                # per-iteration latency on TPU, so all 11 problems ride one
                # lock-step vmap instead of 6 sequential dispatches.
                logits_all = jnp.concatenate(
                    [out["pred_logits"], out["pred_logits_o2m"][: L - 1]], 0
                )
                boxes_all = jnp.concatenate(
                    [out["pred_boxes"], out["pred_boxes_o2m"][: L - 1]], 0
                )
                nprob = 2 * L - 1
                idx_all = hungarian_match(
                    logits_all, boxes_all,
                    jnp.broadcast_to(tgt.boxes, (nprob,) + tgt.boxes.shape),
                    jnp.broadcast_to(tgt.valid, (nprob,) + tgt.valid.shape),
                )
                out["indices"] = idx_all[:L]                         # (L, B, T)
                aux_qi = idx_all[L:]                                 # (L-1, B, T)
                k = cfg.o2m_topk
                aux_qv = (aux_qi >= 0)[..., None] & tgt.valid[None, ..., None]
                aux_qi = jnp.maximum(aux_qi, 0)[..., None]
                aux_qi = jnp.pad(aux_qi, ((0, 0), (0, 0), (0, 0), (0, k - 1)))
                aux_qv = jnp.pad(aux_qv, ((0, 0), (0, 0), (0, 0), (0, k - 1)))
                last_qi, last_qv = one_to_many_match(
                    out["pred_logits_o2m"][L - 1], out["pred_boxes_o2m"][L - 1],
                    tgt.boxes, tgt.valid, topk=k,
                )
                out["o2m_indices"] = jnp.concatenate(
                    [aux_qi, last_qi[None]], 0
                )  # (L, B, T, K)
                out["o2m_valid"] = jnp.concatenate([aux_qv, last_qv[None]], 0)
            else:
                out["indices"] = hungarian_match(
                    out["pred_logits"], out["pred_boxes"], tgt_boxes_l, tgt_valid_l
                )  # (L, B, T)

        # --- segmentation head ---
        last_hs = hs[-1]  # (B, L_q, D)
        if batch.targets is not None:
            # gather only matched queries' embeddings (o2o last layer + o2m)
            q_o2o = jnp.maximum(out["indices"][-1], 0)               # (B, T)
            sel = [last_hs[jnp.arange(b)[:, None], q_o2o]]
            if apply_dac:
                q_o2m = jnp.maximum(out["o2m_indices"][-1], 0) + n_o2o  # (B,T,K)
                t_slots = q_o2m.shape[1]
                sel.append(
                    last_hs[jnp.arange(b)[:, None], q_o2m.reshape(b, -1)]
                )
            queries = jnp.concatenate(sel, axis=1)
            seg = self.segmentation_head(
                feats, memory, queries, prompt, prompt_mask, (h, w), train=train
            )
            masks = seg["pred_masks"]
            t = out["indices"].shape[-1]
            out["pred_masks_matched"] = masks[:, :t]                 # (B, T, Hm, Wm)
            if apply_dac:
                k = out["o2m_indices"].shape[-1]
                out["pred_masks_o2m_matched"] = masks[:, t:].reshape(
                    b, t, k, *masks.shape[-2:]
                )
            out["semantic_seg"] = seg["semantic_seg"]
        else:
            queries = last_hs[:, :n_o2o]
            seg = self.segmentation_head(
                feats, memory, queries, prompt, prompt_mask, (h, w), train=train
            )
            out["pred_masks"] = seg["pred_masks"]                    # (B, Q, Hm, Wm)
            out["semantic_seg"] = seg["semantic_seg"]
        return out
