"""SAM interactive heads: PromptEncoder + TwoWayTransformer + MaskDecoder.

Re-design of the reference's SAM1/2-task tier (``sam3/sam/transformer.py:16-263``,
``sam3/sam/prompt_encoder.py:12-243``, ``sam3/sam/mask_decoder.py:12-292``)
with the tracker's hyperparameters (``sam3_tracker_base.py:177-214``: d=256,
two-way depth 2, mlp 2048, heads 8, 3+1 mask tokens, high-res features,
sigmoid IoU head, object-score token + MLP head, dynamic multimask via
stability). Module/param names mirror the torch state dict (Sequential
indices included) so the tracker-checkpoint converter is a pure name map.

Static-shape notes: point prompts arrive padded to a fixed P with label -1
for empty slots (the reference's "not a point" label); masks are decoded for
all 4 tokens and the single-vs-multimask selection is a gather, so one
compiled program serves both modes.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention, split_heads, merge_heads
from .layers import Conv2d, Embedding, LayerNorm, LoRALinear, MLP, Spec


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over (B, C, H, W) (reference model_misc.py:109-121)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[1]
        weight = self.param("weight", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(1, keepdims=True)
        var = ((xf - mean) ** 2).mean(1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * weight[:, None, None] + bias[:, None, None]).astype(x.dtype)


class ConvTranspose2d(nn.Module):
    """torch ConvTranspose2d(k=2, s=2) with torch-layout weight (in,out,2,2)
    via einsum + pixel shuffle (see neck.ConvTranspose2x2)."""

    features: int
    spec: Spec

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1]
        bound = 1.0 / math.sqrt(self.features * 4)

        def winit(key, shape, dt):
            return jax.random.uniform(key, shape, dt, -bound, bound)

        weight = self.param(
            "weight", winit, (in_ch, self.features, 2, 2), self.spec.param_dtype
        )
        bias = self.param("bias", winit, (self.features,), self.spec.param_dtype)
        dtype = self.spec.dtype
        b, c, h, w = x.shape
        y = jnp.einsum(
            "bchw,cokl->bohkwl", x.astype(dtype), weight.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(b, self.features, 2 * h, 2 * w)
        return y + bias.astype(dtype)[None, :, None, None]


class SamAttention(nn.Module):
    """sam/transformer.py:185-263 — separate q/k/v/out projections with an
    internal downsampled dim."""

    embedding_dim: int
    num_heads: int
    spec: Spec
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d_int = self.embedding_dim // self.downsample_rate
        q = LoRALinear(d_int, self.spec, name="q_proj")(q)
        k = LoRALinear(d_int, self.spec, name="k_proj")(k)
        v = LoRALinear(d_int, self.spec, name="v_proj")(v)
        out = dot_product_attention(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
        )
        return LoRALinear(self.embedding_dim, self.spec, name="out_proj")(
            merge_heads(out)
        )


class MLPBlock(nn.Module):
    """sam MLPBlock: lin1 -> relu -> lin2."""

    mlp_dim: int
    out_dim: int
    spec: Spec

    @nn.compact
    def __call__(self, x):
        x = LoRALinear(self.mlp_dim, self.spec, name="lin1")(x)
        x = jax.nn.relu(x)
        return LoRALinear(self.out_dim, self.spec, name="lin2")(x)


class TwoWayAttentionBlock(nn.Module):
    spec: Spec
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        sp = self.spec
        d, h = self.embedding_dim, self.num_heads
        if self.skip_first_layer_pe:
            queries = SamAttention(d, h, sp, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + SamAttention(d, h, sp, name="self_attn")(q, q, queries)
        queries = LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SamAttention(
            d, h, sp, downsample_rate=self.attention_downsample_rate,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = LayerNorm(name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, d, sp, name="mlp")(queries)
        queries = LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SamAttention(
            d, h, sp, downsample_rate=self.attention_downsample_rate,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    spec: Spec
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, C, H, W); point_embedding (B, N, C).
        Returns (queries (B, N, C), keys (B, HW, C))."""
        b, c, h, w = image_embedding.shape
        keys = image_embedding.reshape(b, c, h * w).transpose(0, 2, 1)
        key_pe = image_pe.reshape(b, c, h * w).transpose(0, 2, 1)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.spec,
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers.{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + SamAttention(
            self.embedding_dim, self.num_heads, self.spec,
            downsample_rate=self.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = LayerNorm(name="norm_final_attn")(queries)
        return queries, keys


def random_position_embedding(coords, gaussian_matrix):
    """PositionEmbeddingRandom._pe_encoding (prompt_encoder.py:214-226):
    coords in [0,1] -> (..., 2*npf) fourier features."""
    c = 2.0 * coords - 1.0
    c = c @ gaussian_matrix.astype(c.dtype)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    """sam/prompt_encoder.py:12-203. Points are padded with label -1 slots
    (static shapes); labels: -1 pad, 0 neg, 1 pos, 2/3 box corners."""

    spec: Spec
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (72, 72)
    input_image_size: Tuple[int, int] = (1008, 1008)
    mask_in_chans: int = 16

    def setup(self):
        sp = self.spec
        d = self.embed_dim
        self.pe_gaussian = self.param(
            "pe_layer.positional_encoding_gaussian_matrix",
            nn.initializers.normal(stddev=1.0),
            (2, d // 2),
            jnp.float32,
        )
        self.point_embeddings = [
            Embedding(1, d, sp, name=f"point_embeddings.{i}") for i in range(4)
        ]
        self.not_a_point_embed = Embedding(1, d, sp, name="not_a_point_embed")
        self.no_mask_embed = Embedding(1, d, sp, name="no_mask_embed")
        ch = self.mask_in_chans
        self.mask_downscaling = [
            Conv2d(ch // 4, (2, 2), sp, stride=(2, 2), name="mask_downscaling.0"),
            LayerNorm2d(name="mask_downscaling.1"),
            Conv2d(ch, (2, 2), sp, stride=(2, 2), name="mask_downscaling.3"),
            LayerNorm2d(name="mask_downscaling.4"),
            Conv2d(d, (1, 1), sp, name="mask_downscaling.6"),
        ]

    def get_dense_pe(self):
        h, w = self.image_embedding_size
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.broadcast_to(gx[None, :], (h, w)),
             jnp.broadcast_to(gy[:, None], (h, w))], -1
        )
        pe = random_position_embedding(grid, self.pe_gaussian)  # (H, W, D)
        return pe.transpose(2, 0, 1)[None]  # (1, D, H, W)

    def embed_points(self, coords, labels):
        """coords (B, P, 2) absolute pixels; labels (B, P) int32."""
        ih, iw = self.input_image_size
        pts = (coords + 0.5) / jnp.array([iw, ih], jnp.float32)
        pe = random_position_embedding(pts, self.pe_gaussian)
        emb = jnp.where((labels == -1)[..., None], 0.0, pe)
        emb = emb + jnp.where(
            (labels == -1)[..., None], self.not_a_point_embed(None)[0], 0.0
        )
        for lbl in range(4):
            emb = emb + jnp.where(
                (labels == lbl)[..., None], self.point_embeddings[lbl](None)[0], 0.0
            )
        return emb

    def embed_boxes(self, boxes):
        """boxes (B, Nb, 4) absolute xyxy -> (B, 2*Nb, D) corner tokens."""
        b, nb, _ = boxes.shape
        ih, iw = self.input_image_size
        corners = (boxes.reshape(b, nb, 2, 2) + 0.5) / jnp.array(
            [iw, ih], jnp.float32
        )
        pe = random_position_embedding(corners, self.pe_gaussian)
        pe = pe.at[:, :, 0, :].add(self.point_embeddings[2](None)[0])
        pe = pe.at[:, :, 1, :].add(self.point_embeddings[3](None)[0])
        return pe.reshape(b, nb * 2, -1)

    def embed_masks(self, masks):
        x = masks
        x = self.mask_downscaling[0](x)
        x = jax.nn.gelu(self.mask_downscaling[1](x), approximate=False)
        x = self.mask_downscaling[2](x)
        x = jax.nn.gelu(self.mask_downscaling[3](x), approximate=False)
        return self.mask_downscaling[4](x)

    def __call__(
        self,
        points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        boxes: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
        batch: int = 1,
    ):
        sparse = []
        bs = batch
        if points is not None:
            coords, labels = points
            bs = coords.shape[0]
            if boxes is None:
                # reference pads one "not a point" slot when no boxes
                coords = jnp.pad(coords, ((0, 0), (0, 1), (0, 0)))
                labels = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=-1)
            sparse.append(self.embed_points(coords, labels))
        if boxes is not None:
            bs = boxes.shape[0]
            sparse.append(self.embed_boxes(boxes))
        sparse_emb = (
            jnp.concatenate(sparse, axis=1)
            if sparse
            else jnp.zeros((bs, 0, self.embed_dim))
        )
        # touch no_mask_embed unconditionally so the param always materializes
        # (strict checkpoint coverage), select afterwards
        h, w = self.image_embedding_size
        no_mask = jnp.broadcast_to(
            self.no_mask_embed(None)[0][None, :, None, None],
            (bs, self.embed_dim, h, w),
        )
        dense = self.embed_masks(masks) if masks is not None else no_mask
        return sparse_emb, dense


class MaskDecoder(nn.Module):
    """sam/mask_decoder.py:12-292 with the tracker flags."""

    spec: Spec
    transformer_dim: int = 256
    twoway_depth: int = 2
    twoway_heads: int = 8
    twoway_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    pred_obj_scores: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,      # (B, C, H, W)
        image_pe: jnp.ndarray,              # (1, C, H, W)
        sparse_prompt_embeddings: jnp.ndarray,  # (B, N, C)
        dense_prompt_embeddings: jnp.ndarray,   # (B, C, H, W)
        multimask_output: bool,
        high_res_features: Optional[List[jnp.ndarray]] = None,
        project_high_res: bool = False,
        train: bool = False,
    ):
        """``high_res_features``: [s0 (B,*,4H,4W), s1 (B,*,2H,2W)]. When
        ``project_high_res`` they are RAW backbone maps (C = transformer_dim)
        and run through conv_s0/conv_s1 (the tracker applies these decoder-
        owned convs before calling, sam3_tracker_base.py); otherwise they are
        already projected to d/8 and d/4 channels."""
        sp = self.spec
        d = self.transformer_dim
        b = sparse_prompt_embeddings.shape[0]
        nm = self.num_mask_tokens

        iou_token = Embedding(1, d, sp, name="iou_token")
        mask_tokens = Embedding(nm, d, sp, name="mask_tokens")
        toks = [iou_token(None), mask_tokens(None)]
        s = 0
        if self.pred_obj_scores:
            obj_token = Embedding(1, d, sp, name="obj_score_token")
            toks = [obj_token(None)] + toks
            s = 1
        output_tokens = jnp.concatenate(toks, axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (b,) + output_tokens.shape),
             sparse_prompt_embeddings], axis=1,
        )

        src = image_embeddings + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe, src.shape)
        h, w = src.shape[-2:]

        hs, src_out = TwoWayTransformer(
            sp,
            depth=self.twoway_depth,
            embedding_dim=d,
            num_heads=self.twoway_heads,
            mlp_dim=self.twoway_mlp_dim,
            name="transformer",
        )(src, pos_src, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1 : s + 1 + nm]

        src_grid = src_out.transpose(0, 2, 1).reshape(b, d, h, w)
        dc1 = ConvTranspose2d(d // 4, sp, name="output_upscaling.0")
        ln1 = LayerNorm2d(name="output_upscaling.1")
        dc2 = ConvTranspose2d(d // 8, sp, name="output_upscaling.3")
        if self.use_high_res_features:
            feat_s0, feat_s1 = high_res_features
            conv_s0 = Conv2d(d // 8, (1, 1), sp, name="conv_s0")
            conv_s1 = Conv2d(d // 4, (1, 1), sp, name="conv_s1")
            if project_high_res:
                feat_s0 = conv_s0(feat_s0)
                feat_s1 = conv_s1(feat_s1)
            else:
                # materialize the decoder-owned projection params anyway so
                # checkpoint coverage is complete
                conv_s0(jnp.zeros((1, d, 1, 1), feat_s0.dtype))
                conv_s1(jnp.zeros((1, d, 1, 1), feat_s1.dtype))
            up = jax.nn.gelu(ln1(dc1(src_grid) + feat_s1), approximate=False)
            up = jax.nn.gelu(dc2(up) + feat_s0, approximate=False)
        else:
            up = jax.nn.gelu(ln1(dc1(src_grid)), approximate=False)
            up = jax.nn.gelu(dc2(up), approximate=False)

        hyper = jnp.stack(
            [
                MLP(d, d // 8, 3, sp, name=f"output_hypernetworks_mlps.{i}")(
                    mask_tokens_out[:, i], train=train
                )
                for i in range(nm)
            ],
            axis=1,
        )  # (B, nm, d/8)
        uh, uw = up.shape[-2:]
        masks = jnp.einsum(
            "bnc,bchw->bnhw", hyper.astype(sp.dtype), up.astype(sp.dtype),
            preferred_element_type=jnp.float32,
        )

        iou_pred = MLP(
            self.iou_head_hidden_dim, nm, self.iou_head_depth, sp,
            name="iou_prediction_head",
        )(iou_token_out, train=train)
        if self.iou_prediction_use_sigmoid:
            iou_pred = jax.nn.sigmoid(iou_pred)

        if self.pred_obj_scores:
            object_score_logits = MLP(d, 1, 3, sp, name="pred_obj_score_head")(
                hs[:, 0], train=train
            )
        else:
            object_score_logits = 10.0 * jnp.ones((b, 1), jnp.float32)

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability and not train:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks = masks[:, :1]
            out_iou = iou_pred[:, :1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, :1]
        return out_masks, out_iou, sam_tokens_out, object_score_logits

    def _dynamic_multimask(self, all_masks, all_iou):
        """mask_decoder.py:252-292: fall back to the best multimask output
        when the single-mask token is unstable."""
        multi = all_masks[:, 1:]
        multi_iou = all_iou[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(all_masks.shape[0])
        best_masks = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]

        single = all_masks[:, :1]
        flat = single.reshape(single.shape[0], -1)
        delta = self.dynamic_multimask_stability_delta
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / area_u, 1.0)
        is_stable = (stability >= self.dynamic_multimask_stability_thresh)[:, None]
        out_masks = jnp.where(is_stable[..., None, None], single, best_masks)
        out_iou = jnp.where(is_stable, all_iou[:, :1], best_iou)
        return out_masks, out_iou
