"""DETR decoder with DAC, presence token, boxRPB bias and box refinement.

Re-design of ``sam3/model/decoder.py:31-611`` (TransformerDecoder /
TransformerDecoderLayer with SAM3's config: 6 layers, 200 learned queries +
learned reference boxes, DAC query doubling in training, one presence token,
text cross-attention, image cross-attention with a log-scale box-relative
position bias, iterative box refinement through inverse_sigmoid deltas).

boxRPB (decoder.py:331-408): the bias is *separable* —
``bias[b, h, q, iy*W+ix] = dy[b, q, iy, h] + dx[b, q, ix, h]`` where dy/dx are
tiny MLP outputs over log-scaled deltas between the reference-box edges and
the feature-grid coordinates. The XLA path materializes the (B, H, Q, HW)
sum (like the reference); the Pallas attention kernel can instead consume
dy/dx directly and form the bias on the fly in VMEM (the flagship fusion
opportunity flagged in SURVEY.md §2.1).

Presence-logit clamp parity note: the reference calls ``logits.clamp(...)``
WITHOUT assigning the result (decoder.py:588-591), i.e. the clamp is a no-op;
we faithfully do not clamp.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.boxes import box_cxcywh_to_xyxy, inverse_sigmoid
from ..ops.posenc import gen_sineembed_for_position
from .layers import Dropout, Embedding, LayerNorm, LoRALinear, MLP, MultiHeadAttention, Spec


class DecoderOutput(NamedTuple):
    hs: jnp.ndarray              # (layers, B, Q, D) — normed per-layer queries
    reference_boxes: jnp.ndarray  # (layers, B, Q, 4) — box input to each layer
    pred_coords: jnp.ndarray     # (layers, B, Q, 4) — refined boxes (cxcywh)
    presence_logits: Optional[jnp.ndarray]  # (layers, B, 1)
    presence_feats: Optional[jnp.ndarray]   # (B, 1, D)


class BoxRPB(nn.Module):
    """Log-scale box relative-position bias (decoder.py:331-408)."""

    spec: Spec
    heads: int

    @nn.compact
    def __call__(
        self, reference_boxes: jnp.ndarray, feat_hw: Tuple[int, int], train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """reference_boxes: (B, Q, 4) cxcywh in [0,1]. Returns (dy, dx):
        dy (B, Q, H, heads), dx (B, Q, W, heads) — the separable bias halves."""
        cfg = self.spec.model
        h, w = feat_hw
        boxes_xyxy = box_cxcywh_to_xyxy(reference_boxes)
        coords_h = jnp.arange(h, dtype=jnp.float32) / h
        coords_w = jnp.arange(w, dtype=jnp.float32) / w
        # deltas to the two y (x) edges: (B, Q, H|W, 2)
        dy = coords_h[None, None, :, None] - boxes_xyxy[:, :, None, 1:4:2]
        dx = coords_w[None, None, :, None] - boxes_xyxy[:, :, None, 0:3:2]
        if cfg.box_rpb in ("log", "both"):
            def logscale(t):
                t = t * 8.0
                return jnp.sign(t) * jnp.log2(jnp.abs(t) + 1.0) / math.log2(8.0)

            if cfg.box_rpb == "log":
                dy, dx = logscale(dy), logscale(dx)
            else:
                dy = jnp.concatenate([dy, logscale(dy)], -1)
                dx = jnp.concatenate([dx, logscale(dx)], -1)
        dx = MLP(cfg.d_model, self.heads, 2, self.spec, name="boxRPB_embed_x")(
            dx.astype(self.spec.dtype), train=train
        )
        dy = MLP(cfg.d_model, self.heads, 2, self.spec, name="boxRPB_embed_y")(
            dy.astype(self.spec.dtype), train=train
        )
        return dy, dx


def rpb_dense_bias(dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Materialize (B, heads, Q, H*W) from the separable halves."""
    b, q, h, nh = dy.shape
    w = dx.shape[2]
    bias = dy[:, :, :, None, :] + dx[:, :, None, :, :]  # (B, Q, H, W, nh)
    bias = bias.reshape(b, q, h * w, nh)
    return jnp.transpose(bias, (0, 3, 1, 2))


class DecoderLayer(nn.Module):
    """One decoder layer (decoder.py:31-187). All-positional call for remat."""

    spec: Spec

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,            # (B, L, D) queries (2Q if dac)
        query_pos: jnp.ndarray,      # (B, L, D)
        memory: jnp.ndarray,         # (B, HW, D)
        memory_pos: jnp.ndarray,     # (B, HW, D)
        memory_text: jnp.ndarray,    # (B, S, D)
        text_mask: Optional[jnp.ndarray],   # (B, S) True=pad
        cross_attn_bias: Optional[jnp.ndarray],  # (B, heads, 1+L, HW)
        presence: Optional[jnp.ndarray],    # (B, 1, D)
        dac: bool = False,
        train: bool = False,
    ):
        sp = self.spec
        cfg = sp.model
        d = cfg.d_model
        heads = cfg.dec_heads
        drop = cfg.dec_dropout
        l = tgt.shape[1]

        # ---- self-attention over the o2o half (+ presence token) ----
        if dac:
            n_o2o = l // 2
            tgt_o2o, tgt_o2m = tgt[:, :n_o2o], tgt[:, n_o2o:]
            pos_o2o = query_pos[:, :n_o2o]
        else:
            tgt_o2o, tgt_o2m = tgt, None
            pos_o2o = query_pos

        if presence is not None:
            tgt_o2o = jnp.concatenate([presence, tgt_o2o], axis=1)
            pos_o2o = jnp.concatenate([jnp.zeros_like(presence), pos_o2o], axis=1)
            query_pos = jnp.concatenate(
                [jnp.zeros_like(presence), query_pos], axis=1
            )

        qk = tgt_o2o + pos_o2o
        sa = MultiHeadAttention(d, heads, sp, dropout=drop, name="self_attn")(
            qk, qk, tgt_o2o, train=train
        )
        tgt_o2o = tgt_o2o + Dropout(drop, name="dropout2")(sa, train=train)
        if dac:
            tgt = jnp.concatenate([tgt_o2o, tgt_o2m], axis=1)  # (B, 1+L, D)
            tgt = LayerNorm(name="norm2")(tgt)  # dac_use_selfatt_ln=True
        else:
            tgt = LayerNorm(name="norm2")(tgt_o2o)

        # ---- text cross-attention (use_text_cross_attention=True) ----
        ca = MultiHeadAttention(d, heads, sp, dropout=drop, name="ca_text")(
            tgt + query_pos, memory_text, memory_text,
            key_padding_mask=text_mask, train=train,
        )
        tgt = LayerNorm(name="catext_norm")(
            tgt + Dropout(drop, name="catext_dropout")(ca, train=train)
        )

        # ---- image cross-attention with boxRPB bias ----
        # cross_attn_bias is either a dense (B, heads, 1+L, HW) tensor or the
        # separable (dy, dx, grid_hw) triple (see ops/rpb_attention.py)
        separable = isinstance(cross_attn_bias, tuple)
        ca = MultiHeadAttention(d, heads, sp, dropout=drop, name="cross_attn")(
            tgt + query_pos, memory + memory_pos, memory,
            attn_bias=None if separable else cross_attn_bias,
            separable_bias=cross_attn_bias if separable else None,
            train=train,
        )
        tgt = LayerNorm(name="norm1")(
            tgt + Dropout(drop, name="dropout1")(ca, train=train)
        )

        # ---- FFN (relu) ----
        y = LoRALinear(cfg.dec_ffn_dim, sp, name="linear1")(tgt, train=train)
        y = Dropout(drop, name="dropout3")(jax.nn.relu(y), train=train)
        y = LoRALinear(d, sp, name="linear2")(y, train=train)
        tgt = LayerNorm(name="norm3")(
            tgt + Dropout(drop, name="dropout4")(y, train=train)
        )

        presence_out = None
        if presence is not None:
            presence_out = tgt[:, :1]
            tgt = tgt[:, 1:]
        return tgt, presence_out


class TransformerDecoder(nn.Module):
    spec: Spec

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,        # (B, HW, D)
        memory_pos: jnp.ndarray,    # (B, HW, D)
        memory_text: jnp.ndarray,   # (B, S, D)
        text_mask: Optional[jnp.ndarray],
        feat_hw: Tuple[int, int],
        *,
        apply_dac: bool = False,
        train: bool = False,
    ) -> DecoderOutput:
        sp = self.spec
        cfg = sp.model
        d = cfg.d_model
        b = memory.shape[0]
        nq = cfg.num_queries

        query_embed = Embedding(nq, d, sp, name="query_embed")()
        tgt = jnp.broadcast_to(query_embed[None], (b, nq, d)).astype(sp.dtype)
        ref_init = Embedding(
            nq, 4, sp, init=nn.initializers.normal(stddev=1.0), name="reference_points"
        )()
        ref = jax.nn.sigmoid(ref_init.astype(jnp.float32))
        ref = jnp.broadcast_to(ref[None], (b, nq, 4))
        if apply_dac:
            tgt = jnp.concatenate([tgt, tgt], axis=1)
            ref = jnp.concatenate([ref, ref], axis=1)

        presence = None
        if cfg.presence_token:
            pt = Embedding(1, d, sp, name="presence_token")()
            presence = jnp.broadcast_to(pt[None], (b, 1, d)).astype(sp.dtype)

        out_norm = LayerNorm(name="norm")
        bbox_embed = MLP(d, 4, 3, sp, zero_init_last=True, name="bbox_embed")
        ref_point_head = MLP(d, d, 2, sp, name="ref_point_head")
        rpb = (
            BoxRPB(sp, heads=cfg.dec_heads, name="rpb")
            if cfg.box_rpb != "none"
            else None
        )
        presence_head = (
            MLP(d, 1, 3, sp, name="presence_token_head") if cfg.presence_token else None
        )
        presence_out_norm = (
            LayerNorm(name="presence_token_out_norm") if cfg.presence_token else None
        )
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(9, 10))
            if (train and cfg.dec_remat)
            else DecoderLayer
        )

        hs_list, ref_list, coord_list, pres_list = [], [], [], []
        pres_feats = None
        # parity detail (decoder.py:484,570-575): the per-layer reference boxes
        # recorded for the loss are GRAD-CARRYING refined boxes from the
        # previous layer; only the box fed into the next layer is detached.
        ref_grad_entry = ref  # layer 0 sees the initial sigmoid references
        for i in range(cfg.dec_layers):
            ref_list_entry = ref_grad_entry
            query_sine = gen_sineembed_for_position(ref, d)  # (B, L, 2D)
            query_pos = ref_point_head(query_sine.astype(sp.dtype), train=train)

            bias = None
            if rpb is not None:
                dy, dx = rpb(ref, feat_hw, train)
                if cfg.dec_separable_bias:
                    # presence row attends with zero bias: prepend a zero
                    # query row to the separable halves
                    if presence is not None:
                        dy = jnp.concatenate(
                            [jnp.zeros_like(dy[:, :1]), dy], axis=1
                        )
                        dx = jnp.concatenate(
                            [jnp.zeros_like(dx[:, :1]), dx], axis=1
                        )
                    bias = (dy, dx, feat_hw)
                else:
                    bias = rpb_dense_bias(dy, dx)  # (B, heads, L, HW)
                    if presence is not None:
                        bias = jnp.concatenate(
                            [jnp.zeros_like(bias[:, :, :1]), bias], axis=2
                        )

            tgt, presence = layer_cls(sp, name=f"layers.{i}")(
                tgt, query_pos, memory, memory_pos, memory_text, text_mask,
                bias, presence, apply_dac, train,
            )

            # iterative box refinement (decoder.py:555-575)
            normed = out_norm(tgt)
            delta = bbox_embed(normed, train=train).astype(jnp.float32)
            # the layer's predicted boxes (sam3_image.py:336-338): same value
            # as the refined reference, but gradient flows through the
            # grad-carrying reference chain
            coords = jax.nn.sigmoid(delta + inverse_sigmoid(ref_list_entry))
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            ref = jax.lax.stop_gradient(new_ref)
            ref_grad_entry = new_ref

            hs_list.append(normed)
            ref_list.append(ref_list_entry)
            coord_list.append(coords)
            if presence is not None:
                logits = presence_head(
                    presence_out_norm(presence), train=train
                ).squeeze(-1)  # (B, 1)
                pres_list.append(logits)
                pres_feats = presence

        return DecoderOutput(
            hs=jnp.stack(hs_list),
            reference_boxes=jnp.stack(ref_list),
            pred_coords=jnp.stack(coord_list),
            presence_logits=jnp.stack(pres_list) if pres_list else None,
            presence_feats=pres_feats,
        )
