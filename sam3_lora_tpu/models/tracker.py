"""SAM3 video-tracker components: memory encoder + memory attention.

Re-design of the reference's SAM2-style tracker compute path
(``sam3/model/memory.py:19-201``, ``sam3/model_builder.py:330-428``,
``sam3/model/decoder.py:614-956`` TransformerDecoderLayerv2 /
TransformerEncoderCrossAttention, ``sam3/sam/transformer.py:266-358``
RoPEAttention):

* ``SimpleMaskDownSampler`` — mask (1 ch, 1152^2 after bilinear interp) ->
  stride-16 grid via 4x (conv k3 s2 p1 + LayerNorm2d + GELU) with channel
  growth 1->4->16->64->256, then 1x1 to embed_dim;
* ``CXBlock``/``SimpleFuser`` — 2 ConvNeXt blocks fusing mask + pixel feats;
* ``SimpleMaskEncoder`` — produces the 64-dim memory features + sine PE;
* ``RoPEAttention`` — single-head attention with 2D axial RoPE on a 72x72
  grid, optional k-repeat (cross-attn over N memory frames) and
  ``num_k_exclude_rope`` (trailing object-pointer tokens skip RoPE);
* ``MemoryAttention`` — 4 pre-norm layers (self RoPE-attn + cross RoPE-attn
  into the 64-dim memory + FFN), ``pos_enc_at_input`` adds 0.1 * vision PE.

Static-shape memory bank: (num_maskmem * Hm * Wm + num_obj_ptr * ptr_tokens)
tokens with a validity mask; invalid slots are masked in cross-attention, so
"fewer than 7 memories" is a mask, not a shape change.

The interactive per-object predictor that drives these (point sampling,
occlusion heuristics, association) lives in the video orchestration tier.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention, merge_heads, split_heads
from ..ops.posenc import sine_pos_grid
from ..ops.rope import apply_rope, compute_axial_freqs
from .layers import Conv2d, Dropout, LayerNorm, LoRALinear, Spec
from .sam_heads import LayerNorm2d


class SimpleMaskDownSampler(nn.Module):
    spec: Spec
    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    total_stride: int = 16
    interpol_size: Optional[Tuple[int, int]] = (1152, 1152)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.interpolate import resize_bilinear

        if self.interpol_size is not None and tuple(x.shape[-2:]) != tuple(
            self.interpol_size
        ):
            x = resize_bilinear(x.astype(jnp.float32), self.interpol_size)
        n_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        ch = 1
        idx = 0
        for _ in range(n_layers):
            out_ch = ch * self.stride ** 2
            x = Conv2d(
                out_ch, (self.kernel_size, self.kernel_size), self.spec,
                stride=(self.stride, self.stride), padding=self.padding,
                name=f"encoder.{idx}",
            )(x)
            x = LayerNorm2d(name=f"encoder.{idx + 1}")(x)
            x = jax.nn.gelu(x, approximate=False)
            ch = out_ch
            idx += 3  # conv, norm, activation slots in the torch Sequential
        return Conv2d(self.embed_dim, (1, 1), self.spec, name=f"encoder.{idx}")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (memory.py:82-135): 7x7 depthwise conv + LN2d +
    pointwise linears with layer scale."""

    spec: Spec
    dim: int = 256
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        x = Conv2d(
            self.dim, (self.kernel_size, self.kernel_size), self.spec,
            padding=self.padding, groups=self.dim, name="dwconv",
        )(x)
        x = LayerNorm2d(name="norm")(x)
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        x = LoRALinear(4 * self.dim, self.spec, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = LoRALinear(self.dim, self.spec, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            lambda k, s, d: jnp.full(s, self.layer_scale_init_value, d),
            (self.dim,),
            jnp.float32,
        )
        x = x * gamma.astype(x.dtype)
        return inp + x.transpose(0, 3, 1, 2)


class SimpleMaskEncoder(nn.Module):
    """memory.py:160-201: downsample mask, fuse with pixel feats, project to
    the 64-dim memory space, emit sine PE."""

    spec: Spec
    out_dim: int = 64
    in_dim: int = 256
    num_fuser_layers: int = 2

    @nn.compact
    def __call__(
        self,
        pix_feat: jnp.ndarray,     # (B, 256, H, W) stride-14 features
        masks: jnp.ndarray,        # (B, 1, Hm, Wm) mask logits
        skip_mask_sigmoid: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        # interpolate to 16 * feature grid so total_stride 16 lands exactly
        h, w = pix_feat.shape[-2:]
        ds = SimpleMaskDownSampler(
            self.spec, embed_dim=self.in_dim,
            interpol_size=(16 * h, 16 * w), name="mask_downsampler",
        )(masks)
        x = Conv2d(self.in_dim, (1, 1), self.spec, name="pix_feat_proj")(pix_feat)
        x = x + ds
        for i in range(self.num_fuser_layers):
            x = CXBlock(self.spec, dim=self.in_dim, name=f"fuser.layers.{i}")(x)
        if self.out_dim != self.in_dim:
            x = Conv2d(self.out_dim, (1, 1), self.spec, name="out_proj")(x)
        pos = sine_pos_grid(x.shape[-2], x.shape[-1], num_pos_feats=self.out_dim)
        pos = jnp.broadcast_to(pos[None], x.shape).astype(x.dtype)
        return {"vision_features": x, "vision_pos_enc": pos}


class RoPEAttention(nn.Module):
    """sam/transformer.py:266-358 with SAM3 tracker settings (heads=1,
    downsample 1, optional kv_in_dim 64, k-repeat, obj-ptr rope exclusion)."""

    spec: Spec
    embedding_dim: int = 256
    num_heads: int = 1
    kv_in_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    feat_sizes: Tuple[int, int] = (72, 72)
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,          # (B, Lq, D)
        k: jnp.ndarray,          # (B, Lk, Dkv)
        v: jnp.ndarray,
        num_k_exclude_rope: int = 0,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True=pad
        train: bool = False,
    ) -> jnp.ndarray:
        sp = self.spec
        d = self.embedding_dim
        q = LoRALinear(d, sp, name="q_proj")(q)
        k = LoRALinear(d, sp, name="k_proj")(k)
        v = LoRALinear(d, sp, name="v_proj")(v)
        qh = split_heads(q, self.num_heads)
        kh = split_heads(k, self.num_heads)
        vh = split_heads(v, self.num_heads)

        head_dim = d // self.num_heads
        ex, ey = self.feat_sizes
        angles = compute_axial_freqs(head_dim, ex, ey, theta=self.rope_theta)
        cos = jnp.asarray(np.cos(angles))
        sin = jnp.asarray(np.sin(angles))
        lq = qh.shape[2]
        assert lq == ex * ey, f"RoPE grid {ex}x{ey} != q len {lq}"
        qh = apply_rope(qh, cos, sin)

        lk = kh.shape[2]
        n_rope = lk - num_k_exclude_rope
        k_rope = kh[:, :, :n_rope]
        if n_rope != lq:
            assert self.rope_k_repeat and n_rope % lq == 0, (
                f"k rope len {n_rope} vs q {lq}"
            )
            reps = n_rope // lq
            cos_k = jnp.tile(cos, (reps, 1))
            sin_k = jnp.tile(sin, (reps, 1))
        else:
            cos_k, sin_k = cos, sin
        k_rope = apply_rope(k_rope, cos_k, sin_k)
        kh = jnp.concatenate([k_rope, kh[:, :, n_rope:]], axis=2)

        out = dot_product_attention(
            qh, kh, vh, key_padding_mask=key_padding_mask
        )
        # (attention-prob dropout is a no-op at eval; training of the tracker
        # is out of reference scope for the LoRA finetune path)
        return LoRALinear(d, sp, name="out_proj")(merge_heads(out))


class MemoryAttentionLayer(nn.Module):
    """TransformerDecoderLayerv2 (decoder.py:886-956), pre-norm, self then
    cross into memory."""

    spec: Spec
    d_model: int = 256
    kv_in_dim: int = 64
    dim_feedforward: int = 2048
    dropout: float = 0.1
    feat_sizes: Tuple[int, int] = (72, 72)

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,          # (B, L, D)
        memory: jnp.ndarray,       # (B, M, kv_in_dim)
        query_pos: jnp.ndarray,    # (B, L, D)
        pos: jnp.ndarray,          # (B, M, kv_in_dim)
        num_obj_ptr_tokens: int = 0,
        memory_mask: Optional[jnp.ndarray] = None,  # (B, M) True=pad
        train: bool = False,
    ) -> jnp.ndarray:
        sp = self.spec
        # self-attention (pos_enc_at_attn=False)
        t2 = LayerNorm(name="norm1")(tgt)
        t2 = RoPEAttention(
            sp, embedding_dim=self.d_model, feat_sizes=self.feat_sizes,
            name="self_attn",
        )(t2, t2, t2, train=train)
        tgt = tgt + Dropout(self.dropout, name="dropout1")(t2, train=train)

        # cross-attention to memory (pos_enc_at_cross_attn_keys=True)
        t2 = LayerNorm(name="norm2")(tgt)
        t2 = RoPEAttention(
            sp, embedding_dim=self.d_model, kv_in_dim=self.kv_in_dim,
            rope_k_repeat=True, feat_sizes=self.feat_sizes,
            name="cross_attn_image",
        )(
            t2, memory + pos, memory,
            num_k_exclude_rope=num_obj_ptr_tokens,
            key_padding_mask=memory_mask, train=train,
        )
        tgt = tgt + Dropout(self.dropout, name="dropout2")(t2, train=train)

        # FFN
        t2 = LayerNorm(name="norm3")(tgt)
        t2 = LoRALinear(self.dim_feedforward, sp, name="linear1")(t2, train=train)
        t2 = Dropout(self.dropout, name="dropout")(jax.nn.relu(t2), train=train)
        t2 = LoRALinear(self.d_model, sp, name="linear2")(t2, train=train)
        return tgt + Dropout(self.dropout, name="dropout3")(t2, train=train)


class MemoryAttention(nn.Module):
    """TransformerEncoderCrossAttention (decoder.py:614-723): 4 layers +
    final LayerNorm, ``pos_enc_at_input`` adds 0.1 * vision PE."""

    spec: Spec
    d_model: int = 256
    num_layers: int = 4
    kv_in_dim: int = 64
    feat_sizes: Tuple[int, int] = (72, 72)

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,        # (B, L, D) current-frame tokens
        memory: jnp.ndarray,     # (B, M, kv) memory tokens (+obj ptrs at end)
        src_pos: jnp.ndarray,    # (B, L, D)
        memory_pos: jnp.ndarray, # (B, M, kv)
        num_obj_ptr_tokens: int = 0,
        memory_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        out = src + 0.1 * src_pos
        for i in range(self.num_layers):
            out = MemoryAttentionLayer(
                self.spec, d_model=self.d_model, kv_in_dim=self.kv_in_dim,
                feat_sizes=self.feat_sizes, name=f"layers.{i}",
            )(
                out, memory, src_pos, memory_pos,
                num_obj_ptr_tokens=num_obj_ptr_tokens,
                memory_mask=memory_mask, train=train,
            )
        return LayerNorm(name="norm")(out)


class TrackerCore(nn.Module):
    """Minimal per-frame tracker step: memory-conditioned features -> SAM
    heads (sam3_tracker_base.py:930-1105 inference slice, batch = objects).

    Memory layout (static): ``mem_feats`` (B, M, 64) with M = num_maskmem *
    Hm * Wm memory-frame tokens followed by obj-ptr token slots; ``mem_mask``
    marks unused slots. The object-pointer tokens are appended by the caller
    (64-dim chunks of the 256-dim pointer, tracker convention).
    """

    spec: Spec
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs: int = 16
    feat_sizes: Tuple[int, int] = (72, 72)

    def setup(self):
        from .layers import MLP
        from .sam_heads import MaskDecoder, PromptEncoder

        h, w = self.feat_sizes
        cfg = self.spec.model
        self.memory_attention = MemoryAttention(
            self.spec, d_model=self.d_model, kv_in_dim=self.mem_dim,
            feat_sizes=self.feat_sizes, name="transformer.encoder",
        )
        self.maskmem_backbone = SimpleMaskEncoder(
            self.spec, out_dim=self.mem_dim, in_dim=self.d_model,
            name="maskmem_backbone",
        )
        self.sam_prompt_encoder = PromptEncoder(
            self.spec, embed_dim=self.d_model, image_embedding_size=self.feat_sizes,
            input_image_size=(cfg.img_size, cfg.img_size),
            name="sam_prompt_encoder",
        )
        self.sam_mask_decoder = MaskDecoder(
            self.spec, transformer_dim=self.d_model, name="sam_mask_decoder",
        )
        # --- tracker-base scalar params (sam3_tracker_base.py:85,140-143,
        # 212-216): temporal memory embeddings, no-memory / no-object
        # embeddings, object-pointer projections, mask-prompt downsampler.
        trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", trunc02, (self.num_maskmem, 1, 1, self.mem_dim),
            jnp.float32,
        )
        self.no_mem_embed = self.param(
            "no_mem_embed", trunc02, (1, 1, self.d_model), jnp.float32
        )
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", trunc02, (1, 1, self.d_model), jnp.float32
        )
        self.no_obj_ptr = self.param(
            "no_obj_ptr", trunc02, (1, self.d_model), jnp.float32
        )
        self.no_obj_embed_spatial = self.param(
            "no_obj_embed_spatial", trunc02, (1, self.mem_dim), jnp.float32
        )
        self.obj_ptr_proj = MLP(
            self.d_model, self.d_model, 3, self.spec, name="obj_ptr_proj"
        )
        self.obj_ptr_tpos_proj = LoRALinear(
            self.mem_dim, self.spec, name="obj_ptr_tpos_proj"
        )
        self.mask_downsample = Conv2d(
            1, (4, 4), self.spec, stride=(4, 4), name="mask_downsample"
        )

    def condition_features(
        self,
        vision_feats: jnp.ndarray,   # (B, D, H, W)
        vision_pos: jnp.ndarray,     # (B, D, H, W)
        mem_feats: jnp.ndarray,      # (B, M, mem_dim)
        mem_pos: jnp.ndarray,        # (B, M, mem_dim)
        mem_mask: Optional[jnp.ndarray] = None,
        num_obj_ptr_tokens: int = 0,
        train: bool = False,
    ) -> jnp.ndarray:
        b, d, h, w = vision_feats.shape
        src = vision_feats.reshape(b, d, h * w).transpose(0, 2, 1)
        pos = vision_pos.reshape(b, d, h * w).transpose(0, 2, 1)
        out = self.memory_attention(
            src, mem_feats, pos, mem_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens,
            memory_mask=mem_mask, train=train,
        )
        return out.transpose(0, 2, 1).reshape(b, d, h, w)

    def predict_masks(
        self,
        conditioned_feats: jnp.ndarray,           # (B, D, H, W)
        high_res_features: List[jnp.ndarray],     # [s0, s1] raw backbone maps
        point_coords: Optional[jnp.ndarray] = None,
        point_labels: Optional[jnp.ndarray] = None,
        multimask_output: bool = False,
    ):
        sparse, dense = self.sam_prompt_encoder(
            points=(
                (point_coords, point_labels) if point_coords is not None else None
            ),
            batch=conditioned_feats.shape[0],
        )
        image_pe = self.sam_prompt_encoder.get_dense_pe()
        return self.sam_mask_decoder(
            conditioned_feats, image_pe, sparse, dense,
            multimask_output=multimask_output,
            high_res_features=high_res_features,
            project_high_res=True,
        )

    def encode_memory(
        self, pix_feat, mask_logits, skip_sigmoid=False,
        object_score_logits=None,
    ):
        """Encode a frame + predicted mask into memory features
        (_encode_new_memory, sam3_tracker_base.py:795-850). When
        ``object_score_logits`` is given, occluded frames (logit <= 0) get
        the no-object spatial embedding added."""
        out = self.maskmem_backbone(pix_feat, mask_logits, skip_sigmoid)
        if object_score_logits is not None:
            is_obj = (object_score_logits > 0).astype(jnp.float32)  # (B, 1)
            out["vision_features"] = out["vision_features"] + (
                (1.0 - is_obj)[..., None, None]
                * self.no_obj_embed_spatial.astype(jnp.float32)[..., None, None]
            ).astype(out["vision_features"].dtype)
        return out

    def project_obj_ptr(self, sam_output_token, is_obj_appearing):
        """SAM output token -> object pointer with occlusion handling
        (sam3_tracker_base.py:373-377): lam*MLP(tok) + (1-lam)*no_obj_ptr."""
        lam = is_obj_appearing.astype(jnp.float32)[..., None]  # (B, 1)
        ptr = self.obj_ptr_proj(sam_output_token)
        return lam * ptr + (1.0 - lam) * self.no_obj_ptr

    def obj_ptr_tpos(self, rel_pos, max_abs_pos):
        """Temporal PE for object pointers (_get_tpos_enc,
        sam3_tracker_base.py:162-175): sine(rel/max-1) -> Linear to mem_dim."""
        from ..ops.posenc import get_1d_sine_pe

        t_diff_max = max(max_abs_pos - 1, 1)
        pe = get_1d_sine_pe(rel_pos / t_diff_max, dim=self.d_model)
        return self.obj_ptr_tpos_proj(pe)

    def downsample_mask_input(self, masks):
        """4x4-stride conv for mask-as-prompt inputs (_use_mask_as_output,
        sam3_tracker_base.py:85,413)."""
        return self.mask_downsample(masks)

    def no_memory_features(self, vision_feats):
        """Init-cond-frame path: skip the transformer, directly add the
        no-memory embedding (sam3_tracker_base.py:770-772)."""
        b, d, h, w = vision_feats.shape
        x = vision_feats.reshape(b, d, h * w).transpose(0, 2, 1)
        x = x + self.no_mem_embed.astype(x.dtype)
        return x.transpose(0, 2, 1).reshape(b, d, h, w)

    def assemble_memory(
        self,
        maskmem_feats: jnp.ndarray,   # (B, N, mem_dim, Hm, Wm) slot bank
        maskmem_pos: jnp.ndarray,     # (B, N, mem_dim, Hm, Wm) spatial PE
        maskmem_tpos: jnp.ndarray,    # (B, N) int32: t_pos (0 = cond frame)
        maskmem_valid: jnp.ndarray,   # (B, N) bool
        obj_ptrs: jnp.ndarray,        # (B, P, d_model)
        obj_ptr_rel: jnp.ndarray,     # (B, P) float: frame distance
        obj_ptr_valid: jnp.ndarray,   # (B, P) bool
        num_frames: Optional[int] = None,
    ):
        """Static-shape analogue of the memory-bank concat in
        ``_prepare_memory_conditioned_features`` (sam3_tracker_base.py:
        586-766): N fixed memory slots + P fixed pointer slots; missing
        entries are mask slots, not shape changes.

        Returns (mem, mem_pos, mem_mask, num_obj_ptr_tokens) ready for
        :meth:`condition_features` — mem (B, N*Hm*Wm + P*r, mem_dim) with
        r = d_model // mem_dim pointer splitting, mem_mask True = pad.
        """
        b, n, c, hm, wm = maskmem_feats.shape
        l = hm * wm
        # spatial memory tokens + temporal embedding (tpos t -> row
        # num_maskmem - t - 1 of maskmem_tpos_enc, :678-681)
        tpos_emb = self.maskmem_tpos_enc[
            jnp.clip(self.num_maskmem - 1 - maskmem_tpos, 0, self.num_maskmem - 1)
        ]  # (B, N, 1, 1, mem_dim)
        feats = maskmem_feats.reshape(b, n, c, l).transpose(0, 1, 3, 2)  # B,N,L,C
        pos = maskmem_pos.reshape(b, n, c, l).transpose(0, 1, 3, 2)
        pos = pos + tpos_emb.reshape(b, n, 1, c)
        feats = feats.reshape(b, n * l, c)
        pos = pos.reshape(b, n * l, c)
        mem_mask = jnp.repeat(~maskmem_valid, l, axis=1)  # (B, N*L) True=pad

        # object-pointer tokens: tpos sine embedding, split d_model-dim
        # pointers into r tokens of mem_dim (:707-765)
        p = obj_ptrs.shape[1]
        r = self.d_model // self.mem_dim
        max_abs = min(num_frames, self.max_obj_ptrs) if num_frames else self.max_obj_ptrs
        ptr_pos = self.obj_ptr_tpos(obj_ptr_rel, max_abs)       # (B, P, mem_dim)
        ptr_tok = obj_ptrs.reshape(b, p, r, self.mem_dim).reshape(b, p * r, self.mem_dim)
        ptr_pos = jnp.repeat(ptr_pos, r, axis=1)                 # (B, P*r, mem_dim)
        ptr_mask = jnp.repeat(~obj_ptr_valid, r, axis=1)

        mem = jnp.concatenate([feats, ptr_tok.astype(feats.dtype)], axis=1)
        mem_pos = jnp.concatenate([pos, ptr_pos.astype(pos.dtype)], axis=1)
        mask = jnp.concatenate([mem_mask, ptr_mask], axis=1)
        return mem, mem_pos, mask, p * r

    def __call__(
        self,
        vision_feats,
        vision_pos,
        mem_feats,
        mem_pos,
        high_res_features,
        mem_mask=None,
        num_obj_ptr_tokens: int = 0,
        multimask_output: bool = False,
    ):
        cond = self.condition_features(
            vision_feats, vision_pos, mem_feats, mem_pos,
            mem_mask=mem_mask, num_obj_ptr_tokens=num_obj_ptr_tokens,
        )
        masks, iou, tokens, obj_logits = self.predict_masks(
            cond, high_res_features, multimask_output=multimask_output
        )
        new_mem = self.encode_memory(cond, masks[:, :1])
        return {
            "conditioned_features": cond,
            "masks": masks,
            "iou": iou,
            "sam_tokens": tokens,
            "object_score_logits": obj_logits,
            "new_memory": new_mem,
        }
