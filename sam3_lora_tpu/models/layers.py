"""Core layers: LoRA-capable Linear, torch-compatible MultiHeadAttention, MLPs.

Module naming convention: every flax submodule is named with its torch-style
attribute name (list entries as ``name.i``), so a parameter's flax path joined
with '.' *is* the reference checkpoint key prefix. This makes

* LoRA targeting exact (``LoRAConfig.should_apply`` sees reference-identical
  names — see lora_layers.py:174-198 semantics), and
* checkpoint conversion a pure name/transpose mapping
  (``scripts/convert_checkpoint.py``).

LoRA design (TPU-native): instead of wrapping modules post-hoc (the reference
mutates ``nn.Module``s in place), every candidate Linear *is* a ``LoRALinear``
that materializes ``lora_a``/``lora_b`` parameters at init iff the build-time
``Spec.lora`` config targets its path. The forward is the fused
``y = x @ W + ((drop(x) @ A) @ B) * (alpha/r)`` — two skinny matmuls that XLA
fuses with the base GEMM's epilogue. Trainability is decided by parameter-path
filtering (``sam3_lora_tpu/models/lora.py``), not requires_grad.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import LoRAConfig, ModelConfig
from ..ops.attention import dot_product_attention, make_attention_bias, merge_heads, split_heads

# Checkpoint the fusion encoder's 5184-token flash self-attention: backward
# saves only bf16 q/k/v and re-runs the flash forward, instead of the library
# kernel's ~190 MB/layer 128-lane-tiled f32 stats + padded copies. Pairs with
# BENCH_ENC_REMAT=ffn (FFN-only layer remat) to fit where full-save OOM'd.
ENC_FLASH_REMAT = os.environ.get("SAM3_ENC_FLASH_REMAT", "0") == "1"


@dataclasses.dataclass(frozen=True)
class Spec:
    """Build-time spec threaded through every module."""

    model: ModelConfig
    lora: Optional[LoRAConfig] = None

    @property
    def dtype(self):
        return jnp.dtype(self.model.dtype)

    @property
    def param_dtype(self):
        return jnp.dtype(self.model.param_dtype)


def torch_path(flax_path: Tuple[str, ...]) -> str:
    return ".".join(flax_path)


def lecun_trunc_normal(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std / 0.87962566103423978)


def torch_linear_kernel_init(key, shape, dtype):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) on (out, in) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape here is (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_uniform_a5(key, shape, dtype):
    """kaiming_uniform(a=sqrt(5)) for LoRA A of shape (in, r): bound =
    sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in) (lora_layers.py:46)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LoRALinear(nn.Module):
    """Linear with optional fused LoRA branch, decided by torch-style path."""

    features: int
    spec: Spec
    use_bias: bool = True
    kernel_init: Callable = torch_linear_kernel_init
    bias_init: Callable = nn.initializers.zeros_init()
    lora_eligible: bool = True  # set False to exempt (e.g. packed qkv of MHA)
    # Static output-channel permutation folded into the weight columns (and
    # bias / lora_b) at apply time: y[..., j] = (x @ W + b)[..., perm[j]].
    # Weight-sized gather, ~free; used to put ViT q/k channels into RoPE
    # rotate-half layout (ops/rope.py::rope_half_perm) without touching the
    # reference checkpoint layout. Params are stored UNpermuted.
    out_perm: Optional[Tuple[int, ...]] = None

    def lora_rank(self) -> int:
        lcfg = self.spec.lora
        if not self.lora_eligible or lcfg is None or lcfg.rank <= 0:
            return 0
        name = torch_path(self.path)
        return lcfg.rank if lcfg.should_apply(name) else 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), self.spec.param_dtype
        )
        dtype = self.spec.dtype
        mcfg = self.spec.model
        perm = (
            jnp.asarray(np.asarray(self.out_perm, np.int32))
            if self.out_perm is not None
            else None
        )
        if perm is not None:
            kernel = jnp.take(kernel, perm, axis=1)
        if (
            mcfg.base_quant != "none"
            and min(in_features, self.features) >= mcfg.base_quant_min_dim
        ):
            # int8 MXU tier for the frozen base GEMM (ops/quant.py). Exact
            # w.r.t. the LoRA adapters: y = q(W)x + BAx, and the base is
            # frozen so the quantization is a fixed (re)parameterization.
            # The scale param is filled by ops.quant.prequantize_base (the
            # kernel leaf becomes int8); un-transformed trees take the
            # dynamic-quantization path with identical numerics.
            from ..ops.quant import (
                int8_lora_matmul_prequant,
                int8_matmul,
                int8_matmul_prequant,
            )

            scale = self.param(
                "kernel_scale",
                nn.initializers.zeros_init(),
                (1, self.features),
                jnp.float32,
            )
            if perm is not None:
                scale = jnp.take(scale, perm, axis=1)
            rank_f = self.lora_rank()
            lcfg_f = self.spec.lora
            from ..ops.gemm_int8 import GEMM_LORA_FUSED
            from ..ops.quant import _kernel_ok

            if (
                GEMM_LORA_FUSED
                and kernel.dtype == jnp.int8
                and rank_f > 0
                and mcfg.base_quant == "int8"
                and (not train or lcfg_f.dropout == 0.0)
                and _kernel_ok(x, kernel)
            ):
                # FUSED base+adapter path (ops/quant.py
                # int8_lora_matmul_prequant / gemm_int8.int8_lora_gemm_wres):
                # one launch, adapter panels pinned in VMEM, delta add fused
                # into the output write. Inapplicable with LoRA dropout in
                # train (the branch sees a masked input) — falls through to
                # the unfused chain below. Bias is added after the fused sum
                # (the unfused path adds it before the delta; both are
                # bf16-rounding-equivalent).
                lora_a = self.param(
                    "lora_a", kaiming_uniform_a5, (in_features, rank_f),
                    jnp.float32,
                )
                lora_b = self.param(
                    "lora_b", nn.initializers.zeros_init(),
                    (rank_f, self.features), jnp.float32,
                )
                lb = (
                    jnp.take(lora_b, perm, axis=1)
                    if perm is not None else lora_b
                )
                y = int8_lora_matmul_prequant(
                    x.astype(dtype), kernel, scale, lora_a, lb,
                    float(lcfg_f.alpha / rank_f),
                )
                if self.use_bias:
                    bias = self.param(
                        "bias", self.bias_init, (self.features,),
                        self.spec.param_dtype,
                    )
                    if perm is not None:
                        bias = jnp.take(bias, perm, axis=0)
                    y = y + bias.astype(dtype)
                return y
            if kernel.dtype == jnp.int8:
                y = int8_matmul_prequant(
                    x.astype(dtype), kernel, scale,
                    mcfg.base_quant == "int8_bwd",
                )
            else:
                y = int8_matmul(
                    x.astype(dtype), kernel, mcfg.base_quant == "int8_bwd"
                )
        else:
            y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), self.spec.param_dtype)
            if perm is not None:
                bias = jnp.take(bias, perm, axis=0)
            y = y + bias.astype(dtype)

        rank = self.lora_rank()
        if rank > 0:
            lcfg = self.spec.lora
            lora_a = self.param(
                "lora_a", kaiming_uniform_a5, (in_features, rank), jnp.float32
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros_init(), (rank, self.features), jnp.float32
            )
            if perm is not None:
                lora_b = jnp.take(lora_b, perm, axis=1)
            xin = x
            if lcfg.dropout > 0.0 and train:
                keep = 1.0 - lcfg.dropout
                mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
                xin = jnp.where(mask, x / keep, 0.0)
            # adapters are STORED fp32 but the skinny matmuls run in the
            # compute dtype with fp32 accumulation (an fp32 activation copy
            # here would dominate train-step memory; the reference's AMP
            # autocasts its LoRA matmuls to bf16 the same way)
            delta = jnp.dot(
                jnp.dot(
                    xin.astype(dtype), lora_a.astype(dtype),
                    preferred_element_type=jnp.float32,
                ).astype(dtype),
                lora_b.astype(dtype),
                preferred_element_type=jnp.float32,
            )
            y = y + (delta * (lcfg.alpha / rank)).astype(y.dtype)
        return y


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate <= 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate <= 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerScale(nn.Module):
    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            lambda k, s, d: jnp.full(s, self.init_values, d),
            (self.dim,),
            jnp.float32,
        )
        return x * gamma.astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with torch naming (weight/bias) and fp32 computation."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones_init(), (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * weight + bias).astype(x.dtype)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm over channel-first (..., C, H, W)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-3]
        weight = self.param("weight", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        g = self.num_groups
        shape = x.shape
        xf = x.astype(jnp.float32).reshape(*shape[:-3], g, c // g, shape[-2], shape[-1])
        mean = xf.mean(axis=(-3, -2, -1), keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=(-3, -2, -1), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(shape)
        return (y * weight[:, None, None] + bias[:, None, None]).astype(x.dtype)


class Conv2d(nn.Module):
    """torch-convention Conv2d over (B, C, H, W) with weight named like torch.

    Kernel is stored flax-style (kh, kw, in, out); the converter transposes
    torch's (out, in, kh, kw).
    """

    features: int
    kernel_size: Tuple[int, int]
    spec: Spec
    stride: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    use_bias: bool = True
    transpose: bool = False  # ConvTranspose2d
    groups: int = 1          # depthwise when groups == in_ch

    @nn.compact
    def __call__(self, x):
        dtype = self.spec.dtype
        in_ch = x.shape[1]
        kh, kw = self.kernel_size
        fan_in = (
            (in_ch // self.groups) * kh * kw
            if not self.transpose
            else self.features * kh * kw
        )
        bound = 1.0 / math.sqrt(fan_in)

        def kinit(key, shape, dt):
            return jax.random.uniform(key, shape, dt, -bound, bound)

        kernel = self.param(
            "kernel", kinit,
            (kh, kw, in_ch // self.groups, self.features),
            self.spec.param_dtype,
        )
        x_nhwc = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)
        if self.transpose:
            y = jax.lax.conv_transpose(
                x_nhwc,
                kernel.astype(dtype),
                strides=self.stride,
                padding=self.padding if self.padding != "VALID" else "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            pad = self.padding
            if isinstance(pad, int):
                pad = [(pad, pad), (pad, pad)]
            y = jax.lax.conv_general_dilated(
                x_nhwc,
                kernel.astype(dtype),
                window_strides=self.stride,
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            bias = self.param("bias", kinit, (self.features,), self.spec.param_dtype)
            y = y + bias.astype(dtype)
        return jnp.transpose(y, (0, 3, 1, 2))


class MaxPool2x2(nn.Module):
    @nn.compact
    def __call__(self, x):
        # (B, C, H, W) -> stride-2 max pool
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 1, 2, 2),
            window_strides=(1, 1, 2, 2),
            padding="VALID",
        ).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible MHA (batch-first interface).

    Packed in_proj (q|k|v) like torch; ``out_proj`` is a LoRALinear so the
    reference's explicit out_proj skip applies identically. ``attn_bias`` is an
    additive (B, H, Lq, Lk) mask (the reference's float attn_mask).
    """

    embed_dim: int
    num_heads: int
    spec: Spec
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Lq, D)
        key: jnp.ndarray,
        value: jnp.ndarray,
        *,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True=pad
        attn_bias: Optional[jnp.ndarray] = None,  # additive (B|1, H|1, Lq, Lk)
        separable_bias=None,  # (dy (B,Lq,GH,H), dx (B,Lq,GW,H), (GH, GW))
        train: bool = False,
    ) -> jnp.ndarray:
        d = self.embed_dim
        dtype = self.spec.dtype
        in_proj_weight = self.param(
            "in_proj_weight",
            lambda k, s, dt: jax.random.uniform(
                k, s, dt, -math.sqrt(1.0 / d), math.sqrt(1.0 / d)
            ),
            (d, 3 * d),
            self.spec.param_dtype,
        )
        in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros_init(), (3 * d,), self.spec.param_dtype
        )
        w = in_proj_weight.astype(dtype)
        b = in_proj_bias.astype(dtype)
        q = query.astype(dtype) @ w[:, :d] + b[:d]
        k = key.astype(dtype) @ w[:, d : 2 * d] + b[d : 2 * d]
        v = value.astype(dtype) @ w[:, 2 * d :] + b[2 * d :]

        mcfg_early = self.spec.model
        head_dim = d // self.num_heads
        lq, lk = q.shape[1], k.shape[1]
        if (
            mcfg_early.use_flash_attention
            and lq >= mcfg_early.flash_attention_min_seq
            and lk == lq
            and attn_bias is None
            and key_padding_mask is None
            and separable_bias is None
            and d % 128 == 0
        ):
            from ..ops import long_attention as la_ops
            from ..ops.pallas_attention import _is_tpu_backend

            if (
                la_ops.LONG_ATTENTION
                and (_is_tpu_backend() or la_ops._FORCE_INTERPRET)
                and la_ops.supported(lq, self.num_heads, head_dim)
            ):
                # Unmasked long self-attention (fusion encoder: 5184 img
                # tokens, 8 heads x D=32) via the whole-KV-resident packed
                # kernel (ops/long_attention.py). Adjacent heads are adjacent
                # in_proj channels, so (B, L, D) -> (B*D/128, L, 128) is ONE
                # relayout and the 4x-lane-padded (B, H, L, 32) layout is
                # never materialized.
                g = d // 128
                bsz = q.shape[0]

                def _packg(t):
                    return (
                        t.reshape(bsz, lq, g, 128)
                        .transpose(0, 2, 1, 3)
                        .reshape(bsz * g, lq, 128)
                    )

                from ..ops import softmax_check

                softmax_check.observe(
                    "encoder.long", _packg(q), _packg(k),
                    float(head_dim) ** -0.5, head_dim,
                )
                out = la_ops.long_attention_packed(
                    _packg(q), _packg(k), _packg(v),
                    float(head_dim) ** -0.5, head_dim,
                )
                out = (
                    out.reshape(bsz, g, lq, 128)
                    .transpose(0, 2, 1, 3)
                    .reshape(bsz, lq, d)
                )
                # "enc_attn_out" save tag (fusion_encoder.py enc_remat
                # policy): the long kernel's VJP consumes its own output o
                # (flash rowsum identity), so saving o (~21 MB/layer at bs8)
                # DCEs the ~10 ms in-kernel forward replay from full-layer
                # encoder remat; identity when the policy is off.
                from jax.ad_checkpoint import checkpoint_name

                out = checkpoint_name(out, "enc_attn_out")
                if self.dropout > 0.0 and train:
                    # same approximate output-dropout as the library flash
                    # long path below (exact prob-dropout would materialize
                    # the (L, L) probs this kernel exists to avoid)
                    keep = 1.0 - self.dropout
                    mask = jax.random.bernoulli(
                        self.make_rng("dropout"), keep, out.shape
                    )
                    out = jnp.where(mask, out / keep, jnp.zeros_like(out))
                return LoRALinear(d, self.spec, name="out_proj")(
                    out.astype(dtype), train=train
                )

        qh = split_heads(q, self.num_heads)
        kh = split_heads(k, self.num_heads)
        vh = split_heads(v, self.num_heads)

        mcfg = self.spec.model
        if separable_bias is not None:
            # decoder image cross-attn with separable boxRPB: the chunked
            # online-softmax path never materializes a (Lq, Lk) tensor; exact
            # attention-prob dropout happens in-loop (ops/rpb_attention.py,
            # measured 6.4x faster than the dense path on v5e)
            from ..ops.rpb_attention import separable_bias_attention

            dy, dx, grid_hw = separable_bias
            drop = self.dropout if train else 0.0
            out = separable_bias_attention(
                qh, kh, vh, dy, dx,
                grid_hw=grid_hw,
                dropout=drop,
                dropout_key=self.make_rng("dropout") if drop > 0.0 else None,
            )
            out = merge_heads(out)
            return LoRALinear(d, self.spec, name="out_proj")(out, train=train)
        # NOTE: routing the decoder's biased cross-attn (Lq=401, Lk=5184,
        # boxRPB) through the flash kernel was MEASURED SLOWER end-to-end
        # (1.56 vs 1.83 img/s/chip): the kernel's dbias pass costs more than
        # the XLA exact path saves. Flash stays gated on BOTH seqs long —
        # and the separable_bias path above supersedes it for boxRPB.
        long_seq = (
            mcfg.use_flash_attention
            and qh.shape[2] >= mcfg.flash_attention_min_seq
            and kh.shape[2] >= mcfg.flash_attention_min_seq
        )
        if self.dropout > 0.0 and train and not long_seq:
            # attention-prob dropout (torch MHA semantics): do softmax here
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * (1.0 / math.sqrt(d // self.num_heads))
            full_bias = make_attention_bias(key_padding_mask, attn_bias)
            if full_bias is not None:
                logits = logits + full_bias
            probs = jax.nn.softmax(logits, axis=-1)
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, probs.shape)
            probs = jnp.where(mask, probs / keep, 0.0)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh,
                preferred_element_type=jnp.float32,
            ).astype(vh.dtype)
        elif self.dropout > 0.0 and train and long_seq:
            # fused path can't materialize the (L, L) probs for exact
            # prob-dropout (that tensor is the 6.5 GB the kernel exists to
            # avoid); approximate with dropout on the attention OUTPUT — same
            # expectation, applied post V-mix. Exact semantics retained for
            # every short sequence.
            out = dot_product_attention(
                qh, kh, vh, bias=attn_bias, key_padding_mask=key_padding_mask,
                impl="pallas", remat=ENC_FLASH_REMAT,
            )
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, out.shape)
            out = jnp.where(mask, out / keep, jnp.zeros_like(out)).astype(vh.dtype)
        else:
            # long self-attention (fusion encoder: 5184 img tokens) goes
            # through the fused Pallas kernel; short/cross stays on XLA
            out = dot_product_attention(
                qh, kh, vh, bias=attn_bias, key_padding_mask=key_padding_mask,
                impl="pallas" if long_seq else "xla",
                remat=long_seq and ENC_FLASH_REMAT,
            )
        out = merge_heads(out)
        return LoRALinear(d, self.spec, name="out_proj")(out, train=train)


class MLP(nn.Module):
    """Reference model_misc.MLP (model_misc.py:160-195): relu between layers,
    dropout on intermediate activations, optional residual + out LayerNorm."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    spec: Spec
    dropout: float = 0.0
    residual: bool = False
    out_norm: bool = False
    zero_init_last: bool = False  # box-refine heads zero the last layer

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        orig = x
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, dim in enumerate(dims):
            last = i == self.num_layers - 1
            kinit = (
                nn.initializers.zeros_init()
                if (last and self.zero_init_last)
                else torch_linear_kernel_init
            )
            x = LoRALinear(dim, self.spec, name=f"layers.{i}", kernel_init=kinit)(
                x, train=train
            )
            if not last:
                x = jax.nn.relu(x)
                x = Dropout(self.dropout, name=f"drop{i}")(x, train=train)
        if self.residual:
            x = x + orig
        if self.out_norm:
            x = LayerNorm(name="out_norm")(x)
        return x


class Embedding(nn.Module):
    """torch nn.Embedding (weight named 'weight')."""

    num: int
    features: int
    spec: Spec
    init: Callable = nn.initializers.normal(stddev=1.0)

    @nn.compact
    def __call__(self, ids=None):
        weight = self.param(
            "weight", self.init, (self.num, self.features), self.spec.param_dtype
        )
        if ids is None:
            return weight.astype(self.spec.dtype)
        return weight[ids].astype(self.spec.dtype)
