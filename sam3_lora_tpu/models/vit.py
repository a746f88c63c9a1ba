"""ViTDet backbone (TPU-native re-design of ``sam3/model/vitdet.py:616-879``).

Architecture (SAM3 config, see ``model_builder.py:69-96``): plain ViT-L/14 at
1008^2 -> 72x72 tokens, depth 32, dim 1024, heads 16, mlp 4.625, 24x24
windowed attention in 28 blocks + global attention in blocks {7,15,23,31},
tiled absolute position embeddings from the 24x24 pretrain grid, and
interpolated 2D axial RoPE (window blocks use the native 24x24 table, global
blocks the same table stretched over 72x72 via scale_pos = 24/72).

TPU mapping:
* window attention = reshape to (B*9, 576, C) batched attention — lands on the
  MXU as large batched GEMMs, no kernel needed;
* global attention (5184 tokens) routes through the central attention op
  (Pallas flash kernel on TPU);
* abs-pos tiling is a static jnp.tile (constant-folded);
* per-block activation rematerialization via ``jax.checkpoint`` is applied by
  the train step (policy in train/trainer.py), not hard-wired here.

MLP sublayers are named ``fc1``/``fc2`` (timm names) — these are the modules
the reference's default LoRA ``target_modules`` actually match (the observed
"64 modules, 11,796,480 trainable params" in the reference README comes from
32 blocks x {fc1, fc2} at rank 32).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import softmax_check
from ..ops.attention import dot_product_attention, merge_heads, split_heads


def _tag_attn_out(out):
    """checkpoint_name tag on the attention output (= the proj LoRALinear's
    input), for the "wo_mid_attn" remat policy: with this tensor saved, the
    backward's only consumers of the attention FORWARD are gone — the window
    kernel's VJP needs just q/k/v (recomputed via the qkv GEMM from the saved
    block input) and the proj ADAPTER grad needs this input — so the ~3.5
    ms/block in-kernel forward replay is dead code. Identity under every
    other policy. Cost when saved: (B, 5184, 1024) bf16 = 85 MB/block, ~2.4
    GB across the 28 windowed blocks at bs8."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(out, "vit_attn_out")
from ..ops.rope import apply_rope_half, compute_axial_freqs, rope_half_perm
from ..ops.windows import window_partition, window_unpartition

# Checkpoint the 4 global blocks' flash attention (see the call site below).
GLOBAL_FLASH_REMAT = (
    __import__("os").environ.get("SAM3_GLOBAL_FLASH_REMAT", "0") == "1"
)
from .layers import LayerNorm, LoRALinear, Spec, lecun_trunc_normal


class PatchEmbed(nn.Module):
    spec: Spec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) -> (B, H/p, W/p, C). The stride-14 conv is expressed as
        a space-to-depth reshape + dense matmul, which XLA tiles onto the MXU
        far better than a fat conv on TPU."""
        cfg = self.spec.model
        p = cfg.patch_size
        b, c, h, w = x.shape
        kernel = self.param(
            "proj.kernel",
            lecun_trunc_normal(0.02),
            (p, p, c, cfg.vit_dim),
            self.spec.param_dtype,
        )
        # space-to-depth: (B, C, H, W) -> (B, H/p, W/p, p*p*C)
        xr = x.reshape(b, c, h // p, p, w // p, p)
        xr = jnp.transpose(xr, (0, 2, 4, 3, 5, 1)).reshape(b, h // p, w // p, p * p * c)
        # kernel (p, p, c, D) -> (p*p*c, D) in the same (ph, pw, c) order
        k2 = kernel.reshape(p * p * c, cfg.vit_dim)
        return jnp.dot(
            xr.astype(self.spec.dtype), k2.astype(self.spec.dtype)
        )  # no bias (bias_patch_embed=False, model_builder.py:94)


class Attention(nn.Module):
    """ViT attention with 2D axial RoPE (vitdet.py:339-515, rel-pos path
    elided: SAM3 sets rel_pos_blocks=())."""

    spec: Spec
    input_size: Tuple[int, int]  # (H, W) of this block's attention grid
    rope_scale_pos: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cfg = self.spec.model
        b, h, w, _ = x.shape
        l = h * w
        dim = cfg.vit_dim
        heads = cfg.vit_heads
        head_dim = dim // heads

        # RoPE rotate-half trick: interleaved stride-2 lane access costs ~28%
        # of a block forward on TPU, so the q/k channel pairs (2i, 2i+1) are
        # re-ordered to (i, i+D/2) by permuting the qkv projection's weight
        # COLUMNS (attention scores are invariant to a shared q/k channel
        # permutation; see ops/rope.py::rope_half_perm). Checkpoint layout is
        # untouched — the permutation is applied at apply-time inside
        # LoRALinear.
        if cfg.vit_use_rope:
            hp = rope_half_perm(head_dim)
            per_head = np.concatenate(
                [hp + h * head_dim for h in range(heads)]
            )
            col_perm = tuple(
                np.concatenate(
                    [per_head, dim + per_head, 2 * dim + np.arange(dim)]
                ).tolist()
            )
        else:
            col_perm = None
        qkv = LoRALinear(dim * 3, self.spec, name="qkv", out_perm=col_perm)(
            x.reshape(b, l, dim), train=train
        )

        # 5184-token global blocks: fused flash attention (13 GB of fp32
        # logits at bs 8 otherwise). Windowed blocks: whole-window fused
        # kernel (ops/window_attention.py) — logits never leave VMEM.
        if cfg.use_flash_attention and l >= cfg.flash_attention_min_seq:
            impl = "pallas"
        elif cfg.use_flash_attention and self.input_size[0] == cfg.vit_window_size:
            impl = "window"
        else:
            impl = "xla"

        cos = sin = None
        if cfg.vit_use_rope:
            angles = compute_axial_freqs(
                head_dim,
                self.input_size[1],
                self.input_size[0],
                theta=cfg.vit_rope_theta,
                scale_pos=self.rope_scale_pos,
            )
            cos = jnp.asarray(np.cos(angles))
            sin = jnp.asarray(np.sin(angles))

        from ..ops import window_attention as wa
        from ..ops import window_qkv as wq

        if (
            impl == "window"
            and wq.qkv_native_ok(heads, head_dim)
            and (wa.FUSE_ROPE or not cfg.vit_use_rope)
        ):
            # qkv-NATIVE chain: the kernel reads the projection output
            # (WB, L, 3*dim) as one contiguous block per window and writes
            # merge_heads layout — ZERO transposes between the qkv GEMM and
            # the output projection (ops/window_qkv.py; the packed chain
            # below still pays one relayout each way).
            scale = float(head_dim**-0.5)
            if softmax_check.is_enabled():
                qkv3 = qkv.reshape(b, l, 3, dim)
                softmax_check.observe(
                    "vit.window.qkv", qkv3[:, :, 0], qkv3[:, :, 1], scale,
                    head_dim, cos if cfg.vit_use_rope else None, sin,
                )
            if cfg.vit_use_rope:
                out = wq.window_attention_rope_qkv(qkv, heads, scale, cos, sin)
            else:
                out = wq.window_attention_qkv(qkv, heads, scale)
            out = _tag_attn_out(out)
            out = LoRALinear(dim, self.spec, name="proj")(out, train=train)
            return out.reshape(b, h, w, dim)

        if (
            impl == "window"
            and wa.packed_native_ok(heads, head_dim)
            and (wa.FUSE_ROPE or not cfg.vit_use_rope)
        ):
            # Head-pair-packed chain: heads (2i, 2i+1) are adjacent channels
            # of the qkv projection, so the packed (B*H/2, L, 2D) kernel
            # layout costs ONE relayout each way — same count as the grouped
            # path — while the kernel DMAs full 128-lane blocks (~2.7x the
            # D=64 rate; scripts/probe_dma_floor.py, probe_packed_chain.py).
            qkv_p = qkv.reshape(b, l, 3, heads // 2, 2 * head_dim)
            q, k, v = [
                jnp.transpose(qkv_p[:, :, i], (0, 2, 1, 3)).reshape(
                    b * (heads // 2), l, 2 * head_dim
                )
                for i in range(3)
            ]
            scale = float(head_dim**-0.5)
            softmax_check.observe(
                "vit.window.packed", q, k, scale, head_dim,
                cos if cfg.vit_use_rope else None, sin,
            )
            if cfg.vit_use_rope:
                out = wa.window_attention_rope_packed(q, k, v, scale, cos, sin)
            else:
                out = wa.window_attention_packed(q, k, v, scale)
            out = (
                out.reshape(b, heads // 2, l, 2 * head_dim)
                .transpose(0, 2, 1, 3)
                .reshape(b, l, dim)
            )
            out = _tag_attn_out(out)
            out = LoRALinear(dim, self.spec, name="proj")(out, train=train)
            return out.reshape(b, h, w, dim)

        from ..ops import long_attention as la
        from ..ops.pallas_attention import _is_tpu_backend

        if (
            impl == "pallas"
            and la.LONG_ATTENTION
            and (_is_tpu_backend() or la._FORCE_INTERPRET)
            and heads % max(1, 128 // head_dim) == 0
            and la.supported(l, heads, head_dim)
        ):
            # GLOBAL blocks via the whole-KV-resident packed kernel
            # (ops/long_attention.py): adjacent heads pack to 128 lanes
            # straight off the qkv projection — one relayout each way, no
            # lane-padded (B, H, L, 64) intermediates, lean bf16 residuals
            # instead of the library flash kernel's ~352 MB/block f32 stats.
            hpg = 128 // head_dim  # heads per packed group
            qkv_p = qkv.reshape(b, l, 3, heads // hpg, 128)
            q, k, v = [
                jnp.transpose(qkv_p[:, :, i], (0, 2, 1, 3)).reshape(
                    b * (heads // hpg), l, 128
                )
                for i in range(3)
            ]
            scale = float(head_dim**-0.5)
            softmax_check.observe(
                "vit.global.long", q, k, scale, head_dim,
                cos if cfg.vit_use_rope else None, sin,
            )
            if cfg.vit_use_rope:
                out = la.long_attention_rope_packed(
                    q, k, v, scale, head_dim, cos, sin
                )
            else:
                out = la.long_attention_packed(q, k, v, scale, head_dim)
            out = (
                out.reshape(b, heads // hpg, l, 128)
                .transpose(0, 2, 1, 3)
                .reshape(b, l, dim)
            )
            out = _tag_attn_out(out)
            out = LoRALinear(dim, self.spec, name="proj")(out, train=train)
            return out.reshape(b, h, w, dim)

        qkv = qkv.reshape(b, l, 3, heads, head_dim)
        q, k, v = [
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        ]  # each (B, H, L, hd)

        rope_cos = rope_sin = None
        if cfg.vit_use_rope:
            if impl == "window" and wa.FUSE_ROPE:
                # rotation fused into the window kernel (VMEM-resident)
                rope_cos, rope_sin = cos, sin
            else:
                q = apply_rope_half(q, cos, sin)
                k = apply_rope_half(k, cos, sin)
        out = dot_product_attention(
            q, k, v, impl=impl, rope_cos=rope_cos, rope_sin=rope_sin,
            # global blocks: trade one flash-forward replay in the backward
            # for ~370 MB/block of 128-lane-tiled f32 stats + padded copies
            # the library kernel would otherwise save (4 unrematted global
            # blocks under windows_only/wo_block_mid ~= 3-4 GB of HBM)
            remat=(impl == "pallas" and GLOBAL_FLASH_REMAT),
        )
        out = merge_heads(out)
        out = _tag_attn_out(out)
        out = LoRALinear(dim, self.spec, name="proj")(out, train=train)
        return out.reshape(b, h, w, dim)


class TimmMlp(nn.Module):
    """timm.Mlp: fc1 -> GELU(exact) -> fc2 (vit dropout=0 in SAM3)."""

    hidden: int
    out: int
    spec: Spec

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = LoRALinear(self.hidden, self.spec, name="fc1")(x, train=train)
        x = jax.nn.gelu(x, approximate=False)
        x = LoRALinear(self.out, self.spec, name="fc2")(x, train=train)
        return x


def _drop_path(x, rate, rng, train: bool):
    """Stochastic depth with a (possibly traced) per-block rate. Keeps x's
    dtype (a traced fp32 rate must not promote the bf16 scan carry)."""
    if not train:
        return x
    keep = (1.0 - rate).astype(jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros_like(x))


class Block(nn.Module):
    spec: Spec
    window_size: int  # 0 = global

    @nn.compact
    def __call__(self, x: jnp.ndarray, drop_path, train: bool = False) -> jnp.ndarray:
        # NOTE: `train` is positional (not kw-only) so nn.remat can mark it
        # static via static_argnums; drop_path is a runtime scalar so a
        # scanned stack of blocks can vary it per layer.
        cfg = self.spec.model
        feat = cfg.feat_size
        ws = self.window_size
        if ws > 0:
            input_size = (ws, ws)
            scale_pos = 1.0
        else:
            input_size = (feat, feat)
            # rope_pt_size = window_size; interpolate to the global grid
            scale_pos = (cfg.vit_window_size / feat) if cfg.vit_rope_interp else 1.0

        shortcut = x
        y = LayerNorm(name="norm1")(x)
        if ws > 0:
            hw = (y.shape[1], y.shape[2])
            y, pad_hw = window_partition(y, ws)
        y = Attention(
            self.spec, input_size=input_size, rope_scale_pos=scale_pos, name="attn"
        )(y, train=train)
        if ws > 0:
            y = window_unpartition(y, ws, pad_hw, hw)
        if train:
            r1 = self.make_rng("dropout")
            r2 = self.make_rng("dropout")
        else:
            r1 = r2 = None
        x = shortcut + _drop_path(y, drop_path, r1, train)
        # tag for the "block_mid" remat policy (identity otherwise)
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "vit_block_mid")

        y = LayerNorm(name="norm2")(x)
        y = TimmMlp(cfg.vit_mlp_hidden, cfg.vit_dim, self.spec, name="mlp")(
            y, train=train
        )
        x = x + _drop_path(y, drop_path, r2, train)
        return x


class ViT(nn.Module):
    """Returns the final stride-14 feature map (B, C, H/14, W/14).

    The 28 windowed blocks run as FOUR ``nn.scan`` groups of 7 (stacked
    params, one compiled body each) interleaved with the 4 individually-named
    global blocks — bounding backward memory to one block's activations and
    collapsing compile time (XLA otherwise schedules all 32 blocks' remat
    segments concurrently and overflows HBM). Set
    ``ModelConfig.vit_scan_blocks=False`` for the flat per-block layout.
    """

    spec: Spec

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cfg = self.spec.model
        feat = cfg.feat_size
        if x.dtype == jnp.uint8:
            # device-side normalize for the uint8 input path
            # (transforms.NormalizeToTensor(device_normalize=True)): exactly
            # (u/255 - 0.5)/0.5 for the production mean=std=0.5
            x = (
                x.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            ).astype(self.spec.dtype)  # f32 math -> bit-matches the host path
        x = PatchEmbed(self.spec, name="patch_embed")(x)  # (B, h, w, C)

        if cfg.vit_use_abs_pos:
            pre = cfg.vit_pretrain_img_size // cfg.patch_size
            pos_embed = self.param(
                "pos_embed",
                lecun_trunc_normal(0.02),
                (1, pre * pre + 1, cfg.vit_dim),  # +1 cls slot (pretrain ckpt)
                self.spec.param_dtype,
            )
            grid = pos_embed[:, 1:].reshape(1, pre, pre, cfg.vit_dim)
            if cfg.vit_tile_abs_pos:
                reps = (feat + pre - 1) // pre
                tiled = jnp.tile(grid, (1, reps, reps, 1))[:, :feat, :feat]
            else:
                from ..ops.interpolate import resize_bilinear

                tiled = jnp.transpose(
                    resize_bilinear(
                        jnp.transpose(grid, (0, 3, 1, 2)), (feat, feat)
                    ),
                    (0, 2, 3, 1),
                )
            x = x + tiled.astype(x.dtype)

        if cfg.vit_ln_pre:
            x = LayerNorm(name="ln_pre")(x)

        dpr = np.linspace(0.0, cfg.vit_drop_path_rate, cfg.vit_depth)
        # per-block activation rematerialization in training (the reference
        # wraps each block in torch checkpoint, vitdet.py:836-838); nn.remat
        # keeps the parameter tree identical to the plain Block
        block_cls = _remat_block(cfg) if train else Block
        global_cls = _remat_block(cfg, is_global=True) if train else Block

        if cfg.vit_scan_blocks:
            for g_idx, (run, glob) in enumerate(_scan_groups(cfg)):
                if run:
                    scan = nn.scan(
                        _ScanBody,
                        variable_axes={"params": 0},
                        split_rngs={"params": True, "dropout": True},
                        in_axes=(0, nn.broadcast),
                        length=len(run),
                    )
                    rates = jnp.asarray(dpr[list(run)], jnp.float32)
                    x, _ = scan(
                        self.spec, window_size=cfg.vit_window_size,
                        name=f"scan_blocks_{g_idx}",
                    )(x, rates, train)
                if glob is not None:
                    x = global_cls(
                        self.spec, window_size=0, name=f"blocks.{glob}"
                    )(x, jnp.float32(dpr[glob]), train)
        else:
            for i in range(cfg.vit_depth):
                ws = 0 if i in cfg.vit_global_blocks else cfg.vit_window_size
                x = (global_cls if ws == 0 else block_cls)(
                    self.spec, window_size=ws, name=f"blocks.{i}"
                )(x, jnp.float32(dpr[i]), train)
        # ln_post is Identity in SAM3 (model_builder.py:92)
        return jnp.transpose(x, (0, 3, 1, 2))  # (B, C, h, w)


class _ScanBody(nn.Module):
    """nn.scan body: one windowed Block per iteration, rematted in training.

    The inner Block is named "block" so stacked params live at
    ``scan_blocks_{g}.block.<...>`` with a leading (group_len,) axis.
    """

    spec: Spec
    window_size: int

    @nn.compact
    def __call__(self, x, rate, train: bool = False):
        # NOTE: a save-attention-OUTPUTS remat policy was measured SLOWER here
        # (1.84 -> 1.78 img/s/chip): the scan stacks saved residuals into a
        # (group, B, 72, 72, C) HBM tensor whose DMA traffic exceeds the
        # attention recompute it avoids. The "block_mid" policy instead saves
        # the post-attention RESIDUAL, which lets XLA drop the attention
        # kernel replay itself from the backward (see ModelConfig).
        cls = _remat_block(self.spec.model) if train else Block
        x = cls(self.spec, window_size=self.window_size, name="block")(
            x, rate, train
        )
        return x, None


def _remat_block(cfg, is_global: bool = False):
    """Block wrapped in nn.remat with the configured save policy.

    "windows_only": the 4 GLOBAL blocks run unrematted (their backward then
    skips the whole-block replay incl. the 5184-token flash forward) while
    the 28 windowed blocks keep full remat — global blocks are 1/8 of the
    depth, so the extra saved activations stay bounded."""
    if cfg.vit_remat_policy in ("windows_only", "wo_block_mid") and is_global:
        return Block
    policy = None
    if cfg.vit_remat_policy in ("block_mid", "wo_block_mid"):
        # "wo_block_mid" = windows_only globals + block_mid windowed blocks:
        # saving x_mid DCEs the window-attention kernel's forward replay from
        # the backward (its bwd takes only q/k/v residuals, recomputed via the
        # qkv GEMM from the saved block input; ViT proj has no LoRA adapter,
        # so nothing else consumes the attention output).
        # "vit_attn_out" additionally saves the attention output o where the
        # backward DOES consume it — the LONG-attention kernel's VJP uses o
        # for the flash rowsum identity — which DCEs the 4 global blocks'
        # ~15.5 ms in-kernel forward replay under "block_mid" (the
        # bs10+/bs12 fitting config) for +85 MB/block; in windowed blocks o
        # has no backward consumer and XLA drops the save entirely.
        policy = jax.checkpoint_policies.save_only_these_names(
            "vit_block_mid", "vit_attn_out"
        )
    elif cfg.vit_remat_policy not in ("full", "windows_only"):
        raise ValueError(f"unknown vit_remat_policy: {cfg.vit_remat_policy}")
    return nn.remat(Block, static_argnums=(3,), policy=policy)


def _scan_groups(cfg):
    """Partition block indices into (windowed_run, following_global) pairs,
    e.g. depth 32 / globals (7,15,23,31) -> [([0..6], 7), ([8..14], 15), ...]."""
    groups = []
    run = []
    for i in range(cfg.vit_depth):
        if i in cfg.vit_global_blocks:
            groups.append((tuple(run), i))
            run = []
        else:
            run.append(i)
    if run:
        groups.append((tuple(run), None))
    return groups
