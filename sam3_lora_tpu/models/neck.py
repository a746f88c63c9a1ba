"""SimpleFPN neck (re-design of ``sam3/model/necks.py:13-125``).

From the single stride-14 ViT map (B, 1024, 72, 72) produce four levels at
scales [4, 2, 1, 0.5] -> sizes [288, 144, 72, 36], each projected to d=256 by
conv1x1 + conv3x3. The 2x2-stride-2 transposed convs are expressed as
einsum + pixel-shuffle (exact for non-overlapping stride==kernel), which maps
onto the MXU as one GEMM instead of a scatter.

Per-level sine position encodings are emitted alongside (the reference calls
``PositionEmbeddingSine`` per level, necks.py:116).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.posenc import sine_pos_grid
from .layers import Conv2d, MaxPool2x2, Spec


class ConvTranspose2x2(nn.Module):
    """torch ConvTranspose2d(k=2, s=2) == einsum + pixel shuffle."""

    features: int
    spec: Spec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        # torch layout (in, out, 2, 2); torch default init bound 1/sqrt(out*k*k)
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
            "bchw,cokl->bohkwl",
            x.astype(dtype),
            weight.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        y = y.reshape(b, self.features, 2 * h, 2 * w)
        return y + bias.astype(dtype)[None, :, None, None]


class FPNNeck(nn.Module):
    """Produces (features, pos_encodings) lists ordered high-res -> low-res."""

    spec: Spec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cfg = self.spec.model
        d = cfg.d_model
        outs: List[jnp.ndarray] = []
        poss: List[jnp.ndarray] = []
        dim = x.shape[1]
        for i, scale in enumerate(cfg.neck_scale_factors):
            cur = x
            if scale == 4.0:
                cur = ConvTranspose2x2(dim // 2, self.spec, name=f"convs.{i}.dconv_2x2_0")(cur)
                cur = jax.nn.gelu(cur, approximate=False)
                cur = ConvTranspose2x2(dim // 4, self.spec, name=f"convs.{i}.dconv_2x2_1")(cur)
            elif scale == 2.0:
                cur = ConvTranspose2x2(dim // 2, self.spec, name=f"convs.{i}.dconv_2x2")(cur)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                cur = MaxPool2x2(name=f"convs.{i}.maxpool_2x2")(cur)
            else:
                raise NotImplementedError(f"scale={scale}")
            cur = Conv2d(d, (1, 1), self.spec, name=f"convs.{i}.conv_1x1")(cur)
            cur = Conv2d(d, (3, 3), self.spec, padding=1, name=f"convs.{i}.conv_3x3")(cur)
            outs.append(cur)
            h, w = cur.shape[-2:]
            pos = sine_pos_grid(h, w, num_pos_feats=d)  # (d, h, w), XLA constant
            poss.append(
                jnp.broadcast_to(pos[None], (cur.shape[0], d, h, w)).astype(cur.dtype)
            )
        return outs, poss
