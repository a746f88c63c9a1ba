"""Model factory (the DI root, mirroring ``sam3/model_builder.py``).

``build_sam3_image_model`` returns the flax module; ``init_model`` initializes
its parameters with a dummy batch. Unlike the reference (which hard-codes the
architecture in builder functions), all hyperparameters live in ``ModelConfig``
whose defaults reproduce the 848M release model.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LoRAConfig, ModelConfig
from .geometry import GeoPrompt
from .layers import Spec
from .sam3_image import Batch, Sam3Image, Targets


def build_sam3_image_model(
    config: Optional[ModelConfig] = None,
    lora: Optional[LoRAConfig] = None,
) -> Sam3Image:
    cfg = config or ModelConfig()
    return Sam3Image(Spec(model=cfg, lora=lora))


def dummy_batch(
    cfg: ModelConfig,
    batch_size: int = 1,
    with_targets: bool = False,
    num_images: Optional[int] = None,
) -> Batch:
    n_img = num_images or batch_size
    r = cfg.img_size
    targets = None
    if with_targets:
        targets = Targets(
            boxes=jnp.tile(
                jnp.array([[0.5, 0.5, 0.25, 0.25]], jnp.float32),
                (batch_size, cfg.max_targets, 1),
            ).reshape(batch_size, cfg.max_targets, 4),
            valid=jnp.zeros((batch_size, cfg.max_targets), jnp.bool_).at[:, 0].set(True),
            masks=jnp.zeros(
                (batch_size, cfg.max_targets, cfg.mask_loss_resolution, cfg.mask_loss_resolution),
                jnp.float32,
            ),
            mask_valid=jnp.zeros((batch_size, cfg.max_targets), jnp.bool_).at[:, 0].set(True),
            is_exhaustive=jnp.ones((batch_size,), jnp.bool_),
        )
    token_ids = jnp.zeros((batch_size, cfg.text_context_length), jnp.int32)
    token_ids = token_ids.at[:, 0].set(49406).at[:, 1].set(49407)
    geo = GeoPrompt.empty(batch_size, cfg.max_prompt_boxes)
    if cfg.geo_mask_prompts:
        # include a (padded) mask prompt so the FusedMaskEncoder params
        # materialize at init (apply-time prompts would otherwise hit
        # ScopeParamNotFoundError)
        geo = geo.replace(
            mask_embeddings=jnp.zeros((batch_size, 1, r, r), jnp.float32),
            mask_mask=jnp.ones((batch_size, 1), jnp.bool_),
            mask_labels=jnp.ones((batch_size, 1), jnp.int32),
        )
    return Batch(
        images=jnp.zeros((n_img, 3, r, r), jnp.float32),
        token_ids=token_ids,
        img_ids=jnp.arange(batch_size, dtype=jnp.int32) % n_img,
        geo=geo,
        targets=targets,
    )


def init_model(
    model: Sam3Image,
    rng: jax.Array,
    batch: Optional[Batch] = None,
    train: bool = False,
):
    cfg = model.spec.model
    if batch is None:
        batch = dummy_batch(cfg, with_targets=train)
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(rngs, batch, train=train)
    return variables["params"]


def init_model_fast(model: Sam3Image, seed: int = 0, scale: float = 0.02):
    """Host-side parameter materialization: shapes/dtypes from ``eval_shape``
    (no device compute), values small-random numpy. For benchmarks and
    compile checks where the 848M on-device random init (~minutes through a
    remote tunnel) is pure overhead; real training loads converted weights."""
    import numpy as np

    cfg = model.spec.model
    batch = dummy_batch(cfg)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    )["params"]
    rng = np.random.RandomState(seed)

    def fill(leaf):
        a = rng.standard_normal(leaf.shape).astype(np.float32) * scale
        return jnp.asarray(a, dtype=leaf.dtype)

    return jax.tree_util.tree_map(fill, shapes)
