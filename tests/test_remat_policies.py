"""Every vit_remat_policy must be a pure scheduling choice: identical loss
and gradients to the un-rematted forward (remat replays, never re-derives).

Guards the save_only_these_names wiring (models/vit.py::_remat_block): a
checkpoint-name typo silently degrades to save-nothing, which still runs —
only a numerical cross-check catches a policy that diverges.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from sam3_lora_tpu.config import tiny_model_config
from sam3_lora_tpu.models.layers import Spec
from sam3_lora_tpu.models.vit import ViT

POLICIES = ("full", "block_mid", "windows_only", "wo_block_mid")


def _loss_and_grads(policy):
    cfg = tiny_model_config(vit_remat_policy=policy, dtype="float32",
                            param_dtype="float32")
    vit = ViT(Spec(model=cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.img_size, cfg.img_size))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(2)}
    params = vit.init(rngs, x, train=True)

    def loss_fn(p):
        return jnp.mean(
            vit.apply(p, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)}) ** 2
        )

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return loss, grads


@pytest.mark.fast
def test_remat_policies_numerically_identical():
    ref_loss, ref_grads = _loss_and_grads("full")
    assert jnp.isfinite(ref_loss)
    for policy in POLICIES[1:]:
        loss, grads = _loss_and_grads(policy)
        assert jnp.allclose(loss, ref_loss, atol=1e-6), policy
        flat_r = jax.tree.leaves(ref_grads)
        flat_p = jax.tree.leaves(grads)
        for a, b in zip(flat_r, flat_p):
            assert jnp.allclose(a, b, atol=1e-5), policy


@pytest.mark.fast
def test_unknown_policy_rejected():
    with pytest.raises(ValueError):
        _loss_and_grads("nonsense")


@pytest.mark.fast
def test_encoder_ffn_remat_numerically_identical():
    """enc_remat_ffn (FFN-only remat, attention unrematted) must match the
    fully-unrematted encoder bit-for-bit in fp32 — and must not change the
    parameter tree (the lifted _ffn creates names in the layer's own scope)."""
    from sam3_lora_tpu.models.fusion_encoder import TransformerEncoderFusion

    def run(enc_remat, enc_remat_ffn):
        cfg = tiny_model_config(
            dtype="float32", param_dtype="float32", enc_remat=enc_remat,
            enc_remat_ffn=enc_remat_ffn,
        )
        enc = TransformerEncoderFusion(Spec(model=cfg))
        key = jax.random.PRNGKey(3)
        src = jax.random.normal(key, (2, 36, cfg.d_model))
        pos = jax.random.normal(jax.random.fold_in(key, 1), (2, 36, cfg.d_model))
        prm = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, cfg.d_model))
        params = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(2)},
            src, pos, prm, None, train=True,
        )

        def loss_fn(p):
            return jnp.mean(
                enc.apply(p, src, pos, prm, None, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)}) ** 2
            )

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        return loss, grads, params

    ref_loss, ref_grads, ref_params = run(False, False)
    for variant in ((False, True), (True, False)):
        loss, grads, params = run(*variant)
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(ref_params)
        ), variant
        assert jnp.allclose(loss, ref_loss, atol=1e-6), variant
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
            assert jnp.allclose(a, b, atol=1e-5), variant
