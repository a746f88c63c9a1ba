"""dot_product_attention(remat=True): checkpointing the flash call must not
change outputs or gradients — it only changes WHAT the backward saves (bf16
q/k/v inputs instead of the library kernel's 128-lane-tiled f32 stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops.attention import dot_product_attention


def _qkv(key, b=2, h=2, l=256, d=16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("with_mask", [False, True])
def test_remat_identical_outputs_and_grads(with_mask):
    q, k, v = _qkv(jax.random.PRNGKey(0))
    kpm = None
    if with_mask:
        kpm = jnp.zeros((q.shape[0], k.shape[2]), bool).at[:, -17:].set(True)

    def loss(qkv, remat):
        o = dot_product_attention(
            *qkv, key_padding_mask=kpm, impl="pallas", remat=remat
        )
        return (o * jnp.cos(o)).sum()

    l0, g0 = jax.value_and_grad(lambda t: loss(t, False))((q, k, v))
    l1, g1 = jax.value_and_grad(lambda t: loss(t, True))((q, k, v))
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_encoder_flag_is_wired():
    """The env-gated constants exist and default off (the A/B levers the
    TPU queue flips: SAM3_ENC_FLASH_REMAT / SAM3_GLOBAL_FLASH_REMAT)."""
    from sam3_lora_tpu.models import layers, vit

    assert layers.ENC_FLASH_REMAT is False
    assert vit.GLOBAL_FLASH_REMAT is False
