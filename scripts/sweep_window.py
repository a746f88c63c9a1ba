"""Focused microbench of the fused window-attention kernel only.

Reads SAM3_WINDOW_HEAD_GROUP / SAM3_WINDOW_INTERLEAVE from the environment
(consumed at import inside ops/window_attention.py), so each configuration
must run in a fresh process:

    for g in 1 2 4; do for il in 0 1; do
      SAM3_WINDOW_HEAD_GROUP=$g SAM3_WINDOW_INTERLEAVE=$il python scripts/sweep_window.py
    done; done

Prints one line per timer tagged with the EFFECTIVE config (read back from
the kernel module, including the h %% g fallback) so logs are greppable and
never attribute a timing to a config that did not actually run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from microbench import timeit  # shared tunnel-aware timing harness

B = int(os.environ.get("B", "8"))


def main():
    from sam3_lora_tpu.ops import window_attention as wa

    WB, HD, L, DH = B * 9, 16, 576, 64
    # the kernel falls back to g=1 when the head count is not divisible
    g = wa.HEAD_GROUP if HD % wa.HEAD_GROUP == 0 else 1
    tag = (
        f"[g={g} il={int(wa._INTERLEAVE)} ms={int(wa._MXU_SUM)}"
        f" nm={int(wa._NO_MAX)} fr={int(wa.FUSE_ROPE)} wpp={wa._WPP}"
        f" pk={int(wa._PACKED)}]"
    )
    # rope rows: the fused-RoPE fwd honors il (kernel_rope_interleave);
    # its bwd (like the plain bwd) has no interleave variant
    rope_tag = tag
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    k = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    v = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    attn_flops = 4 * WB * HD * L * L * DH

    scale = DH ** -0.5
    timeit(f"window attn fwd {tag}",
           lambda a, b_, c: wa.window_attention(a, b_, c, scale),
           q, k, v, flops=attn_flops)

    def wa_bwd(a, b_, c):
        f = lambda a, b_, c: jnp.sum(
            wa.window_attention(a, b_, c, scale).astype(jnp.float32))
        return jax.grad(f, argnums=(0, 1, 2))(a, b_, c)

    timeit(f"window attn fwd+bwd {tag}", wa_bwd, q, k, v,
           flops=attn_flops * 3.5)

    # RoPE-fused variant (SAM3_WINDOW_FUSE_ROPE production gate); timed here
    # unconditionally for side-by-side comparison. Note the flop count ignores
    # the rotation (VPU work), so its TF/s is comparable to the plain kernel's.
    import numpy as np

    from sam3_lora_tpu.ops.rope import compute_axial_freqs

    ang = compute_axial_freqs(DH, 24, 24)
    cos = jnp.asarray(np.cos(ang))
    sin = jnp.asarray(np.sin(ang))

    timeit(f"window attn+rope fwd {rope_tag}",
           lambda a, b_, c: wa.window_attention_rope(a, b_, c, scale, cos, sin),
           q, k, v, flops=attn_flops)

    def war_bwd(a, b_, c):
        f = lambda a, b_, c: jnp.sum(
            wa.window_attention_rope(a, b_, c, scale, cos, sin).astype(
                jnp.float32))
        return jax.grad(f, argnums=(0, 1, 2))(a, b_, c)

    timeit(f"window attn+rope fwd+bwd {rope_tag}", war_bwd, q, k, v,
           flops=attn_flops * 3.5)


if __name__ == "__main__":
    main()
