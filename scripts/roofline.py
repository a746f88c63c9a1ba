"""Analytic FLOP inventory for the headline train step + roofline to 7.0.

Computes the exact matmul FLOPs of every stage of the bs8 full-config LoRA
train step from the ModelConfig dims (no device needed), then — given the
measured stage times from scripts/profile_bwd.py / profile_ground.py /
microbench.py (paste via env or the MEASURED dict below) — prints each
stage's achieved TF/s, its share of the step, and the bound:

    step_bound = sum_i flops_i / best_rate_i

where best_rate_i is the best rate DEMONSTRATED on this chip for that op
class (v5e-1: bf16 GEMM ~109 TF/s measured, int8 GEMM ~177, window-attn
kernel fwd+bwd ~44, long-attn kernel ~63 global / ~28 encoder-shape).
If the bound is above 1.143 s (= 7.0 img/s/chip at bs8), 7.0 is structurally
out of reach at these rates and the printout quantifies exactly which rates
would have to improve (VERDICT r4 next-#1).

FLOP conventions: matmul (M,K)x(K,N) = 2*M*K*N; attention fwd = 2 matmuls
(QK^T + PV) = 4*L_q*L_k*D per head-dim-D; backward of a GEMM needs dx only
for frozen weights (dW dead-code-eliminated; LoRA adapter GEMMs are rank-32
noise) => bwd_gemm ~= 1x fwd. Attention bwd = dQ,dK,dV + recompute P =
~2.5x fwd. Remat replay adds 1x the rematted region's fwd.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "8"))

# ---- model dims (ModelConfig 848M defaults) --------------------------------
D_VIT, DEPTH, HEADS, HID = 1024, 32, 16, 4736
N_TOK = 72 * 72            # 5184 tokens @ 1008^2 / patch 14
WIN = 576                  # 24x24 windowed attention
N_GLOBAL = 4
N_WINDOWED = DEPTH - N_GLOBAL
D_ENC, ENC_LAYERS, ENC_FFN = 256, 6, 2048
D_TXT, TXT_LAYERS, TXT_CTX = 1024, 24, 32
NQ, DEC_LAYERS = 200, 6
NQ_ALL = 401               # o2o + o2m queries through the decoder


def tf(x):
    return x / 1e12


def gemm(m, k, n):
    return 2 * m * k * n


def vit_block_flops(attn_lk):
    """One ViT block, per image: qkv + proj GEMMs + attention (fwd only)."""
    g = gemm(N_TOK, D_VIT, 3 * D_VIT) + gemm(N_TOK, D_VIT, D_VIT)
    mlp = gemm(N_TOK, D_VIT, HID) + gemm(N_TOK, HID, D_VIT)
    attn = 4 * N_TOK * attn_lk * D_VIT  # all heads combined
    return g + mlp, attn


def stage_flops():
    """Per-IMAGE fwd matmul FLOPs by stage; returns {stage: (gemm, attn)}."""
    wg, wa = vit_block_flops(WIN)
    gg, ga = vit_block_flops(N_TOK)
    s = {
        "vit_windowed_gemm": N_WINDOWED * wg,
        "vit_windowed_attn": N_WINDOWED * wa,
        "vit_global_gemm": N_GLOBAL * gg,
        "vit_global_attn": N_GLOBAL * ga,
        # fusion encoder: self-attn over N_TOK + text cross (tiny) + FFN
        "enc_gemm": ENC_LAYERS * (
            gemm(N_TOK, D_ENC, 3 * D_ENC) + gemm(N_TOK, D_ENC, D_ENC)
            + gemm(N_TOK, D_ENC, ENC_FFN) + gemm(N_TOK, ENC_FFN, D_ENC)
        ),
        "enc_attn": ENC_LAYERS * 4 * N_TOK * N_TOK * D_ENC,
        "dec_gemm": DEC_LAYERS * (
            2 * gemm(NQ_ALL, D_ENC, 3 * D_ENC)  # self + cross projections
            + 2 * gemm(NQ_ALL, D_ENC, D_ENC)
            + gemm(NQ_ALL, D_ENC, 2048) + gemm(NQ_ALL, 2048, D_ENC)
        ),
        "dec_attn": DEC_LAYERS * (
            4 * NQ_ALL * NQ_ALL * D_ENC + 4 * NQ_ALL * N_TOK * D_ENC
        ),
        # text encoder: 24 layers over 32 tokens (per PROMPT ~ per image)
        "text_gemm": TXT_LAYERS * (
            gemm(TXT_CTX, D_TXT, 3 * D_TXT) + gemm(TXT_CTX, D_TXT, D_TXT)
            + 2 * gemm(TXT_CTX, D_TXT, 4 * D_TXT)
        ),
    }
    return s


def main():
    s = stage_flops()
    fwd_img = sum(s.values())
    print(f"== per-image fwd matmul FLOPs (B={B} batch multiplies these) ==")
    for k, v in s.items():
        print(f"  {k:22s} {tf(v):8.3f} TF  ({100 * v / fwd_img:5.1f}%)")
    print(f"  {'TOTAL fwd':22s} {tf(fwd_img):8.3f} TF/img -> {tf(B * fwd_img):.1f} TF @ bs{B}")

    # backward multipliers: frozen GEMMs need dx only (~1x fwd); attention
    # bwd ~2.5x fwd; remat replay: wo_block_mid replays the windowed blocks'
    # fwd (gemm+attn) once, globals unrematted, encoder FFN-only remat
    # replays enc FFN GEMMs once.
    bwd = (
        1.0 * (s["vit_windowed_gemm"] + s["vit_global_gemm"] + s["enc_gemm"]
               + s["dec_gemm"] + s["text_gemm"])
        + 2.5 * (s["vit_windowed_attn"] + s["vit_global_attn"]
                 + s["enc_attn"] + s["dec_attn"])
    )
    # wo_block_mid replay per windowed block: qkv GEMM (window VJP's q/k/v
    # residuals) + fc1+gelu (fc2 adapter's input); the window-attn fwd and
    # proj/fc2 GEMMs are NOT replayed (mid saved, ViT proj unadapted).
    # Encoder ffn-remat replays the FFN GEMMs. Globals unrematted.
    replay = (
        N_WINDOWED * (gemm(N_TOK, D_VIT, 3 * D_VIT) + gemm(N_TOK, D_VIT, HID))
        + ENC_LAYERS * (gemm(N_TOK, D_ENC, ENC_FFN) + gemm(N_TOK, ENC_FFN, D_ENC))
    )
    tot = fwd_img + bwd + replay
    print(f"\n== per-image fwd+bwd+replay ==")
    print(f"  fwd {tf(fwd_img):.2f}  bwd {tf(bwd):.2f}  replay {tf(replay):.2f}"
          f"  total {tf(tot):.2f} TF/img -> {tf(B * tot):.1f} TF @ bs{B}")

    # demonstrated-best rates on THIS v5e-1 (r5 queue D GEMM_BM_512 sweep:
    # fc1 206.5 / fc2 194.4 / qkv 160.1 / proj 74.0 int8 wres kernel ->
    # FLOP-weighted trunk fwd-GEMM avg ~169; dx bf16 126-140)
    rates = {
        "gemm_int8_fwd": 169e12,   # wres kernel, weighted over trunk shapes
        "gemm_bf16": 130e12,       # dx dy@W^T measured 126-140
        "window_attn_fwdbwd": 44e12,   # queue G WPPxCLAMP
        "long_attn_global": 63e12,     # queue F fwd+bwd
        "long_attn_enc": 28e12,        # encoder shape fwd+bwd
        "dec_attn": 44e12,             # assume window-kernel-class rate
    }
    gemm_fwd = sum(v for k, v in s.items() if k.endswith("gemm"))
    gemm_bwd_replay = gemm_fwd + replay
    attn_win = 3.5 * s["vit_windowed_attn"]  # fwd + bwd (no replay, see above)
    attn_glob = 3.5 * s["vit_global_attn"]
    attn_enc = 3.5 * s["enc_attn"]
    attn_dec = 3.5 * s["dec_attn"]
    bound = B * (
        gemm_fwd / rates["gemm_int8_fwd"]
        + gemm_bwd_replay / rates["gemm_bf16"]
        + attn_win / rates["window_attn_fwdbwd"]
        + attn_glob / rates["long_attn_global"]
        + attn_enc / rates["long_attn_enc"]
        + attn_dec / rates["dec_attn"]
    )
    print(f"\n== bound at demonstrated-best rates (matmul time only) ==")
    print(f"  step >= {bound:.3f} s  ->  <= {B / bound:.2f} img/s/chip")
    print(f"  7.0 img/s/chip needs step <= {B / 7.0:.3f} s")
    v5e_peak_bf16, v5e_peak_int8 = 197e12, 394e12
    ideal = B * tot / v5e_peak_bf16
    print(f"  absolute bf16-peak floor ({tf(v5e_peak_bf16):.0f} TF/s): "
          f"{ideal:.3f} s -> {B / ideal:.2f} img/s/chip")
    ideal8 = B * tot / v5e_peak_int8
    print(f"  absolute int8-peak floor ({tf(v5e_peak_int8):.0f} TF/s): "
          f"{ideal8:.3f} s -> {B / ideal8:.2f} img/s/chip")


if __name__ == "__main__":
    main()
