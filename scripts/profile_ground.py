"""Bisect the non-trunk backward: grad of the grounding stack with
stop-gradient barriers inserted after the encoder / after the decoder.

  A. grad wrt feats, full stack          -> total non-trunk bwd
  B. stop-grad(memory) after encoder     -> decoder+scoring+seg+loss bwd only
  C. stop-grad(decoder outputs)          -> scoring-gather+seg+loss bwd only
Differences attribute backward time to encoder(+geometry+text), decoder, rest.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.config import LoRAConfig, ModelConfig  # noqa: F401 (env-tier tests)
from sam3_lora_tpu.models import build_sam3_image_model, init_model_fast
from sam3_lora_tpu.models.builder import dummy_batch
from sam3_lora_tpu.models.geometry import GeoPrompt
from sam3_lora_tpu.train.losses import LossConfig, compute_losses
from sam3_lora_tpu.train.trainer import merge_trainable, split_trainable

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "10"))


def _fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def bench(name, fn, *args):
    t0 = time.time()
    _fetch(fn(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} compile {ct:6.1f}s  steady {dt * 1e3:9.1f} ms", flush=True)
    return dt


def staged_ground(m, feats, poss, batch, sg_memory, sg_dec, train):
    """Replica of Sam3Image.ground (sam3_image.py:106-257) with stop-grad
    toggles. Keep in sync manually — diagnostics only."""
    from sam3_lora_tpu.ops.boxes import box_cxcywh_to_xyxy
    from sam3_lora_tpu.train.matcher import hungarian_match, one_to_many_match

    sp = m.spec
    cfg = sp.model
    b = batch.token_ids.shape[0]
    sg = jax.lax.stop_gradient

    text_mask, text_tokens = m.language_backbone(batch.token_ids, train=train)
    feats = [f[batch.img_ids] for f in feats]
    poss = [p[batch.img_ids] for p in poss]
    lowres = feats[-1]
    h, w = lowres.shape[-2:]
    img_tokens = lowres.reshape(b, cfg.d_model, h * w).transpose(0, 2, 1)
    img_pos = poss[-1].reshape(b, cfg.d_model, h * w).transpose(0, 2, 1)
    geo = batch.geo or GeoPrompt.empty(b, cfg.max_prompt_boxes)
    geo_tokens, geo_mask = m.geometry_encoder(geo, img_tokens, img_pos, (h, w), train=train)
    prompt = jnp.concatenate([text_tokens, geo_tokens], axis=1)
    prompt_mask = jnp.concatenate([text_mask, geo_mask], axis=1)

    memory = m.encoder(img_tokens, img_pos, prompt, prompt_mask, train=train)
    if sg_memory:
        memory, prompt, img_pos = sg(memory), sg(prompt), sg(img_pos)

    apply_dac = cfg.dac and batch.targets is not None
    dec = m.decoder(memory, img_pos, prompt, prompt_mask, (h, w),
                    apply_dac=apply_dac, train=train)
    hs, refs = dec.hs, dec.reference_boxes
    if sg_dec:
        hs = sg(hs)
        dec = dec._replace(
            hs=hs, pred_coords=sg(dec.pred_coords),
            presence_logits=sg(dec.presence_logits),
        )
    n_o2o = cfg.num_queries
    logits = m.dot_prod_scoring(hs, prompt, prompt_mask, train=train)
    coords = dec.pred_coords
    out = {
        "pred_logits": logits[:, :, :n_o2o],
        "pred_boxes": coords[:, :, :n_o2o],
        "pred_boxes_xyxy": box_cxcywh_to_xyxy(coords[:, :, :n_o2o]),
        "presence_logit_dec": dec.presence_logits,
    }
    if apply_dac:
        out["pred_logits_o2m"] = logits[:, :, n_o2o:]
        out["pred_boxes_o2m"] = coords[:, :, n_o2o:]
        out["pred_boxes_xyxy_o2m"] = box_cxcywh_to_xyxy(coords[:, :, n_o2o:])

    tgt = batch.targets
    L = hs.shape[0]
    logits_all = jnp.concatenate([out["pred_logits"], out["pred_logits_o2m"][: L - 1]], 0)
    boxes_all = jnp.concatenate([out["pred_boxes"], out["pred_boxes_o2m"][: L - 1]], 0)
    nprob = 2 * L - 1
    idx_all = hungarian_match(
        logits_all, boxes_all,
        jnp.broadcast_to(tgt.boxes, (nprob,) + tgt.boxes.shape),
        jnp.broadcast_to(tgt.valid, (nprob,) + tgt.valid.shape),
    )
    out["indices"] = idx_all[:L]
    aux_qi = idx_all[L:]
    k = cfg.o2m_topk
    aux_qv = (aux_qi >= 0)[..., None] & tgt.valid[None, ..., None]
    aux_qi = jnp.maximum(aux_qi, 0)[..., None]
    aux_qi = jnp.pad(aux_qi, ((0, 0), (0, 0), (0, 0), (0, k - 1)))
    aux_qv = jnp.pad(aux_qv, ((0, 0), (0, 0), (0, 0), (0, k - 1)))
    last_qi, last_qv = one_to_many_match(
        out["pred_logits_o2m"][L - 1], out["pred_boxes_o2m"][L - 1],
        tgt.boxes, tgt.valid, topk=k,
    )
    out["o2m_indices"] = jnp.concatenate([aux_qi, last_qi[None]], 0)
    out["o2m_valid"] = jnp.concatenate([aux_qv, last_qv[None]], 0)

    last_hs = hs[-1]
    q_o2o = jnp.maximum(out["indices"][-1], 0)
    sel = [last_hs[jnp.arange(b)[:, None], q_o2o]]
    q_o2m = jnp.maximum(out["o2m_indices"][-1], 0) + n_o2o
    sel.append(last_hs[jnp.arange(b)[:, None], q_o2m.reshape(b, -1)])
    queries = jnp.concatenate(sel, axis=1)
    seg = m.segmentation_head(feats, memory, queries, prompt, prompt_mask, (h, w), train=train)
    masks = seg["pred_masks"]
    t = out["indices"].shape[-1]
    out["pred_masks_matched"] = masks[:, :t]
    kk = out["o2m_indices"].shape[-1]
    out["pred_masks_o2m_matched"] = masks[:, t:].reshape(b, t, kk, *masks.shape[-2:])
    return out


def main():
    # exact headline-bench config (see profile_bwd.py note)
    from bench import bench_lora_config, bench_model_config

    cfg = bench_model_config()
    lcfg = bench_lora_config()
    model = build_sam3_image_model(cfg, lora=lcfg)
    rng = np.random.RandomState(0)
    batch = dummy_batch(cfg, batch_size=B, with_targets=True)
    batch = batch.replace(
        images=jnp.asarray(
            rng.randint(0, 256, (B, 3, cfg.img_size, cfg.img_size)), jnp.uint8
        )
    )
    params = init_model_fast(model)
    trainable, frozen = split_trainable(params)
    del params
    if cfg.base_quant != "none" and os.environ.get("BENCH_PREQUANT", "1") == "1":
        from sam3_lora_tpu.ops.quant import prequantize_base

        frozen = prequantize_base(frozen, min_dim=cfg.base_quant_min_dim)
    key = jax.random.PRNGKey(0)

    # precompute trunk features once (frozen trunk; grads not needed here)
    @jax.jit
    def run_trunk(tr, fz, x):
        p = merge_trainable(tr, fz)
        return model.apply(
            {"params": p}, x, train=False,
            method=lambda m, img, train: m.backbone_image(img, train=train),
        )

    feats, poss = run_trunk(trainable, frozen, batch.images)
    feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

    def make_loss(sg_memory, sg_dec):
        def loss(tr, fz, fts, pss, b_, k_):
            p = merge_trainable(tr, fz)
            out = model.apply(
                {"params": p}, fts, pss, b_, sg_memory, sg_dec, True,
                rngs={"dropout": k_}, method=staged_ground,
            )
            return compute_losses(out, b_.targets, LossConfig())["core_loss"]
        return loss

    for name, sgm, sgd in (
        ("ground fwd", None, None),
        ("ground grad FULL", False, False),
        ("ground grad sg(memory)", True, False),
        ("ground grad sg(decoder)", True, True),
    ):
        if sgm is None:
            fn = jax.jit(make_loss(False, False))
        else:
            fn = jax.jit(jax.grad(make_loss(sgm, sgd)))
        bench(name, fn, trainable, frozen, feats, poss, batch, key)


if __name__ == "__main__":
    main()
