"""Numerical parity of the tracker tier vs the reference Sam3TrackerPredictor.

Builds the reference tracker (``model_builder.build_tracker``, random init,
CPU), converts its 309-tensor state dict into our ``TrackerCore`` params via
the same generic converter as the image model, and compares:

* memory encoding (``_encode_new_memory`` core incl. the no-object spatial
  embedding path) — maskmem backbone + occlusion embedding,
* object-pointer projection + temporal PE,
* the FULL memory-conditioned feature path
  (``_prepare_memory_conditioned_features``: cond + non-cond memory frames,
  temporal embeddings, pointer splitting, 4-layer RoPE memory attention)
  against our static-slot ``assemble_memory`` + ``condition_features``.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import HAS_REF, cuda_to_cpu, import_ref

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAS_REF, reason="reference not mounted"),
]

H = W = 72          # stride-14 grid of 1008^2 (fixed by the ref RoPE tables)
D = 256
MEM = 64


@pytest.fixture(scope="module")
def ref_tracker():
    import torch

    torch.manual_seed(0)
    mb = import_ref("sam3.model_builder")
    with cuda_to_cpu():
        trk = mb.build_tracker(apply_temporal_disambiguation=False)
    trk.eval()
    with torch.no_grad():
        gen = torch.Generator().manual_seed(1234)
        for p in trk.parameters():
            if not torch.isfinite(p).all():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
            if p.ndim >= 2:
                p.mul_(0.5)
    return trk


@pytest.fixture(scope="module")
def our_tracker(ref_tracker):
    """TrackerCore + params converted from the reference state dict."""
    scripts = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    )
    sys.path.insert(0, scripts)
    from convert_checkpoint import convert_state_dict

    from flax import traverse_util

    from sam3_lora_tpu.config import ModelConfig
    from sam3_lora_tpu.models.layers import Spec
    from sam3_lora_tpu.models.tracker import TrackerCore

    cfg = ModelConfig(dtype="float32")
    core = TrackerCore(Spec(model=cfg, lora=None), feat_sizes=(H, W))

    def init_all():
        m = TrackerCore(Spec(model=cfg, lora=None), feat_sizes=(H, W))
        vis = jnp.zeros((1, D, H, W))
        mem = jnp.zeros((1, 1, MEM, H, W))
        tp = jnp.zeros((1, 1), jnp.int32)
        val = jnp.ones((1, 1), bool)
        ptr = jnp.zeros((1, 2, D))
        rel = jnp.zeros((1, 2))
        pval = jnp.ones((1, 2), bool)

        def run(mm):
            bank = mm.assemble_memory(mem, mem, tp, val, ptr, rel, pval, num_frames=4)
            cond = mm.condition_features(vis, vis, bank[0], bank[1], bank[2], bank[3])
            enc = mm.encode_memory(vis, jnp.zeros((1, 1, 4 * H, 4 * W)),
                                   object_score_logits=jnp.ones((1, 1)))
            optr = mm.project_obj_ptr(jnp.zeros((1, D)), jnp.ones((1,)))
            ds = mm.downsample_mask_input(jnp.zeros((1, 1, 4 * H, 4 * W)))
            nm = mm.no_memory_features(vis)
            hi = [jnp.zeros((1, D, 4 * H, 4 * W)), jnp.zeros((1, D, 2 * H, 2 * W))]
            # pass a point prompt so point_embeddings / not_a_point_embed
            # materialize; mask_downscaling via a direct embed_masks touch
            masks, iou, tok, obj = mm.predict_masks(
                cond, hi,
                point_coords=jnp.zeros((1, 1, 2)),
                point_labels=jnp.ones((1, 1), jnp.int32),
            )
            dense = mm.sam_prompt_encoder.embed_masks(jnp.zeros((1, 1, 4 * H, 4 * W)))
            return cond, enc, optr, ds, nm, masks, dense

        return m.init({"params": jax.random.PRNGKey(0)}, method=run)

    tree = jax.eval_shape(init_all)["params"]
    tflat = traverse_util.flatten_dict(tree)
    shapes = {".".join(k): tuple(v.shape) for k, v in tflat.items()}
    sd = {k: v.numpy() for k, v in ref_tracker.state_dict().items()}
    flat = convert_state_dict(sd, shapes, strict=True)
    params = traverse_util.unflatten_dict(
        {k: jnp.asarray(flat[".".join(k)], jnp.float32) for k in tflat}
    )
    return core, params


def rel_close(ours, ref, tol, what=""):
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    assert ours.shape == ref.shape, (what, ours.shape, ref.shape)
    assert np.isfinite(ref).all(), f"{what}: reference non-finite"
    assert np.isfinite(ours).all(), f"{what}: ours non-finite"
    diff = np.abs(ours - ref).max()
    scale = np.abs(ref).max() + 1e-9
    assert diff / scale < tol, f"{what}: rel diff {diff / scale} (abs {diff})"


class TestMemoryEncoder:
    def test_encode_new_memory(self, ref_tracker, our_tracker):
        import torch

        core, params = our_tracker
        rng = np.random.RandomState(0)
        pix = rng.randn(1, D, H, W).astype(np.float32) * 0.1
        mask_logits = rng.randn(1, 1, 16 * H, 16 * W).astype(np.float32)

        with torch.no_grad():
            ref_out = ref_tracker.maskmem_backbone(
                torch.from_numpy(pix), torch.sigmoid(torch.from_numpy(mask_logits)),
                skip_mask_sigmoid=True,
            )
        ours = core.apply(
            {"params": params}, jnp.asarray(pix), jnp.asarray(mask_logits),
            method=lambda m, p, ml: m.encode_memory(p, ml),
        )
        rel_close(ours["vision_features"],
                  ref_out["vision_features"].numpy(), 2e-4, "maskmem features")
        rel_close(ours["vision_pos_enc"],
                  ref_out["vision_pos_enc"][-1].numpy(), 2e-4, "maskmem pos")

    def test_no_object_embedding(self, ref_tracker, our_tracker):
        """Occluded frames get no_obj_embed_spatial added
        (sam3_tracker_base.py:843-848)."""
        core, params = our_tracker
        rng = np.random.RandomState(1)
        pix = rng.randn(1, D, H, W).astype(np.float32) * 0.1
        ml = rng.randn(1, 1, 16 * H, 16 * W).astype(np.float32)
        vis = core.apply(
            {"params": params}, jnp.asarray(pix), jnp.asarray(ml),
            method=lambda m, p, x: m.encode_memory(
                p, x, object_score_logits=jnp.full((1, 1), -5.0)
            ),
        )["vision_features"]
        base = core.apply(
            {"params": params}, jnp.asarray(pix), jnp.asarray(ml),
            method=lambda m, p, x: m.encode_memory(
                p, x, object_score_logits=jnp.full((1, 1), 5.0)
            ),
        )["vision_features"]
        import torch

        no_obj = ref_tracker.no_obj_embed_spatial.detach().numpy()  # (1, 64)
        got = np.asarray(vis - base)  # (1, 64, 72, 72), constant per channel
        np.testing.assert_allclose(
            got.mean(axis=(2, 3)), no_obj, rtol=1e-4, atol=1e-5
        )


class TestObjectPointers:
    def test_project_obj_ptr(self, ref_tracker, our_tracker):
        import torch

        core, params = our_tracker
        rng = np.random.RandomState(2)
        tok = rng.randn(2, D).astype(np.float32) * 0.1
        with torch.no_grad():
            ref_vis = ref_tracker.obj_ptr_proj(torch.from_numpy(tok)).numpy()
        ref_occ = ref_tracker.no_obj_ptr.detach().numpy().repeat(2, axis=0)

        ours_vis = core.apply(
            {"params": params}, jnp.asarray(tok), jnp.ones((2,)),
            method=lambda m, t, a: m.project_obj_ptr(t, a),
        )
        ours_occ = core.apply(
            {"params": params}, jnp.asarray(tok), jnp.zeros((2,)),
            method=lambda m, t, a: m.project_obj_ptr(t, a),
        )
        rel_close(ours_vis, ref_vis, 2e-4, "obj_ptr visible")
        rel_close(ours_occ, ref_occ, 2e-4, "obj_ptr occluded")

    def test_tpos_enc(self, ref_tracker, our_tracker):
        import torch

        core, params = our_tracker
        rel = np.array([3.0, 1.0, 2.0], np.float32)
        with torch.no_grad():
            ref_pe = ref_tracker._get_tpos_enc(
                rel.tolist(), device="cpu", max_abs_pos=4
            ).numpy()
        ours = core.apply(
            {"params": params}, jnp.asarray(rel),
            method=lambda m, r: m.obj_ptr_tpos(r, 4),
        )
        rel_close(ours, ref_pe, 2e-4, "tpos enc")


class TestMemoryConditioning:
    def test_full_memory_conditioned_features(self, ref_tracker, our_tracker):
        """The gold test: 1 cond frame + 2 non-cond memory frames + 3 object
        pointers through the 4-layer RoPE memory attention, reference dynamic
        list-concat vs our static slot bank."""
        import torch

        core, params = our_tracker
        rng = np.random.RandomState(3)
        B, num_frames, frame_idx = 1, 4, 3

        # memory features for frames 0 (cond), 1, 2 — from the REF encoder so
        # both sides consume identical banks
        frames = {}
        for t in (0, 1, 2):
            pix = rng.randn(B, D, H, W).astype(np.float32) * 0.1
            ml = rng.randn(B, 1, 16 * H, 16 * W).astype(np.float32)
            with torch.no_grad():
                out = ref_tracker.maskmem_backbone(
                    torch.from_numpy(pix), torch.from_numpy(ml)
                )
            frames[t] = {
                "maskmem_features": out["vision_features"],
                "maskmem_pos_enc": out["vision_pos_enc"],
                "obj_ptr": torch.from_numpy(
                    rng.randn(B, D).astype(np.float32) * 0.1
                ),
            }
        output_dict = {
            "cond_frame_outputs": {0: frames[0]},
            "non_cond_frame_outputs": {1: frames[1], 2: frames[2]},
        }
        vis = rng.randn(H * W, B, D).astype(np.float32) * 0.1
        pos = rng.randn(H * W, B, D).astype(np.float32) * 0.1

        with torch.no_grad(), cuda_to_cpu():
            ref_out = ref_tracker._prepare_memory_conditioned_features(
                frame_idx=frame_idx,
                is_init_cond_frame=False,
                current_vision_feats=[torch.from_numpy(vis)],
                current_vision_pos_embeds=[torch.from_numpy(pos)],
                feat_sizes=[(H, W)],
                output_dict=output_dict,
                num_frames=num_frames,
            ).numpy()

        # ours: static banks in the reference's concat order
        # (cond t_pos=0 first, then non-cond by ascending t_pos:
        #  frame1 -> t_pos=5, frame2 -> t_pos=6 for num_maskmem=7)
        def np_of(t):
            return frames[t]["maskmem_features"].numpy()

        def pos_of(t):
            return frames[t]["maskmem_pos_enc"][-1].numpy()

        mem_feats = jnp.asarray(np.stack([np_of(0), np_of(1), np_of(2)], axis=1))
        mem_pos = jnp.asarray(np.stack([pos_of(0), pos_of(1), pos_of(2)], axis=1))
        mem_tpos = jnp.asarray([[0, 5, 6]], jnp.int32)
        mem_valid = jnp.ones((B, 3), bool)
        # pointers in ref order: cond (rel 3), then t_diff 1 -> frame2,
        # t_diff 2 -> frame1 (frame0 is a selected cond frame, skipped)
        ptrs = jnp.asarray(
            np.stack(
                [frames[0]["obj_ptr"].numpy(), frames[2]["obj_ptr"].numpy(),
                 frames[1]["obj_ptr"].numpy()], axis=1,
            )
        )
        rel = jnp.asarray([[3.0, 1.0, 2.0]])
        pval = jnp.ones((B, 3), bool)

        vis_b = jnp.asarray(vis.transpose(1, 2, 0).reshape(B, D, H, W))
        pos_b = jnp.asarray(pos.transpose(1, 2, 0).reshape(B, D, H, W))

        def run(m):
            mem, mpos, mmask, n_ptr = m.assemble_memory(
                mem_feats, mem_pos, mem_tpos, mem_valid, ptrs, rel, pval,
                num_frames=num_frames,
            )
            return m.condition_features(
                vis_b, pos_b, mem, mpos, mem_mask=mmask,
                num_obj_ptr_tokens=n_ptr,
            )

        ours = core.apply({"params": params}, method=run)
        rel_close(ours, ref_out, 5e-4, "memory-conditioned features")

    def test_no_memory_path(self, ref_tracker, our_tracker):
        """Init cond frame: vision + no_mem_embed, no transformer
        (sam3_tracker_base.py:770-772)."""
        import torch

        core, params = our_tracker
        rng = np.random.RandomState(4)
        vis = rng.randn(H * W, 1, D).astype(np.float32) * 0.1
        with torch.no_grad(), cuda_to_cpu():
            ref_out = ref_tracker._prepare_memory_conditioned_features(
                frame_idx=0,
                is_init_cond_frame=True,
                current_vision_feats=[torch.from_numpy(vis)],
                current_vision_pos_embeds=[torch.from_numpy(vis)],
                feat_sizes=[(H, W)],
                output_dict={"cond_frame_outputs": {}, "non_cond_frame_outputs": {}},
                num_frames=4,
            ).numpy()
        vis_b = jnp.asarray(vis.transpose(1, 2, 0).reshape(1, D, H, W))
        ours = core.apply(
            {"params": params}, vis_b, method=lambda m, v: m.no_memory_features(v)
        )
        rel_close(ours, ref_out, 2e-4, "no-memory features")
