"""SAM interactive-head parity vs the reference sam/ modules (small dims)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import HAS_REF, import_ref

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAS_REF, reason="reference not mounted"),
]

D = 32          # transformer dim (reference: 256)
HW = 8          # feature grid (reference: 72)
IMG = 112       # input image size (reference: 1008)


def _convert(ref_sd, our_shapes):
    scripts = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    )
    sys.path.insert(0, scripts)
    from convert_checkpoint import convert_state_dict

    return convert_state_dict(
        {k: v.detach().numpy() for k, v in ref_sd.items()}, our_shapes, strict=True
    )


def _tree_from_flat(tree_shapes, flat):
    from flax import traverse_util

    out = {k: jnp.asarray(flat[".".join(k)], jnp.float32) for k in tree_shapes}
    return traverse_util.unflatten_dict(out)


@pytest.fixture(scope="module")
def spec():
    from sam3_lora_tpu.config import tiny_model_config
    from sam3_lora_tpu.models.layers import Spec

    return Spec(model=tiny_model_config())


class TestTwoWayTransformer:
    def test_parity(self, spec):
        import torch

        from flax import traverse_util
        from sam3_lora_tpu.models.sam_heads import TwoWayTransformer

        torch.manual_seed(1)
        ref_mod = import_ref("sam3.sam.transformer")
        ref = ref_mod.TwoWayTransformer(
            depth=2, embedding_dim=D, num_heads=4, mlp_dim=64
        ).eval()

        ours = TwoWayTransformer(
            spec, depth=2, embedding_dim=D, num_heads=4, mlp_dim=64
        )
        rng = np.random.RandomState(0)
        img = rng.randn(2, D, HW, HW).astype(np.float32)
        pe = rng.randn(2, D, HW, HW).astype(np.float32)
        pts = rng.randn(2, 5, D).astype(np.float32)

        shapes = jax.eval_shape(
            lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(img),
                              jnp.asarray(pe), jnp.asarray(pts))
        )["params"]
        tshapes = traverse_util.flatten_dict(shapes)
        flat = _convert(
            ref.state_dict(), {".".join(k): tuple(v.shape) for k, v in tshapes.items()}
        )
        params = _tree_from_flat(tshapes, flat)

        with torch.no_grad():
            rq, rk = ref(
                torch.from_numpy(img), torch.from_numpy(pe), torch.from_numpy(pts)
            )
        oq, ok = ours.apply(
            {"params": params}, jnp.asarray(img), jnp.asarray(pe), jnp.asarray(pts)
        )
        np.testing.assert_allclose(np.asarray(oq), rq.detach().numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ok), rk.detach().numpy(), atol=2e-5)


class TestPromptEncoder:
    @pytest.fixture(scope="class")
    def pair(self, spec):
        import torch
        from flax import traverse_util
        from sam3_lora_tpu.models.sam_heads import PromptEncoder

        torch.manual_seed(2)
        ref_mod = import_ref("sam3.sam.prompt_encoder")
        ref = ref_mod.PromptEncoder(
            embed_dim=D, image_embedding_size=(HW, HW),
            input_image_size=(IMG, IMG), mask_in_chans=16,
        ).eval()
        ours = PromptEncoder(
            spec, embed_dim=D, image_embedding_size=(HW, HW),
            input_image_size=(IMG, IMG), mask_in_chans=16,
        )
        shapes = jax.eval_shape(
            lambda: ours.init(
                jax.random.PRNGKey(0),
                points=(jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32)),
                masks=jnp.zeros((1, 1, 4 * HW, 4 * HW)),
            )
        )["params"]
        tshapes = traverse_util.flatten_dict(shapes)
        flat = _convert(
            ref.state_dict(),
            {".".join(k): tuple(v.shape) for k, v in tshapes.items()},
        )
        return ref, ours, _tree_from_flat(tshapes, flat)

    def test_points_and_boxes(self, pair):
        import torch

        ref, ours, params = pair
        rng = np.random.RandomState(3)
        coords = (rng.rand(2, 3, 2) * IMG).astype(np.float32)
        labels = np.array([[1, 0, 1], [1, -1, -1]], np.int32)
        boxes = np.array(
            [[[4.0, 6.0, 50.0, 60.0]], [[10.0, 10.0, 80.0, 90.0]]], np.float32
        )
        with torch.no_grad():
            r_sparse, r_dense = ref(
                points=(torch.from_numpy(coords), torch.from_numpy(labels)),
                boxes=torch.from_numpy(boxes.reshape(2, 4)),
                masks=None,
            )
        o_sparse, o_dense = ours.apply(
            {"params": params},
            points=(jnp.asarray(coords), jnp.asarray(labels)),
            boxes=jnp.asarray(boxes),
        )
        np.testing.assert_allclose(np.asarray(o_sparse), r_sparse.detach().numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(o_dense), r_dense.detach().numpy(), atol=2e-5)

    def test_mask_prompt_and_dense_pe(self, pair):
        import torch

        ref, ours, params = pair
        rng = np.random.RandomState(4)
        mask = rng.randn(2, 1, 4 * HW, 4 * HW).astype(np.float32)
        with torch.no_grad():
            _, r_dense = ref(points=None, boxes=None, masks=torch.from_numpy(mask))
            r_pe = ref.get_dense_pe()
        _, o_dense = ours.apply({"params": params}, masks=jnp.asarray(mask), batch=2)
        o_pe = ours.apply({"params": params}, method=lambda m: m.get_dense_pe())
        np.testing.assert_allclose(np.asarray(o_dense), r_dense.detach().numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(o_pe), r_pe.detach().numpy(), atol=2e-5)


class TestMaskDecoder:
    def test_parity_multimask_and_single(self, spec):
        import torch
        from flax import traverse_util
        from sam3_lora_tpu.models.sam_heads import MaskDecoder

        torch.manual_seed(5)
        tr_mod = import_ref("sam3.sam.transformer")
        md_mod = import_ref("sam3.sam.mask_decoder")
        ref = md_mod.MaskDecoder(
            num_multimask_outputs=3,
            transformer=tr_mod.TwoWayTransformer(
                depth=2, embedding_dim=D, mlp_dim=64, num_heads=4
            ),
            transformer_dim=D,
            iou_head_depth=3,
            iou_head_hidden_dim=32,
            use_high_res_features=True,
            iou_prediction_use_sigmoid=True,
            pred_obj_scores=True,
            pred_obj_scores_mlp=True,
            use_multimask_token_for_obj_ptr=True,
            dynamic_multimask_via_stability=True,
        ).eval()

        ours = MaskDecoder(
            spec, transformer_dim=D, iou_head_hidden_dim=32,
            twoway_heads=4, twoway_mlp_dim=64,
        )
        rng = np.random.RandomState(6)
        img = rng.randn(2, D, HW, HW).astype(np.float32)
        pe = rng.randn(1, D, HW, HW).astype(np.float32)
        sparse = rng.randn(2, 3, D).astype(np.float32)
        dense = rng.randn(2, D, HW, HW).astype(np.float32)
        s0 = rng.randn(2, D // 8, 4 * HW, 4 * HW).astype(np.float32)
        s1 = rng.randn(2, D // 4, 2 * HW, 2 * HW).astype(np.float32)

        args = dict(multimask_output=True, high_res_features=[jnp.asarray(s0), jnp.asarray(s1)])
        shapes = jax.eval_shape(
            lambda: ours.init(
                jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(pe),
                jnp.asarray(sparse), jnp.asarray(dense), **args,
            )
        )["params"]
        tshapes = traverse_util.flatten_dict(shapes)
        # our transformer lives under "transformer." like the reference
        flat = _convert(
            ref.state_dict(),
            {".".join(k): tuple(v.shape) for k, v in tshapes.items()},
        )
        params = _tree_from_flat(tshapes, flat)

        for multimask in (True, False):
            with torch.no_grad():
                rm, riou, rtok, robj = ref(
                    torch.from_numpy(img), torch.from_numpy(pe),
                    torch.from_numpy(sparse), torch.from_numpy(dense),
                    multimask_output=multimask, repeat_image=False,
                    high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
                )
            om, oiou, otok, oobj = ours.apply(
                {"params": params}, jnp.asarray(img), jnp.asarray(pe),
                jnp.asarray(sparse), jnp.asarray(dense),
                multimask_output=multimask,
                high_res_features=[jnp.asarray(s0), jnp.asarray(s1)],
            )
            np.testing.assert_allclose(
                np.asarray(om), rm.detach().numpy(), atol=5e-5,
                err_msg=f"masks multimask={multimask}",
            )
            np.testing.assert_allclose(np.asarray(oiou), riou.detach().numpy(), atol=5e-5)
            np.testing.assert_allclose(np.asarray(otok), rtok.detach().numpy(), atol=5e-5)
            np.testing.assert_allclose(np.asarray(oobj), robj.detach().numpy(), atol=5e-5)
