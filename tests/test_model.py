import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam3_lora_tpu.config import LoRAConfig, ModelConfig, tiny_model_config
from sam3_lora_tpu.models import (
    Batch,
    GeoPrompt,
    Targets,
    build_sam3_image_model,
    dummy_batch,
    init_model,
)
from sam3_lora_tpu.models.lora import (
    count_parameters,
    load_lora_weights,
    lora_mask,
    lora_module_names,
    lora_optimizer,
    merge_lora_into_base,
    save_lora_weights,
    split_params,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_model_config()
    model = build_sam3_image_model(cfg)
    params = init_model(model, jax.random.PRNGKey(0))
    return cfg, model, params


def _rand_batch(cfg, b=2, with_targets=False, seed=0):
    rng = np.random.RandomState(seed)
    r = cfg.img_size
    targets = None
    if with_targets:
        t = cfg.max_targets
        boxes = np.zeros((b, t, 4), np.float32)
        boxes[..., :2] = 0.3 + 0.4 * rng.rand(b, t, 2)
        boxes[..., 2:] = 0.05 + 0.2 * rng.rand(b, t, 2)
        valid = np.zeros((b, t), bool)
        valid[:, :2] = True
        m = cfg.mask_loss_resolution
        targets = Targets(
            boxes=jnp.array(boxes),
            valid=jnp.array(valid),
            masks=jnp.array((rng.rand(b, t, m, m) > 0.7).astype(np.float32)),
            mask_valid=jnp.array(valid),
            is_exhaustive=jnp.ones((b,), bool),
        )
    tok = np.zeros((b, cfg.text_context_length), np.int32)
    tok[:, 0] = 49406
    tok[:, 1] = 320
    tok[:, 2] = 49407
    return Batch(
        images=jnp.array(rng.randn(b, 3, r, r).astype(np.float32)),
        token_ids=jnp.array(tok),
        img_ids=jnp.arange(b, dtype=jnp.int32),
        geo=GeoPrompt.empty(b, cfg.max_prompt_boxes),
        targets=targets,
    )


class TestForward:
    def test_eval_shapes(self, tiny):
        cfg, model, params = tiny
        batch = _rand_batch(cfg, b=2)
        out = model.apply({"params": params}, batch, train=False)
        L, Q = cfg.dec_layers, cfg.num_queries
        assert out["pred_logits"].shape == (L, 2, Q, 1)
        assert out["pred_boxes"].shape == (L, 2, Q, 4)
        assert out["presence_logit_dec"].shape == (L, 2, 1)
        m = cfg.mask_loss_resolution
        assert out["pred_masks"].shape == (2, Q, m, m)
        # boxes are valid probabilities
        pb = np.array(out["pred_boxes"])
        assert np.all(pb >= 0) and np.all(pb <= 1)
        assert np.isfinite(np.array(out["pred_logits"])).all()

    def test_train_shapes_dac_and_matching(self, tiny):
        cfg, model, params = tiny
        batch = _rand_batch(cfg, b=2, with_targets=True)
        out = model.apply(
            {"params": params}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        L, Q, T, K = cfg.dec_layers, cfg.num_queries, cfg.max_targets, cfg.o2m_topk
        assert out["pred_logits"].shape == (L, 2, Q, 1)
        assert out["pred_logits_o2m"].shape == (L, 2, Q, 1)
        assert out["indices"].shape == (L, 2, T)
        assert out["o2m_indices"].shape == (L, 2, T, K)
        idx = np.array(out["indices"])
        valid = np.array(batch.targets.valid)
        # valid targets matched to distinct queries in range
        for li in range(L):
            for bi in range(2):
                qs = idx[li, bi][valid[bi]]
                assert np.all(qs >= 0) and np.all(qs < Q)
                assert len(set(qs.tolist())) == len(qs)
                assert np.all(idx[li, bi][~valid[bi]] == -1)
        m = cfg.mask_loss_resolution
        assert out["pred_masks_matched"].shape == (2, T, m, m)
        assert out["pred_masks_o2m_matched"].shape == (2, T, K, m, m)

    def test_deterministic_eval(self, tiny):
        cfg, model, params = tiny
        batch = _rand_batch(cfg, b=1)
        o1 = model.apply({"params": params}, batch, train=False)
        o2 = model.apply({"params": params}, batch, train=False)
        np.testing.assert_array_equal(
            np.array(o1["pred_logits"]), np.array(o2["pred_logits"])
        )


class TestLoRA:
    def test_default_targets_match_vit_mlp_only(self):
        """Reference semantics: with the stock module names, the default
        q_proj/k_proj/v_proj/out_proj targets match NOTHING, and the full
        config's fc1/fc2 match exactly the ViT MLPs (64 modules on the real
        model; 2*depth on tiny)."""
        cfg = tiny_model_config()
        lcfg = LoRAConfig(
            rank=2, alpha=4.0,
            target_modules=("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"),
        )
        model = build_sam3_image_model(cfg, lora=lcfg)
        params = init_model(model, jax.random.PRNGKey(0))
        names = lora_module_names(params)
        assert all(".mlp.fc" in n for n in names)
        assert all("vision_backbone.trunk." in n for n in names)
        # scanned layout: fc1/fc2 per scan group (stacked over blocks) plus
        # per global block; flat layout: 2 per block
        if cfg.vit_scan_blocks:
            n_groups = sum(
                1 for i in range(cfg.vit_depth) if i in cfg.vit_global_blocks
            )
            expected = 2 * (n_groups + len(cfg.vit_global_blocks))
        else:
            expected = 2 * cfg.vit_depth
        assert len(names) == expected

    def test_component_gating(self):
        cfg = tiny_model_config()
        lcfg = LoRAConfig(
            rank=2, alpha=4.0,
            target_modules=("fc1", "fc2", "linear1", "linear2"),
            apply_to_vision_encoder=False,
            apply_to_detr_encoder=True,
            apply_to_detr_decoder=False,
            apply_to_geometry_encoder=False,
        )
        model = build_sam3_image_model(cfg, lora=lcfg)
        params = init_model(model, jax.random.PRNGKey(0))
        names = lora_module_names(params)
        assert names, "expected encoder linears targeted"
        assert all("transformer.encoder" in n for n in names)

    def test_zero_init_forward_parity(self, tiny):
        """LoRA with zero-init B must not change the forward (the reference's
        test_lora_injection.py parity anchor)."""
        cfg, base_model, base_params = tiny
        lcfg = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
        lora_model = build_sam3_image_model(cfg, lora=lcfg)
        lora_params = init_model(lora_model, jax.random.PRNGKey(0))
        # graft base weights into the lora param tree
        from flax import traverse_util

        bflat = traverse_util.flatten_dict(base_params)
        lflat = traverse_util.flatten_dict(lora_params)
        for k, v in bflat.items():
            assert k in lflat
            lflat[k] = v
        lora_params = traverse_util.unflatten_dict(lflat)

        batch = _rand_batch(cfg, b=1)
        out_base = base_model.apply({"params": base_params}, batch, train=False)
        out_lora = lora_model.apply({"params": lora_params}, batch, train=False)
        np.testing.assert_allclose(
            np.array(out_base["pred_logits"]),
            np.array(out_lora["pred_logits"]),
            atol=1e-6,
        )

    def test_masked_optimizer_updates_only_lora(self):
        """The JAX analogue of the reference's requires_grad check
        (test_lora_injection.py:105-136): a masked optimizer step changes
        adapter leaves (dL/dB != 0 even at B=0) and leaves base frozen."""
        import optax
        from flax import traverse_util

        cfg = tiny_model_config()
        lcfg = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
        model = build_sam3_image_model(cfg, lora=lcfg)
        params = init_model(model, jax.random.PRNGKey(0))
        batch = _rand_batch(cfg, b=1)

        def loss_fn(p):
            out = model.apply({"params": p}, batch, train=False)
            return jnp.sum(out["pred_logits"] ** 2)

        grads = jax.grad(loss_fn)(params)
        mask = lora_mask(params)
        tx = lora_optimizer(optax.sgd(1.0), params)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new_params = optax.apply_updates(params, updates)

        pflat = traverse_util.flatten_dict(params)
        nflat = traverse_util.flatten_dict(new_params)
        mflat = traverse_util.flatten_dict(mask)
        base_changed = sum(
            float(jnp.abs(nflat[k] - pflat[k]).sum())
            for k in pflat if not mflat[k]
        )
        lora_b_changed = sum(
            float(jnp.abs(nflat[k] - pflat[k]).sum())
            for k in pflat if k[-1] == "lora_b"
        )
        assert base_changed == 0.0
        assert lora_b_changed > 0.0

    def test_save_load_merge(self):
        cfg = tiny_model_config()
        lcfg = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
        model = build_sam3_image_model(cfg, lora=lcfg)
        params = init_model(model, jax.random.PRNGKey(0))
        stats = count_parameters(params)
        assert stats["trainable_parameters"] > 0
        assert stats["trainable_percentage"] < 10.0

        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "lora.npz")
            n = save_lora_weights(params, path)
            assert n == 4 * cfg.vit_depth  # a+b per fc1/fc2 per block
            params2, loaded = load_lora_weights(params, path)
            assert loaded == n

        # merging zero-B adapters leaves kernels unchanged
        merged = merge_lora_into_base(params, lcfg)
        base, lora = split_params(merged)
        assert not lora
