"""Trainer + parallel integration tests (8 virtual CPU devices via conftest)."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from sam3_lora_tpu.config import LoRAConfig, TrainConfig, tiny_model_config
from sam3_lora_tpu.parallel import make_mesh, param_shardings, shard_batch
from sam3_lora_tpu.train.data import (
    COCOSegmentDataset,
    DataLoader,
    make_synthetic_coco,
)
from sam3_lora_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def coco_root():
    d = tempfile.mkdtemp(prefix="cocotest_")
    make_synthetic_coco(d, "train", num_images=8, img_size=64)
    make_synthetic_coco(d, "valid", num_images=4, img_size=64, seed=1)
    return d


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
        mesh2 = make_mesh(n_devices=4, model_parallel=2)
        assert mesh2.shape == {"data": 2, "model": 2}

    def test_shard_batch_places_on_data_axis(self, coco_root):
        cfg = tiny_model_config()
        ds = COCOSegmentDataset(coco_root, "train", model_config=cfg)
        batch = next(DataLoader(ds, 8, shuffle=False).epoch(0))
        mesh = make_mesh()
        sb = shard_batch(batch, mesh)
        # leading axis split across 8 devices
        assert len(sb.images.sharding.device_set) == 8

    def test_fsdp_param_sharding(self):
        from sam3_lora_tpu.models import build_sam3_image_model, init_model

        cfg = tiny_model_config()
        lcfg = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
        model = build_sam3_image_model(cfg, lora=lcfg)
        params = init_model(model, jax.random.PRNGKey(0))
        mesh = make_mesh(n_devices=8)
        sh = param_shardings(params, mesh, shard_base=True)
        flat_p = jax.tree_util.tree_leaves_with_path(params)
        flat_s = dict(
            (jax.tree_util.keystr(p), s)
            for p, s in jax.tree_util.tree_leaves_with_path(sh)
        )
        n_sharded = sum(
            1 for p, _ in flat_p
            if not flat_s[jax.tree_util.keystr(p)].is_fully_replicated
        )
        assert n_sharded > 0, "expected some fsdp-sharded base kernels"
        # adapters stay replicated
        for p, _ in flat_p:
            ks = jax.tree_util.keystr(p)
            if "lora_" in ks:
                assert flat_s[ks].is_fully_replicated


class TestTrainer:
    def test_fit_two_epochs_with_val_and_checkpoints(self, coco_root):
        cfg = tiny_model_config()
        out = tempfile.mkdtemp(prefix="trainout_")
        tr = Trainer(
            model_cfg=cfg,
            lora_cfg=LoRAConfig(rank=4, alpha=8.0, target_modules=("fc1", "fc2")),
            train_cfg=TrainConfig(
                batch_size=4, num_epochs=2, logging_steps=1, output_dir=out,
                gradient_accumulation_steps=2, learning_rate=1e-3,
            ),
        )
        ds = COCOSegmentDataset(coco_root, "train", model_config=cfg)
        vds = COCOSegmentDataset(coco_root, "valid", model_config=cfg)
        res = tr.fit(DataLoader(ds, 4, seed=0), DataLoader(vds, 4, shuffle=False))
        assert res["steps"] == 4
        assert np.isfinite(res["history"]["train_loss"]).all()
        assert np.isfinite(res["best_val_loss"])
        for f in ("best_lora.npz", "last_lora.npz", "train_stats.json", "val_stats.json"):
            assert os.path.exists(os.path.join(out, f)), f
        assert tr.load_adapters(os.path.join(out, "best_lora.npz")) == 16

    def test_nan_loss_raises(self, coco_root):
        cfg = tiny_model_config()
        out = tempfile.mkdtemp(prefix="trainout_")
        tr = Trainer(
            model_cfg=cfg,
            lora_cfg=LoRAConfig(rank=4, alpha=8.0, target_modules=("fc1", "fc2")),
            train_cfg=TrainConfig(
                batch_size=4, num_epochs=1, logging_steps=1, output_dir=out,
                learning_rate=1e38,  # guaranteed blow-up
            ),
        )
        ds = COCOSegmentDataset(coco_root, "train", model_config=cfg)
        with pytest.raises(FloatingPointError):
            tr.fit(DataLoader(ds, 4, seed=0), None, num_epochs=2)


class TestResume:
    def test_save_load_state_roundtrip_and_auto_resume(self, coco_root):
        cfg = tiny_model_config()
        out = tempfile.mkdtemp(prefix="resume_")
        kw = dict(
            model_cfg=cfg,
            lora_cfg=LoRAConfig(rank=4, alpha=8.0, target_modules=("fc1", "fc2")),
            train_cfg=TrainConfig(
                batch_size=4, num_epochs=2, logging_steps=1, output_dir=out,
                learning_rate=1e-3,
            ),
        )
        ds = COCOSegmentDataset(coco_root, "train", model_config=cfg)
        tr = Trainer(**kw)
        res1 = tr.fit(DataLoader(ds, 4, seed=0), None)
        assert os.path.exists(os.path.join(out, "train_state.npz"))
        snap = {k: np.asarray(v).copy() for k, v in tr.state.trainable.items()}

        # a fresh trainer in the same output dir resumes past both epochs:
        # fit() returns immediately with no new steps
        tr2 = Trainer(**kw)
        res2 = tr2.fit(DataLoader(ds, 4, seed=0), None)
        assert res2["steps"] == res1["steps"]  # resumed counter, no new work
        for k, v in tr2.state.trainable.items():
            np.testing.assert_array_equal(np.asarray(v), snap[k])

        # extending epochs continues training and changes adapters
        tr3 = Trainer(**kw)
        tr3.fit(DataLoader(ds, 4, seed=0), None, num_epochs=3)
        changed = sum(
            float(np.abs(np.asarray(v) - snap[k]).sum())
            for k, v in tr3.state.trainable.items()
        )
        assert changed > 0.0


class TestDataParallelEquivalence:
    def test_dp_step_matches_single_device(self, coco_root):
        """One jitted train step on an 8-device data-sharded batch produces
        the SAME updated adapters and loss as the unsharded step — i.e. the
        sharding-propagated gradient all-reduce is numerically exact (the
        TPU-native replacement for DDP's allreduce, SURVEY §2.8)."""
        import jax.numpy as jnp
        import optax

        from sam3_lora_tpu.config import ModelConfig
        from sam3_lora_tpu.models import build_sam3_image_model, init_model
        from sam3_lora_tpu.train.losses import LossConfig
        from sam3_lora_tpu.train.trainer import (
            make_train_step,
            split_trainable,
        )

        cfg = tiny_model_config(
            enc_dropout=0.0, dec_dropout=0.0, vit_drop_path_rate=0.0
        )
        lcfg = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
        model = build_sam3_image_model(cfg, lora=lcfg)
        ds = COCOSegmentDataset(coco_root, "train", model_config=cfg)
        loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1)
        batch = next(iter(loader.epoch(0)))

        params = init_model(model, jax.random.PRNGKey(0))
        trainable, frozen = split_trainable(params)
        tx = optax.sgd(1e-2)  # deterministic, state-light

        step = make_train_step(model, tx, LossConfig())
        key = jax.random.PRNGKey(7)

        # single device (default placement)
        t1, _, l1 = step(
            jax.tree_util.tree_map(jnp.array, trainable), frozen,
            tx.init(trainable), batch, key,
        )

        # 8-device data-parallel placement
        mesh = make_mesh()
        sb = shard_batch(batch, mesh)
        shardings = param_shardings(params, mesh)
        put = lambda tree: jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x)), tree
        )
        from sam3_lora_tpu.parallel import replicated

        rep = replicated(mesh)
        t_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep), trainable
        )
        f_sh = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep), frozen
        )
        t8, _, l8 = step(t_sh, f_sh, tx.init(t_sh), sb, key)

        np.testing.assert_allclose(
            float(l1["core_loss"]), float(l8["core_loss"]), rtol=2e-5
        )
        for k in t1:
            np.testing.assert_allclose(
                np.asarray(t1[k]), np.asarray(t8[k]), rtol=5e-5, atol=1e-7,
                err_msg=str(k),
            )
