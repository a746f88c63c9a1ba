"""Tests for the Hydra-style DI config tier (utils/instantiate.py)."""

import functools

import pytest

from sam3_lora_tpu.utils.instantiate import instantiate, locate, resolve


def test_locate_class():
    cls = locate("sam3_lora_tpu.config.LoRAConfig")
    from sam3_lora_tpu.config import LoRAConfig

    assert cls is LoRAConfig


def test_locate_nested_attr():
    fn = locate("sam3_lora_tpu.ops.boxes.box_cxcywh_to_xyxy")
    assert callable(fn)


def test_locate_missing_raises():
    with pytest.raises(ImportError):
        locate("sam3_lora_tpu.no.such.Thing")


def test_resolve_interpolation_types():
    cfg = {
        "base": {"lr": 0.001, "name": "run1"},
        "optim": {"lr": "${base.lr}", "tag": "exp-${base.name}"},
    }
    out = resolve(cfg)
    assert out["optim"]["lr"] == 0.001          # type preserved
    assert out["optim"]["tag"] == "exp-run1"    # embedded stringifies


def test_resolve_chained():
    cfg = {"a": 7, "b": "${a}", "c": "${b}"}
    assert resolve(cfg)["c"] == 7


def test_resolve_cycle_detected():
    cfg = {"a": "${b}", "b": "${a}"}
    with pytest.raises(RecursionError):
        resolve(cfg)


def test_instantiate_dataclass():
    cfg = {
        "_target_": "sam3_lora_tpu.config.LoRAConfig",
        "rank": 16,
        "alpha": 32.0,
    }
    obj = instantiate(cfg)
    assert obj.rank == 16 and obj.alpha == 32.0


def test_instantiate_nested_with_interpolation():
    cfg = {
        "rank": 8,
        "lora": {
            "_target_": "sam3_lora_tpu.config.LoRAConfig",
            "rank": "${rank}",
            "alpha": 16.0,
        },
    }
    out = instantiate(cfg)
    assert out["lora"].rank == 8


def test_instantiate_partial():
    cfg = {
        "_target_": "sam3_lora_tpu.config.LoRAConfig",
        "_partial_": True,
        "alpha": 64.0,
    }
    fn = instantiate(cfg)
    assert isinstance(fn, functools.partial)
    obj = fn(rank=32)
    assert obj.rank == 32 and obj.alpha == 64.0


def test_instantiate_overrides():
    cfg = {"_target_": "sam3_lora_tpu.config.LoRAConfig", "rank": 4}
    obj = instantiate(cfg, rank=64)
    assert obj.rank == 64


def test_instantiate_list_nodes():
    cfg = [
        {"_target_": "sam3_lora_tpu.config.LoRAConfig", "rank": 1},
        {"_target_": "sam3_lora_tpu.config.LoRAConfig", "rank": 2},
    ]
    objs = instantiate(cfg)
    assert [o.rank for o in objs] == [1, 2]
