"""Param-group optimizer construction with pattern matching + layer decay.

Re-design of the reference's ``sam3/train/optim/optimizer.py``:

* ``construct_optimizer`` (optimizer.py:295-375) builds torch param groups as
  a cross-product of per-option scheduler configs matched by unix-pattern
  param names, validating full non-overlapping coverage. Here each *group*
  is a dict ``{"patterns": [...], "lr_scale": float, "weight_decay": float}``
  and the groups become one ``optax.multi_transform`` whose label pytree is
  derived by first-match-wins over the flattened param path — the same
  coverage validation (every param matched, no param matched twice within a
  group's patterns) applies.
* ``layer_decay_param_modifier`` (optimizer.py:418-498) scales the lr of
  ViT-backbone params by ``decay^(n_layers - layer_id)`` via ``get_layer_id``
  on the param path. Works on LoRA adapters too (they live at the same
  paths).

Pattern syntax is ``fnmatch`` over the '/'-joined param path, matching the
reference's unix-pattern semantics.
"""

from __future__ import annotations

import fnmatch
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import optax

__all__ = [
    "path_str",
    "get_vit_layer_id",
    "layer_decay_scales",
    "make_grouped_optimizer",
]


def path_str(path: Tuple[str, ...]) -> str:
    return "/".join(str(p) for p in path)


# --- ViT layer-wise lr decay (reference get_layer_id, optimizer.py:418-470) --


_SCAN_RE = re.compile(r"scan_blocks_(\d+)")
_BLOCK_RE = re.compile(r"blocks?[_./](\d+)")


def get_vit_layer_id(path: str, num_layers: int, cfg=None) -> int:
    """Layer index for decay: patch embed / pos embed -> 0, block i -> i+1,
    everything else (neck, downstream) -> num_layers + 1 (no decay).

    Handles both the flat ``blocks.{i}`` param tree and the scanned layout
    (``scan_blocks_{g}`` holds the stacked run of windowed blocks before
    global block g — vit.py _scan_groups). Stacked runs share ONE leaf, so
    the whole run gets the decay of its middle block (the reference decays
    per block, optimizer.py:418-470; per-slice lr inside a stacked leaf is
    not expressible, and the midpoint bounds the error at decay^(run/2)).
    """
    if "patch_embed" in path or "pos_embed" in path:
        return 0
    m = _SCAN_RE.search(path)
    if m:
        g = int(m.group(1))
        globals_ = sorted(cfg.vit_global_blocks) if cfg else [7, 15, 23, 31]
        start = 0 if g == 0 else globals_[g - 1] + 1
        end = globals_[g] - 1  # last windowed block of the run
        return (start + end) // 2 + 1
    m = _BLOCK_RE.search(path)
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1


def layer_decay_scales(
    flat_params: Dict[Tuple[str, ...], Any],
    decay: float,
    num_layers: int = 32,
    vit_prefix: str = "trunk",
    cfg=None,
) -> Dict[Tuple[str, ...], float]:
    """Per-leaf lr multiplier ``decay^(num_layers + 1 - layer_id)`` for ViT
    params, 1.0 elsewhere (reference layer_decay_param_modifier)."""
    scales = {}
    for k in flat_params:
        p = path_str(k)
        if vit_prefix in p:
            lid = get_vit_layer_id(p, num_layers, cfg)
            scales[k] = decay ** (num_layers + 1 - lid)
        else:
            scales[k] = 1.0
    return scales


# --- grouped optimizer (reference construct_optimizer) ----------------------


def _match_group(path: str, groups: Sequence[Dict]) -> Optional[int]:
    for gi, g in enumerate(groups):
        hits = [pat for pat in g["patterns"] if fnmatch.fnmatch(path, pat)]
        if len(hits) > 1:
            raise ValueError(
                f"param '{path}' matched {len(hits)} patterns in group {gi}: {hits}"
                " (reference requires non-overlapping coverage)"
            )
        if hits:
            return gi
    return None


def make_grouped_optimizer(
    flat_params: Dict[Tuple[str, ...], Any],
    base_lr_schedule,
    groups: Optional[Sequence[Dict]] = None,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    layer_decay: Optional[float] = None,
    num_vit_layers: int = 32,
    model_cfg=None,
) -> Tuple[optax.GradientTransformation, Dict[Tuple[str, ...], str]]:
    """Build an AdamW whose lr/weight-decay vary per param group.

    ``groups``: ordered list of {"patterns": [fnmatch...], "lr_scale": f,
    "weight_decay": f (optional)}. A trailing implicit default group catches
    the rest (lr_scale 1, the global weight_decay). With ``layer_decay`` set,
    each group is further split by the ViT layer-decay multiplier — the
    cross-product-of-options construction of the reference.

    Returns (tx, labels) where labels maps each param path to its group name
    (exposed for tests / logging, mirroring the reference's validation).
    """
    groups = list(groups or [])
    ld_scales = (
        layer_decay_scales(
            flat_params, layer_decay, num_vit_layers, cfg=model_cfg
        )
        if layer_decay is not None
        else {k: 1.0 for k in flat_params}
    )

    # label = (group index or 'default', layer-decay scale)
    labels: Dict[Tuple[str, ...], str] = {}
    combos: Dict[str, Tuple[float, float]] = {}  # label -> (lr_scale, wd)
    for k in flat_params:
        p = path_str(k)
        gi = _match_group(p, groups)
        if gi is None:
            lr_scale, wd = 1.0, weight_decay
            gname = "default"
        else:
            lr_scale = float(groups[gi].get("lr_scale", 1.0))
            wd = float(groups[gi].get("weight_decay", weight_decay))
            gname = groups[gi].get("name", f"group{gi}")
        s = lr_scale * ld_scales[k]
        label = f"{gname}|{s:.6g}|{wd:.6g}"
        combos[label] = (s, wd)
        labels[k] = label

    transforms = {}
    for label, (s, wd) in combos.items():
        transforms[label] = optax.adamw(
            learning_rate=lambda step, _s=s: base_lr_schedule(step) * _s,
            b1=b1, b2=b2, eps=eps, weight_decay=wd,
        )
    tx = optax.multi_transform(transforms, param_labels=labels)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx, labels
