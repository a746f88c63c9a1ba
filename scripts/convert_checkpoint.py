"""Convert a reference SAM3 PyTorch checkpoint to this framework's flat .npz.

The flax module tree was named so that each parameter's '.'-joined path equals
the reference state-dict key, modulo:

* ``kernel`` <-> ``weight`` for Linear/Conv (with layout transposes below),
* the decoder's boxRPB MLPs live under a ``rpb.`` submodule here
  (``transformer.decoder.rpb.boxRPB_embed_x`` vs reference
  ``transformer.decoder.boxRPB_embed_x``, decoder.py:331-408),
* reference-only buffers/dead params are skipped: per-block RoPE tables
  (``*.attn.freqs_cis`` — computed on the fly here, vitdet.py:41-57) and the
  pixel decoder's unused 3rd stage (``pixel_decoder.{conv_layers,norms}.2.*``
  — built but never executed at scalp=1, maskformer_segmentation.py:181-219).

Layout transforms (torch -> flax):
* Linear weight (out, in) -> kernel (in, out)            [transpose]
* Conv2d weight (out, in, kh, kw) -> (kh, kw, in, out)   [permute 2,3,1,0]
* ConvTranspose2d weight (in, out, kh, kw)               [kept verbatim —
  our ConvTranspose2x2 stores the torch layout and einsums it directly]
* nn.MultiheadAttention in_proj_weight (3d, d) -> (d, 3d) [transpose]
* LayerNorm/GroupNorm/Embedding weights                   [verbatim]

Usage:
    python scripts/convert_checkpoint.py --torch-ckpt sam3.pt --out base.npz
    # or, given a live torch state dict, call convert_state_dict(...)
"""

from __future__ import annotations

import argparse
import fnmatch
import sys
from typing import Dict, Optional, Tuple

import numpy as np

# reference keys with no destination (buffers / dead params)
SKIP_PATTERNS = (
    "*.attn.freqs_cis",
    "segmentation_head.pixel_decoder.conv_layers.2.*",
    "segmentation_head.pixel_decoder.norms.2.*",
)

# reference prefix -> our prefix
RENAMES = (
    ("transformer.decoder.boxRPB_embed_x.", "transformer.decoder.rpb.boxRPB_embed_x."),
    ("transformer.decoder.boxRPB_embed_y.", "transformer.decoder.rpb.boxRPB_embed_y."),
)


def _ref_to_ours_key(ref_key: str) -> str:
    k = ref_key
    if k.startswith("detector."):
        k = k[len("detector."):]
    for src, dst in RENAMES:
        if k.startswith(src):
            k = dst + k[len(src):]
    return k


def convert_tensor(our_key: str, our_shape: Tuple[int, ...], t: np.ndarray) -> np.ndarray:
    """Apply the layout transform that maps the torch tensor onto our param."""
    leaf = our_key.rsplit(".", 1)[-1]
    if leaf == "kernel":
        if t.ndim == 2:
            t = t.T
        elif t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)  # (O,I,kh,kw) -> (kh,kw,I,O)
        else:
            raise ValueError(f"unexpected kernel ndim {t.ndim} for {our_key}")
    elif leaf == "in_proj_weight":
        t = t.T  # (3d, d) -> (d, 3d)
    elif leaf == "text_projection" and tuple(t.shape) != tuple(our_shape):
        t = t.T
    if tuple(t.shape) != tuple(our_shape):
        raise ValueError(
            f"{our_key}: converted shape {t.shape} != model shape {our_shape}"
        )
    return t


def vit_scan_map(cfg) -> Dict[str, Tuple[int, ...]]:
    """{scan module name: (block indices)} for ModelConfig.vit_scan_blocks
    (the windowed runs between global blocks — see models/vit.py)."""
    groups: Dict[str, Tuple[int, ...]] = {}
    run, g = [], 0
    for i in range(cfg.vit_depth):
        if i in cfg.vit_global_blocks:
            if run:
                groups[f"scan_blocks_{g}"] = tuple(run)
            g += 1
            run = []
        else:
            run.append(i)
    if run:
        groups[f"scan_blocks_{g}"] = tuple(run)
    return groups


def _stack_scanned(our_key, our_shape, torch_sd, scan_map):
    """Resolve '...trunk.scan_blocks_g.block.REST' by stacking the per-block
    reference tensors blocks.{i}.REST along a new leading axis."""
    import re

    m = re.match(r"(.*trunk\.)(scan_blocks_\d+)\.block\.(.*)$", our_key)
    if not m or m.group(2) not in scan_map:
        return None, []
    prefix, gname, rest = m.groups()
    ref_rest = rest
    if ref_rest.endswith(".kernel"):
        ref_rest = ref_rest[: -len(".kernel")] + ".weight"
    slot_shape = tuple(our_shape[1:])
    slabs, used = [], []
    for i in scan_map[gname]:
        rk = f"{prefix}blocks.{i}.{ref_rest}"
        if rk not in torch_sd:
            return None, []
        slabs.append(convert_tensor(our_key, slot_shape, np.asarray(torch_sd[rk])))
        used.append(rk)
    return np.stack(slabs), used


def convert_state_dict(
    torch_sd: Dict[str, "np.ndarray"],
    our_shapes: Dict[str, Tuple[int, ...]],
    strict: bool = True,
    scan_map: Optional[Dict[str, Tuple[int, ...]]] = None,
) -> Dict[str, np.ndarray]:
    """torch state dict (numpy values) -> flat dict keyed by our param names.

    ``our_shapes``: {'.'-joined flax path: shape} for all non-adapter params.
    ``scan_map``: vit_scan_map(cfg) when the model uses scanned ViT blocks.
    """
    out: Dict[str, np.ndarray] = {}
    consumed = set()
    unmatched = []

    if scan_map:
        for our_key, shape in our_shapes.items():
            stacked, used = _stack_scanned(our_key, shape, torch_sd, scan_map)
            if stacked is not None:
                out[our_key] = stacked
                consumed.update(used)

    for ref_key, val in torch_sd.items():
        if ref_key in consumed:
            continue
        if any(fnmatch.fnmatch(ref_key, pat) for pat in SKIP_PATTERNS):
            continue
        our_key = _ref_to_ours_key(ref_key)
        want = None
        if our_key in our_shapes:
            want = our_key
        elif our_key.endswith(".weight"):
            cand = our_key[: -len(".weight")] + ".kernel"
            if cand in our_shapes:
                want = cand
        if want is None:
            unmatched.append(ref_key)
            continue
        arr = np.asarray(val)
        out[want] = convert_tensor(want, our_shapes[want], arr)
    missing = set(our_shapes) - set(out)
    if strict and unmatched:
        raise KeyError(
            f"{len(unmatched)} reference tensors had no destination "
            f"(first: {unmatched[:5]})"
        )
    if strict and missing:
        raise KeyError(
            f"{len(missing)} model params not covered by checkpoint "
            f"(first: {sorted(missing)[:5]})"
        )
    return out


def our_param_shapes(model_cfg=None) -> Dict[str, Tuple[int, ...]]:
    """Shape table of the (base) model params via eval_shape (no compute)."""
    import jax
    from flax import traverse_util

    sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
    from sam3_lora_tpu.config import ModelConfig
    from sam3_lora_tpu.models import build_sam3_image_model
    from sam3_lora_tpu.models.builder import dummy_batch

    cfg = model_cfg or ModelConfig()
    model = build_sam3_image_model(cfg)
    batch = dummy_batch(cfg)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    )["params"]
    flat = traverse_util.flatten_dict(shapes)
    return {".".join(k): tuple(v.shape) for k, v in flat.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-ckpt", required=True, help="path to .pt/.pth state dict")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--tiny", action="store_true", help="use the tiny test config")
    args = ap.parse_args()

    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    cfg = None
    if args.tiny:
        from sam3_lora_tpu.config import tiny_model_config

        cfg = tiny_model_config()
    shapes = our_param_shapes(cfg)
    from sam3_lora_tpu.config import ModelConfig, tiny_model_config as _tiny

    mc = _tiny() if args.tiny else ModelConfig()
    out = convert_state_dict(
        sd, shapes, scan_map=vit_scan_map(mc) if mc.vit_scan_blocks else None
    )
    np.savez(args.out, **out)
    print(f"converted {len(out)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
