"""One-command real-checkpoint pipeline: HF download -> converted base .npz.

    python scripts/fetch_and_convert.py --out checkpoints/sam3_base.npz
    # offline: point at an already-downloaded state dict instead
    python scripts/fetch_and_convert.py --torch-ckpt /path/sam3.pt --out ...

Mirrors the reference's fetch (``sam3/model_builder.py:640-646``:
``hf_hub_download("facebook/sam3", "sam3.pt")``) then runs the strict
name/transpose converter (``scripts/convert_checkpoint.py`` — full coverage
of all 1134 release tensors is asserted by tests/test_parity.py). The
resulting .npz is what ``Trainer(base_checkpoint=...)``,
``Sam3Processor.from_checkpoint`` and the CLIs consume.

Offline behaviour: if the download fails (no network egress), exits 2 with
instructions; nothing is partially written. The golden-prediction test
(tests/test_golden_checkpoint.py) skips cleanly unless the .npz exists or
``SAM3_BASE_NPZ`` points at one.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(out_dir: str) -> str:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub not installed; pass --torch-ckpt instead", file=sys.stderr)
        raise SystemExit(2)
    try:
        return hf_hub_download(
            repo_id="facebook/sam3", filename="sam3.pt", local_dir=out_dir or None
        )
    except Exception as e:  # no egress / gated repo
        print(
            f"download failed ({type(e).__name__}: {e}).\n"
            "If this machine has no network egress, download facebook/sam3's "
            "sam3.pt elsewhere and rerun with --torch-ckpt /path/to/sam3.pt",
            file=sys.stderr,
        )
        raise SystemExit(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-ckpt", help="local sam3.pt (skips the download)")
    ap.add_argument("--out", required=True, help="output base .npz path")
    ap.add_argument("--cache-dir", default="", help="download dir (HF default if empty)")
    args = ap.parse_args()

    ckpt = args.torch_ckpt or fetch(args.cache_dir)

    import numpy as np
    import torch

    from convert_checkpoint import convert_state_dict, our_param_shapes, vit_scan_map
    from sam3_lora_tpu.config import ModelConfig

    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    mc = ModelConfig()
    out = convert_state_dict(
        sd, our_param_shapes(), scan_map=vit_scan_map(mc) if mc.vit_scan_blocks else None
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    tmp = args.out + ".tmp"
    np.savez(tmp, **out)
    os.replace(tmp, args.out)
    print(f"converted {len(out)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
