"""Explain expected loss magnitudes from the weight dictionary.

Port of the reference's ``analyze_loss.py`` (repo root, 100 LoC), which
documents that a total loss of ~130 at initialization is NORMAL for the
SAM3 weight landscape (README.md:1224-1254): each raw term is O(0.1-1) but
the production weights (bbox 5, giou 2, ce 20, presence 20, mask 200,
dice 10) and the 6 aux decoder layers multiply it up.

Usage:
    python scripts/analyze_loss.py            # static weight breakdown
    python scripts/analyze_loss.py --measure  # one real tiny-model step
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's worked example uses ~0.5 unweighted per term
# (analyze_loss.py: "If each unweighted loss ~ 0.5 ... total ~ 128.5,
# which matches the observed 110-159 range")
TYPICAL_RAW = {
    "loss_bbox": 0.5,
    "loss_giou": 0.5,
    "loss_ce": 0.5,
    "loss_presence": 0.5,
    "loss_mask": 0.5,
    "loss_dice": 0.5,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true",
                   help="run one tiny-model forward + loss on synthetic data")
    args = p.parse_args(argv)

    from sam3_lora_tpu.train.losses import LossConfig

    cfg = LossConfig()
    weights = {
        "loss_bbox": cfg.weight_bbox,
        "loss_giou": cfg.weight_giou,
        "loss_ce": cfg.weight_ce,
        "loss_presence": cfg.weight_presence,
        "loss_mask": cfg.weight_mask,
        "loss_dice": cfg.weight_dice,
    }
    print(f"{'term':16s} {'raw':>7s} {'weight':>7s} {'weighted':>9s}")
    total = 0.0
    for k, raw in TYPICAL_RAW.items():
        w = weights[k]
        total += raw * w
        print(f"{k:16s} {raw:7.2f} {w:7.1f} {raw * w:9.2f}")
    print(f"{'EXPECTED TOTAL':16s} {'':7s} {'':7s} {total:9.1f}")
    print("(matches the reference's observed 110-159 at init — high weights,")
    print(" especially mask 200, NOT a bug; aux decoder layers add similar")
    print(" terms but trend identically. README.md:1224-1254)")

    if args.measure:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.models import build_sam3_image_model, init_model
        from sam3_lora_tpu.models.builder import dummy_batch
        from sam3_lora_tpu.train.losses import compute_losses

        mcfg = tiny_model_config()
        model = build_sam3_image_model(mcfg)
        batch = dummy_batch(mcfg, batch_size=2, with_targets=True)
        params = init_model(model, jax.random.PRNGKey(0))
        out = model.apply({"params": params}, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        losses = compute_losses(out, batch.targets, cfg)
        print("\nmeasured (tiny model, random init, synthetic batch):")
        for k in sorted(losses):
            v = float(np.asarray(losses[k]))
            print(f"  {k:24s} {v:10.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
