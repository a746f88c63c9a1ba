"""Verify dataset category names tokenize and encode sanely.

Port of the reference's ``check_text_encoding.py`` (repo root, 154 LoC):
for every category in a COCO dataset, tokenize the (lowercased) name,
print token ids, and run the text encoder to confirm finite embeddings —
the quick sanity pass before a category-aware LoRA finetune.

Usage:
    python scripts/check_text_encoding.py --data_dir data --split train [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    p.add_argument("--encode", action="store_true",
                   help="also run the text encoder (builds the model)")
    args = p.parse_args(argv)

    import numpy as np

    from sam3_lora_tpu.config import ModelConfig, tiny_model_config
    from sam3_lora_tpu.models.tokenizer import get_default_tokenizer
    from sam3_lora_tpu.train.data import COCOSegmentDataset

    cfg = tiny_model_config() if args.tiny else ModelConfig()
    ds = COCOSegmentDataset(args.data_dir, args.split, model_config=cfg)
    tok = get_default_tokenizer()
    names = sorted(set(ds.categories.values()))
    print(f"{len(names)} categories in {args.data_dir}/{args.split}")

    ids = np.asarray(tok([n.lower() for n in names],
                         context_length=cfg.text_context_length))
    ok = True
    for name, row in zip(names, ids):
        n_tok = int((row != 0).sum()) - 2  # minus start/end
        trunc = bool(row[-1] != 0)
        flag = "TRUNCATED!" if trunc else "ok"
        if trunc:
            ok = False
        print(f"  {name!r:30s} -> {n_tok:2d} tokens  {flag}")

    if args.encode:
        import jax.numpy as jnp

        from sam3_lora_tpu.models import build_sam3_image_model, init_model_fast

        model = build_sam3_image_model(cfg)
        params = init_model_fast(model)
        mask, tokens = model.apply(
            {"params": params}, jnp.asarray(ids), train=False,
            method=lambda m, i, train: m.language_backbone(i, train=train),
        )
        finite = bool(np.isfinite(np.asarray(tokens)).all())
        print(f"text encoder output finite: {finite}, shape {tokens.shape}")
        ok = ok and finite

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
