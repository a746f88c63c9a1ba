"""SAM1-task interactive image predictor.

Re-design of the reference's ``SAM3InteractiveImagePredictor``
(``sam3/model/sam1_task_predictor.py:22-451``) and the SAM1-task slice of
``Sam3Image.predict_inst`` (``sam3/model/sam3_image.py:599-684``): set an
image once (backbone pass cached), then predict instance masks from point /
box / mask prompts through the SAM heads.

TPU-first shape: prompts are padded to a static slot count so every
``predict`` call hits the same compiled program regardless of how many
clicks the user has made; the no-memory embedding is added to the lowest
feature map exactly as the reference does for the image task
(sam1_task_predictor.py:617-620).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_POINTS = 8  # static point-prompt slots (pad with label -1)


class SAM3InteractiveImagePredictor:
    """Click/box-driven instance segmentation on one image.

    ``processor``: a :class:`~sam3_lora_tpu.processor.Sam3Processor` (supplies
    the shared backbone). ``tracker_params``: TrackerCore params (SAM heads +
    no_mem_embed live there) — converted from the reference tracker
    checkpoint in production, random for smoke tests.
    """

    def __init__(
        self,
        processor,
        tracker_params=None,
        mask_threshold: float = 0.0,
        seed: int = 0,
    ):
        from .models.layers import Spec
        from .models.tracker import TrackerCore

        self.proc = processor
        cfg = processor.cfg
        self.cfg = cfg
        self.mask_threshold = mask_threshold
        fh = fw = cfg.img_size // cfg.patch_size
        self.feat_hw = (fh, fw)
        self.core = TrackerCore(
            Spec(model=cfg, lora=None),
            d_model=cfg.d_model,
            mem_dim=max(cfg.d_model // 4, 8),
            feat_sizes=self.feat_hw,
        )
        if tracker_params is None:
            d = cfg.d_model
            k = jax.random.PRNGKey(seed)

            def init(m):
                vis = jnp.zeros((1, d, fh, fw))
                cond = m.no_memory_features(vis)
                hi = [
                    jnp.zeros((1, d, 4 * fh, 4 * fw)),
                    jnp.zeros((1, d, 2 * fh, 2 * fw)),
                ]
                return m.predict_masks(
                    cond, hi,
                    point_coords=jnp.zeros((1, MAX_POINTS, 2)),
                    point_labels=jnp.full((1, MAX_POINTS), -1, jnp.int32),
                    multimask_output=True,
                )

            tracker_params = self.core.init({"params": k}, method=init)["params"]
        self.params = tracker_params
        self._features: Optional[Dict[str, Any]] = None
        self._orig_size: Optional[Tuple[int, int]] = None

        core = self.core

        def make_predict(multimask: bool):
            @jax.jit
            def _predict(params, vis, hi0, hi1, coords, labels):
                def run(m):
                    cond = m.no_memory_features(vis)
                    return m.predict_masks(
                        cond, [hi0, hi1],
                        point_coords=coords, point_labels=labels,
                        multimask_output=multimask,
                    )

                masks, iou, tokens, obj = core.apply(
                    {"params": params}, method=run
                )
                return masks, iou, obj

            return _predict

        self._predict_jits = {True: make_predict(True), False: make_predict(False)}

    # ------------------------------------------------------------------ #
    def set_image(self, image) -> "SAM3InteractiveImagePredictor":
        """Run the backbone once and cache features (reference
        sam1_task_predictor.py:71-120)."""
        self.proc.set_image(image)
        st = self.proc._state
        feats = st["feats"]
        self._features = {
            "vis": feats[-1],
            "hi0": feats[0],
            "hi1": feats[1],
        }
        self._orig_size = st["orig_size"]
        return self

    def reset_predictor(self) -> None:
        self._features = None
        self._orig_size = None

    def get_image_embedding(self) -> np.ndarray:
        if self._features is None:
            raise RuntimeError("call set_image first")
        return np.asarray(self._features["vis"])

    # ------------------------------------------------------------------ #
    def _prep_prompts(
        self,
        point_coords: Optional[np.ndarray],
        point_labels: Optional[np.ndarray],
        box: Optional[np.ndarray],
        normalize_coords: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pad to MAX_POINTS slots; a box becomes 2 corner points with
        labels 2/3 (the reference's box-as-points convention,
        sam1_task_predictor.py:298-328)."""
        oh, ow = self._orig_size
        r = self.cfg.img_size
        coords = np.zeros((MAX_POINTS, 2), np.float32)
        labels = np.full((MAX_POINTS,), -1, np.int32)
        n = 0
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2)
            coords[0:2] = bx
            labels[0:2] = (2, 3)
            n = 2
        if point_coords is not None:
            pc = np.asarray(point_coords, np.float32).reshape(-1, 2)
            pl = np.asarray(point_labels, np.int32).reshape(-1)
            m = min(len(pc), MAX_POINTS - n)
            coords[n : n + m] = pc[:m]
            labels[n : n + m] = pl[:m]
            n += m
        if normalize_coords:
            coords = coords * np.array([r / ow, r / oh], np.float32)
        return jnp.asarray(coords[None]), jnp.asarray(labels[None])

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (masks (M, H, W) at original size, iou_predictions (M,),
        low_res_masks (M, h, w)) — the reference predict() contract
        (sam1_task_predictor.py:230-297)."""
        if self._features is None:
            raise RuntimeError("call set_image first")
        coords, labels = self._prep_prompts(
            point_coords, point_labels, box, normalize_coords
        )
        f = self._features
        key = bool(multimask_output)
        masks, iou, obj = self._predict_jits[key](
            self.params, f["vis"], f["hi0"], f["hi1"], coords, labels
        )
        # MaskDecoder already selects multimask (3) vs single (1) outputs
        masks = np.asarray(masks[0], np.float32)
        iou = np.asarray(iou[0], np.float32)
        # upscale to the original image size
        oh, ow = self._orig_size
        low_res = masks
        up = jax.image.resize(
            jnp.asarray(masks), (masks.shape[0], oh, ow), "bilinear"
        )
        up = np.asarray(up, np.float32)
        if not return_logits:
            up = up > self.mask_threshold
        return up, iou, low_res

    def predict_batch(
        self,
        images: List,
        point_coords_batch: List,
        point_labels_batch: List,
        multimask_output: bool = True,
    ):
        """Sequential convenience batch (reference predict_batch
        sam1_task_predictor.py:168-229)."""
        out = []
        for img, pc, pl in zip(images, point_coords_batch, point_labels_batch):
            self.set_image(img)
            out.append(
                self.predict(pc, pl, multimask_output=multimask_output)
            )
        return out
