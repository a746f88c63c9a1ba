from .coco_map import evaluate_coco_map
from .cgf1 import evaluate_cgf1

__all__ = ["evaluate_coco_map", "evaluate_cgf1"]
