"""sam3-lora-tpu: a TPU-native (JAX/XLA/Pallas) promptable-segmentation
framework with the capabilities of the SAM3-LoRA reference stack.

See SURVEY.md for the structural map of the reference this framework rebuilds.
"""

__version__ = "0.1.0"
