"""hyperseg_tpu — a TPU-native JAX/XLA/Pallas re-implementation of the HyperSeg
real-time semantic-segmentation framework (CVPR 2021).

Brand-new functional design: models are static plans built from configs; all
compute paths are pure functions over flat parameter pytrees, jit-compiled for
XLA, with Pallas kernels for the patch-wise dynamic convolutions.

Reference capability map: /root/reference (YuvalNirkin/hyperseg) — see SURVEY.md.
"""

__version__ = "0.1.0"
