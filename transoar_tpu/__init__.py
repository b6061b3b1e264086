"""transoar_tpu — a TPU-native framework for Transformer-based 3D
organs-at-risk detection in CT volumes.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
bwittmann/transoar PyTorch reference (see SURVEY.md): AttnFPN 3D-conv/Swin
backbone, Focused Decoder / DETR / Deformable-DETR necks, anchor-based set
matching with BCE/L1/GIoU losses, RetinaNet baseline, COCO/nnDetection mAP
evaluation — all as pjit-shardable, fixed-shape, on-device computation.
"""

__version__ = "0.1.0"
