"""genpose2_tpu — a TPU-native (JAX/XLA/Pallas) category-level 6D pose estimation
framework with the capabilities of GenPose++ / Omni6DPose (reference:
PythonerJOJO/GenPose2, studied at /root/reference).

The framework estimates the 6D pose (rotation + translation) and 3D bounding-box
size of objects from RGB-D + instance masks, category-level, via score-based
diffusion over SE(3) pose candidates, and tracks poses over video.

Subpackages
-----------
- ``so3``        rotation math (quaternion / matrix / 6D conversions, averaging)
- ``ops``        point-cloud kernels (FPS, ball query, grouping) — Pallas + XLA
- ``diffusion``  SDEs, on-device probability-flow ODE / PC / EDM samplers, losses
- ``models``     PointNet++ (MSG + transformer-fused) encoders, Score/Energy/Scale
                 nets, ViT image backbone, composition root
- ``training``   optax-based agents, EMA, checkpointing, trainers
- ``data``       Omni6DPose / BOP(XYZ-IBD) / tracking / inference datasets
- ``eval``       candidate aggregation, symmetry-aware metrics, staged pipelines
- ``parallel``   device-mesh sharding (data x candidate axes), multi-host init
"""

__version__ = "0.1.0"
