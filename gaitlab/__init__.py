"""gaitlab: TPU-native video-based gait analysis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
lisqzqng/Video-based-gait-analysis-for-dementia (MAX-GRNet):
monocular RGB video -> person tracking -> per-track crops -> HRNet-W32 +
PARE part-attention head -> SMPL body model -> 3D joints / mesh /
rendered overlays -> gait features -> dementia scoring.

Layout (see SURVEY.md section 7):
  core/      geometry, temporal filters
  body/      SMPL model (blendshapes + LBS), skeleton registry
  nn/        HRNet, PARE head, GRNet composition, gait branch
  ops/       Pallas TPU kernels for the hot paths
  weights/   PyTorch checkpoint import (3 remap rules) + Orbax cache
  pipeline/  video IO, on-device crop, tracking, smoothing, runners
  parallel/  device mesh + sharding helpers
  gait/      gait-feature extraction and classification
  render/    host-side visualisation / export
  cli/       flag-compatible demo / batch_generation entry points
"""

__version__ = "0.1.0"
