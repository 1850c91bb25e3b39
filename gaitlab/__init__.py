"""gaitlab: TPU-native video-based gait analysis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
lisqzqng/Video-based-gait-analysis-for-dementia (MAX-GRNet):
monocular RGB video -> person tracking -> per-track crops -> HRNet-W32 +
PARE part-attention head -> SMPL body model -> 3D joints / mesh /
rendered overlays -> gait features -> dementia scoring.

Layout (see SURVEY.md §7 blueprint and PARITY.md component map):
  core/      geometry, temporal filters (1-euro scan, median, gaussian)
  body/      SMPL model (blendshapes + LBS), skeleton-format registry
  nn/        HRNet, PARE head, GRNet, gait branch (BiGRU + TS-attention),
             legacy SPIN/HMR, ResNet zoo
  ops/       Pallas TPU kernels (fused blendshapes, attention pooling)
  weights/   PyTorch checkpoint import (3 remap rules) + Orbax cache
  pipeline/  video IO, native C++ loader, on-device crop, detector + SORT,
             bbox/coord utilities, smoothing, k-medoids, runners, datasets
  parallel/  (data, model) device mesh + sharding helpers
  gait/      clinical gait features and dementia scoring
  render/    software rasterizer, skeleton vis, overlay video, GLB export
  cli/       demo / batch_generation / train entry points
  api        high-level analyze_video / gait_report facade
  training   losses, optimizers, jittable train step
  eval       MPJPE / PA-MPJPE / PVE / acceleration metrics
  config     typed config, yacs-YAML compatible
  utils      logging, meters, stage timing, profiler hook
"""

__version__ = "0.1.0"
