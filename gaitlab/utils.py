"""Logging, meters, profiling (reference lib/utils/utils.py:68-160 roles).

The checkpoint-remapping utilities that lived alongside these in the
reference (load_ckpt_w_prefix :185, load_pretrained_model :198) are in
gaitlab.weights.torch_import; the training-schedule helpers (:68-135) are
superseded by optax schedules in gaitlab.training.
"""

from __future__ import annotations

import contextlib
import logging
import os
import os.path as osp
import time
from typing import Optional


def create_logger(logdir: str, phase: str = "train") -> logging.Logger:
    """File+console logger (reference utils.py:138-151)."""
    os.makedirs(logdir, exist_ok=True)
    log_file = osp.join(logdir, f"{time.strftime('%Y-%m-%d_%H-%M-%S')}_{phase}.log")
    logging.basicConfig(filename=log_file, format="%(asctime)-15s %(message)s")
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    console = logging.StreamHandler()
    logging.getLogger("").addHandler(console)
    return logger


class AverageMeter:
    """Running average (reference utils.py:154-168)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


class StageTimer:
    """Per-stage wall-clock telemetry, replacing the reference's scattered
    time.time() brackets (demo.py:77,128,235-252) with one structured
    report; `fps(n)` reproduces the end-of-run FPS print format."""

    def __init__(self):
        self.stages: dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t

    def total(self) -> float:
        return time.time() - self._t0

    def report(self) -> str:
        lines = [f"  {k}: {v:.2f}s" for k, v in self.stages.items()]
        return "\n".join(lines + [f"  total: {self.total():.2f}s"])

    def fps(self, num_frames: int, stage: Optional[str] = None) -> float:
        dt = self.stages.get(stage, self.total()) if stage else self.total()
        return num_frames / dt if dt > 0 else 0.0


def enable_compile_cache(cache_dir: Optional[str] = None) -> bool:
    """Turn on JAX's persistent compilation cache (idempotent).

    Cold XLA compiles dominate every cold start on this stack — the full
    qualified GRNet takes 146-470s through the TPU tunnel and 3-5 min on
    CPU — while cached repeat compiles load in seconds (measured 470s ->
    15.7s, bench.py). Called by the runner and every CLI entry point so
    any repeat invocation of the same program shape is warm. Opt out with
    GAITLAB_NO_COMPILE_CACHE=1 (e.g. when diagnosing compiler issues).
    Returns True when the cache is active.
    """
    import jax

    if os.environ.get("GAITLAB_NO_COMPILE_CACHE"):
        return False
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        current = None
    if current and cache_dir is None:
        # An embedding application already configured a cache dir; the
        # implicit runner-construction call must not clobber it. An
        # explicit cache_dir argument still overrides.
        return True
    cache_dir = cache_dir or os.path.expanduser("~/.cache/gaitlab/xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False  # older jax without the persistent cache


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None):
    """jax.profiler trace option (SURVEY.md §5 tracing plan). Set
    GAITLAB_PROFILE=/path or pass logdir to capture a TensorBoard trace of
    the jitted pipeline; no-op otherwise."""
    import jax

    logdir = logdir or os.environ.get("GAITLAB_PROFILE")
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
