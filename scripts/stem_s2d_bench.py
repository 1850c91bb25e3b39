"""Stem space-to-depth experiment on the real TPU (VERDICT r2 next-step #8).

The deployed stem conv1 sees (128,224,224,3): 3 channels in the lane
dimension is the worst-case TPU layout, and docs/PERFORMANCE.md measured
the stem at 7.2 ms of the 101 ms `high` budget at <=29% MXU peak. The
untried idea: evaluate conv1 on the space-to-depth packed grid
(112,112,12) as a 2x2 stride-1 conv (gaitlab.nn.hrnet.StemConvS2D —
identical math, tests/test_packed_conv.py), i.e. 4x the lane occupancy at
48/27 = 1.78x the nominal MACs (zero-padded taps).

Measures, with the bench.py device-dependency-chain discipline:
  * stem-only (stop_after="stem") standard vs packed, `high` + `default`;
  * full GRNet forward standard vs packed at `high` (the production mode).

Appends the result to docs/PERFORMANCE.md by hand afterwards; prints JSON.
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

BATCH = 128
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(fwd, variables, x, iters=ITERS, warm=2):
    """Chained iterations, one host sync at the end (axon discipline).

    fwd signature: (variables, x, bias) with the bias-add INSIDE the jit —
    an eager per-iteration `x + bias` through the tunnel costs a dispatch
    round trip each and dominates the measurement (observed 3.4 s/iter
    artifacts vs the real ~60 ms)."""
    import jax.numpy as jnp

    def run(n):
        bias = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            o = fwd(variables, x, bias)
            bias = o * 1e-12
        float(bias)
        return time.perf_counter() - t0

    run(warm)
    return run(iters) / iters


def main():
    import contextlib

    import jax
    import jax.numpy as jnp

    from gaitlab.nn.hrnet import HRNetCfg, PoseHighResolutionNet

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(BATCH, 224, 224, 3)).astype(np.float32)))

    results = {}

    # ---- stem-only -------------------------------------------------------
    net_std = PoseHighResolutionNet(HRNetCfg.w(32), stop_after="stem")
    net_s2d = PoseHighResolutionNet(HRNetCfg.w(32, stem_s2d=True),
                                    stop_after="stem")
    full_std = PoseHighResolutionNet(HRNetCfg.w(32))
    # full variables (CPU init: tracing through the tunnel is minutes);
    # the stem-only applies just use the prefix
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = full_std.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 224, 224, 3), jnp.float32))
    variables = jax.device_put(variables)

    for prec in ("high", "default"):
        ctx = (jax.default_matmul_precision(prec) if prec != "default"
               else contextlib.nullcontext())
        with ctx:
            f_std = jax.jit(
                lambda v, im, b: net_std.apply(v, im + b).sum())
            f_s2d = jax.jit(
                lambda v, im, b: net_s2d.apply(v, im + b).sum())
            # equality check once (same variables, same math)
            zero = jnp.zeros((), jnp.float32)
            a = float(f_std(variables, x[:4], zero))
            b = float(f_s2d(variables, x[:4], zero))
            assert abs(a - b) / max(abs(a), 1e-6) < 1e-3, (a, b)
            t_std = chain_time(f_std, variables, x)
            t_s2d = chain_time(f_s2d, variables, x)
        results[f"stem_{prec}_std_ms"] = round(t_std * 1e3, 2)
        results[f"stem_{prec}_s2d_ms"] = round(t_s2d * 1e3, 2)
        log(f"stem[{prec}]: std {t_std * 1e3:.2f} ms  "
            f"s2d {t_s2d * 1e3:.2f} ms")

    # ---- full backbone at `high` (the production mode) -------------------
    full_s2d = PoseHighResolutionNet(HRNetCfg.w(32, stem_s2d=True))
    with jax.default_matmul_precision("high"):
        g_std = jax.jit(lambda v, im, b: full_std.apply(v, im + b).sum())
        g_s2d = jax.jit(lambda v, im, b: full_s2d.apply(v, im + b).sum())
        t_std = chain_time(g_std, variables, x, iters=6)
        t_s2d = chain_time(g_s2d, variables, x, iters=6)
    results["backbone_high_std_ms"] = round(t_std * 1e3, 2)
    results["backbone_high_s2d_ms"] = round(t_s2d * 1e3, 2)
    log(f"backbone[high]: std {t_std * 1e3:.2f} ms  "
        f"s2d {t_s2d * 1e3:.2f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
