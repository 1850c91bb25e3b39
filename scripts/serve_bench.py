"""Pinned-artifact dispatch speed vs live-jit on the real TPU.

The serving story (gaitlab/serve.py, docs/serving.md) claims a
deserialized jax.export StableHLO program runs at the same device step
time as the live-traced jit — i.e. pinning costs nothing at runtime.
This measures that claim honestly on the real chip:

  1. build the production runner (qualified mixed precision), export one
     batch-128 bucket to bytes, deserialize it back (the serving-host
     path: serialize -> deserialize forces the full artifact round trip);
  2. time the LIVE jitted forward and the DESERIALIZED program with the
     same device-side dependency chain bench.py uses (block_until_ready
     lies through the axon tunnel — a scalar from iteration i feeds
     iteration i+1, one host sync at the end);
  3. print both ms/iter and the ratio.

Weights are passed as ARGUMENTS in both paths (the jit-constant trap
embeds them as XLA constants and runs 2.3x slower at batch 128 —
docs/PERFORMANCE.md §Serving latency).

Usage (real chip):  python scripts/serve_bench.py [batch]
Writes docs/SERVE_BENCH.json.
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(fwd, variables, smpl, images, iters):
    """Device-dependency-chain wall time for `iters` calls."""
    bias = jnp.zeros((), images.dtype)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, smpl, images + bias)
        # any scalar output feeds the next iteration's input
        bias = (out["theta"][0, 0] * 1e-9).astype(images.dtype)
    float(bias)  # one host sync
    return time.perf_counter() - t0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 8

    from gaitlab import serve
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}, batch {batch}")

    model = GRNet.create()
    runner = GRNetRunner(model, buckets=(batch,))

    # raw_uint8=False: feed f32 crops so the +bias dependency chain works
    live = runner._forward(batch, raw_uint8=False)

    t0 = time.perf_counter()
    exp = serve.export_forward(runner, batch, raw_uint8=False,
                               platforms=("tpu",))
    blob = exp.serialize()
    log(f"export+serialize: {time.perf_counter() - t0:.1f}s, "
        f"{len(blob) / 1e6:.1f} MB")
    from jax import export as jexport

    pinned = jexport.deserialize(blob).call

    variables = runner._trunk_variables()
    smpl = runner._smpl_params()
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(batch, 224, 224, 3)).astype(np.float32), dev)

    results = {}
    for name, fwd in (("live_jit", live), ("pinned_artifact", pinned)):
        t0 = time.perf_counter()
        chain_time(fwd, variables, smpl, images, 1)
        log(f"{name}: compile+first-run {time.perf_counter() - t0:.1f}s")
        chain_time(fwd, variables, smpl, images, 2)  # warm
        dt = chain_time(fwd, variables, smpl, images, iters)
        ms = dt / iters * 1e3
        results[name] = {"ms_per_iter": round(ms, 2),
                         "fps": round(batch * iters / dt, 1)}
        log(f"{name}: {ms:.1f} ms/iter")

    ratio = (results["pinned_artifact"]["ms_per_iter"]
             / results["live_jit"]["ms_per_iter"])
    out = {
        "batch": batch,
        "iters": iters,
        "device": str(dev.device_kind),
        "precision_mode": "backbone high + head bf16 (qualified default)",
        "artifact_mb": round(len(blob) / 1e6, 1),
        **results,
        "pinned_over_live_ratio": round(ratio, 3),
    }
    path = osp.join(osp.dirname(__file__), "..", "docs",
                    "SERVE_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
