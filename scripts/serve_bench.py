"""Pinned-artifact dispatch speed vs live-jit on the real TPU.

The serving story (gaitlab/serve.py, docs/serving.md) claims a
deserialized jax.export StableHLO program runs at the same device step
time as the live-traced jit — i.e. pinning costs nothing at runtime.
This measures that claim honestly on the real chip:

  1. build the production runner (qualified mixed precision), export one
     batch-128 bucket to bytes, deserialize it back (the serving-host
     path: serialize -> deserialize forces the full artifact round trip);
  2. time the LIVE jitted forward and the DESERIALIZED program with the
     device-side dependency chain COMPILED INTO the program (ADVICE r3:
     the earlier version ran the chain arithmetic — images+bias, theta
     scalar extraction — as eager ops through the axon tunnel, where each
     eager op costs a full dispatch round trip, so it reported ~37x the
     true device step time);
  3. report ms_device (chain), ms_fetch + output MB (one full D2H
     materialization), the H2D link probe, and the pinned/live ratio.

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

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def h2d_link_probe(dev) -> float:
    """Measured H2D MB/s, forced materialization (bench_e2e.link_probe
    technique: a bare device_put returns before the bytes move)."""
    fn = jax.jit(lambda x: x.astype(jnp.float32).sum())
    buf = np.random.default_rng(0).integers(
        0, 255, size=(12, 1024, 1024), dtype=np.uint8)
    float(fn(jax.device_put(buf[:1], dev)))  # compile
    t0 = time.perf_counter()
    float(fn(jax.device_put(buf, dev)))
    return round(12.0 / (time.perf_counter() - t0), 1)


def make_chained(fwd):
    """One COMPILED step carrying the dependency chain: iteration i's
    scalar output feeds i+1's input inside the jitted program, so a timed
    loop costs one dispatch per iteration and wall time covers real
    device execution (exported calls are jit-composable)."""

    @jax.jit
    def step(variables, smpl, images, bias):
        out = fwd(variables, smpl, images + bias)
        return (out["theta"][0, 0] * 1e-9).astype(images.dtype)

    return step


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
    regions = runner.resolved_region_precision()
    precision_mode = (f"backbone {runner.precision} + head "
                      f"{runner.resolved_head_precision() or 'inherit'}"
                      + "".join(f" + {r} {p}" for r, p in regions)
                      + f" + resize {runner.resolved_resize_precision()}"
                      + (f" + trunk {runner.trunk_dtype}"
                         if runner.trunk_dtype else ""))

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

    link_mbps = h2d_link_probe(dev)
    log(f"H2D link probe: {link_mbps} MB/s")

    results = {}
    for name, fwd in (("live_jit", live), ("pinned_artifact", pinned)):
        step = make_chained(fwd)

        def chain(n):
            bias = jnp.zeros((), images.dtype)
            t0 = time.perf_counter()
            for _ in range(n):
                bias = step(variables, smpl, images, bias)
            float(bias)  # one host sync
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        chain(1)
        log(f"{name}: compile+first-run {time.perf_counter() - t0:.1f}s")
        chain(2)  # warm
        dt = chain(iters)
        ms = dt / iters * 1e3

        # one full-output D2H materialization (what a serving host fetches)
        out = fwd(variables, smpl, images)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        host = jax.tree_util.tree_map(np.asarray, out)
        fetch_ms = (time.perf_counter() - t0) * 1e3
        out_mb = sum(v.nbytes for v in jax.tree_util.tree_leaves(host)) / 1e6

        results[name] = {"ms_device": round(ms, 2),
                         "fps_device": round(batch * iters / dt, 1),
                         "ms_fetch_all_outputs": round(fetch_ms, 1),
                         "output_mb": round(out_mb, 2)}
        log(f"{name}: {ms:.1f} ms/iter device, fetch {fetch_ms:.0f} ms "
            f"({out_mb:.1f} MB)")

    ratio = (results["pinned_artifact"]["ms_device"]
             / results["live_jit"]["ms_device"])
    out = {
        "batch": batch,
        "iters": iters,
        "device": str(dev.device_kind),
        "precision_mode": precision_mode,
        "artifact_mb": round(len(blob) / 1e6, 1),
        "h2d_link_MBps": link_mbps,
        "note": ("ms_device is compiled-chain device step time; "
                 "ms_fetch_all_outputs is the one-time D2H cost through "
                 "the tunnel link above — a serving host fetches only the "
                 "outputs it needs (runner fetch=...)"),
        **results,
        "pinned_over_live_ratio": round(ratio, 3),
    }
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "docs", "SERVE_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
