"""Small-batch latency study: ms per model step at serving batch sizes.

Complements bench.py (throughput at the batch-128 sweet spot) with the
other serving axis: how long ONE dispatch takes at real-time batch sizes
(a live camera feeds 1-32 crops at a time).

Two numbers per batch size, because this container's axon tunnel adds a
~5-10 ms round trip to EVERY dispatch (docs/INT8_PROBE.json methodology
notes) that a locally-attached TPU host does not pay:

- ``ms_dispatch``: Python-level dependency chain — includes the tunnel
  round trip. This is the serving latency *of this container*.
- ``ms_device``: pure device step time — the model step runs inside one
  jitted ``lax.fori_loop`` (carry consumes a full reduction of the
  outputs so XLA cannot dead-code the network), and the step time is the
  slope between a 32-iter and a 64-iter program, which cancels the
  per-dispatch overhead. This is what a production host would see.

Methodology trap found while writing this (and confirmed twice in fresh
processes): closing the jitted step over the ~250 MB weight pytree embeds
it as XLA *constants*, and the identical chain then measures 194 ms/iter
at batch 128 vs 84 ms with weights passed as jit arguments — a 2.3x
slowdown from constant-embedded parameters alone. All gaitlab product
paths pass weights as arguments (runner._trunk_variables, detect,
serve.py external weights); keep it that way.

Run on the real chip:  python scripts/latency_bench.py
Writes docs/LATENCY.json and prints one JSON line per batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

BATCHES = tuple(int(b) for b in os.environ.get(
    "GAITLAB_LATENCY_BATCHES", "1,8,16,32,64,128").split(","))
CHAIN_ITERS = 16  # python-level chain length (dispatch-inclusive)
LOOP_N = 32       # on-device loop; slope between N and 2N programs
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # the qualified mixed mode (= GRNetRunner's resolved r4 default)
    module = GRNetCore(head_precision="default",
                       backbone_region_precision=(("heads", "w2x"),),
                       backbone_resize_precision="high")
    rng = jax.random.PRNGKey(0)
    variables = module.init(rng, jnp.zeros((1, 224, 224, 3), jnp.float32))
    smpl = body_smpl.synthetic_smpl_params()
    variables, smpl = jax.device_put((variables, smpl), dev)

    def step(variables, smpl, images, bias):
        """One accuracy-qualified model step (backbone high + head bf16).

        variables/smpl MUST be jit *arguments*, not closure constants:
        embedding the ~250 MB weight tree as XLA constants measured 2.2x
        slower at batch 128 (194 vs 86.6 ms/iter, same chip, same chain —
        constant-embedded weights defeat XLA:TPU's layout/aliasing of the
        parameter buffers). bench.py passes them as args for the same
        reason.
        """
        with jax.default_matmul_precision("high"):
            patt = module.apply(variables, images + bias)
            out = vp_regress(smpl, patt, batch_size=1,
                             joint_mode="spin2")[0]
        return out["kp_3d"], out["theta"]

    fwd = jax.jit(step)

    def loop_prog(n):
        @jax.jit
        def f(variables, smpl, images):
            def body(_, carry):
                bias, acc = carry
                kp3d, theta = step(variables, smpl, images, bias)
                # full reduction -> the whole network stays live
                s = kp3d.sum() + theta.sum()
                return s * 1e-12, acc + s
            _, acc = jax.lax.fori_loop(
                0, n, body, (jnp.zeros(()), jnp.zeros(())))
            return acc
        return f

    def timed(f, *args):
        f(*args).block_until_ready()  # compile + warm
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))  # host fetch forces completion through axon
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rows = []
    for b in BATCHES:
        images = jax.device_put(
            jax.random.normal(rng, (b, 224, 224, 3), jnp.float32), dev)

        # dispatch-inclusive: python-level chain
        def chain(n):
            bias = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(n):
                _, theta = fwd(variables, smpl, images, bias)
                bias = theta[0, 0, 0] * 1e-12
            float(bias)  # one host sync at the end
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        chain(1)
        log(f"b={b}: compile+first {time.perf_counter() - t0:.1f}s")
        chain(2)
        ms_dispatch = chain(CHAIN_ITERS) / CHAIN_ITERS * 1e3

        # pure device step: slope between N- and 2N-iter loop programs
        t1 = timed(loop_prog(LOOP_N), variables, smpl, images)
        t2 = timed(loop_prog(2 * LOOP_N), variables, smpl, images)
        ms_device = max(t2 - t1, 1e-9) / LOOP_N * 1e3

        row = {"batch": b,
               "ms_device": round(ms_device, 2),
               "ms_dispatch": round(ms_dispatch, 2),
               "fps_device": round(b / ms_device * 1e3, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "mode": "backbone high + heads w2x + resize high + head bf16 "
                "(qualified r4 default, docs/PRECISION.json)",
        "device": f"{dev.platform} {dev.device_kind}",
        "method": "ms_device = slope((2N-N) fori_loop programs)/N with "
                  "full-reduction carry; ms_dispatch = python chain incl. "
                  "the axon tunnel round trip",
        "chain_iters": CHAIN_ITERS, "loop_n": LOOP_N, "reps_median": REPS,
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "LATENCY.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
