"""Decision probe: does int8 conv beat bf16 on v5e at HRNet's hot shapes?

v5e's MXU peak is 2x for int8 vs bf16 (394 vs 197 TOPS), so a quantized
trunk could double the bulk-throughput mode (bf16trunk+high: 3370 fps,
docs/PRECISION.json) — IF XLA actually lowers s8xs8->s32
conv_general_dilated onto the int8 MXU path at these shapes instead of
converting to bf16. This script measures exactly that, per hot shape
(stage3/4 3x3 convs dominate the trunk budget, docs/PERFORMANCE.md
stage table).

Methodology: through the axon tunnel a SINGLE dispatch costs ~5-10 ms,
which swamps sub-ms kernels — a Python-level dependency chain (bench.py
style) measures dispatch rate at these sizes, not kernel time (first
version of this probe reported 0.5-2.6 TFLOP/s for everything). So the
dependency chain lives ON DEVICE in one jitted `lax.fori_loop` program,
and kernel time is the SLOPE between an N-iter and a 2N-iter program
(differencing cancels the per-dispatch overhead and the loop-carry cost
shared by both).

Decision rule (recorded in docs/PERFORMANCE.md): build the quantized
trunk only if int8 wins >=1.5x on the stage3/4 shapes; otherwise record
the negative and close the line.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# (name, N, H, W, Cin, Cout, stride) — batch-128 deployment shapes from
# the docs/PERFORMANCE.md stage table
SHAPES = [
    ("stage3_br2_3x3", 128, 14, 14, 128, 128, 1),
    ("stage3_br1_3x3", 128, 28, 28, 64, 64, 1),
    ("stage4_br3_3x3", 128, 7, 7, 256, 256, 1),
    ("layer1_3x3", 128, 56, 56, 64, 64, 1),
    ("stem_conv2", 128, 112, 112, 64, 64, 2),
]
ITERS = 384  # inner on-device loop count (the 2N program runs 2x this)
REPS = 5     # host-level repeats per program; median taken


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_loop(n_iters: int, stride: int, acc_dtype):
    """One jitted program: n_iters convs chained by a device-side scalar."""

    @partial(jax.jit, static_argnames=())
    def f(x, w):
        def body(_, carry):
            bias, acc = carry
            y = jax.lax.conv_general_dilated(
                x + bias, w, window_strides=(stride, stride),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype)
            # FULL reduction of y feeds the next iteration: a single-element
            # slice lets XLA narrow the conv to one output position (DCE —
            # the first loop version measured identical N and 2N times)
            s = y.sum()
            bias2 = (s % jnp.asarray(2, s.dtype)).astype(x.dtype)
            return bias2, acc + s.astype(jnp.float32)

        init = (jnp.zeros((), x.dtype), jnp.zeros((), jnp.float32))
        _, acc = jax.lax.fori_loop(0, n_iters, body, init)
        return acc

    return f


def timed(f, x, w, reps=REPS):
    f(x, w).block_until_ready()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x, w))  # host fetch of the scalar = real completion
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    rng = np.random.default_rng(0)
    rows = []
    for name, n, h, w_, cin, cout, s in SHAPES:
        x_f = rng.normal(size=(n, h, w_, cin)).astype(np.float32)
        w_f = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05
        x8 = np.clip(np.round(x_f * 20), -126, 126).astype(np.int8)
        w8 = np.clip(np.round(w_f * 400), -127, 127).astype(np.int8)

        macs = n * (h // s) * (w_ // s) * cout * cin * 9
        res = {"shape": name, "macs_G": round(macs / 1e9, 2)}
        for label, xx, ww, acc in (
                ("bf16", x_f.astype(jnp.bfloat16),
                 w_f.astype(jnp.bfloat16), jnp.float32),
                ("int8", x8, w8, jnp.int32)):
            xx, ww = jax.device_put((jnp.asarray(xx), jnp.asarray(ww)), dev)
            try:
                t1 = timed(make_loop(ITERS, s, acc), xx, ww)
                t2 = timed(make_loop(2 * ITERS, s, acc), xx, ww)
                log(f"{name} {label}: N-prog {t1 * 1e3:.1f} ms, "
                    f"2N-prog {t2 * 1e3:.1f} ms")
                dt = max((t2 - t1) / ITERS, 1e-9)  # slope = per-conv time
                res[label + "_ms"] = round(dt * 1e3, 4)
                res[label + "_TOPs"] = round(2 * macs / dt / 1e12, 1)
            except Exception as e:  # noqa: BLE001 — record and move on
                res[label + "_error"] = str(e)[:200]
        if res.get("bf16_ms") and res.get("int8_ms"):
            res["int8_speedup"] = round(res["bf16_ms"] / res["int8_ms"], 2)
        rows.append(res)
        print(json.dumps(res), flush=True)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
