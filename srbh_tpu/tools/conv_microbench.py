"""Raw conv-shape microbenchmark on the TPU (chained-timing recipe).

Times a chain of convs where each conv's OUTPUT is the next conv's INPUT
(square Ci==Co shapes), so an iteration is exactly one conv with no carry
bookkeeping — the isolated-conv variant of this tool was overhead-dominated
(a trunk-shaped conv measured 11 TF/s isolated vs ~100 TF/s inside the real
fused trunk).  Ground truth for choosing between the literal 16-channel
fusion stack, the space-to-depth packed path (ops/s2d.py), and Pallas.

Usage: python -m srbh_tpu.tools.conv_microbench [case,case,...]

Measured (real chip, b256, bf16): lit16 4.71 ms / 16.4 TF/s; g2c16 8.28 ms
(2x lit16's work) / 18.7 TF/s true; g8c16 (batch->group repack, SAME work
as lit16) 15.1 ms / 5.1 TF/s; g16c16 30.2 ms / 2.6 TF/s.  Conclusion:
XLA's grouped-conv lowering DEGRADES with group count (block-diagonalised
dense contraction), so packing 8 images' 16 channels into one 128-channel
8-group conv is 3.2x SLOWER at equal work — lane underfill at 16 output
channels is a hard floor here; do not re-try group packing.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time


import jax
import jax.numpy as jnp


CHAIN = 24
REPEATS = 3
B = 256


def _time_conv(x_shape, k, padding, dtype=jnp.bfloat16, groups=1):
    """ms per conv and effective TFLOP/s for a self-feeding conv chain."""
    c = x_shape[-1]
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, x_shape, jnp.float32).astype(dtype)
    w_shape = (k, k, c // groups, c)
    w = (jax.random.uniform(rng, w_shape, jnp.float32) * (2.0 / (k * k * c))
         ).astype(dtype)

    def one(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), padding, feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    oshape = jax.eval_shape(one, jax.ShapeDtypeStruct(x_shape, dtype),
                            jax.ShapeDtypeStruct(w_shape, dtype)).shape
    assert oshape == x_shape, f"{oshape} != {x_shape}: chain needs same shape"

    @jax.jit
    def chained(x, w):
        def body(i, x):
            return one(x, w)
        x = jax.lax.fori_loop(0, CHAIN, body, x)
        return x.astype(jnp.float32).mean()

    float(chained(x, w))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        s = float(chained(x, w))
        ts.append(time.perf_counter() - t0)
        assert s == s
    ms = statistics.median(ts) / CHAIN * 1000
    n = x_shape[0]
    # true FLOPs: each output channel contracts over c/groups inputs
    flops = 2 * n * oshape[1] * oshape[2] * k * k * c * (c // groups)
    return ms, flops / (ms / 1000) / 1e12


CASES = {
    # the literal fusion-stack conv widths at 256^2
    "lit16": ((B, 256, 256, 16), 3, ((1, 1), (1, 1))),
    "lit32": ((B, 256, 256, 32), 3, ((1, 1), (1, 1))),
    "lit64": ((B, 256, 256, 64), 3, ((1, 1), (1, 1))),
    # trunk-like spatial with narrow channels
    "t64c32": ((B, 64, 64, 32), 3, ((1, 1), (1, 1))),
    "t64c96": ((B, 64, 64, 96), 3, ((1, 1), (1, 1))),
    "t64c192": ((B, 64, 64, 192), 3, ((1, 1), (1, 1))),
    # s2d-packed equivalents: 2x2 kernel, pad (1,0) keeps shape (chainable)
    "pack64": ((B, 128, 128, 64), 2, ((1, 0), (1, 0))),
    "pack128": ((B, 128, 128, 128), 2, ((1, 0), (1, 0))),
    "pack256": ((B, 128, 128, 256), 2, ((1, 0), (1, 0))),
    # f32 control of the hot width
    "lit16_f32": ((B, 256, 256, 16), 3, ((1, 1), (1, 1)), jnp.float32),
    # the two 16-wide heads computed as one grouped conv (block-diagonal)
    "g2c16": ((B, 256, 256, 32), 3, ((1, 1), (1, 1)), jnp.bfloat16, 2),
    "g4c16": ((B, 256, 256, 64), 3, ((1, 1), (1, 1)), jnp.bfloat16, 4),
    # batch->group repack: 8 images' 16 channels as one 128-ch 8-group conv.
    # Work equals lit16 (B images x 16ch); compare ms directly.
    "g8c16": ((B // 8, 256, 256, 128), 3, ((1, 1), (1, 1)), jnp.bfloat16, 8),
    "g16c16": ((B // 16, 256, 256, 256), 3, ((1, 1), (1, 1)), jnp.bfloat16, 16),
}


def main(only=None):
    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()
    out = {}
    for name, spec in CASES.items():
        if only and name not in only:
            continue
        x_shape, k, padding = spec[:3]
        dtype = spec[3] if len(spec) > 3 else jnp.bfloat16
        groups = spec[4] if len(spec) > 4 else 1
        ms, tf = _time_conv(x_shape, k, padding, dtype, groups)
        out[name] = (round(ms, 3), round(tf, 1))
        print(f"{name:10s} {ms:8.3f} ms  {tf:7.1f} TF/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1].split(",") if len(sys.argv) > 1 else None)
