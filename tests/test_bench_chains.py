"""The timed bench chains must be LICM-proof.

Round-5 finding (measured on chip): XLA's WhileLoopInvariantCodeMotion
hoisted the frozen-SR feature pass out of ``train_bench``'s step chain —
the batch was loop-invariant, and the frozen-SR forward depends only on
``sr_params`` + batch, so the whole 135-GFLOP/tile pass ran ONCE instead
of once per chained iteration, inflating the reported train throughput by
~60% (398 t/s @ b128 vs the honest number). The smoking gun was a
loss-FORWARD-only timing exceeding the "full step" timing.

This test compiles the tool's actual chain (``train_bench.build_chained``)
at toy scale with full XLA optimisations and asserts every convolution in
the optimised module is reachable from the while-loop body
(``srbh_tpu/tools/_hlo.py``). A deliberately loop-invariant chain is
compiled alongside to prove the detector sees LICM fire on this stack (it
hoists exactly the SR trunk's convolutions).

ISOLATION: the compiles run in a SUBPROCESS with
``JAX_DISABLE_MOST_OPTIMIZATIONS=0``. LICM only fires with the full
optimisation pipeline, and the first full-opt compile reconfigures
process-global XLA:CPU codegen state (observed: ``cpu_aot_loader``
machine-feature mismatch warnings and, downstream, a ~2e-3 numeric shift
in the torch train-step oracle when it ran later in the same process).
Flipping ``jax_disable_most_optimizations`` in-process and restoring it
is NOT enough — the process is already poisoned.

The inference bench chain (bench.py) threads its input through the carry
and is covered by construction; conv_microbench/profile_flagship likewise.
"""
import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import json, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "0"  # LICM needs full opts
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", \
    "cpu override regressed: refusing to compile over the TPU tunnel"

from srbh_tpu import models
from srbh_tpu.tools._hlo import conv_placement
from srbh_tpu.tools.train_bench import build_chained
from srbh_tpu.train.state import TrainState
from srbh_tpu.train.steps import make_train_step

dtype = jnp.float32
rng = jax.random.PRNGKey(0)
sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=4, dtype=dtype)
model = models.SRRegressClsFeature(
    encoder_name="efficientnet-test", super_mid=4, isaggre=True,
    chans_build=7, dtype=dtype)
B, T = 1, 32
x = jax.random.uniform(rng, (B, T, T, 8), jnp.float32)
sr_params = jax.jit(sr.init)(rng, x[..., :3])
variables = jax.jit(model.init)(rng, x, jnp.zeros((B, T * 4, T * 4, 8), dtype))
state = TrainState.create(variables, n_log_vars=3, lr=1e-3)
ks = jax.random.split(rng, 3)
batch = {
    "image": x,
    "height": jax.random.uniform(ks[0], (B, T * 4, T * 4)) * 30,
    "height_aggre": jax.random.uniform(ks[1], (B, T, T)) * 30,
    "build": jax.random.randint(ks[2], (B, T * 4, T * 4), 0, 7),
    "weight": jnp.ones((B, T * 4, T * 4)),
    "weight_aggre": jnp.ones((B, T, T)),
}
step = make_train_step(model, sr, isaggre=True, seed=1)

honest = build_chained(step, chain=2)
t_h, b_h = conv_placement(honest.lower(state, sr_params, batch)
                          .compile().as_text())

@jax.jit
def invariant(state, sr_params, batch_dict):
    def body(i, carry):
        st, _ = carry
        return step(st, sr_params, batch_dict, jnp.float32(1e-3))
    return jax.lax.fori_loop(
        0, 2, body, (state, {"loss": jnp.float32(0),
                             "rmse": jnp.float32(0),
                             "log_vars": state.log_vars}))

t_i, b_i = conv_placement(invariant.lower(state, sr_params, batch)
                          .compile().as_text())
print(json.dumps({"honest": [t_h, b_h], "invariant": [t_i, b_i]}))
"""


@pytest.fixture(scope="module")
def placements():
    # JAX_COMPILATION_CACHE_DIR stripped too: jax seeds its config from
    # it, and a warm /tmp/jaxcache would feed the full-opt subprocess
    # persistent XLA:CPU AOT entries — the exact machine-feature-mismatch
    # reload class this isolation exists to quarantine (same reason
    # __graft_entry__._bootstrap_virtual_mesh pops it)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "JAX_DISABLE_MOST_OPTIMIZATIONS",
                        "JAX_COMPILATION_CACHE_DIR")}
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, capture_output=True,
        text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, f"subprocess failed:\n{out.stderr[-4000:]}"
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_train_bench_chain_keeps_all_convs_in_loop(placements):
    total, in_body = placements["honest"]
    assert total > 50, f"parse failure? only {total} convolutions found"
    assert in_body == total, (
        f"LICM hoisted {total - in_body}/{total} convolutions out of the "
        "bench chain — the timed loop no longer covers the full train step")


def test_detector_sees_licm_fire_on_invariant_chain(placements):
    # the same chain WITHOUT the carry-dependent image: XLA must hoist the
    # frozen-SR convolutions (this is the measured round-4 bug; if this
    # starts failing, the stack stopped hoisting and the guard above is
    # moot — re-measure on chip before relaxing anything)
    total, in_body = placements["invariant"]
    assert in_body < total, (
        "expected XLA to hoist the loop-invariant frozen-SR pass; it "
        "did not — the LICM guard test is no longer exercising anything")
