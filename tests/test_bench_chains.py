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
the optimised module is reachable from the while-loop body. A deliberately
loop-invariant chain is compiled alongside to prove the detector sees LICM
fire on this stack (it hoists exactly the SR trunk's convolutions).

The inference bench chain (bench.py) threads its input through the carry
and is covered by construction; conv_microbench/profile_flagship likewise.
"""
import re

import pytest

import jax
import jax.numpy as jnp

from srbh_tpu import models
from srbh_tpu.tools.train_bench import build_chained
from srbh_tpu.train.state import TrainState
from srbh_tpu.train.steps import make_train_step


def _computations(hlo_text):
    """Map computation name -> list of instruction lines."""
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"^(ENTRY\s+)?(%[\w.\-]+)\s*\(.*\{\s*$", line)
        if m:
            cur = m.group(2)
            comps[cur] = []
        elif cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comps[cur].append(line)
    return comps


_CALL_KEYS = ("calls=", "to_apply=", "body=", "condition=")
_CONV = re.compile(r"=\s*\S+\s+convolution\(")


def _convs_reachable(comps, name, seen):
    if name in seen:
        return 0
    seen.add(name)
    lines = comps.get(name, ())
    n = sum(1 for l in lines if _CONV.search(l))
    for l in lines:
        for key in _CALL_KEYS:
            for m in re.finditer(key + r"(%[\w.\-]+)", l):
                n += _convs_reachable(comps, m.group(1), seen)
        for m in re.finditer(r"branch_computations=\{([^}]*)\}", l):
            for c in m.group(1).split(","):
                n += _convs_reachable(comps, c.strip(), seen)
    return n


def _conv_placement(hlo_text):
    """(total convolutions, convolutions reachable from while bodies)."""
    comps = _computations(hlo_text)
    total = sum(1 for l in hlo_text.splitlines() if _CONV.search(l))
    bodies = set(re.findall(r"body=(%[\w.\-]+)", hlo_text))
    seen = set()
    in_body = sum(_convs_reachable(comps, b, seen) for b in bodies)
    return total, in_body


@pytest.fixture(scope="module")
def toy_step():
    dtype = jnp.float32
    rng = jax.random.PRNGKey(0)
    sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=4, dtype=dtype)
    model = models.SRRegressClsFeature(
        encoder_name="efficientnet-test", super_mid=4, isaggre=True,
        chans_build=7, dtype=dtype)
    B, T = 1, 32
    x = jax.random.uniform(rng, (B, T, T, 8), jnp.float32)
    sr_params = jax.jit(sr.init)(rng, x[..., :3])
    variables = jax.jit(model.init)(
        rng, x, jnp.zeros((B, T * 4, T * 4, 8), dtype))
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
    return step, state, sr_params, batch


def _compile_full_opt(fn, *args):
    """Compile with the real optimisation pipeline (the conftest disables
    most optimisations for wall-time; LICM only fires with them on)."""
    jax.config.update("jax_disable_most_optimizations", False)
    try:
        return fn.lower(*args).compile().as_text()
    finally:
        jax.config.update("jax_disable_most_optimizations", True)


def test_train_bench_chain_keeps_all_convs_in_loop(toy_step):
    step, state, sr_params, batch = toy_step
    chained = build_chained(step, chain=2)
    txt = _compile_full_opt(chained, state, sr_params, batch)
    total, in_body = _conv_placement(txt)
    assert total > 50, f"parse failure? only {total} convolutions found"
    assert in_body == total, (
        f"LICM hoisted {total - in_body}/{total} convolutions out of the "
        "bench chain — the timed loop no longer covers the full train step")


def test_detector_sees_licm_fire_on_invariant_chain(toy_step):
    # the same chain WITHOUT the carry-dependent image: XLA must hoist the
    # frozen-SR convolutions (this is the measured round-4 bug; if this
    # starts failing, the stack stopped hoisting and the guard above is
    # moot — re-measure on chip before relaxing anything)
    step, state, sr_params, batch = toy_step

    @jax.jit
    def invariant(state, sr_params, batch_dict):
        def body(i, carry):
            st, _ = carry
            return step(st, sr_params, batch_dict, jnp.float32(1e-3))
        return jax.lax.fori_loop(
            0, 2, body, (state, {"loss": jnp.float32(0),
                                 "rmse": jnp.float32(0),
                                 "log_vars": state.log_vars}))

    txt = _compile_full_opt(invariant, state, sr_params, batch)
    total, in_body = _conv_placement(txt)
    assert in_body < total, (
        "expected XLA to hoist the loop-invariant frozen-SR pass; it "
        "did not — the LICM guard test is no longer exercising anything")
