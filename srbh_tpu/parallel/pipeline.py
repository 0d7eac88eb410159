"""GPipe-style pipeline parallelism over the ``model`` mesh axis.

The reference is single-GPU (SURVEY.md §2.5); this is the fourth TPU-native
scaling mode next to DP / TP / SP (parallel/mesh.py): the RRDBNet trunk's
residual-in-residual body (rrdbnet_arch.py:208-216 — 23 structurally
identical RRDB blocks) is split into S contiguous stages, one per device
along ``model``; microbatches stream through the stages with
``lax.ppermute`` hand-offs, so S devices each hold 1/S of the body weights
and pipeline-overlap their compute (bubble fraction (S-1)/(S-1+M)).

Everything runs inside ONE ``shard_map``-ed jit: the schedule is a
``lax.fori_loop`` whose carry is (in-flight activation, output buffer) —
no host round-trips between ticks.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from srbh_tpu.parallel.mesh import MODEL_AXIS


def stack_stage_params(param_subtrees):
    """Stack S homogeneous per-stage pytrees into one tree with a leading
    stage dim — the shard_map input that puts stage s's weights on device s."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *param_subtrees)


def pipeline_apply(stage_fn: Callable, stage_params, microbatches,
                   mesh: Mesh, axis: str = MODEL_AXIS):
    """Run (M, mb, ...) microbatches through S pipelined stages.

    ``stage_fn(local_params, x) -> y`` must be shape-preserving (the RRDB
    body is); ``stage_params`` leaves carry a leading dim S (stage s on
    device s along ``axis``). Returns (M, mb, ...) outputs, replicated.

    Schedule: at tick t, device d processes microbatch ``t - d`` (device 0
    reads the feed, the rest read the ppermuted hand-off), so the whole
    drain takes M + S - 1 ticks.
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    if jax.tree_util.tree_leaves(stage_params)[0].shape[0] != S:
        raise ValueError("stage_params leading dim must equal mesh axis size")

    def spmd(local_params, mbs):
        local_params = jax.tree_util.tree_map(lambda p: p[0], local_params)
        idx = lax.axis_index(axis)
        # carries start device-varying (each device holds different partial
        # state before the final psum) — required by shard_map's vma checks
        state = lax.pcast(jnp.zeros_like(mbs[0]), axis, to="varying")
        out = lax.pcast(jnp.zeros_like(mbs), axis, to="varying")

        def tick(carry, t):
            state, out = carry
            inp = jnp.where(idx == 0, mbs[jnp.clip(t, 0, M - 1)], state)
            y = stage_fn(local_params, inp)
            done = t - (S - 1)  # microbatch completing on the last stage
            updated = lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(done, 0, M - 1), 0)
            write = jnp.logical_and(idx == S - 1,
                                    jnp.logical_and(done >= 0, done < M))
            out = jnp.where(write, updated, out)
            state = lax.ppermute(y, axis,
                                 [(i, (i + 1) % S) for i in range(S)])
            return (state, out), None

        # scan (not fori_loop) so the schedule is reverse-differentiable:
        # grads flow back through the ppermute hand-offs (reverse permute),
        # giving pipeline-parallel TRAINING for free (tested).
        (_, out), _ = lax.scan(tick, (state, out), jnp.arange(M + S - 1))
        # only the last stage wrote; psum replicates its buffer
        return lax.psum(out, axis)

    spec_params = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    fn = jax.shard_map(spmd, mesh=mesh, in_specs=(spec_params, P()),
                       out_specs=P())
    return fn(stage_params, microbatches)


def _conv_p(p, x, dtype):
    """Torch-padded 3x3 conv from a raw {kernel, bias} param dict (the
    stand-alone twin of models/layers.py:tconv for head/tail replays)."""
    k = p["kernel"].astype(dtype)
    pad = k.shape[0] // 2
    y = lax.conv_general_dilated(
        x.astype(dtype), k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(dtype)


def rrdb_pipeline_features(sr, variables, x, mesh: Mesh,
                           num_microbatches: Optional[int] = None,
                           axis: str = MODEL_AXIS):
    """``RRDBNet(features_only=True)`` with the RRDB body pipelined.

    Head (conv_first) and tail (conv_body residual + upsample convs +
    conv_hr) replay replicated on every device; the body's ``num_block``
    RRDBs split into ``mesh.shape[axis]`` stages. Bit-matches the
    single-program ``sr.apply(..., features_only=True)`` (tested on the
    8-device CPU mesh).
    """
    from srbh_tpu.models.rrdbnet import RRDB
    from srbh_tpu.ops.resize import upsample_nearest
    from srbh_tpu.ops.shuffle import pixel_unshuffle

    params = variables["params"] if "params" in variables else variables
    if getattr(sr, "quantize", False):
        # the head/tail convs replay here as float _conv_p convs; routing
        # them through the int8 path is not implemented, and silently
        # diverging from sr.apply would break the bit-match contract below
        raise NotImplementedError(
            "rrdb_pipeline_features does not support RRDBNet(quantize=True): "
            "head/tail convs run in float here and would not bit-match "
            "sr.apply's int8 trunk")
    S = mesh.shape[axis]
    B = sr.num_block
    if B % S == 0:
        per = B // S
    else:
        raise ValueError(f"num_block={B} not divisible by {S} stages")
    M = S if num_microbatches is None else num_microbatches
    if M < 1:
        raise ValueError(f"num_microbatches must be >= 1, got {M}")
    if x.shape[0] % M:
        raise ValueError(f"batch {x.shape[0]} not divisible by {M} microbatches")

    dtype = sr.dtype
    if sr.scale == 2:
        x = pixel_unshuffle(x, 2)
    elif sr.scale == 1:
        x = pixel_unshuffle(x, 4)
    feat = _conv_p(params["conv_first"], x, dtype)

    block = RRDB(sr.num_feat, sr.num_grow_ch, sr.dtype, sr.fused, sr.quantize)
    stacked = stack_stage_params([
        stack_stage_params([params[f"body_{s * per + i}"] for i in range(per)])
        for s in range(S)])

    def stage_fn(local, h):
        def body_step(carry, p):
            return block.apply({"params": p}, carry), None
        y, _ = lax.scan(body_step, h, local)
        return y

    mb = feat.reshape((M, feat.shape[0] // M) + feat.shape[1:])
    body = pipeline_apply(stage_fn, stacked, mb, mesh, axis)
    body = body.reshape(feat.shape)

    feat = feat + _conv_p(params["conv_body"], body, dtype)
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    feat = lrelu(_conv_p(params["conv_up1"], upsample_nearest(feat, 2), dtype))
    feat = lrelu(_conv_p(params["conv_up2"], upsample_nearest(feat, 2), dtype))
    return _conv_p(params["conv_hr"], feat, dtype)
