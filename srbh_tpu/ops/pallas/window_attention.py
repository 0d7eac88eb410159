"""Fused window attention (Pallas TPU kernel) for SwinIR.

The XLA path materialises the (windows, heads, N, N) attention tensor in HBM
twice (QK^T out, softmax in/out, AV in) — ~100 MB per SwinIR layer at
batch 32. This kernel keeps everything for a chunk of windows in VMEM:

    s = q @ k^T * scale + rel_pos_bias [+ shift_mask]
    p = softmax(s)
    o = p @ v

Layout: inputs are (heads, B_, N, d) so the grid is (heads, B_ / CHUNK) and
the per-head relative-position bias indexes on ``program_id(0)``. The
shifted-window mask (nW, N, N) is blocked with a modular index map, valid
whenever ``nW % CHUNK == 0`` or ``CHUNK % nW == 0``; other shapes fall back
to the XLA einsum path (``window_attention_auto``).

All matmuls accumulate in f32 (``preferred_element_type``); N (49/64) and
d (<=64) stay well inside one VMEM tile.

Measured on v5e (h=6, B_=512, N=64, d=30, f32): 1.48-1.52 ms vs XLA's
1.40 ms — parity, not a win: at SwinIR's window shapes both paths are bound
by MXU underfill (d=30 and N=64 both < the 128 lane width), not by the HBM
round-trip this kernel eliminates. Kept as the fused building block for
larger-window/embedding configs where the attention tensor dominates;
``SwinIR(use_pallas=True)`` opts in. Keep ``chunk <= 32``: bigger chunks
exceed the 16 MB scoped-VMEM budget with double buffering.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/interpret-only; keep import soft for CPU test envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

DEFAULT_CHUNK = 8


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (C, N, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)  # (N, N)
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (C, N, N)
    s = s + bias[None]
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / e.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    mask = mask_ref[:].astype(jnp.float32)  # (C, N, N) tiled shift mask
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s + bias[None] + mask
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / e.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def window_attention_pallas(q, k, v, bias, mask=None,
                            chunk: int = DEFAULT_CHUNK,
                            interpret: bool = False):
    """Fused attention over windows.

    q/k/v: (heads, B_, N, d); bias: (heads, N, N); mask: (nW, N, N) or None,
    with windows ordered so window ``b`` uses ``mask[b % nW]``.
    Returns (heads, B_, N, d).
    """
    h, b_, n, d = q.shape
    assert b_ % chunk == 0, (b_, chunk)
    scale = d ** -0.5
    grid = (h, b_ // chunk)
    qkv_spec = pl.BlockSpec((1, chunk, n, d), lambda i, j: (i, j, 0, 0))
    bias_spec = pl.BlockSpec((1, n, n), lambda i, j: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)

    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q, k, v, bias)

    nw = mask.shape[0]
    if nw % chunk == 0:
        # window chunk j covers mask rows [j*chunk % nw : +chunk]
        mask_spec = pl.BlockSpec((chunk, n, n),
                                 lambda i, j: ((j * chunk) % nw // chunk, 0, 0))
        mask_arg = mask
    elif chunk % nw == 0:
        # tile the mask up to one chunk; every chunk sees the same block
        reps = chunk // nw
        mask_arg = jnp.tile(mask, (reps, 1, 1))
        mask_spec = pl.BlockSpec((chunk, n, n), lambda i, j: (0, 0, 0))
    else:
        raise ValueError(f"mask windows {nw} incompatible with chunk {chunk}")
    return pl.pallas_call(
        functools.partial(_attn_kernel_masked, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, bias, mask_arg)


def window_attention_xla(q, k, v, bias, mask=None):
    """Reference einsum path; same signature/semantics as the kernel."""
    h, b_, n, d = q.shape
    scale = d ** -0.5
    s = jnp.einsum("hbnd,hbmd->hbnm", q * scale, k,
                   preferred_element_type=jnp.float32)
    s = s + bias[:, None].astype(s.dtype)
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(h, b_ // nw, nw, n, n) + mask[None, None].astype(s.dtype)
        s = s.reshape(h, b_, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("hbnm,hbmd->hbnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def window_attention_auto(q, k, v, bias, mask=None,
                          chunk: int = DEFAULT_CHUNK,
                          interpret: bool = False):
    """Pallas when shapes allow, XLA otherwise."""
    h, b_, n, d = q.shape
    # Mosaic lowering needs a real TPU backend (pallas imports fine on CPU
    # but fails at lowering unless interpret=True)
    on_tpu = jax.default_backend() == "tpu" or interpret
    usable = (HAVE_PALLAS and on_tpu and b_ % chunk == 0
              and (mask is None or mask.shape[0] % chunk == 0
                   or chunk % mask.shape[0] == 0))
    if usable:
        return window_attention_pallas(q, k, v, bias, mask, chunk=chunk,
                                       interpret=interpret)
    return window_attention_xla(q, k, v, bias, mask)
