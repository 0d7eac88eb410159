"""Space-to-depth packed 3x3 convolution for narrow-channel maps.

Why
---
The flagship height model's fusion heads run chains of 3x3 convs at 256^2
with 16 output channels (SR/HRfuse.py:115-190).  On TPU, 16 channels fill
16 of the MXU's 128 lanes and force ~8x padded HBM traffic, measured at
~24 TFLOP/s vs ~98 TFLOP/s for the 32..192-channel SR trunk
(srbh_tpu/tools/profile_flagship.py).  The TPU-native fix is to rearrange
``(H, W, C) -> (H/2, W/2, 4C)`` ("space-to-depth") and convolve in the
packed domain: a stride-1 3x3 conv becomes a 2x2 conv over deterministically
transformed weights — 4x lane fill for 16/9x the (padded-away) FLOPs.

Representation
--------------
A packed tensor carries a *parity* bit:

* parity 0 ("rest"): block ``i`` holds original rows ``{2i, 2i+1}``; the
  pack/unpack is a free reshape of ``(B, H, W, C)`` to ``(B, H/2, W/2, 4C)``
  with channel index ``(d*2 + e)*C + c`` for intra-block offset ``(d, e)``.
* parity 1 ("halo"): block ``i`` holds rows ``{2i-1, 2i}``; there are
  ``H/2 + 1`` blocks covering rows ``-1 .. H`` (the two boundary rows are
  halo slots).

Each packed 3x3 conv flips parity:

* parity 0 -> 1: the input is padded with one zero block per side (this
  reproduces the literal conv's zero padding exactly), VALID 2x2 conv.
* parity 1 -> 0: the input's halo slots are zeroed (so whatever garbage a
  previous conv wrote in them acts as the literal zero padding), VALID 2x2.

Chains of convs therefore never repack: BasicBlock(conv-BN-ReLU-conv-BN +
skip) maps parity 0 -> 0 and composes freely; the residual add and all
elementwise ops happen at matching parity.  Equivalence to the literal
``lax.conv`` path is exact up to dtype rounding (tests/test_s2d.py).

The weight transform: for output offset ``(a, b)`` and input tap
``(p, q, d, e)``, the packed kernel entry is ``W[u+1, v+1]`` with
``u = 2p + d - 1 - a`` and ``v = 2q + e - 1 - b`` when ``|u|,|v| <= 1``,
else zero.  The same transform serves both parities.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> parity-0 packed (B, H/2, W/2, 4C); free relayout."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"spatial dims ({h},{w}) must be even to pack")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h2, w2, d, e, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack(xp: jnp.ndarray, parity: int = 0) -> jnp.ndarray:
    """Packed (B, Hp, Wp, 4C) -> (B, H, W, C). Parity 1 drops the halo."""
    b, hp, wp, c4 = xp.shape
    c = c4 // 4
    x = xp.reshape(b, hp, wp, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, 2 * hp, 2 * wp, c)
    if parity == 1:
        x = x[:, 1:-1, 1:-1, :]
    return x


def transform_weight(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> packed 2x2 kernel (2, 2, 4Ci, 4Co)."""
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"only 3x3 kernels, got {kh}x{kw}")
    zeros = jnp.zeros((ci, co), w.dtype)
    rows_pq = []
    for p in (0, 1):
        row_q = []
        for q in (0, 1):
            kin_blocks = []
            for d in (0, 1):
                for e in (0, 1):
                    kout_blocks = []
                    for a in (0, 1):
                        for b in (0, 1):
                            u = 2 * p + d - 1 - a
                            v = 2 * q + e - 1 - b
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                kout_blocks.append(w[u + 1, v + 1])
                            else:
                                kout_blocks.append(zeros)
                    kin_blocks.append(jnp.concatenate(kout_blocks, axis=1))
            row_q.append(jnp.concatenate(kin_blocks, axis=0))
        rows_pq.append(jnp.stack(row_q))
    return jnp.stack(rows_pq)  # (2, 2, 4Ci, 4Co)


def _halo_mask(hp: int, wp: int, c: int, dtype) -> jnp.ndarray:
    """Multiplicative mask zeroing the halo slots of a parity-1 tensor."""
    # rows: block 0 / offset d=0 is original row -1; last block d=1 is row H.
    row = jnp.ones((hp, 1, 4 * c), dtype)
    row = row.at[0, :, : 2 * c].set(0)
    row = row.at[-1, :, 2 * c:].set(0)
    # cols: e=0 channels are [0,C) and [2C,3C); e=1 are [C,2C) and [3C,4C).
    col = jnp.ones((1, wp, 4 * c), dtype)
    col = col.at[:, 0, 0:c].set(0)
    col = col.at[:, 0, 2 * c: 3 * c].set(0)
    col = col.at[:, -1, c: 2 * c].set(0)
    col = col.at[:, -1, 3 * c:].set(0)
    return row * col


def conv3x3_packed(
    xp: jnp.ndarray,
    parity: int,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dtype=None,
    kin_perm=None,
) -> jnp.ndarray:
    """Packed stride-1 3x3 'SAME-with-zero-pad' conv; flips parity.

    ``w`` is the literal (3, 3, Ci, Co) kernel; ``xp`` has 4*Ci channels.
    ``kin_perm`` (see :func:`concat_perm`) adapts the transformed kernel to
    an input that is a concatenation of separately-packed tensors.
    Returns a packed tensor of parity ``1 - parity``.
    """
    dtype = dtype or xp.dtype
    ci4 = xp.shape[-1]
    if kin_perm is not None and parity != 0:
        # _halo_mask assumes the canonical (d, e, c) channel layout over the
        # whole channel dim; a kin_perm input is a concat-of-packs layout,
        # so the mask would zero valid rows and leak halo rows. No in-repo
        # caller needs this combination — fail loudly instead of silently
        # computing garbage.
        raise NotImplementedError(
            "conv3x3_packed: kin_perm with parity=1 is unsupported (the "
            "halo mask assumes a canonical packed layout)")
    if parity == 0:
        xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        _, hp, wp_, _ = xp.shape
        xp = xp * _halo_mask(hp, wp_, ci4 // 4, xp.dtype)
    wp = transform_weight(w).astype(dtype)
    if kin_perm is not None:
        wp = wp[:, :, kin_perm, :]
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), wp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(dtype)
    return y


def conv1x1_packed(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dtype=None,
    kin_perm=None,
) -> jnp.ndarray:
    """Packed 1x1 conv (block-diagonal over the 4 intra-block offsets);
    parity preserving."""
    dtype = dtype or xp.dtype
    _, _, ci, co = w.shape
    w2 = w.reshape(ci, co)
    blocks = [[w2 if i == j else jnp.zeros((ci, co), w.dtype)
               for j in range(4)] for i in range(4)]
    wbd = jnp.block(blocks)[None, None]  # (1, 1, 4Ci, 4Co)
    if kin_perm is not None:
        wbd = wbd[:, :, kin_perm, :]
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), wbd.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(dtype)
    return y


def tile_channel_param(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel (C,) parameter -> packed (4C,): the packed channel order
    is (d, e, c) with c minor, so a plain 4x tile lines up."""
    return jnp.tile(v, 4)


def concat_perm(parts: Sequence[int]) -> jnp.ndarray:
    """Kernel input-channel permutation for concatenated packed tensors.

    ``concat([pack(x1), pack(x2)], -1)`` interleaves channels differently
    from ``pack(concat([x1, x2], -1))``.  This returns an index array so
    that ``w_packed[:, :, perm, :]`` (gather on the kin axis of a kernel
    transformed for the *canonical* pack-of-concat layout) convolves the
    concat-of-packs layout correctly: ``perm[j]`` is the canonical channel
    index of actual position ``j``.
    """
    ctot = sum(parts)
    perm = []
    start = 0
    for c in parts:
        for de in range(4):
            for cc in range(c):
                perm.append(de * ctot + start + cc)
        start += c
    return np.asarray(perm, dtype=np.int32)


def ps_to_pack_perm(c_out: int) -> np.ndarray:
    """Channel gather turning a pre-pixel-shuffle conv output into a parity-0
    packed tensor.

    ``pixel_shuffle`` (ops/shuffle.py) reads channel ``c*4 + i*2 + j`` for
    output pixel offset ``(i, j)``; the packed layout wants channel
    ``(i*2 + j)*C + c``.  ``x[..., ps_to_pack_perm(C)] == pack(pixel_shuffle(
    x, 2))`` — letting an upsampler emit packed output with no data movement
    (XLA folds the gather into the producing conv's weights).
    """
    perm = [c * 4 + ij for ij in range(4) for c in range(c_out)]
    return np.asarray(perm, dtype=np.int32)
