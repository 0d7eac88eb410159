"""Valid-pixel block aggregation of height maps.

Reference: ``aggregate_utils.py`` — the 256x256 2.5 m height GT is reduced to
the 64x64 10 m grid by a ones-kernel stride-``1/scale`` convolution of the data
divided by the same convolution of a validity mask:

* ``aggregate``            (aggregate_utils.py:11-26): validity = ``data > 0``,
  denominator ``+1e-6`` (numpy reference implementation).
* ``aggregate_torch``      (aggregate_utils.py:29-41): validity = ``data >= 0``,
  denominator ``+1e-10`` — the variant used by the training loader
  (BH_loader.py:384-392). Since heights are non-negative this degenerates to a
  plain block mean, which we preserve bit-for-bit.

TPU design: ``lax.reduce_window`` with an add monoid compiles to a single
fused windowed reduction on the VPU — no conv weights, no MXU round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _block_sum(x: jnp.ndarray, step: int) -> jnp.ndarray:
    """Non-overlapping step x step window sum over the trailing two HW dims."""
    nd = x.ndim
    dims = [1] * nd
    strides = [1] * nd
    # operate on (..., H, W)
    dims[-2] = dims[-1] = step
    strides[-2] = strides[-1] = step
    return lax.reduce_window(x, 0.0, lax.add, tuple(dims), tuple(strides), "VALID")


def aggregate(
    data: jnp.ndarray,
    scale: float,
    valid_threshold: float = 0.0,
    inclusive: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Block-aggregate ``data`` by ``1/scale``, averaging over "valid" pixels.

    Args:
      data: (..., H, W) float array (height map in metres).
      scale: downscale factor, e.g. 0.25 for 256 -> 64.
      valid_threshold: pixels with value ``>= threshold`` (``inclusive``) or
        ``> threshold`` count toward the denominator.
      inclusive: True reproduces ``aggregate_torch`` (``data >= 0``); False
        with ``eps=1e-6`` reproduces the numpy ``aggregate`` (``data > 0``).
      eps: denominator stabiliser.

    Returns:
      (..., H*scale, W*scale) array of block means over valid pixels.
    """
    step = int(round(1.0 / scale))
    data = data.astype(jnp.float32)
    if inclusive:
        valid = (data >= valid_threshold).astype(jnp.float32)
    else:
        valid = (data > valid_threshold).astype(jnp.float32)
    num = _block_sum(data, step)
    den = _block_sum(valid, step)
    return num / (den + eps)


# Training-path alias matching aggregate_torch (aggregate_utils.py:29-41).
aggregate_mean = jax.tree_util.Partial(
    aggregate, valid_threshold=0.0, inclusive=True, eps=1e-10
)
