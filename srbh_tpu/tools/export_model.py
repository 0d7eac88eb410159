"""Serving export: serialize the flagship forward as portable StableHLO.

The reference has no deployment story beyond "run the python script with
torch installed" (predict_realesanet_feature_globe.py's __main__). The
TPU-native equivalent is ``jax.export``: trace the jitted inference step
once (weights baked in as constants), serialize the StableHLO artifact to
one file, and reload it in any JAX process — no model code, no Flax, no
checkpoint plumbing on the serving side. A symbolic batch dimension keeps
one artifact valid for every batch size.

CLI::

    python -m srbh_tpu.tools.export_model out.stablehlo \
        [--tile 64] [--encoder efficientnet-b4] [--blocks 23] \
        [--ckpt model.msgpack --sr-ckpt sr.msgpack]

Loading (three lines, anywhere)::

    from jax import export
    fn = export.deserialize(open("out.stablehlo", "rb").read()).call
    height, build = fn(images)   # (B, T, T, 8) float32 -> predictions
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def make_serving_fn(model, sr_model, variables, sr_params,
                    rgb_idx=(0, 1, 2), dtype=jnp.bfloat16):
    """Closure computing (height, build_softmax) from raw normalized tiles —
    the predictor's on-device path (predict_realesanet_feature_globe.py:
    170-177) with the weights captured as constants."""
    rgb = jnp.asarray(rgb_idx)

    def fn(image):
        img = image.astype(dtype)
        fea = sr_model.apply(sr_params, img[..., rgb], features_only=True)
        outs = model.apply(variables, img, fea, train=False)
        height, build = outs[0], outs[1]
        h = jnp.clip(height[..., 0].astype(jnp.float32), 0, None)
        b = jax.nn.softmax(build.astype(jnp.float32), axis=-1)
        return h, b

    return fn


def export_flagship(model, sr_model, variables, sr_params,
                    tile: int = 64, nchans: int = 8,
                    batch: Optional[int] = None,
                    platforms: Tuple[str, ...] = ("tpu", "cpu"),
                    dtype=jnp.bfloat16) -> bytes:
    """Serialize the serving forward; ``batch=None`` exports a symbolic
    batch dimension so one artifact serves every batch size."""
    fn = make_serving_fn(model, sr_model, variables, sr_params, dtype=dtype)
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, tile, tile, nchans), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, tile, tile, nchans), jnp.float32)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    return bytes(exported.serialize())


def load_exported(data: bytes):
    """bytes -> callable(images) (the .call of the deserialized artifact)."""
    return jexport.deserialize(bytearray(data)).call


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="srbh-export")
    ap.add_argument("out")
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--encoder", default="efficientnet-b4")
    ap.add_argument("--blocks", type=int, default=23)
    ap.add_argument("--super-mid", type=int, default=16)
    ap.add_argument("--batch", type=int, default=None,
                    help="fixed batch; default exports a symbolic batch dim")
    ap.add_argument("--ckpt", default=None,
                    help="flax msgpack of the height model variables")
    ap.add_argument("--sr-ckpt", default=None,
                    help="flax msgpack of the frozen RRDBNet params")
    args = ap.parse_args(argv)

    from srbh_tpu import models

    sr = models.RRDBNet(num_block=args.blocks, num_feat=64, num_grow_ch=32,
                        dtype=jnp.bfloat16)
    model = models.SRRegressClsFeature(
        encoder_name=args.encoder, super_mid=args.super_mid, isaggre=True,
        chans_build=7, dtype=jnp.bfloat16)
    # a half-loaded artifact (one side trained, the other random init)
    # looks valid but serves garbage — refuse rather than guess
    if bool(args.ckpt) != bool(args.sr_ckpt):
        ap.error("--ckpt and --sr-ckpt must be given together (a random "
                 "half would silently export an untrained trunk/model); "
                 "omit both for a random-weights smoke export")

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, args.tile, args.tile, 8), jnp.bfloat16)
    if args.ckpt:  # restore replaces BOTH inits: skip the expensive traces
        from flax.serialization import msgpack_restore

        variables = msgpack_restore(open(args.ckpt, "rb").read())
        sr_params = msgpack_restore(open(args.sr_ckpt, "rb").read())
    else:
        sr_params = jax.jit(sr.init)(rng, x[..., :3])
        fea = jnp.zeros((1, args.tile * 4, args.tile * 4, 64), jnp.bfloat16)
        variables = jax.jit(model.init)(rng, x, fea)

    data = export_flagship(model, sr, variables, sr_params,
                           tile=args.tile, batch=args.batch)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"{args.out}: {len(data) / 1e6:.1f} MB StableHLO artifact")


if __name__ == "__main__":  # pragma: no cover
    main()
