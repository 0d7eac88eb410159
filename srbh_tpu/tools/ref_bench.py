"""Measure the PyTorch REFERENCE pipeline's inference throughput.

BASELINE.md's north-star says the rebuild must measure the reference's
tiles/sec itself rather than rely on the documented V100 engineering
estimate (~30 t/s). The reference's own deps (segmentation_models_pytorch,
timm, GDAL) are not installed here, but the test suite carries
numerically-verified torch replicas of the exact reference topology —
`tests/test_height_model_oracle.py` (`_TorchHeightModel`,
efficientnet-pytorch/smp naming, oracle-pinned against our Flax flagship)
and `tests/test_rrdbnet_oracle.py` (`_TorchRRDBNet`) — so this tool runs
THOSE at full reference scale (RRDBNet-23 nf64 + EfficientNet-B4 U-Net,
mymodels.py:233-337 / SR/rrdbnet_arch.py:170-240) through the reference's
predict-loop semantics (predict_realesanet_feature_globe.py:170-177:
frozen features -> model -> round(h*10) uint16 + softmax*255 uint16).

This environment has no CUDA, so the measurement is the torch-CPU floor
(honestly labelled as such in the JSON). The documented V100 estimate
stays as bench.py's `vs_baseline` denominator; this number anchors it:
the same FLOP-count model that predicts the measured CPU floor from
torch-CPU's effective GFLOP/s predicts ~30 t/s at V100 fp32 rates.

Usage: python -m srbh_tpu.tools.ref_bench [--batch 16] [--batches 3]
Prints one JSON line: {"metric": "reference_torch_cpu_tiles_per_sec", ...}
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time


def _load_test_module(name: str):
    tests = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "tests")
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(tests, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_reference_pipeline(batch: int = 16):
    """Full-scale reference inference pipeline (torch, eval mode).

    Returns (step, x) where step() runs one batch end-to-end exactly like
    predict_realesanet_feature_globe.py:170-177 and returns host numpy.
    """
    import numpy as np
    import torch

    hm = _load_test_module("test_height_model_oracle")
    rr = _load_test_module("test_rrdbnet_oracle")

    torch.manual_seed(0)
    # SR/rrdbnet_arch.py:170-240 at x4plus scale (train.py:133-136)
    net_hr = rr._TorchRRDBNet(cin=3, cout=3, nf=64, nb=23, gc=32, scale=4)
    # mymodels.py:233-337 at reference scale (train.py:143-148)
    net = hm._TorchHeightModel(
        "efficientnet-b4", in_ch=8, super_ch=64, super_mid=16,
        dec_ch=(256, 128, 64, 32, 16), chans_build=7)
    net_hr.eval()
    net.eval()
    for p in net_hr.parameters():
        p.requires_grad_(False)
    for p in net.parameters():
        p.requires_grad_(False)

    x = torch.rand(batch, 8, 64, 64)

    def step():
        with torch.no_grad():
            fea = net_hr.features(x[:, :3])
            height, build, _ = net(x, fea)
            h = torch.round(torch.clamp(height[:, 0], min=0) * 10
                            ).to(torch.int32).numpy().astype(np.uint16)
            b = torch.round(torch.softmax(build, dim=1) * 255
                            ).to(torch.int32).numpy().astype(np.uint16)
        return h, b

    return step, x


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="reference train batch (train.py:97); its predict "
                         "loop uses 32")
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch intra-op threads (0 = torch default)")
    args = ap.parse_args(argv)

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    step, _ = build_reference_pipeline(args.batch)
    step()  # warm (allocator, weight layout)
    t0 = time.perf_counter()
    for _ in range(args.batches):
        step()
    dt = time.perf_counter() - t0
    tiles_per_sec = args.batch * args.batches / dt
    print(json.dumps({
        "metric": "reference_torch_cpu_tiles_per_sec",
        "value": round(tiles_per_sec, 3),
        "unit": "tiles/sec",
        "batch": args.batch,
        "torch_threads": torch.get_num_threads(),
        "note": "torch-CPU floor of the reference pipeline via the "
                "oracle-verified replicas; no CUDA in this image",
    }))
    return tiles_per_sec


if __name__ == "__main__":
    main()
