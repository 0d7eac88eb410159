"""The examples/quickstart.py walkthrough stays importable and its
dataset-builder produces loader-compatible artifacts (the full train/eval/
predict path it strings together is covered by tests/test_e2e_train.py and
tests/test_predict.py)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import quickstart  # noqa: E402


def test_synthetic_dataset_feeds_the_loader(tmp_path):
    data, stats = quickstart.build_synthetic_dataset(str(tmp_path))
    cfg = quickstart.tiny_config(str(tmp_path), data, stats)
    assert cfg.nchanss2 == 6 and cfg.maxepoch == 2

    from srbh_tpu.data.dataset import S12GlobeDataset

    ds = S12GlobeDataset(
        datalist=os.path.join(data, "dl_train.csv"), rootname=data,
        s1dir="s1c", s2dir="s2c", heightdir="bhc", datastats=stats,
        preweight=cfg.preweight, aug=False, isaggre=True, ishir=True)
    s = ds[0]
    assert s["image"].shape == (32, 32, 8)
    assert np.isfinite(s["image"]).all()
