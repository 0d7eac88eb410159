"""SR finetune/eval drivers end-to-end on synthetic pairs."""
import os

import numpy as np
import pandas as pd
import pytest

import jax

from srbh_tpu.data.dataset import LRHRPairDataset
from srbh_tpu.data.tiff import write_tiff
from srbh_tpu.train.sr_driver import eval_sr, load_sr_generator, train_sr
from srbh_tpu.train.sr_trainer import RealESRGANTrainer


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    rng = np.random.default_rng(0)
    names = [f"p_{i}.tif" for i in range(6)]
    os.makedirs(root / "s2p")
    os.makedirs(root / "gep")
    gt = (0.0, 10.0, 0.0, 100.0, 0.0, -10.0)
    for n in names:
        write_tiff(str(root / "s2p" / n),
                   rng.integers(0, 3000, (16, 16, 3)).astype(np.uint16), gt)
        write_tiff(str(root / "gep" / n),
                   rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
                   (0.0, 2.5, 0.0, 100.0, 0.0, -2.5))
    pd.DataFrame({0: names}).to_csv(root / "list.csv", header=False, index=False)
    os.makedirs(root / "stats")
    np.savetxt(root / "stats" / "s2p_minmax.txt",
               np.stack([np.zeros(3), np.full(3, 3000.0)]))
    return root


def make_dataset(root, aug=False):
    return LRHRPairDataset(str(root / "list.csv"), str(root),
                           str(root / "stats"), s2dir="s2p", gedir="gep",
                           aug=aug)


class TestSRDriver:
    def test_dataset_pairs(self, pair_root):
        ds = make_dataset(pair_root)
        s = ds[0]
        assert s["lq"].shape == (16, 16, 3)
        assert s["gt"].shape == (64, 64, 3)
        assert 0 <= s["lq"].min() and s["lq"].max() <= 1
        assert 0 <= s["gt"].min() and s["gt"].max() <= 1

    def test_train_eval_roundtrip(self, pair_root, tmp_path):
        tr = RealESRGANTrainer(num_block=1, num_feat=8, num_grow_ch=8,
                               disc_feat=8, perceptual=False)
        ds = make_dataset(pair_root, aug=True)
        logdir = str(tmp_path / "sr")
        state = train_sr(tr, ds, logdir, epochs=1, batch_size=2,
                         num_workers=1)
        assert int(state.step) == 3  # 6 pairs / batch 2
        assert os.path.isdir(os.path.join(logdir, "net_g"))
        assert os.path.isdir(os.path.join(logdir, "net_d"))

        res = eval_sr(tr, state, make_dataset(pair_root),
                      txtpath=str(tmp_path / "acc1.txt"), batch_size=2)
        assert np.isfinite(res["psnr"]) and 0 <= res["ssim"] <= 1
        # review-17: the jitted EMA forward is cached on the trainer — a
        # second eval must reuse it (a fresh lambda per call would be a
        # new jit cache key, recompiling the generator every eval)
        jit1 = tr._eval_sr_jit
        eval_sr(tr, state, make_dataset(pair_root), batch_size=2,
                max_batches=1)
        assert tr._eval_sr_jit is jit1
        lines = open(tmp_path / "acc1.txt").read().splitlines()
        assert lines[0] == "psnr, ssim"
        assert float(lines[1]) == pytest.approx(res["psnr"], abs=1e-3)
        assert len(lines) == 6  # matches weights/realesrgan/acc2.txt schema

        # reload the generator into a fresh state
        fresh = tr.init(jax.random.PRNGKey(1), (2, 16, 16, 3))
        restored = load_sr_generator(tr, logdir, fresh)
        a = jax.tree_util.tree_leaves(restored.g_ema)[0]
        b = jax.tree_util.tree_leaves(state.g_ema)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestLearnedMetricsGate:
    def test_clear_errors(self):
        """Without converted weights the learned metrics raise a ValueError
        naming the converter to use (they are real models now — see
        tests/test_learned_metrics.py for the compute path)."""
        from srbh_tpu.metrics.learned import calculate_clipscore, calculate_lpips

        with pytest.raises(ValueError, match="convert_clip_visual"):
            calculate_clipscore(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))
        with pytest.raises(ValueError, match="convert_lpips"):
            calculate_lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))


class TestFinetuneYmlLoader:
    """SURVEY §2.2 #23: the shipped BasicSR finetune recipe parsed as a
    first-class config source."""

    REF_YML = "/root/reference/SR/finetune_realesrgan_x4plus_pairdata.yml"

    def test_parses_reference_yml_verbatim(self):
        if not os.path.exists(self.REF_YML):
            pytest.skip("reference yml not mounted")
        from srbh_tpu.train.sr_config import load_finetune_yml

        cfg = load_finetune_yml(self.REF_YML)
        t = cfg["trainer"]
        assert t["scale"] == 4 and t["num_block"] == 23
        assert t["num_feat"] == 64 and t["num_grow_ch"] == 32
        assert t["lr"] == 1e-4 and t["ema_decay"] == 0.999
        assert t["gan_weight"] == 0.1 and t["perceptual"]
        assert t["milestones"] == (400000,) and t["warmup_iter"] == -1
        assert cfg["gamma"] == 0.5 and cfg["total_iter"] == 400000
        assert cfg["data"]["batch_size"] == 12 and cfg["data"]["gt_size"] == 256
        assert cfg["data"]["use_hflip"] and not cfg["data"]["use_rot"]
        # USM-GT switches (yml:9-11): l1/percep sharpened, gan raw
        assert cfg["usm"] == {"l1": True, "percep": True, "gan": False}

    def test_trainer_from_yml_builds(self):
        if not os.path.exists(self.REF_YML):
            pytest.skip("reference yml not mounted")
        from srbh_tpu.train.sr_config import trainer_from_yml

        tr = trainer_from_yml(self.REF_YML, num_block=1, num_feat=8,
                              num_grow_ch=8, disc_feat=8, perceptual=False)
        assert tr.net_g.num_block == 1 and tr.ema_decay == 0.999
        assert float(tr.schedule(0)) == pytest.approx(1e-4)
        assert float(tr.schedule(400001)) == pytest.approx(5e-5, rel=1e-5)
