"""End-to-end CLI-driver test: train 2 tiny epochs on synthetic tiles, resume,
evaluate, check the acc artifact schemas (SURVEY.md §4 'tiny-run' plan)."""
import os

import jax
import numpy as np
import pandas as pd
import pytest

from srbh_tpu.data.tiff import write_tiff
from srbh_tpu.train.config import TrainConfig
from srbh_tpu.train import trainer


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    rng = np.random.default_rng(0)
    names = [f"t_{i}.tif" for i in range(8)]
    for d in ("s2c", "s1c", "bhc"):
        os.makedirs(data / d)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    for n in names:
        write_tiff(str(data / "s2c" / n),
                   rng.integers(0, 5000, (32, 32, 6)).astype(np.uint16), gt)
        write_tiff(str(data / "s1c" / n),
                   rng.uniform(-25, 5, (32, 32, 2)).astype(np.float32), gt)
        write_tiff(str(data / "bhc" / n),
                   rng.integers(0, 100, (128, 128)).astype(np.uint8),
                   (gt[0], 2.5, 0, gt[3], 0, -2.5))
    for split in ("train", "val", "test"):
        pd.DataFrame({0: names, 1: "s1c", 2: "s2c", 3: "bhc"}).to_csv(
            data / f"dl_{split}.csv", header=False, index=False)
    stats = root / "stats"
    os.makedirs(stats)
    np.savetxt(stats / "s2c_minmax.txt",
               np.stack([np.zeros(6), np.full(6, 5000.0)]))
    np.savetxt(stats / "s1c_minmax.txt",
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))
    hist = np.zeros(256)
    hist[:100] = 1000
    np.savetxt(stats / "bh_stats.txt", hist)
    return root


def make_cfg(root) -> TrainConfig:
    return TrainConfig(
        datapath=str(root / "data"),
        trainlist="dl_train.csv", vallist="dl_val.csv", testlist="dl_test.csv",
        logdir=str(root / "logs"), logdirhr=str(root / "no_sr_ckpt"),
        datastats=str(root / "stats"),
        preweight=str(root / "stats" / "bh_stats.txt"),
        s1dir="s1c", s2dir="s2c", bhdir="bhc",
        maxepoch=2, batch_size=4, num_workers=2,
        encoder_name="efficientnet-test", super_mid=8,
        sr_num_block=1, sr_num_feat=8, sr_num_grow=8, tile=32,
    )


class TestTrainDriver:
    def test_train_two_epochs(self, workdir, capsys):
        cfg = make_cfg(workdir)
        state = trainer.main(cfg, writer=None)
        assert int(state.step) == 2 * 2  # 8 tiles / batch 4 = 2 steps/epoch
        assert os.path.isdir(os.path.join(cfg.logdir, "checkpoint"))
        # best copy exists (val rmse always improves from +inf)
        assert os.path.isdir(os.path.join(cfg.logdir, "model_best"))
        # a FRESH run without encoder_weights warns about the random
        # encoder (the reference always starts from ImageNet weights)
        assert "RANDOM encoder" in capsys.readouterr().out

    def test_resume_continues(self, workdir, capsys):
        cfg = make_cfg(workdir)
        cfg.maxepoch = 3
        state = trainer.main(cfg, writer=None)
        assert int(state.step) == 3 * 2  # 2 old + 1 new epoch
        # review-17: a RESUMED run takes its encoder from the checkpoint —
        # the random-encoder warning (or a graft) here would be false
        out = capsys.readouterr().out
        assert "resumed epoch 2" in out
        assert "RANDOM encoder" not in out

    def test_device_aug_epoch(self, workdir, tmp_path):
        """--device_aug trains end-to-end through trainer.main: the loader
        ships image+uint8 height only, the jitted step builds augmentation
        + targets in-jit (ops/device_aug.py)."""
        cfg = make_cfg(workdir)
        cfg.logdir = str(tmp_path / "logs_devaug")
        cfg.maxepoch = 1
        cfg.device_aug = True
        state = trainer.main(cfg, writer=None)
        assert int(state.step) == 2
        assert os.path.isdir(os.path.join(cfg.logdir, "checkpoint"))

    def test_device_norm_epoch(self, workdir, tmp_path):
        """--device_norm trains end-to-end: raw uint16 s2 + f32 s1 on the
        wire, normalise+aug+targets in-jit. Regression: the epoch loop read
        b['image'] for the batch count and crashed with KeyError."""
        cfg = make_cfg(workdir)
        cfg.logdir = str(tmp_path / "logs_devnorm")
        cfg.maxepoch = 1
        cfg.device_norm = True  # implies device_aug in the trainer
        state = trainer.main(cfg, writer=None)
        assert int(state.step) == 2

    def test_noaggre_epoch_with_tb_writer(self, workdir, tmp_path):
        """isaggre=False trains with the auto-created TB writer: the
        lossweight scalar loop must follow the actual log_vars count
        (2 without aggre) instead of assuming 3 (regression: IndexError
        at the end of epoch 1)."""
        pytest.importorskip("tensorboardX")
        cfg = make_cfg(workdir)
        cfg.logdir = str(tmp_path / "noaggre_logs")
        cfg.isaggre = False
        cfg.maxepoch = 1
        state = trainer.main(cfg)  # writer=None -> auto SummaryWriter
        assert int(state.step) == 2
        # review-17: main_test on an isaggre=False checkpoint must build
        # its restore template with 2 log_vars like main() (a hardcoded 3
        # grafted (2,)-shaped Adam moments into a (3,) template)
        res = trainer.main_test(cfg, num_sample=0, suffix="na",
                                max_batches=1)
        assert res is not None and np.isfinite(res["rmse"])

    def test_data_parallel_epoch(self, workdir, tmp_path):
        """One DP epoch over the 8-device mesh through the full driver."""
        cfg = make_cfg(workdir)
        cfg.logdir = str(tmp_path / "dp_logs")
        cfg.maxepoch = 1
        cfg.batch_size = 8
        state = trainer.main(cfg, writer=None, data_parallel=True)
        assert int(state.step) == 1  # 8 tiles / batch 8

    def test_fsdp_epoch(self, workdir, tmp_path):
        """One FSDP epoch through the full driver: params + Adam moments
        sharded over the data axis (cfg.fsdp implies data_parallel); the
        saved checkpoint must be host-gatherable and finite."""
        cfg = make_cfg(workdir)
        cfg.logdir = str(tmp_path / "fsdp_logs")
        cfg.maxepoch = 1
        cfg.batch_size = 8
        cfg.fsdp = True
        state = trainer.main(cfg, writer=None)
        assert int(state.step) == 1
        leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
        assert all(np.all(np.isfinite(l)) for l in leaves)
        assert os.path.isdir(os.path.join(cfg.logdir, "checkpoint"))

    def test_main_test_zero_batches_means_zero(self, workdir):
        """review-17: max_batches=0 must evaluate NOTHING (is-not-None
        guard), matching eval_sr's semantics for the same parameter."""
        cfg = make_cfg(workdir)
        res = trainer.main_test(cfg, num_sample=0, suffix="zb",
                                max_batches=0)
        assert res is not None and res["rmse"] == 0.0  # empty AverageMeter

    def test_main_test_artifacts(self, workdir):
        cfg = make_cfg(workdir)
        res = trainer.main_test(cfg, num_sample=0, suffix="syn")
        assert res is not None and np.isfinite(res["rmse"])
        txt = res["txtpath"]
        assert os.path.exists(txt)
        assert float(open(txt).read()) == pytest.approx(res["rmse"])
        seg = pd.read_csv(txt[:-4] + "_seg.csv", header=None)
        assert list(seg.iloc[:6, 7]) == ["oa_miou_mfiou", "fiou", "iou",
                                         "f1", "ua", "pa"]
        he = pd.read_csv(txt[:-4] + "_he.csv")
        assert list(he.columns) == ["rmse", "mae", "me", "count"]
        assert len(he) == 9

    def test_main_test_saves_tifs(self, workdir):
        cfg = make_cfg(workdir)
        res = trainer.main_test(cfg, num_sample=0, suffix="sv", issave=True,
                                max_batches=1)
        epoch = 3
        pred_dir = os.path.join(cfg.logdir, f"pred_{epoch}_sv")
        files = os.listdir(pred_dir)
        assert any(f.endswith("_predprob.tif") for f in files)
        assert any(f.endswith("_build.tif") for f in files)


class TestTensorboardTagParity:
    REF_EVENTS = ("/root/reference/weights/"
                  "realesrgan_feature_aggre_weight_globe")

    def test_event_tags_match_reference(self, workdir):
        """Our TB event files must carry exactly the reference's scalar tag
        set (train.py:214-222): lr, train/{loss,rmse}, val/{loss,rmse},
        lossweight/w1-3 — verified against the SHIPPED event file."""
        import glob

        ea_mod = pytest.importorskip(
            "tensorboard.backend.event_processing.event_accumulator")
        ref_files = glob.glob(os.path.join(self.REF_EVENTS, "events*"))
        if not ref_files:
            pytest.skip("reference event files not mounted")
        ref_ea = ea_mod.EventAccumulator(ref_files[0])
        ref_ea.Reload()
        ref_tags = set(ref_ea.Tags()["scalars"])

        from tensorboardX import SummaryWriter

        cfg = make_cfg(workdir)
        cfg.logdir = str(workdir / "tb_logs")
        cfg.maxepoch = 1
        writer = SummaryWriter(log_dir=cfg.logdir)
        trainer.main(cfg, writer=writer)
        writer.close()
        ours = glob.glob(os.path.join(cfg.logdir, "events*"))
        assert ours, "trainer wrote no event file"
        ea = ea_mod.EventAccumulator(ours[0])
        ea.Reload()
        got = set(ea.Tags()["scalars"])
        assert got == ref_tags, (got, ref_tags)
