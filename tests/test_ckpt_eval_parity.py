"""Reference-checkpoint -> convert -> eval artifact parity (BASELINE
north-star #1, achievable slice).

The reference's real usage is: load a trained ``checkpoint.tar``
(train.py:396-411) and produce ``acc{epoch}_{num}.txt`` / ``*_seg.csv`` /
``*_he.csv`` via vtest_epoch2 (train.py:427-486, metrics.py:383-463).
The reference ships no trained checkpoints, so this test EXECUTES the
verified torch replica to create one:

1. train the torch height replica a few steps (real BN stats, real Adam
   trajectory) with frozen torch-RRDBNet features,
2. ``torch.save`` the exact reference payload
   ``{'epoch', 'state_dict', 'log_vars', 'best_acc'}`` (train.py:199-212)
   plus a ``{'net_g_ema': ...}`` SR tar (rrdbnet_arch.py checkpoints),
3. run the real migration CLI (``python -m srbh_tpu.train.convert``),
4. point ``cfg.checkpoint`` / ``cfg.logdirhr`` at the converted ``.npz``
   files and run ``trainer.main_test`` over a synthetic on-disk split,
5. assert the three written artifacts numerically equal an in-test
   torch-executed vtest_epoch2 on the same loader tiles: headline RMSE
   <= 1e-3, confusion matrix EXACT, per-class height stats <= 1e-3.

Any converter key-mapping bug, BN-stat transposition, or artifact-schema
drift fails here — before a real published checkpoint ever arrives.
"""
import os

import numpy as np
import pandas as pd
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_height_model_oracle import _TorchHeightModel  # noqa: E402
from test_rrdbnet_oracle import _TorchRRDBNet  # noqa: E402
from test_train_step_oracle import (  # noqa: E402
    _ce_dice_adapt_weight_t,
    _mse_adapt_weight_t,
)

from srbh_tpu.data.tiff import write_tiff  # noqa: E402
from srbh_tpu.train import convert, trainer  # noqa: E402
from srbh_tpu.train.config import TrainConfig  # noqa: E402

ENC = "efficientnet-test"
NCLS = 7


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt_parity")
    data = root / "data"
    rng = np.random.default_rng(5)
    names = [f"t_{i}.tif" for i in range(6)]
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
        logdir=str(root / "logs"), logdirhr=str(root / "sr.npz"),
        datastats=str(root / "stats"),
        preweight=str(root / "stats" / "bh_stats.txt"),
        s1dir="s1c", s2dir="s2c", bhdir="bhc",
        batch_size=2, num_workers=0,
        encoder_name=ENC, super_mid=8,
        sr_num_block=1, sr_num_feat=8, sr_num_grow=8, tile=32,
        checkpoint="height.npz",
    )


def _train_torch_replica(rrdb, steps=3):
    """A few executed reference train steps (train.py:244-306 semantics via
    the verified loss twins) to give the checkpoint real BN stats."""
    torch.manual_seed(21)
    tm = _TorchHeightModel(ENC, in_ch=8, super_ch=8, super_mid=8,
                           dec_ch=(256, 128, 64, 32, 16), chans_build=NCLS)
    tm.train()
    log_vars = tnn.Parameter(torch.zeros(3))
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3, weight_decay=1e-4)
    opt.add_param_group({"params": [log_vars], "lr": 1e-3})
    rng = np.random.default_rng(9)
    for _ in range(steps):
        x = torch.from_numpy(
            rng.normal(size=(2, 8, 32, 32)).astype(np.float32))
        h_t = torch.from_numpy(
            np.abs(rng.normal(size=(2, 128, 128))).astype(np.float32) * 8)
        w_t = torch.from_numpy(
            rng.uniform(0.5, 2.0, (2, 128, 128)).astype(np.float32))
        ha_t = h_t.reshape(2, 32, 4, 32, 4).mean(dim=(2, 4))
        wa_t = torch.from_numpy(
            rng.uniform(0.5, 2.0, (2, 32, 32)).astype(np.float32))
        b_t = torch.from_numpy(
            rng.integers(0, NCLS, (2, 128, 128)).astype(np.int64))
        with torch.no_grad():
            fea = rrdb.features(x[:, :3])
        h, bl, a = tm(x, fea)
        loss = (_mse_adapt_weight_t(h[:, 0], h_t, w_t, log_vars[0])
                + _mse_adapt_weight_t(a[:, 0], ha_t, wa_t, log_vars[1])
                + _ce_dice_adapt_weight_t(bl, b_t, w_t, log_vars[2]))
        opt.zero_grad()
        loss.backward()
        opt.step()
    return tm, log_vars


@pytest.mark.slow
class TestCheckpointEvalParity:
    def test_tar_convert_main_test_matches_torch_vtest(self, workdir):
        root = workdir
        cfg = make_cfg(root)
        os.makedirs(cfg.logdir, exist_ok=True)

        # ---- the "published checkpoint": executed torch replica ----
        torch.manual_seed(17)
        rrdb = _TorchRRDBNet(cin=3, cout=3, nf=8, nb=1, gc=8, scale=4)
        rrdb.eval()
        tm, log_vars = _train_torch_replica(rrdb)
        tar = str(root / "checkpoint.tar")
        torch.save({
            "epoch": 2,
            "state_dict": tm.state_dict(),
            "log_vars": [log_vars[i].detach().clone() for i in range(3)],
            "best_acc": 3.25,
        }, tar)
        sr_tar = str(root / "net_g_ema.tar")
        torch.save({"net_g_ema": rrdb.state_dict()}, sr_tar)

        # ---- the real migration CLI, both artifacts ----
        convert.main([tar, os.path.join(cfg.logdir, "height.npz"),
                      "--arch", "height", "--encoder-name", ENC])
        convert.main([sr_tar, cfg.logdirhr,
                      "--arch", "rrdbnet", "--num-block", "1"])

        # ---- framework eval over the synthetic split ----
        res = trainer.main_test(cfg, num_sample=0, suffix="cp")
        assert res is not None
        txt = os.path.join(cfg.logdir, "acc2cp_0.txt")
        assert os.path.isfile(txt), \
            "epoch metadata must flow tar -> npz -> artifact name"

        # ---- torch-executed vtest_epoch2 on the SAME tiles ----
        loader = trainer._make_loader(
            cfg, cfg.testlist, aug=False, isaggre=False, ishir=True,
            num_sample=0, shuffle=False, preweight=cfg.preweight,
            batch_size=1, device_put=False)
        tm.eval()
        rmses = []
        cm = np.zeros((NCLS, NCLS), np.int64)  # [label, pred]
        stats = np.zeros((NCLS, 3), np.float64)
        counts = np.zeros(NCLS, np.float64)
        with torch.no_grad():
            for batch in loader:
                x = torch.from_numpy(
                    np.asarray(batch["image"]).transpose(0, 3, 1, 2))
                y = np.asarray(batch["height"])
                build = np.asarray(batch["build"])
                fea = rrdb.features(x[:, list(cfg.rgbseq)])
                h, bl, _ = tm(x, fea)
                yp = h[:, 0].numpy()
                bp = bl.argmax(1).numpy()
                rmses.append(float(np.sqrt(np.mean((yp - y) ** 2))))
                idx = NCLS * build.reshape(-1).astype(np.int64) + \
                    bp.reshape(-1)
                cm += np.bincount(idx, minlength=NCLS * NCLS
                                  ).reshape(NCLS, NCLS)
                err = yp - y
                for c in range(NCLS):  # metrics.py:186-199 per-batch rule
                    m = build == c
                    n = m.sum()
                    if n == 0:
                        continue
                    stats[c, 0] += np.sqrt(np.mean(err[m] ** 2)) * n
                    stats[c, 1] += np.mean(np.abs(err[m])) * n
                    stats[c, 2] += np.mean(err[m]) * n
                    counts[c] += n

        # ---- artifact comparisons ----
        got_rmse = float(open(txt).read())
        assert got_rmse == pytest.approx(np.mean(rmses), abs=1e-3)

        seg = pd.read_csv(txt[:-4] + "_seg.csv", header=None)
        got_cm = seg.iloc[6:6 + NCLS, :NCLS].to_numpy(np.float64)
        np.testing.assert_array_equal(got_cm, cm.T,  # writer stores cm.T
                                      err_msg="confusion matrix must be "
                                              "EXACT through conversion")

        he = pd.read_csv(txt[:-4] + "_he.csv")
        want_each = stats / (counts[:, None] + 1e-10)
        got = he.to_numpy(np.float64)
        np.testing.assert_allclose(got[:NCLS, :3], want_each, atol=1e-3)
        np.testing.assert_array_equal(got[:NCLS, 3], counts)
        np.testing.assert_allclose(
            got[NCLS, :3], want_each.mean(axis=0), atol=1e-3)  # balanced
        np.testing.assert_allclose(
            got[NCLS + 1, :3], stats.sum(axis=0) / counts.sum(), atol=1e-3)
