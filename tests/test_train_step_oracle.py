"""Full train-step torch oracle for the flagship height training path.

The SR GAN trainer already has a one-step torch oracle
(tests/test_sr_step_oracle.py); this pins the OTHER training loop — the
height model's aggre+weight step (train.py:225-271) — end to end over
THREE steps against an executed torch replica:

* the three adaptive losses MSE_adapt_weight x2 + CE_DICE_adapt_weight
  (losses_pytorch/selfloss.py:81-90,145-168) composed exactly as
  train.py:251-253,
* torch ``Adam(lr=1e-3, weight_decay=1e-4)`` with the extra ``lossweight``
  param group (train.py:170-179) — including the reference's real
  behaviour that the group INHERITS weight_decay=1e-4 and FOLLOWS the lr
  schedule (its skip condition tests dict keys and never fires; asserted
  on the live torch optimizer here),
* ``adjust_learning_rate`` writing the scheduled lr to every group each
  epoch (train.py:68-81) — step 3 runs at a decayed lr,
* train-mode BatchNorm: normalisation over batch statistics AND the
  torch-exact Bessel-corrected running-average update
  (models/layers.py:TorchBatchNorm), compared leaf-for-leaf after the
  three steps.

The torch model/replica comes from tests/test_height_model_oracle.py (no
reference code copied); the frozen-SR feature input is a fixed tensor on
both sides (the composed RRDBNet+model forward is pinned separately by
test_height_model_oracle / test_rrdbnet_oracle — train.py:244 wraps it in
no_grad, which steps.py twins with stop_gradient).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_height_model_oracle import _TorchHeightModel  # noqa: E402
from test_sr_step_oracle import _sign_flip_fraction  # noqa: E402

from srbh_tpu.models import SRRegressClsFeature  # noqa: E402
from srbh_tpu.train import convert  # noqa: E402
from srbh_tpu.train.state import TrainState  # noqa: E402
from srbh_tpu.train.steps import make_train_step  # noqa: E402


class _FixedFeature:
    """Stands in for the frozen RRDBNet: returns a constant feature map
    (the real composition is pinned by test_height_model_oracle)."""

    def __init__(self, fea):
        self._fea = fea

    def apply(self, params, x, features_only=True):
        assert features_only
        return self._fea


def _mse_adapt_weight_t(pred, target, weight, log_var):
    """selfloss.py:81-90: mean(weight * (pred-target)^2) * exp(-s) + s."""
    loss = torch.mean(((pred - target) ** 2) * weight)
    return loss * torch.exp(-log_var) + log_var


def _ce_dice_adapt_weight_t(logits, labels, weight, log_var):
    """selfloss.py:145-168: weighted CE + foreground dice, adapted."""
    ce = torch.nn.functional.cross_entropy(logits, labels, reduction="none")
    ce = torch.mean(ce * weight)
    prob_fg = torch.softmax(logits, dim=1)[:, 1:].sum(1)
    p = prob_fg.reshape(-1)
    t = (labels > 0).float().reshape(-1)
    inter = (p * t).sum()
    dice = 1.0 - (2.0 * inter + 1.0) / (p.sum() + t.sum() + 1.0)
    return (ce + dice) * torch.exp(-log_var) + log_var


class TestTrainStepOracle:
    def test_three_steps_match_torch(self):
        torch.manual_seed(21)
        enc = "efficientnet-test"
        dec_ch = (32, 24, 16, 12, 8)
        tm = _TorchHeightModel(enc, in_ch=8, super_ch=8, super_mid=8,
                               dec_ch=dec_ch, chans_build=7)
        tm.train()  # BN batch statistics + running-average updates
        # efficientnet-pytorch uses bn momentum 0.01 (TF 0.99); the replica's
        # BN modules default to torch 0.1 — align the encoder like the
        # reference (models/efficientnet.py _bn momentum=0.99 flax)
        for m in tm.encoder.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.momentum = 0.01

        sd0 = {k: v.detach().cpu().numpy().copy()
               for k, v in tm.state_dict().items()}

        rng = np.random.default_rng(23)
        x_np = rng.normal(size=(2, 32, 32, 8)).astype(np.float32)
        fea_np = rng.normal(size=(2, 128, 128, 8)).astype(np.float32)
        height_np = np.abs(rng.normal(size=(2, 128, 128))).astype(np.float32) * 8
        weight_np = rng.uniform(0.5, 2.0, size=(2, 128, 128)).astype(np.float32)
        aggre_np = np.abs(rng.normal(size=(2, 32, 32))).astype(np.float32) * 8
        waggre_np = rng.uniform(0.5, 2.0, size=(2, 32, 32)).astype(np.float32)
        build_np = rng.integers(0, 7, size=(2, 128, 128)).astype(np.int32)

        # ---------------- torch reference loop (train.py:225-271 twin)
        xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ft = torch.from_numpy(fea_np.transpose(0, 3, 1, 2))
        height_t = torch.from_numpy(height_np)
        weight_t = torch.from_numpy(weight_np)
        aggre_t = torch.from_numpy(aggre_np)
        waggre_t = torch.from_numpy(waggre_np)
        build_t = torch.from_numpy(build_np).long()

        log_vars_t = tnn.Parameter(torch.zeros(3))
        opt = torch.optim.Adam(tm.parameters(), lr=1e-3, weight_decay=1e-4)
        opt.add_param_group({"params": [log_vars_t], "lr": 1e-3})
        # the reference quirk this framework reproduces, asserted on the
        # live optimizer: add_param_group inherits weight_decay
        assert opt.param_groups[1]["weight_decay"] == pytest.approx(1e-4)

        lrs = [1e-3, 1e-3, 1e-4]  # step decay lands mid-run (train.py:68-81)
        want = []
        sd_snaps = []
        for lr in lrs:
            for g in opt.param_groups:  # adjust_learning_rate writes ALL
                g["lr"] = lr
            h, b, a = tm(xt, ft)
            loss = (
                _mse_adapt_weight_t(h[:, 0], height_t, weight_t, log_vars_t[0])
                + _mse_adapt_weight_t(a[:, 0], aggre_t, waggre_t,
                                      log_vars_t[1])
                + _ce_dice_adapt_weight_t(b, build_t, weight_t, log_vars_t[2])
            )
            rmse = torch.sqrt(torch.mean((h[:, 0] - height_t) ** 2))
            opt.zero_grad()
            loss.backward()
            opt.step()
            want.append((float(loss.detach()), float(rmse.detach()),
                         log_vars_t.detach().numpy().copy()))
            sd_snaps.append({k: v.detach().cpu().numpy().copy()
                             for k, v in tm.state_dict().items()})

        # ---------------- framework loop from the SAME converted weights
        variables = convert.convert_height_model(sd0, isaggre=True,
                                                 encoder_name=enc)
        model = SRRegressClsFeature(encoder_name=enc, super_mid=8,
                                    isaggre=True, chans_build=7,
                                    decoder_channels=dec_ch,
                                    drop_connect_rate=0.0)
        state = TrainState.create(variables, n_log_vars=3, lr=1e-3,
                                  weight_decay=1e-4, log_var_lr=1e-3)
        step = make_train_step(model, _FixedFeature(jnp.asarray(fea_np)),
                               isaggre=True, seed=0)
        batch = {
            "image": jnp.asarray(x_np),
            "height": jnp.asarray(height_np),
            "weight": jnp.asarray(weight_np),
            "height_aggre": jnp.asarray(aggre_np),
            "weight_aggre": jnp.asarray(waggre_np),
            "build": jnp.asarray(build_np),
        }
        got = []
        params_snaps = []
        stats_snaps = []
        for lr in lrs:
            state, metrics = step(state, {}, batch,
                                  jnp.asarray(lr, jnp.float32))
            got.append((float(metrics["loss"]), float(metrics["rmse"]),
                        np.asarray(metrics["log_vars"])))
            params_snaps.append(jax.tree_util.tree_map(np.asarray,
                                                       state.params))
            stats_snaps.append(jax.tree_util.tree_map(np.asarray,
                                                      state.batch_stats))

        # ---------------- losses / rmse / log_vars per step
        for i, ((lw, rw, lvw), (lg, rg, lvg)) in enumerate(zip(want, got)):
            assert lg == pytest.approx(lw, rel=1e-3, abs=1e-4), f"loss step {i}"
            assert rg == pytest.approx(rw, rel=1e-3, abs=1e-4), f"rmse step {i}"
            np.testing.assert_allclose(lvg, lvw, atol=2e-5,
                                       err_msg=f"log_vars step {i}")

        # ---------------- parameters. After step 1 every Adam update is
        # +-lr exactly, so frameworks agree to grad-sign flips (elements
        # whose true gradient is ~0); later steps accumulate benign
        # magnitude noise below ~2*lr, so step 3 gets the looser threshold.
        after1 = convert.convert_height_model(sd_snaps[0], isaggre=True,
                                              encoder_name=enc)
        frac1 = _sign_flip_fraction(params_snaps[0], after1["params"],
                                    thresh=1e-4)
        assert frac1 < 0.005, \
            f"{frac1:.4%} of step-1 params diverged beyond 1e-4"
        after = convert.convert_height_model(sd_snaps[-1], isaggre=True,
                                             encoder_name=enc)
        frac3 = _sign_flip_fraction(params_snaps[-1], after["params"],
                                    thresh=2.5e-3)
        assert frac3 < 0.001, \
            f"{frac3:.4%} of step-3 params diverged beyond 2.5e-3"

        # ---------------- BN running statistics after step 1: both sides
        # update from IDENTICAL params, so the batch statistics match to
        # f32 noise and any variance-semantics mismatch (flax stores the
        # biased batch variance; torch the Bessel-corrected one —
        # TorchBatchNorm reproduces torch) would show as a systematic
        # (n-1)/n error ~1e-2 at this tile size. Step 3 only bounds the
        # benign param-drift compounding.
        flat_got = jax.tree_util.tree_leaves_with_path(stats_snaps[0])
        flat_want = dict(jax.tree_util.tree_leaves_with_path(
            after1["batch_stats"]))
        assert flat_got and len(flat_got) == len(flat_want)
        for path, leaf in flat_got:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_want[path]), atol=2e-5,
                err_msg=f"step-1 batch_stats {jax.tree_util.keystr(path)}")
        flat_want3 = dict(jax.tree_util.tree_leaves_with_path(
            after["batch_stats"]))
        for path, leaf in jax.tree_util.tree_leaves_with_path(stats_snaps[-1]):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_want3[path]),
                rtol=0.15, atol=5e-3,
                err_msg=f"step-3 batch_stats {jax.tree_util.keystr(path)}")
