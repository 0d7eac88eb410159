"""RUN-level torch parity oracle: schedule x BatchNorm x resume composed.

test_train_step_oracle.py pins three consecutive train STEPS; this pins a
tiny multi-epoch RUN against one uninterrupted executed torch replica —
the composition the reference actually executes (train.py:181-222):

* 3 "epochs" x 2 batches with the step-LR boundary landing mid-run
  (adjust_learning_rate semantics, train.py:68-81, scaled to epoch 3),
* a validation pass after every epoch with the BN train->eval flip
  (vtest_epoch, train.py:315-344: eval-mode plain MSE + RMSE, no stat
  updates),
* ONE mid-run resume on the framework side — checkpoint after epoch 2,
  restore into a fresh TrainState (save_opt_state=True exact resume),
  continue — while the torch side never stops: parity proves resume is
  invisible to the training trajectory.

Per-epoch train losses/log_vars, per-epoch val loss/RMSE, and the final
params are asserted against torch. Models/losses come from the verified
replicas (tests/test_height_model_oracle.py); no reference code copied.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_height_model_oracle import _TorchHeightModel  # noqa: E402
from test_sr_step_oracle import _sign_flip_fraction  # noqa: E402
from test_train_step_oracle import (  # noqa: E402
    _FixedFeature,
    _ce_dice_adapt_weight_t,
    _mse_adapt_weight_t,
)

from srbh_tpu.models import SRRegressClsFeature  # noqa: E402
from srbh_tpu.train import convert  # noqa: E402
from srbh_tpu.train.checkpoint import (  # noqa: E402
    load_checkpoint,
    restore_into_state,
    save_checkpoint,
)
from srbh_tpu.train.state import TrainState  # noqa: E402
from srbh_tpu.train.steps import make_eval_step, make_train_step  # noqa: E402

ENC = "efficientnet-test"
DEC_CH = (32, 24, 16, 12, 8)
# scaled reference schedule: x0.1 after the boundary (train.py:68-81)
EPOCH_LRS = [1e-3, 1e-3, 1e-4]
STEPS_PER_EPOCH = 2


def _make_batches(rng, n, b=2, tile=32):
    out = []
    for _ in range(n):
        h = np.abs(rng.normal(size=(b, tile * 4, tile * 4))
                   ).astype(np.float32) * 8
        out.append({
            "image": rng.normal(size=(b, tile, tile, 8)).astype(np.float32),
            "height": h,
            "weight": rng.uniform(0.5, 2.0, (b, tile * 4, tile * 4)
                                  ).astype(np.float32),
            "height_aggre": h.reshape(b, tile, 4, tile, 4).mean((2, 4)),
            "weight_aggre": rng.uniform(0.5, 2.0, (b, tile, tile)
                                        ).astype(np.float32),
            "build": rng.integers(0, 7, (b, tile * 4, tile * 4)
                                  ).astype(np.int32),
        })
    return out


@pytest.mark.slow
class TestRunLevelOracle:
    def test_three_epoch_run_with_resume_matches_torch(self, tmp_path):
        torch.manual_seed(31)
        tm = _TorchHeightModel(ENC, in_ch=8, super_ch=8, super_mid=8,
                               dec_ch=DEC_CH, chans_build=7)
        tm.train()
        for m in tm.encoder.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.momentum = 0.01  # efficientnet-pytorch BN momentum

        sd0 = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
        rng = np.random.default_rng(33)
        fea_np = rng.normal(size=(2, 128, 128, 8)).astype(np.float32)
        train_batches = _make_batches(rng, STEPS_PER_EPOCH)
        val_batch = _make_batches(rng, 1)[0]

        # ---------------- uninterrupted torch run (train.py:181-222 twin)
        def t_of(b):
            return {k: (torch.from_numpy(v).long() if k == "build"
                        else torch.from_numpy(v))
                    for k, v in b.items()}

        tb = [t_of(b) for b in train_batches]
        vb = t_of(val_batch)
        ft = torch.from_numpy(fea_np.transpose(0, 3, 1, 2))
        log_vars_t = tnn.Parameter(torch.zeros(3))
        opt = torch.optim.Adam(tm.parameters(), lr=1e-3, weight_decay=1e-4)
        opt.add_param_group({"params": [log_vars_t], "lr": 1e-3})

        want_train, want_val = [], []
        for lr in EPOCH_LRS:
            for g in opt.param_groups:
                g["lr"] = lr
            tm.train()
            ep_losses = []
            for b in tb:
                x = b["image"].permute(0, 3, 1, 2)
                h, bl, a = tm(x, ft)
                loss = (_mse_adapt_weight_t(h[:, 0], b["height"], b["weight"],
                                            log_vars_t[0])
                        + _mse_adapt_weight_t(a[:, 0], b["height_aggre"],
                                              b["weight_aggre"], log_vars_t[1])
                        + _ce_dice_adapt_weight_t(bl, b["build"], b["weight"],
                                                  log_vars_t[2]))
                opt.zero_grad()
                loss.backward()
                opt.step()
                ep_losses.append(float(loss.detach()))
            want_train.append(ep_losses)
            tm.eval()  # vtest_epoch: eval-mode BN, no stat updates
            with torch.no_grad():
                h, _, _ = tm(vb["image"].permute(0, 3, 1, 2), ft)
                mse = torch.mean((h[:, 0] - vb["height"]) ** 2)
            want_val.append(float(mse))
        final_sd = {k: v.detach().numpy().copy()
                    for k, v in tm.state_dict().items()}
        want_logvars = log_vars_t.detach().numpy().copy()

        # ---------------- framework run with a resume after epoch 2
        variables = convert.convert_height_model(sd0, isaggre=True,
                                                 encoder_name=ENC)
        model = SRRegressClsFeature(encoder_name=ENC, super_mid=8,
                                    isaggre=True, chans_build=7,
                                    decoder_channels=DEC_CH,
                                    drop_connect_rate=0.0)
        fixed = _FixedFeature(jnp.asarray(fea_np))
        step = make_train_step(model, fixed, isaggre=True, seed=0)
        eval_step = make_eval_step(model, fixed)
        jb = [{k: jnp.asarray(v) for k, v in b.items()} for b in train_batches]
        jvb = {"image": jnp.asarray(val_batch["image"]),
               "height": jnp.asarray(val_batch["height"])}

        def make_state(vs):
            return TrainState.create(vs, n_log_vars=3, lr=1e-3,
                                     weight_decay=1e-4, log_var_lr=1e-3)

        state = make_state(variables)
        got_train, got_val = [], []
        logdir = str(tmp_path / "run")
        for epoch, lr in enumerate(EPOCH_LRS, start=1):
            if epoch == 3:
                # mid-run resume ACROSS the decay boundary: rebuild
                # everything from the on-disk checkpoint only
                payload = load_checkpoint(f"{logdir}/checkpoint")
                assert payload is not None and payload["epoch"] == 2
                assert "opt_state" in payload
                state = restore_into_state(
                    make_state(convert.convert_height_model(
                        sd0, isaggre=True, encoder_name=ENC)), payload)
            ep_losses = []
            for b in jb:
                state, m = step(state, {}, dict(b), jnp.asarray(lr))
                ep_losses.append(float(m["loss"]))
            got_train.append(ep_losses)
            got_val.append(float(eval_step(state, {}, jvb)["loss"]))
            save_checkpoint(logdir, state, epoch, best_rmse=0.0,
                            save_opt_state=True)

        # ---------------- assertions
        for e, (w, g) in enumerate(zip(want_train, got_train), 1):
            np.testing.assert_allclose(
                g, w, rtol=2e-3 * e, atol=1e-3 * e,
                err_msg=f"epoch-{e} train losses")
        for e, (w, g) in enumerate(zip(want_val, got_val), 1):
            assert g == pytest.approx(w, rel=3e-3 * e, abs=1e-3 * e), \
                f"epoch-{e} val mse: {g} vs {w}"
        np.testing.assert_allclose(np.asarray(state.log_vars), want_logvars,
                                   atol=3e-4)
        after = convert.convert_height_model(final_sd, isaggre=True,
                                             encoder_name=ENC)
        frac = _sign_flip_fraction(
            jax.tree_util.tree_map(np.asarray, state.params),
            after["params"], thresh=5e-3)
        assert frac < 0.005, \
            f"{frac:.4%} of final params diverged beyond 5e-3"
        # BN running stats after 6 steps + 3 eval flips: bounds the benign
        # param-drift compounding only (the tight per-step check lives in
        # test_train_step_oracle.py; measured worst drift here was 0.016
        # on one decoder BN mean element)
        flat_want = dict(jax.tree_util.tree_leaves_with_path(
            after["batch_stats"]))
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                jax.tree_util.tree_map(np.asarray, state.batch_stats)):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_want[path]),
                rtol=0.3, atol=3e-2,
                err_msg=f"final batch_stats {jax.tree_util.keystr(path)}")
