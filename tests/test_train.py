"""End-to-end train-step tests: loss decreases, DP sharding over the 8-device
CPU mesh, LR schedule, checkpoint roundtrip.

The tiny pipeline (RRDBNet-1 frozen + 'efficientnet-test' height model) is
built ONCE per module — setup + train-step compile costs ~2 min on the
single-core CI host, so every test shares the same jitted step and params.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu import models
from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu.train.checkpoint import load_checkpoint, restore_into_state, save_checkpoint
from srbh_tpu.train.schedule import step_decay_lr
from srbh_tpu.train.state import TrainState
from srbh_tpu.train.steps import make_eval_step, make_predict_step, make_train_step

TILE = 32
BATCH = 8


def tiny_setup(batch=BATCH, tile=TILE, seed=0):
    """Tiny flagship pipeline: RRDBNet(1 block) frozen + test-size height model."""
    rng = jax.random.PRNGKey(seed)
    sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8)
    model = models.SRRegressClsFeature(
        encoder_name="efficientnet-test", super_mid=8, isaggre=True,
        chans_build=7,
    )
    x = jnp.zeros((batch, tile, tile, 8))
    sr_params = jax.jit(sr.init)(rng, x[..., :3])
    fea_shape = (batch, tile * 4, tile * 4, 8)
    variables = jax.jit(model.init)(rng, x, jnp.zeros(fea_shape))
    state = TrainState.create(variables, n_log_vars=3, lr=1e-3)
    return model, sr, state, sr_params


def tiny_batch(batch=BATCH, tile=TILE, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, 50, (batch, tile * 4, tile * 4)).astype(np.float32)
    return {
        "image": rng.uniform(0, 1, (batch, tile, tile, 8)).astype(np.float32),
        "height": h,
        "height_aggre": h.reshape(batch, tile, 4, tile, 4).mean((2, 4)),
        "build": (h > 10).astype(np.int32) * 3,
        "weight": np.ones((batch, tile * 4, tile * 4), np.float32),
        "weight_aggre": np.ones((batch, tile, tile), np.float32),
    }


@pytest.fixture(scope="module")
def pipeline():
    model, sr, state, sr_params = tiny_setup()
    host_vars = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }

    def fresh_state():
        # cheap donation-safe clone (model init costs ~1 min; this doesn't)
        return TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, host_vars), n_log_vars=3, lr=1e-3)

    step = make_train_step(model, sr)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    return {"model": model, "sr": sr, "fresh_state": fresh_state,
            "sr_params": sr_params, "step": step, "batch": batch}


@pytest.fixture(scope="module")
def trained(pipeline):
    """8 steps of training; shared by loss-decrease + checkpoint tests.

    NOTE: donate_argnums=(0,) means each call consumes its input state.
    """
    state = pipeline["fresh_state"]()
    losses = []
    for _ in range(8):
        state, m = pipeline["step"](state, pipeline["sr_params"],
                                    pipeline["batch"], jnp.asarray(1e-3))
        losses.append(float(m["loss"]))
    return {"state": state, "losses": losses, "first_metrics_loss": losses[0]}


class TestSchedule:
    def test_step_decay(self):
        # train.py:68-81 semantics
        assert step_decay_lr(1e-3, 1) == 1e-3
        assert step_decay_lr(1e-3, 10) == 1e-3
        assert step_decay_lr(1e-3, 11) == pytest.approx(1e-4)
        assert step_decay_lr(1e-3, 20) == pytest.approx(1e-4)
        assert step_decay_lr(1e-3, 21) == pytest.approx(1e-5)


class TestTrainStep:
    def test_loss_decreases_and_logvars_move(self, trained):
        losses = trained["losses"]
        assert losses[-1] < losses[0], losses
        assert not np.allclose(np.asarray(trained["state"].log_vars), 0.0)
        assert int(trained["state"].step) == 8

    def test_eval_and_predict_steps(self, pipeline, trained):
        ev = make_eval_step(pipeline["model"], pipeline["sr"])
        m = ev(trained["state"], pipeline["sr_params"], pipeline["batch"])
        assert np.isfinite(float(m["rmse"]))
        pred = make_predict_step(pipeline["model"], pipeline["sr"])
        height, build = pred(trained["state"], pipeline["sr_params"],
                             pipeline["batch"]["image"])
        assert height.shape == (BATCH, TILE * 4, TILE * 4)
        assert build.shape == (BATCH, TILE * 4, TILE * 4, 7)


class TestDeviceAugStep:
    """device_aug=True: the step consumes only image+height and builds
    augmentation + targets in-jit (ops/device_aug.py)."""

    def test_runs_and_is_deterministic(self, pipeline):
        from srbh_tpu.ops.hierarchy import DEFAULT_HIR, hierweight

        cw = hierweight(np.linspace(1, 100, 256), DEFAULT_HIR)
        step = make_train_step(pipeline["model"], pipeline["sr"],
                               device_aug=True, hir=DEFAULT_HIR,
                               class_weight=cw, seed=3)
        raw = {"image": pipeline["batch"]["image"],
               "height": pipeline["batch"]["height"]}
        losses = []
        for _ in range(2):
            state = pipeline["fresh_state"]()
            state, m = step(state, pipeline["sr_params"], dict(raw),
                            jnp.asarray(1e-3))
            assert np.isfinite(float(m["loss"]))
            losses.append(float(m["loss"]))
        assert losses[0] == losses[1]  # same seed+step -> same augmentation

    def test_device_norm_matches_device_aug(self, pipeline):
        """norm= (raw s2 DNs + s1 in, normalise in-jit) must match the
        device_aug step fed the host-normalised image. Not bitwise: XLA's
        f32 division is reciprocal-based, 1 ulp off numpy's exactly-rounded
        divide (measured: 1-ulp input deltas on ~1% of pixels), so losses
        and updated params agree to float noise, not bits."""
        from srbh_tpu.ops.hierarchy import DEFAULT_HIR

        rng = np.random.default_rng(5)
        s2 = rng.integers(0, 5000, (BATCH, TILE, TILE, 6)).astype(np.uint16)
        s1 = rng.uniform(-25, 5, (BATCH, TILE, TILE, 2)).astype(np.float32)
        norm = {"s2_off": np.zeros(6, np.float32),
                "s2_scale": np.full(6, 5000.0, np.float32),
                "s1_off": np.full(2, -25.0, np.float32),
                "s1_scale": np.full(2, 30.0, np.float32)}
        image = np.concatenate(
            [(s2.astype(np.float32) - norm["s2_off"]) / norm["s2_scale"],
             (s1 - norm["s1_off"]) / norm["s1_scale"]], -1).clip(0, 1)
        height = pipeline["batch"]["height"]

        kw = dict(isaggre=True, seed=7, device_aug=True,
                  hir=DEFAULT_HIR, class_weight=np.ones(7))
        step_a = make_train_step(pipeline["model"], pipeline["sr"], **kw)
        step_n = make_train_step(pipeline["model"], pipeline["sr"],
                                 norm=norm, **kw)
        sa = pipeline["fresh_state"]()
        sa, ma = step_a(sa, pipeline["sr_params"],
                        {"image": jnp.asarray(image), "height": height},
                        jnp.asarray(1e-3))
        sn = pipeline["fresh_state"]()
        sn, mn = step_n(sn, pipeline["sr_params"],
                        {"s2": jnp.asarray(s2), "s1": jnp.asarray(s1),
                         "height": height}, jnp.asarray(1e-3))
        assert float(ma["loss"]) == pytest.approx(float(mn["loss"]),
                                                  rel=1e-5)
        pa = jax.tree_util.tree_leaves(sa.params)
        pn = jax.tree_util.tree_leaves(sn.params)
        for a, b in zip(pa, pn):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3)  # Adam step-1 sign noise

    def test_device_norm_clips_after_augmentation(self, pipeline):
        """ADVICE r3: the host augments RAW DNs and clips LAST
        (dataset.py:175-190) — normalisation (affine) commutes with the
        bilinear rotation, clip does not — so the device_norm branch must
        clip AFTER the in-jit augmentation. Saturating s2 DNs (above the
        stats max) pin the ordering against a plain step fed the manually
        computed host-order batch."""
        from srbh_tpu.ops.device_aug import augment_batch, build_targets
        from srbh_tpu.ops.hierarchy import DEFAULT_HIR, build_hierarchy_lut

        rng = np.random.default_rng(11)
        # ~40% of DNs ABOVE the stats max -> normalised values in (1, 1.6]
        s2 = rng.integers(0, 8000, (BATCH, TILE, TILE, 6)).astype(np.uint16)
        s1 = rng.uniform(-25, 5, (BATCH, TILE, TILE, 2)).astype(np.float32)
        norm = {"s2_off": np.zeros(6, np.float32),
                "s2_scale": np.full(6, 5000.0, np.float32),
                "s1_off": np.full(2, -25.0, np.float32),
                "s1_scale": np.full(2, 30.0, np.float32)}
        height = pipeline["batch"]["height"]
        seed = 7
        # replicate the step's internal normalise -> augment -> clip (same
        # jnp ops, same aug key layout: fold 'aug' tag, then step=0)
        s2n = ((jnp.asarray(s2).astype(jnp.float32)
                - jnp.asarray(norm["s2_off"], jnp.float32))
               / jnp.asarray(norm["s2_scale"], jnp.float32))
        s1n = ((jnp.asarray(s1) - jnp.asarray(norm["s1_off"], jnp.float32))
               / jnp.asarray(norm["s1_scale"], jnp.float32))
        raw_img = jnp.concatenate([s2n, s1n], -1)
        aug_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), 0x617567), 0)
        img_after, h_aug = augment_batch(aug_key, raw_img, height)
        img_after = jnp.clip(img_after, 0, 1)
        # the orderings genuinely differ on this draw (otherwise this test
        # could not discriminate clip-first from clip-last)
        img_before, _ = augment_batch(aug_key, jnp.clip(raw_img, 0, 1),
                                      height)
        assert float(jnp.abs(img_after - img_before).max()) > 1e-3

        lut = jnp.asarray(build_hierarchy_lut(DEFAULT_HIR))
        targets = build_targets(h_aug, lut, jnp.ones(7, jnp.float32),
                                isaggre=True)
        plain = make_train_step(pipeline["model"], pipeline["sr"],
                                isaggre=True, seed=seed)
        sp = pipeline["fresh_state"]()
        sp, mp = plain(sp, pipeline["sr_params"],
                       {"image": img_after, **targets}, jnp.asarray(1e-3))
        step_n = make_train_step(pipeline["model"], pipeline["sr"],
                                 isaggre=True, seed=seed, device_aug=True,
                                 norm=norm, hir=DEFAULT_HIR,
                                 class_weight=np.ones(7))
        sn = pipeline["fresh_state"]()
        sn, mn = step_n(sn, pipeline["sr_params"],
                        {"s2": jnp.asarray(s2), "s1": jnp.asarray(s1),
                         "height": height}, jnp.asarray(1e-3))
        assert float(mp["loss"]) == pytest.approx(float(mn["loss"]),
                                                  rel=1e-5)

    def test_different_steps_draw_different_augmentations(self, pipeline):
        from srbh_tpu.ops.hierarchy import DEFAULT_HIR

        step = make_train_step(pipeline["model"], pipeline["sr"],
                               device_aug=True, hir=DEFAULT_HIR,
                               class_weight=np.ones(7), seed=3)
        raw = {"image": pipeline["batch"]["image"],
               "height": pipeline["batch"]["height"]}
        state = pipeline["fresh_state"]()
        state, m1 = step(state, pipeline["sr_params"], dict(raw),
                         jnp.asarray(0.0))  # lr=0: params unchanged
        state, m2 = step(state, pipeline["sr_params"], dict(raw),
                         jnp.asarray(0.0))
        # same params (lr=0, but BN stats move) -> loss differs only
        # through the new augmentation draw / BN update; in practice the
        # augmentation dominates and the losses must differ
        assert float(m1["loss"]) != float(m2["loss"])


class TestNosuperVariant:
    def test_train_step_without_sr_model(self):
        """The no-SR ablation (mymodels.py:341-409, cfg.model_variant=
        'nosuper') trains through the same step factory with sr_model=None."""
        rng = jax.random.PRNGKey(0)
        model = models.SRRegressClsNosuper(
            encoder_name="efficientnet-test", isaggre=True, chans_build=7)
        x = jnp.zeros((BATCH, TILE, TILE, 8))
        variables = jax.jit(model.init)(rng, x)
        state = TrainState.create(variables, n_log_vars=3, lr=1e-3)
        step = make_train_step(model, None)
        batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
        state, m = step(state, None, batch, jnp.asarray(1e-3))
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["rmse"]))


import flax.linen as fnn  # noqa: E402  (test-local probe module below)


class _RngProbeModel(fnn.Module):
    """Minimal height-model-interface module whose outputs depend on the
    'dropout' rng — isolates the seed plumbing of make_train_step.

    (The 'efficientnet-test' encoder never reaches a drop-connect branch —
    depth 0.1 leaves no identity blocks — so the tiny pipeline can't observe
    the rng; the full B4 does, see efficientnet.py MBConv.)"""

    @fnn.compact
    def __call__(self, x, train=False):
        from srbh_tpu.ops.resize import upsample_nearest

        h = fnn.Conv(8, (1, 1), name="c1")(x)
        h = fnn.BatchNorm(use_running_average=not train, name="bn")(h)
        h = fnn.Dropout(0.5, deterministic=not train)(h)
        up = upsample_nearest(h, 4)
        height = fnn.Conv(1, (1, 1), name="ch")(up)
        build = fnn.Conv(7, (1, 1), name="cb")(up)
        aggre = fnn.Conv(1, (1, 1), name="ca")(h)
        return height, build, aggre


class TestSeedThreading:
    def test_seed_reaches_dropout_rng(self):
        """cfg.seed roots the per-step dropout/drop-connect RNG (steps.py):
        same seed => identical update, different seed => different update
        (the round-1 hard-coded PRNGKey(0) regression)."""
        model = _RngProbeModel()
        x = jnp.ones((2, 8, 8, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            x, train=True)
        batch = {
            "image": x,
            "height": jnp.ones((2, 32, 32)),
            "height_aggre": jnp.ones((2, 8, 8)),
            "build": jnp.zeros((2, 32, 32), jnp.int32),
            "weight": jnp.ones((2, 32, 32)),
            "weight_aggre": jnp.ones((2, 8, 8)),
        }
        fresh = lambda: TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, jax.device_get(variables)),
            n_log_vars=3, lr=1e-3)
        step_a = make_train_step(model, None, seed=1)
        step_b = make_train_step(model, None, seed=2)
        sa1, _ = step_a(fresh(), None, batch, jnp.asarray(1e-3))
        sa2, _ = step_a(fresh(), None, batch, jnp.asarray(1e-3))
        sb, _ = step_b(fresh(), None, batch, jnp.asarray(1e-3))
        la1 = jax.tree_util.tree_leaves(sa1.params)
        la2 = jax.tree_util.tree_leaves(sa2.params)
        lb = jax.tree_util.tree_leaves(sb.params)
        for a, b in zip(la1, la2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(not np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(la1, lb))


class TestDataParallel:
    def test_dp_matches_single_device(self, pipeline):
        """Same batch sharded over the 8-device mesh must produce the same
        loss as the unsharded step (XLA inserts the collectives)."""
        mesh = pmesh.make_mesh()
        assert mesh.devices.size == 8
        state = pipeline["fresh_state"]()
        _, m1 = pipeline["step"](state, pipeline["sr_params"],
                                 pipeline["batch"], jnp.asarray(1e-3))
        loss1 = float(m1["loss"])

        state2 = pipeline["fresh_state"]()
        sharded = pmesh.shard_batch(pipeline["batch"], mesh)
        state2 = pmesh.replicate(state2, mesh)
        sr_rep = pmesh.replicate(pipeline["sr_params"], mesh)
        state2, m2 = pipeline["step"](state2, sr_rep, sharded, jnp.asarray(1e-3))
        assert np.isfinite(float(m2["loss"]))
        np.testing.assert_allclose(loss1, float(m2["loss"]), rtol=2e-5)

    def test_dp_batch_stats_are_global_batch(self, pipeline):
        """BN parity pin (steps.py docstring): stats after one sharded step
        equal the unsharded step's — global-batch BN == the reference's
        single-GPU BN over the same batch."""
        mesh = pmesh.make_mesh()
        state1 = pipeline["fresh_state"]()
        state1, _ = pipeline["step"](state1, pipeline["sr_params"],
                                     pipeline["batch"], jnp.asarray(1e-3))
        state2 = pmesh.replicate(pipeline["fresh_state"](), mesh)
        sharded = pmesh.shard_batch(pipeline["batch"], mesh)
        sr_rep = pmesh.replicate(pipeline["sr_params"], mesh)
        state2, _ = pipeline["step"](state2, sr_rep, sharded, jnp.asarray(1e-3))
        for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                        jax.tree_util.tree_leaves(state2.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestCheckpoint:
    def test_roundtrip(self, pipeline, trained, tmp_path):
        state = trained["state"]
        path = save_checkpoint(str(tmp_path), state, epoch=5, best_rmse=3.3)
        payload = load_checkpoint(path)
        assert payload["epoch"] == 5 and payload["best_rmse"] == 3.3

        fresh = pipeline["fresh_state"]()
        restored = restore_into_state(fresh, payload)
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(restored.log_vars),
                                   np.asarray(state.log_vars))
        # snapshot copy exists (epoch 5 % 5 == 0), like checkpoint{N}.tar
        assert (tmp_path / "checkpoint5").is_dir()

    def test_async_save_commits_and_serialises(self, trained, tmp_path):
        """async_save returns immediately; wait_for_saves() then makes the
        crash-safe dir visible with identical contents, and back-to-back
        async saves serialise (last writer wins)."""
        from srbh_tpu.train.checkpoint import wait_for_saves

        state = trained["state"]
        save_checkpoint(str(tmp_path), state, epoch=1, best_rmse=9.0,
                        async_save=True)
        save_checkpoint(str(tmp_path), state, epoch=2, best_rmse=8.0,
                        async_save=True)
        wait_for_saves()
        payload = load_checkpoint(str(tmp_path / "checkpoint"))
        assert payload["epoch"] == 2 and payload["best_rmse"] == 8.0
        for a, b in zip(jax.tree_util.tree_leaves(payload["params"]),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_missing_checkpoint_returns_none(self, tmp_path):
        assert load_checkpoint(str(tmp_path / "nope")) is None

    def test_default_omits_opt_state_like_reference(self, trained, tmp_path):
        # train.py:207 keeps the optimizer-state save commented out
        path = save_checkpoint(str(tmp_path), trained["state"], epoch=1,
                               best_rmse=1.0)
        assert load_checkpoint(path).get("opt_state") is None

    def test_exact_resume_restores_opt_state(self, pipeline, trained, tmp_path):
        state = trained["state"]
        path = save_checkpoint(str(tmp_path), state, epoch=6, best_rmse=2.0,
                               save_opt_state=True)
        restored = restore_into_state(pipeline["fresh_state"](),
                                      load_checkpoint(path))
        ref_leaves = jax.tree_util.tree_leaves(state.opt_state)
        got_leaves = jax.tree_util.tree_leaves(restored.opt_state)
        assert len(ref_leaves) == len(got_leaves)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # the restored state must step identically to the original (donation
        # consumes both inputs, so this is the last use of `trained`)
        s1, m1 = pipeline["step"](state, pipeline["sr_params"],
                                  pipeline["batch"], jnp.asarray(1e-3))
        s2, m2 = pipeline["step"](restored, pipeline["sr_params"],
                                  pipeline["batch"], jnp.asarray(1e-3))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
