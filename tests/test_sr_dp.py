"""Data-parallel Real-ESRGAN GAN step on the 8-device mesh.

The reference's SR finetune recipe is multi-GPU data-parallel
(`SR/finetune_realesrgan_x4plus_pairdata.yml:5` ``num_gpu: auto`` with
``batch_size_per_gpu: 12``; BasicSR wraps the nets in DDP). The TPU-native
equivalent is pure sharding: replicate the GANTrainState, shard lq/gt on
the mesh's data axis, and run the SAME jitted fused step — GSPMD inserts
the gradient all-reduces for both G and D, the SN power-iteration state
stays replicated (it reads only replicated weights), and the EMA update
is elementwise on replicated trees. No step code changes at all.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu.train.sr_trainer import RealESRGANTrainer


@pytest.fixture(scope="module")
def setup():
    tr = RealESRGANTrainer(num_block=1, num_feat=8, num_grow_ch=8,
                           disc_feat=8, perceptual=False)
    state = tr.init(jax.random.PRNGKey(0), (8, 16, 16, 3))
    step = tr.make_step()
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    return tr, state, step, lq, gt


def test_dp_gan_step_matches_single_device(setup):
    tr, state0, step, lq, gt = setup
    # single device
    state1, m1 = step(state0, lq, gt)

    # 8-way DP: replicated state, batch-sharded data, same jitted step
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    state2 = pmesh.replicate(tr.init(jax.random.PRNGKey(0), (8, 16, 16, 3)),
                             mesh)
    sharded = pmesh.shard_batch({"lq": lq, "gt": gt}, mesh)
    state2, m2 = step(state2, sharded["lq"], sharded["gt"])

    for k in ("l_g_pix", "l_g_gan", "l_g_total", "l_d_real", "l_d_fake"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-5,
                                   err_msg=k)
    # post-step generator params, EMA, and discriminator (incl. SN
    # power-iteration state) match the single-device update;
    # tree_map asserts equal tree STRUCTURE, not just a zipped prefix
    for name in ("g_params", "g_ema", "d_vars"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=name),
            getattr(state1, name), getattr(state2, name))


def test_dp_gan_second_step_stays_sharded(setup):
    # the donated/updated state must keep working for a second sharded step
    tr, state0, step, lq, gt = setup
    mesh = pmesh.make_mesh()
    state = pmesh.replicate(tr.init(jax.random.PRNGKey(0), (8, 16, 16, 3)),
                            mesh)
    sharded = pmesh.shard_batch({"lq": lq, "gt": gt}, mesh)
    state, _ = step(state, sharded["lq"], sharded["gt"])
    state, m = step(state, sharded["lq"], sharded["gt"])
    assert int(state.step) == 2
    assert np.isfinite(float(m["l_g_total"]))
