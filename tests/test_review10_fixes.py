"""Regression tests for the tenth adversarial-review findings."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestSchedulerGamma:
    def test_yaml_gamma_reaches_schedule(self, tmp_path):
        """load_finetune_yml parsed scheduler gamma but trainer_from_yml
        dropped it: a 'gamma: 0.1' YAML silently trained with x0.5 decay."""
        yml = tmp_path / "ft.yml"
        yml.write_text(
            "scale: 4\n"
            "network_g: {num_feat: 8, num_block: 2, num_grow_ch: 4}\n"
            "train:\n"
            "  optim_g: {lr: 1.0e-4}\n"
            "  scheduler: {milestones: [100], gamma: 0.1}\n"
            "  perceptual_opt: {}\n")
        from srbh_tpu.train.sr_config import load_finetune_yml, trainer_from_yml

        cfg = load_finetune_yml(str(yml))
        assert cfg["trainer"]["gamma"] == pytest.approx(0.1)
        tr = trainer_from_yml(str(yml))
        assert float(tr.schedule(99)) == pytest.approx(1e-4)
        assert float(tr.schedule(101)) == pytest.approx(1e-5)  # x0.1, not x0.5


class TestExportCkptGuards:
    def test_single_ckpt_flag_rejected(self, tmp_path):
        """--ckpt without --sr-ckpt silently exported a random RRDBNet trunk."""
        from srbh_tpu.tools import export_model

        ck = tmp_path / "m.msgpack"
        ck.write_bytes(b"\x80")
        with pytest.raises(SystemExit):
            export_model.main([str(tmp_path / "out.shlo"), "--ckpt", str(ck)])
        with pytest.raises(SystemExit):
            export_model.main([str(tmp_path / "out.shlo"),
                               "--sr-ckpt", str(ck)])


class TestDiscriminatorWarmStart:
    def test_init_accepts_pretrained_d_vars(self):
        """The reference recipe warm-starts the discriminator
        (finetune yml pretrain_network_d; rrdbnet_arch.py:483-488) — init()
        must accept converted d_vars instead of always fresh-initialising."""
        from srbh_tpu.train.sr_trainer import RealESRGANTrainer

        tr = RealESRGANTrainer(num_block=2, num_feat=8, num_grow_ch=4,
                               disc_feat=8, perceptual=False)
        rng = jax.random.PRNGKey(0)
        st0 = tr.init(rng, (1, 8, 8, 3))
        custom = jax.tree_util.tree_map(lambda x: x + 1.0, st0.d_vars)
        st1 = tr.init(rng, (1, 8, 8, 3), d_vars=custom)
        a = jax.tree_util.tree_leaves(st1.d_vars)[0]
        b = jax.tree_util.tree_leaves(custom)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineMicrobatchValidation:
    def test_zero_microbatches_rejected(self):
        """num_microbatches=0 was silently coerced to the stage count."""
        from srbh_tpu.models import RRDBNet
        from srbh_tpu.parallel import mesh as pmesh
        from srbh_tpu.parallel.pipeline import rrdb_pipeline_features

        sr = RRDBNet(num_block=2, num_feat=8, num_grow_ch=4)
        x = jnp.zeros((4, 8, 8, 3))
        params = sr.init(jax.random.PRNGKey(0), x)["params"]
        mesh = pmesh.make_mesh(n_model=2)
        with pytest.raises(ValueError, match="microbatches must be >= 1"):
            rrdb_pipeline_features(sr, params, x, mesh, num_microbatches=0)


class TestCRSUnitGuards:
    def test_feet_unit_rejected(self):
        """US state-plane feet parsed as metres -> silent ~3.3x mislocation."""
        from srbh_tpu.data.crs import from_wkt

        wkt = ('PROJCS["NAD83 / Florida East (ftUS)",GEOGCS["NAD83",'
               'DATUM["D",SPHEROID["GRS 1980",6378137,298.257222101]],'
               'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Transverse_Mercator"],'
               'PARAMETER["central_meridian",-81],'
               'PARAMETER["scale_factor",0.999941],'
               'PARAMETER["false_easting",656166.667],'
               'UNIT["US survey foot",0.30480060960121924]]')
        with pytest.raises(ValueError, match="UNIT factor"):
            from_wkt(wkt)

    def test_nonzero_prime_meridian_rejected(self):
        from srbh_tpu.data.crs import from_wkt

        wkt = ('GEOGCS["NTF (Paris)",DATUM["D",SPHEROID["Clarke 1880",'
               '6378249.2,293.466021293627]],PRIMEM["Paris",2.33722917],'
               'UNIT["degree",0.0174532925199433]]')
        with pytest.raises(ValueError, match="prime meridian"):
            from_wkt(wkt)

    def test_metre_and_degree_still_parse(self):
        from srbh_tpu.data.crs import Geographic, TransverseMercator, from_wkt

        g = from_wkt('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
                     '6378137,298.257223563]],PRIMEM["Greenwich",0],'
                     'UNIT["degree",0.0174532925199433]]')
        assert isinstance(g, Geographic)
        p = from_wkt('PROJCS["WGS 84 / UTM 33N",GEOGCS["WGS 84",'
                     'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
                     '298.257223563]],PRIMEM["Greenwich",0],'
                     'UNIT["degree",0.0174532925199433]],'
                     'PROJECTION["Transverse_Mercator"],'
                     'PARAMETER["central_meridian",15],'
                     'PARAMETER["scale_factor",0.9996],'
                     'PARAMETER["false_easting",500000],UNIT["metre",1]]')
        assert isinstance(p, TransverseMercator)


class TestDistributedProbe:
    def test_uses_public_is_initialized(self):
        """initialize_distributed must use the supported public API, not
        jax._src internals (mesh.py review finding)."""
        import inspect

        from srbh_tpu.parallel import mesh as pmesh

        src = inspect.getsource(pmesh.initialize_distributed)
        assert "jax.distributed.is_initialized" in src
        assert "jax._src" not in src
