"""Regression tests for the eighth-review findings:

1. CAM drivers resize to input size BEFORE max-fusing the flip pair
   (reference order; max and bilinear resize do not commute).
2. CLIPScore preprocessing uses the torch F.interpolate nearest convention
   (src = floor(dst * in / out)), not jax's half-pixel-centre nearest.
3. accprint_seg emits the reference's trailing class-1 summary block.
4. color_jitter follows torchvision ColorJitter semantics: random op
   order, luma-based contrast/saturation blends, per-op clamping.
5. metrics package imports stay light: the CLIP/LPIPS towers load only
   when a learned metric is actually used.
"""
import subprocess
import sys

import numpy as np
import pytest


class TestCamFuseOrder:
    def test_resize_before_max(self):
        from srbh_tpu.utils.cam import multi_scale_puzzle

        # one-hot peaks in ADJACENT low-res cells of the two flip halves:
        # resize-then-max dips between the peaks, max-then-resize does not
        img = np.zeros((1, 16, 16, 1), np.float32)

        def cam_fn(x):
            n = x.shape[0] // 2
            h = x.shape[1] // 4
            out = np.zeros((2 * n, h, h, 1), np.float32)
            out[:n, h // 2, 0] = 1.0            # forward peak, left edge
            out[n:, h // 2, 0] = 1.0            # flipped peak -> right edge
            return out

        import cv2

        cam = multi_scale_puzzle(cam_fn, img, scales=())[0, :, :, 0]
        # reference-ordered expectation
        h = 4
        fwd = np.zeros((h, h), np.float32)
        fwd[h // 2, 0] = 1.0
        flip = fwd[:, ::-1]
        up = lambda a: cv2.resize(a, (16, 16))
        want = np.maximum(up(fwd), up(flip))
        want = want - want.min()
        want = want / (want.max() + 1e-5)
        np.testing.assert_allclose(cam, want, atol=1e-6)


def test_nearest_torch_convention():
    import jax.numpy as jnp

    from srbh_tpu.metrics.learned import _nearest_torch

    x = jnp.arange(3, dtype=jnp.float32).reshape(1, 3, 1, 1)
    x = jnp.broadcast_to(x, (1, 3, 3, 1))
    out = _nearest_torch(x, 4)
    # torch picks rows [0, 0, 1, 2]; jax half-pixel nearest picks [0,1,1,2]
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0, 0], [0, 0, 1, 2])


def test_accprint_seg_tail_block(capsys):
    from srbh_tpu.metrics.streaming import SegmentationMetric, accprint_seg

    m = SegmentationMetric(3)
    pred = np.array([0, 1, 1, 2, 2, 2])
    ref = np.array([0, 1, 2, 2, 2, 1])
    m.add_batch(pred, ref)
    accprint_seg(m)
    lines = capsys.readouterr().out.strip().splitlines()
    i = next(k for k, ln in enumerate(lines) if ln.startswith("numtotal"))
    tail = lines[i + 1:]
    assert len(tail) == 5  # oa, iou[1], f1[1], ua[1], pa[1]
    assert tail[0] == f"{m.overall_accuracy():.3f}"
    assert tail[1] == f"{m.iou()[1]:.3f}"
    assert tail[4] == f"{m.recall()[1]:.3f}"


class _ScriptedRng:
    """np.random.Generator stand-in with scripted draws."""

    def __init__(self, uniforms, perm):
        self._uniforms = list(uniforms)
        self._perm = np.asarray(perm)

    def random(self):
        return 0.0  # always apply

    def uniform(self, lo, hi):
        return self._uniforms.pop(0)

    def permutation(self, n):
        return self._perm


class TestColorJitter:
    def _img(self):
        rng = np.random.default_rng(0)
        return rng.random((8, 8, 3)).astype(np.float32)

    def test_saturation_zero_gives_luma_gray(self):
        from srbh_tpu.data.augment import _LUMA, color_jitter

        img = self._img()
        out = color_jitter(_ScriptedRng([1.0, 1.0, 0.0, 0.0], [2, 0, 1, 3]),
                           img, hue=0.0)
        gray = img @ _LUMA
        for c in range(3):
            np.testing.assert_allclose(out[..., c], gray, atol=1e-5)

    def test_contrast_zero_gives_scalar_luma_mean(self):
        from srbh_tpu.data.augment import _LUMA, color_jitter

        img = self._img()
        out = color_jitter(_ScriptedRng([1.0, 0.0, 1.0, 0.0], [1, 0, 2, 3]),
                           img, contrast=1.0, hue=0.0)
        np.testing.assert_allclose(out, float((img @ _LUMA).mean()), atol=1e-5)

    def test_op_order_matters(self):
        from srbh_tpu.data.augment import color_jitter

        img = self._img()
        draws = [1.8, 0.3, 1.0, 0.0]  # strong brightness + contrast
        a = color_jitter(_ScriptedRng(list(draws), [0, 1, 2, 3]), img,
                         brightness=1.0, contrast=1.0, hue=0.0)
        b = color_jitter(_ScriptedRng(list(draws), [1, 0, 2, 3]), img,
                         brightness=1.0, contrast=1.0, hue=0.0)
        # brightness clamps before contrast in (a) but after in (b)
        assert not np.allclose(a, b)

    def test_factor_range_clamps_at_zero(self):
        from srbh_tpu.data.augment import color_jitter

        seen = []

        class Probe(_ScriptedRng):
            def uniform(self, lo, hi):
                seen.append((lo, hi))
                return 1.0

        color_jitter(Probe([], [0, 1, 2, 3]), self._img(),
                     brightness=2.0, contrast=0.5, saturation=0.5, hue=0.25)
        assert seen[0] == (0.0, 3.0)   # max(0, 1-2) floor
        assert seen[1] == (0.5, 1.5)
        assert seen[3] == (-0.25, 0.25)


@pytest.mark.slow
def test_metrics_import_stays_light():
    code = (
        "import sys, srbh_tpu.metrics as M\n"
        "assert 'srbh_tpu.models.clip' not in sys.modules, 'eager CLIP'\n"
        "assert 'srbh_tpu.metrics.learned' not in sys.modules, 'eager learned'\n"
        "assert callable(M.calculate_clipscore)\n"
        "assert 'srbh_tpu.metrics.learned' in sys.modules\n"
        "print('LAZY OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "LAZY OK" in out.stdout
