"""Tile datasets: the host-side sample producers.

Twin of the BH_loader.py dataset classes, returning numpy dicts ready for
``srbh_tpu.data.pipeline`` batching:

* :class:`S12GlobeDataset`      (BH_loader.py:282-400) — the main training /
  eval dataset: S2 (first ``nchans``) + S1 GeoTIFF tiles, min-max or mean-std
  per-region normalisation with (0,1) clipping, joint augmentation at the x4
  grid, hierarchical class mask + per-pixel weights, 64x64 aggregated height
  GT. Exact pixel recipe: img x4 nearest -> aug -> normalise -> x0.25
  nearest -> clip (BH_loader.py:354-369).
* :class:`S2GlobeDataset` / :class:`S1GlobeDataset` (BH_loader.py:404-634) —
  single-sensor ablations.
* :class:`LRHRPairDataset`      (BH_loader.py:638-757) — LR (S2 RGB) / HR
  (GoogleEarth) pairs for SR finetuning, with joint flips.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np
import pandas as pd

from srbh_tpu.data.augment import augment_lrhr_pair, augment_pair_lowres
from srbh_tpu.data.tiff import read_tiff
from srbh_tpu.ops.hierarchy import DEFAULT_HIR, WEIGHT_METHODS, build_hierarchy_lut
from srbh_tpu.ops.normalize import load_stats_table, norm_offsets


def _aggregate_numpy(height: np.ndarray, scale: float = 0.25) -> np.ndarray:
    """Block mean (aggregate_torch semantics: validity = h >= 0,
    aggregate_utils.py:29-41)."""
    step = int(round(1 / scale))
    h, w = height.shape
    blocks = height.reshape(h // step, step, w // step, step).astype(np.float64)
    num = blocks.sum(axis=(1, 3))
    den = (blocks >= 0).sum(axis=(1, 3))
    return (num / (den + 1e-10)).astype(np.float32)


class S12GlobeDataset:
    """Sentinel-2 + Sentinel-1 tile dataset with hierarchy targets."""

    def __init__(self, datalist: str, rootname: str, datastats: str = "datastats",
                 normmethod: str = "minmax", datarange: Optional[Tuple] = (0, 1),
                 aug: bool = False, num_sample: int = 0,
                 s1dir: str = "s1", s2dir: str = "s2", heightdir: str = "bh",
                 preweight: Optional[str] = None, isaggre: bool = False,
                 ishir: bool = False, hir=DEFAULT_HIR, nchans: int = 6,
                 weightmethod: str = "sqrt", seed: int = 1337,
                 device_aug: bool = False, device_norm: bool = False):
        self.nchans = nchans
        self.datalist = pd.read_csv(datalist, sep=",", header=None)
        if len(self.datalist.columns) == 1:
            for d in (s1dir, s2dir, heightdir):
                self.datalist[d] = d
        if num_sample > 0:
            self.datalist = self.datalist[:num_sample]
        self.aug = aug
        self.rootname = rootname
        self.s2_off = self.s2_scale = self.s1_off = self.s1_scale = None
        # lazily optional (the S1/S2-only ablations each need only one
        # table) but NEVER silently skipped: __getitem__ raises if a needed
        # table is absent — the reference's np.loadtxt fails loudly too
        # (BH_loader.py:300-306), and feeding unnormalised DN values would
        # be clipped to an all-ones image with no error otherwise
        self._s2_stats_path = os.path.join(
            datastats, f"{s2dir}_{normmethod}.txt")
        if nchans > 0 and os.path.exists(self._s2_stats_path):
            self.s2_off, self.s2_scale = norm_offsets(
                load_stats_table(self._s2_stats_path, nchans), normmethod)
        self._s1_stats_path = os.path.join(
            datastats, f"{s1dir}_{normmethod}.txt")
        if os.path.exists(self._s1_stats_path):
            self.s1_off, self.s1_scale = norm_offsets(
                load_stats_table(self._s1_stats_path), normmethod)
        self.datarange = datarange
        num_hier = len(hir) - 1
        self.heightweight = np.ones((num_hier,))
        if preweight is not None:
            stats = np.loadtxt(preweight)
            self.heightweight = WEIGHT_METHODS.get(
                weightmethod, WEIGHT_METHODS["sqrt"])(stats, hir)
        if isaggre and not ishir:
            # the aggregated-weight path indexes the hierarchy LUT; the
            # reference crashes identically (buildhir only exists when ishir,
            # BH_loader.py:326-329, yet is used at :389) — fail clearly here
            raise ValueError("isaggre=True requires ishir=True")
        self.isaggre = isaggre
        self.ishir = ishir
        self.buildhir = build_hierarchy_lut(hir) if ishir else None
        self.seed = seed
        self._epoch = 0
        # device_aug: the host skips augmentation AND target building —
        # both run inside the jitted train step (ops/device_aug.py), so
        # __getitem__ returns only the normalised image + raw height. The
        # cv2 rotation (~48% of per-tile host cost, tools/loader_bench.py)
        # moves to the TPU.
        if device_aug and aug:
            raise ValueError("device_aug replaces host aug: pass aug=False")
        self.device_aug = device_aug
        # device_norm (requires device_aug): ship RAW sensor DNs (s2 in its
        # natural uint16, s1 float32) and normalise in-jit — the per-band
        # affine + clip is bit-exact on device, and raw s2 is 2x smaller
        # on the wire than the normalised float32 image
        if device_norm and not device_aug:
            raise ValueError("device_norm requires device_aug")
        if device_norm and (self.s2_off is None or self.s1_off is None):
            # the in-jit normaliser needs both tables up front; failing here
            # keeps the "never silently skipped" stats contract (the step
            # would otherwise die with an obscure jnp.asarray(None) error)
            raise FileNotFoundError(
                f"device_norm needs both stats tables: "
                f"{self._s2_stats_path} and {self._s1_stats_path}")
        self.device_norm = device_norm
        # per-sample pandas .iloc costs ~2 ms; resolve rows to tuples once
        self._rows = list(self.datalist.itertuples(index=False, name=None))
        self._weight32 = self.heightweight.astype(np.float32)

    def __len__(self):
        return len(self._rows)

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation stream (torch's per-epoch loader state).
        Called by ``DataLoader.__iter__`` at the start of every epoch."""
        self._epoch = int(epoch)

    def _sample_rng(self, index: int) -> np.random.Generator:
        """Augmentation RNG as a pure function of (seed, epoch, index):
        deterministic for a given cfg.seed regardless of loader thread
        interleaving or num_workers (a shared np Generator is not
        thread-safe under the ThreadPoolExecutor loader)."""
        return np.random.default_rng((self.seed, self._epoch, index))

    def _load_pair(self, index):
        basename, s1dir, s2dir, bhdir = self._rows[index][:4]
        s2 = read_tiff(os.path.join(self.rootname, s2dir, basename))[..., : self.nchans]
        s1 = read_tiff(os.path.join(self.rootname, s1dir, basename))
        img = np.concatenate([s2, s1], axis=-1).astype(np.float32)
        hpath = os.path.join(self.rootname, bhdir, basename)
        if os.path.exists(hpath):
            height = read_tiff(hpath)[..., 0]
        else:
            height = np.ones((256, 256), np.uint8)  # BH_loader.py:346
        return img, height, os.path.join(self.rootname, s2dir, basename)

    def __getitem__(self, index):
        if self.device_norm:
            if type(self) is not S12GlobeDataset:
                raise NotImplementedError(
                    "device_norm is only wired for the S12 main path")
            # raw-DN mode: normalisation + clip + aug + targets all run
            # in-jit; s2 keeps its file dtype (uint16) on the wire. Reads
            # each raster ONCE (no _load_pair float32 concat)
            basename, s1dir, s2dir, bhdir = self._rows[index][:4]
            s2 = read_tiff(os.path.join(self.rootname, s2dir, basename)
                           )[..., : self.nchans]
            s1 = read_tiff(os.path.join(self.rootname, s1dir, basename))
            hpath = os.path.join(self.rootname, bhdir, basename)
            height = (read_tiff(hpath)[..., 0] if os.path.exists(hpath)
                      else np.ones((256, 256), np.uint8))
            return {"s2": np.ascontiguousarray(s2),
                    "s1": np.ascontiguousarray(s1.astype(np.float32)),
                    "height": np.ascontiguousarray(height),
                    "path": os.path.join(self.rootname, s2dir, basename)}
        img, height, img_path = self._load_pair(index)
        # The reference recipe is: x4 nearest up (so augmentation acts on the
        # 2.5 m grid) -> aug -> normalise -> x0.25 nearest -> clip
        # (BH_loader.py:354-369). x4-up then [::4] is the identity, flips /
        # grid shuffles are 4x4-block-aligned, and normalisation commutes
        # with subsampling — so the fused low-res path below is bit-identical
        # while only the rotation branch ever touches a 4x-res image.
        if self.aug:
            img, height = augment_pair_lowres(self._sample_rng(index), img, height)
        # normalise: first nchans are S2, rest S1 (BH_loader.py:361-363)
        bs2 = self.nchans
        if bs2 > 0:
            if self.s2_off is None:
                raise FileNotFoundError(
                    f"missing S2 stats table {self._s2_stats_path}")
            img[..., :bs2] = (img[..., :bs2] - self.s2_off) / self.s2_scale
        if img.shape[-1] > bs2:
            if self.s1_off is None:
                raise FileNotFoundError(
                    f"missing S1 stats table {self._s1_stats_path}")
            img[..., bs2:] = (img[..., bs2:] - self.s1_off) / self.s1_scale
        if isinstance(self.datarange, tuple):
            img = img.clip(*self.datarange)
        return self._finish_sample(img, height, img_path)

    def _finish_sample(self, img, height, img_path):
        if self.device_aug:
            # keep the height's natural integer dtype (uint8 rasters): 4x
            # fewer host->device bytes; the in-jit target builder casts
            return {"image": np.ascontiguousarray(img),
                    "height": np.ascontiguousarray(height),
                    "path": img_path}
        height = height.astype(np.float32)
        if self.ishir:
            build = self.buildhir[height.astype(np.int64).clip(0, 255)]
            weight = self._weight32[build]
        else:
            build = (height > 0).astype(np.int64)
            weight = np.ones_like(build, np.float32)

        sample = {"image": np.ascontiguousarray(img),
                  "height": height, "build": build.astype(np.int32),
                  "weight": weight, "path": img_path}
        if self.isaggre:
            aggre = _aggregate_numpy(height, 0.25)
            build_aggre = self.buildhir[aggre.astype(np.int64).clip(0, 255)]
            sample["height_aggre"] = aggre
            sample["weight_aggre"] = self._weight32[build_aggre]
        return sample


class S2GlobeDataset(S12GlobeDataset):
    """S2-only ablation (BH_loader.py:404-516)."""

    def _load_pair(self, index):
        basename, _s1dir, s2dir, bhdir = self._rows[index][:4]
        s2 = read_tiff(os.path.join(self.rootname, s2dir, basename))[..., : self.nchans]
        img = s2.astype(np.float32)
        hpath = os.path.join(self.rootname, bhdir, basename)
        height = (read_tiff(hpath)[..., 0] if os.path.exists(hpath)
                  else np.ones((256, 256), np.uint8))
        return img, height, os.path.join(self.rootname, s2dir, basename)


class S1GlobeDataset(S12GlobeDataset):
    """S1-only ablation (BH_loader.py:520-634)."""

    def _load_pair(self, index):
        basename, s1dir, _s2dir, bhdir = self._rows[index][:4]
        s1 = read_tiff(os.path.join(self.rootname, s1dir, basename))
        img = s1.astype(np.float32)
        hpath = os.path.join(self.rootname, bhdir, basename)
        height = (read_tiff(hpath)[..., 0] if os.path.exists(hpath)
                  else np.ones((256, 256), np.uint8))
        return img, height, os.path.join(self.rootname, s1dir, basename)

    def __getitem__(self, index):
        # S1-only: all channels normalised with the S1 table (same fused
        # low-res recipe as S12GlobeDataset.__getitem__)
        img, height, img_path = self._load_pair(index)
        if self.aug:
            img, height = augment_pair_lowres(self._sample_rng(index), img, height)
        if self.s1_off is None:
            raise FileNotFoundError(
                f"missing S1 stats table {self._s1_stats_path}")
        img = (img - self.s1_off) / self.s1_scale
        if isinstance(self.datarange, tuple):
            img = img.clip(*self.datarange)
        return self._finish_sample(img.astype(np.float32), height, img_path)

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("nchans", 0)
        super().__init__(*args, **kwargs)
        # S1 table drives everything; S2 table may not exist for pure-S1 runs


class LRHRPairDataset:
    """LR (Sentinel-2 RGB) / HR (GoogleEarth) pairs for Real-ESRGAN
    finetuning (BH_loader.py:638-757): joint Flip + RandomGridShuffle(2,2)
    + Rotate (each p=0.5, applied to the x4-up LR concatenated with HR —
    here in the fused low-res form), per-band stats normalisation for both
    sides, LR-only datarange clip, and the reference's seeded
    ``.sample(n, random_state=0)`` subset selection."""

    def __init__(self, datalist: str, rootname: str, datastats: str,
                 normmethod: str = "minmax", aug: bool = False,
                 num_sample: int = 0, s2dir: str = "s2", gedir: str = "ge",
                 nchans: int = 3, seed: int = 1337):
        self.datalist = pd.read_csv(datalist, sep=",", header=None)
        if num_sample > 0:  # BH_loader.py:703-704: seeded random subset
            self.datalist = self.datalist.sample(n=num_sample, random_state=0)
        self.rootname = rootname
        self.s2dir, self.gedir = s2dir, gedir
        self.nchans = nchans
        self.aug = aug
        table = load_stats_table(os.path.join(datastats, f"{s2dir}_{normmethod}.txt"),
                                 nchans)
        self.off, self.scale = norm_offsets(table, normmethod)
        # HR target stats (BH_loader.py:709-712). The reference repo ships
        # no ge_* table (its SR data lives off-repo), so when the file is
        # absent fall back to the uint8 GE identity table (0, 255) — the
        # only self-consistent default — instead of crashing; a shipped
        # table is honoured exactly.
        ge_path = os.path.join(datastats, f"{gedir}_{normmethod}.txt")
        if os.path.exists(ge_path):
            self.ge_off, self.ge_scale = norm_offsets(
                load_stats_table(ge_path, 3), normmethod)
        else:
            self.ge_off = np.zeros(3, np.float32)
            self.ge_scale = np.full(3, 255.0, np.float32)
        self.seed = seed
        self._epoch = 0
        self._rows = list(self.datalist.itertuples(index=False, name=None))

    def __len__(self):
        return len(self._rows)

    set_epoch = S12GlobeDataset.set_epoch
    _sample_rng = S12GlobeDataset._sample_rng

    def __getitem__(self, index):
        row = self._rows[index]
        basename = row[0]
        s2dir = row[2] if len(row) > 2 else self.s2dir
        gedir = row[4] if len(row) > 4 else self.gedir
        lr = read_tiff(os.path.join(self.rootname, s2dir, basename))[..., : self.nchans]
        hr = read_tiff(os.path.join(self.rootname, gedir, basename))[..., :3]
        lr = lr.astype(np.float32)
        hr = hr.astype(np.float32)
        if self.aug:
            # reference order: x4-up, concat, aug, normalise, x0.25-down,
            # clip (BH_loader.py:729-750). Flip/shuffle/warp all commute
            # with the per-band affine normalisation, so augmenting the raw
            # values first is exact; the LR side runs in the fused low-res
            # form (see augment.augment_lrhr_pair).
            lr, hr = augment_lrhr_pair(self._sample_rng(index), lr, hr)
        lr = ((lr - self.off) / self.scale).clip(0, 1)  # clip: LR only
        hr = (hr - self.ge_off) / self.ge_scale
        return {"lq": np.ascontiguousarray(lr), "gt": np.ascontiguousarray(hr)}
