"""Datalist generation and train/val/test splitting.

Twin of BH_dataset.py: builds ``datalist_{region}.csv`` from tile dirs,
shuffle-splits train 0.7 / (val 0.33 of the rest / test) with pandas
``sample(frac=1, random_state=1)`` — the identical RNG call — and merges
china/eu/usa into ``globe`` lists with per-row s1/s2/bh dir columns.

Ordering note: tile names are SORTED before the seeded shuffle. The
reference uses raw ``Path.rglob`` order (BH_dataset.py:63-75), which is
filesystem-dependent and not reproducible in general; sorted input is the
deterministic choice and matches the reference's shipped datalists
(pinned by tests/test_datalist_goldens-style golden tests), i.e.
row-for-row equality holds exactly when rglob yields sorted order — the
case the shipped artifacts came from.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import pandas as pd


def split_data(datalist_path: str, split_rate: float = 0.9, id: str = "2",
               n1: str = "train", n2: str = "test"):
    """Shuffle-split a CSV into two (BH_dataset.py:35-52); idempotent."""
    data_dir = os.path.dirname(datalist_path)
    base = os.path.basename(datalist_path)[:-4]
    train_path = os.path.join(data_dir, f"{base}_{n1}{id}.csv")
    test_path = os.path.join(data_dir, f"{base}_{n2}{id}.csv")
    if os.path.exists(train_path) and os.path.exists(test_path):
        return train_path, test_path
    df = pd.read_csv(datalist_path, sep=",", header=None)
    df1 = df.sample(frac=1, random_state=1)
    num_train = int(len(df1) * split_rate)
    df1[:num_train].to_csv(train_path, index=False, sep=",", header=None)
    df1[num_train:].to_csv(test_path, index=False, sep=",", header=None)
    return train_path, test_path


def generate_allfile(ipath: str, subdir, invalid: Optional[str] = None,
                     suffix: str = "", numsample: int = 0):
    """Scan tile dirs -> datalist CSV -> 0.7 train / 0.3*(0.33 val, 0.67 test)
    splits (BH_dataset.py:55-96)."""
    if not isinstance(subdir, (list, tuple)):
        subdir = [subdir]
    names = []
    for sd in subdir:
        for f in Path(os.path.join(ipath, sd)).rglob("*.tif"):
            iname = f.stem + ".tif"
            if invalid is None or invalid not in iname:
                names.append(iname)
    df = pd.DataFrame({"imglist": sorted(names)})
    if numsample:
        df = df.sample(n=numsample, random_state=1)
    respath = os.path.join(ipath, f"datalist_{suffix}.csv")
    if not os.path.exists(respath):
        df.to_csv(respath, header=False, index=False)
    split_data(respath, split_rate=0.7, id="_0.7", n1="train", n2="test")
    split_data(os.path.join(ipath, f"datalist_{suffix}_test_0.7.csv"),
               split_rate=0.33, id="_0.3", n1="val", n2="test")
    return respath


def addabspath(ipath: str, city: str, flist=None, listdir: str = "datalistcopy"):
    """Append per-region s1/s2/bh/... dir columns to each csv
    (BH_dataset.py:168-188)."""
    if flist is None:
        flist = sorted(Path(os.path.join(ipath, listdir)).glob(f"*{city}*.csv"))
    subdir = {"s1": f"s1{city}_check", "s2": f"s2{city}_check",
              "bh": f"bh{city}", "ge": f"ge{city}_check",
              "dem": f"dem{city}", "dsm": f"dsm{city}"}
    for file in flist:
        df = pd.read_csv(str(file), header=None)
        if len(df.columns) >= 1 + len(subdir):
            continue  # already augmented: re-running the recipe is a no-op
        for k, v in subdir.items():
            df[k] = v
        df.to_csv(os.path.join(ipath, Path(file).name), header=False, index=False)


def concat_allfile(ipath: str, flist: Sequence[str] = ("china", "eu", "usa"),
                   suffix: str = "globe", mergetype: str = ""):
    """Concatenate per-region CSVs into a globe list (BH_dataset.py:141-165)."""
    frames = [pd.read_csv(os.path.join(ipath, f"datalist_{c}{mergetype}.csv"),
                          header=None) for c in flist]
    respath = os.path.join(ipath, f"datalist_{suffix}{mergetype}.csv")
    if not os.path.exists(respath):
        pd.concat(frames).to_csv(respath, header=False, index=False)
    return respath


MERGE_TYPES = ("", "_test_0.7", "_train_0.7", "_test_0.7_test_0.3",
               "_test_0.7_val_0.3")


def build_globe_lists(ipath: str, regions=("china", "eu", "usa"),
                      china_cap: int = 15000):
    """The reference's full __main__ recipe (BH_dataset.py:191-223)."""
    generate_allfile(ipath, "s1usa_check", invalid=None, suffix="usa")
    generate_allfile(ipath, "s1china_check", invalid="shenzhen",
                     suffix="china", numsample=china_cap)
    generate_allfile(ipath, "s1eu_check", invalid=None, suffix="eu")
    for c in regions:
        flist = [Path(ipath) / f"datalist_{c}{m}.csv" for m in MERGE_TYPES]
        addabspath(ipath, c, flist=[f for f in flist if f.exists()])
    for m in MERGE_TYPES:
        concat_allfile(ipath, regions, "globe", m)
