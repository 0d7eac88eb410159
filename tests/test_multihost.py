"""Multi-host proof: 2 real ``jax.distributed`` CPU processes with disjoint
DataLoader shards must reproduce the single-process global metrics
(SURVEY.md §5.8 — the DCN story the reference lacks entirely).

Each child initialises the distributed runtime against a shared
coordinator, iterates its own ``DataLoader(shard_index/num_shards)`` shard,
and all-gathers the per-shard sums; the parent asserts both ranks computed
the identical global sum, equal to the single-process answer.
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from srbh_tpu.parallel.mesh import initialize_distributed

initialize_distributed({coord!r}, num_processes=2, process_id={rank})
assert jax.process_count() == 2, jax.process_count()

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from srbh_tpu.data.pipeline import DataLoader


class ArangeDataset:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {{"x": np.full((4,), float(i), np.float32)}}


loader = DataLoader(ArangeDataset(), batch_size=4, shuffle=False,
                    num_workers=1, shard_index=jax.process_index(),
                    num_shards=jax.process_count())
local = 0.0
seen = []
for batch in loader:
    local += float(batch["x"].sum())
    seen += [int(v[0]) for v in batch["x"]]
# disjoint interleaved shards (pipeline.py _indices: idx[rank::nshards])
assert all(i % 2 == {rank} for i in seen), seen
gathered = multihost_utils.process_allgather(jnp.float32(local))
print("GLOBAL", float(gathered.sum()), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shards_match_single_process():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    env.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             CHILD.format(repo=REPO, coord=coord, rank=rank)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    # single-process ground truth: sum over the whole dataset
    expected = float(sum(i * 4.0 for i in range(16)))
    values = [float(o.split("GLOBAL")[1].split()[0]) for o in outs]
    assert values[0] == values[1] == expected, (values, expected)
