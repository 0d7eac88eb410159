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


TP_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from srbh_tpu.parallel.mesh import initialize_distributed

initialize_distributed({coord!r}, num_processes=2, process_id={rank})
assert jax.process_count() == 2 and len(jax.devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu import models

sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8)
x = np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
params = jax.jit(sr.init)(jax.random.PRNGKey(0), jnp.asarray(x))
fn = lambda p, im: sr.apply(p, im, features_only=True)
ref = np.asarray(jax.jit(fn)(params, jnp.asarray(x)))  # local single-device

mesh = pmesh.make_mesh(n_model=2)  # (2 hosts' data) x (2 model) globally
n_model = mesh.shape["model"]


def gput(v, spec):
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(v.shape, s, lambda idx: v[idx])


tp = jax.tree_util.tree_map(
    lambda v: gput(np.asarray(v), pmesh.tp_param_spec(v, n_model)), params)
xg = gput(x, P())
out = jax.jit(fn, out_shardings=NamedSharding(mesh, P()))(tp, xg)
diff = float(np.abs(np.asarray(out) - ref).max())
assert diff < 1e-5, diff
print("TPOK", diff, flush=True)
"""


FSDP_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from srbh_tpu.parallel.mesh import initialize_distributed

initialize_distributed({coord!r}, num_processes=2, process_id={rank})
assert jax.process_count() == 2 and len(jax.devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu import models

sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8)
x = np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
params = jax.jit(sr.init)(jax.random.PRNGKey(0), jnp.asarray(x))
fn = lambda p, im: sr.apply(p, im, features_only=True)
ref = np.asarray(jax.jit(fn)(params, jnp.asarray(x)))  # local single-device

mesh = pmesh.make_mesh()  # (4,) data over both hosts' devices
n_data = mesh.shape["data"]


def gput(v, spec):
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(v.shape, s, lambda idx: v[idx])


fs = jax.tree_util.tree_map(
    lambda v: gput(np.asarray(v), pmesh.fsdp_param_spec(v, n_data)), params)
# each process must hold only its own 1/4 shards of the divisible kernels
for leaf in jax.tree_util.tree_leaves(fs):
    if leaf.ndim >= 2 and leaf.shape[-1] % n_data == 0:
        local = sum(s.data.size for s in leaf.addressable_shards)
        assert local == leaf.size // 2, (leaf.shape, local)  # 2 of 4 shards
xg = gput(x, P())
out = jax.jit(fn, out_shardings=NamedSharding(mesh, P()))(fs, xg)
diff = float(np.abs(np.asarray(out) - ref).max())
assert diff < 1e-5, diff
print("FSDPOK", diff, flush=True)
"""


def test_two_host_fsdp_forward():
    """2 jax.distributed processes x 2 local devices: the frozen trunk with
    params FULLY sharded over the global 4-device data axis
    (parallel/mesh.py:fsdp_param_spec) matches the local single-device
    forward — each host stores half the model, GSPMD all-gathers across
    DCN+ICI."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             FSDP_CHILD.format(repo=REPO, coord=coord, rank=rank)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for rank in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        assert "FSDPOK" in out, out


def test_two_host_tensor_parallel_forward():
    """2 jax.distributed processes x 2 local devices: the frozen trunk with
    conv channels sharded over a GLOBAL (2 data, 2 model) mesh matches the
    local single-device forward on every host — TP across DCN+ICI, not just
    within one process."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             TP_CHILD.format(repo=REPO, coord=coord, rank=rank)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for rank in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        assert "TPOK" in out, out
