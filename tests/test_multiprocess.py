"""REAL multi-process validation of the multihost wiring: two OS processes
form a jax.distributed runtime over localhost (CPU backend, 4 virtual
devices each → one 8-device global mesh), assemble a global batch from
host-local shards, and run a psum'd computation. This is the integration test
the reference never had for its multi-node path (Lightning ddp,
configs/ddp.yaml:1-5 — SURVEY §4: "Multi-node/distributed testing: none").
"""
import os
import socket
import subprocess
import sys

import pytest

# Workers import ot_vae_tpu from a tmp_path script; make the repo root
# importable explicitly so the test does not depend on an editable install.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
from ot_vae_tpu.parallel import (
    ProcessComm, global_mesh, host_local_batch_to_global,
    initialize_distributed, per_host_slice,
)
ok = initialize_distributed(coordinator_address=coordinator,
                            num_processes=2, process_id=pid)
assert ok, "expected multi-process init"
assert jax.process_count() == 2
assert jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
mesh = global_mesh()
assert mesh.devices.size == 8

# per-host data feeding: global dataset of 16 rows, each host loads 8
data = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
local = data[per_host_slice(16)]
assert local.shape == (8, 3)
g = host_local_batch_to_global(mesh, local)
assert g.shape == (16, 3)

# a jit'd global reduction must see ALL rows
total = jax.jit(lambda x: jnp.sum(x))(g)
expect = float(data.sum())
assert abs(float(total) - expect) < 1e-3, (float(total), expect)

# host-side cross-process metric reduction
comm = ProcessComm()
s = comm.psum(np.asarray([float(pid + 1)]))
assert float(s[0]) == 3.0  # 1 + 2

# FID-state reduction across processes (the reference's torchmetrics
# dist_reduce_fx="sum" path, metrics/fid.py:90-97): each process streams
# HALF the data; the psum'd (Σf, Σffᵀ, n) states must reproduce the
# whole-data FID exactly
from ot_vae_tpu.metrics import FrechetInceptionDistance
rng = np.random.default_rng(0)
real = rng.normal(size=(16, 2, 2, 3)).astype(np.float32)
fake = (rng.normal(size=(16, 2, 2, 3)) * 1.3 + 0.2).astype(np.float32)
fid = FrechetInceptionDistance(
    feature_size=12, feature_fn=lambda im: im.reshape(im.shape[0], -1),
    min_obs=4)
sl = per_host_slice(16)
st = fid.update(fid.init(), samples=real[sl], generated=fake[sl])
gst = comm.psum(jax.tree_util.tree_map(np.asarray, st))
val_dist = float(fid.compute(gst))
st_all = fid.update(fid.init(), samples=real, generated=fake)
val_all = float(fid.compute(st_all))
assert np.isfinite(val_all) and val_all > 0
assert abs(val_dist - val_all) < 1e-3 * max(1.0, abs(val_all)), (val_dist, val_all)

print(f"WORKER{pid} OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_runtime(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = ""  # let the worker's config.update pick cpu
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out


_TRAINER_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
from ot_vae_tpu.parallel import (
    ProcessComm, global_mesh, initialize_distributed, per_host_slice,
)
assert initialize_distributed(coordinator_address=coordinator,
                              num_processes=2, process_id=pid)
assert jax.device_count() == 8

import numpy as np
from ot_vae_tpu.data import MNIST32
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import CNN
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.trainer import Trainer

dm = MNIST32(train_batch_size=20, val_batch_size=20, test_batch_size=20,
             seed=7, synthetic_train=160, synthetic_test=80)
dm.setup()
# per-host data feeding: every split holds only this process's contiguous
# shard (the DistributedSampler equivalent)
for split in ("train", "val", "test"):
    ds = getattr(dm, f"{split}_dataset")
    sl = per_host_slice(len(ds.images))
    ds.images, ds.labels = ds.images[sl], ds.labels[sl]

model = VAE(
    metrics=MetricCollection({"psnr": PSNR()}),
    encoder=CNN(1, 8, 32, 8, capacity=2, down_sample=True),
    decoder=CNN(4, 1, 8, 32, capacity=2, up_sample=True),
    prior=GaussianPrior(loss_coeff=0.1),
)
mesh = global_mesh()
tr = Trainer(max_epochs=1, seed=7, mesh=mesh, log_every_n_steps=1000)
tr.fit(model, dm)
res = tr.test(model, dm)
psnr = float(res["test/metrics/psnr"])

# THE DDP invariant: replicated params stay bit-identical across processes
comm = ProcessComm()
leaves = jax.tree_util.tree_leaves(tr.state.params)
local = np.concatenate([np.asarray(l).ravel() for l in leaves])
gathered = comm._gather(local)            # [2, n_params]
assert gathered.shape[0] == 2
np.testing.assert_array_equal(gathered[0], gathered[1])

# metrics are computed on the GLOBAL batch -> every process reports the same
psnrs = comm._gather(np.asarray([psnr]))
assert abs(float(psnrs[0]) - float(psnrs[1])) < 1e-6, psnrs
assert np.isfinite(psnr) and psnr > 5.0, psnr

# multi-process checkpoint round-trip: every process joins the orbax save
# (it coordinates over the jax.distributed runtime; the JSON sidecar is
# written by process 0 only), then restores and compares bit-exactly
ckpt_dir = sys.argv[3]
from ot_vae_tpu.trainer import load_checkpoint, save_checkpoint
save_checkpoint(ckpt_dir, tr.state, model=model)
model2 = VAE(
    metrics=None,
    encoder=CNN(1, 8, 32, 8, capacity=2, down_sample=True),
    decoder=CNN(4, 1, 8, 32, capacity=2, up_sample=True),
    prior=GaussianPrior(loss_coeff=0.1),
)
tree, side = load_checkpoint(ckpt_dir, model2)
for x, y in zip(jax.tree_util.tree_leaves(tr.state.params),
                jax.tree_util.tree_leaves(tree["params"])):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
assert "inference_preprocess" in side

print(f"TRAINER_WORKER{pid} OK psnr={psnr:.2f}")
"""


def test_two_process_trainer_fit(tmp_path):
    """Full Trainer.fit over a mesh spanning two OS processes: per-host data
    shards assemble into global batches (mesh.shard_batch multihost path),
    params replicate via put_replicated, and the fitted params remain
    bit-identical across processes — the DDP synchronization invariant the
    reference delegates to Lightning and never tests (SURVEY §4)."""
    worker = tmp_path / "trainer_worker.py"
    worker.write_text(_TRAINER_WORKER)
    ckpt_dir = tmp_path / "ckpt"  # shared across both processes
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = ""
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid),
             str(ckpt_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("trainer workers timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"TRAINER_WORKER{pid} OK" in out
