"""Multi-host wiring helpers, validated on the single-process/8-virtual-device
configuration (the multi-process paths are the documented
jax.distributed/multihost_utils recipes; here we pin the single-process
degradations and the global-array assembly
(reference equivalent: Lightning ddp multi-node init, configs/ddp.yaml:1-5)."""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.parallel import (
    ProcessComm,
    host_local_batch_to_global,
    initialize_distributed,
    make_mesh,
    per_host_slice,
)


def test_initialize_distributed_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_per_host_slice_single_process():
    s = per_host_slice(100)
    assert (s.start, s.stop) == (0, 100)


def test_process_comm_identity():
    comm = ProcessComm()
    x = {"a": np.ones((3,)), "b": np.full((2, 2), 5.0)}
    out = comm.psum(x)
    np.testing.assert_array_equal(out["a"], x["a"])
    assert comm.axis_size == 1


def test_host_local_batch_to_global_shards_on_data():
    mesh = make_mesh()
    batch = (np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
             np.arange(16, dtype=np.int32))
    g_imgs, g_labels = host_local_batch_to_global(mesh, batch)
    assert g_imgs.shape == (16, 4) and g_labels.shape == (16,)
    # batch axis sharded over the 8 'data' devices -> 2 rows per shard
    assert {s.data.shape[0] for s in g_imgs.addressable_shards} == {2}
    np.testing.assert_array_equal(np.asarray(g_imgs), batch[0])
