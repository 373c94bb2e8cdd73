"""Mesh/sharding helpers and the driver multi-chip dry run."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import TrainConfig, smoke_config
from .state import init_state, example_batch
from .steps import make_train_step


def make_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    assert len(devs) >= n_devices, f"need {n_devices}, have {len(devs)}"
    return Mesh(np.asarray(devs[:n_devices]).reshape(n_devices), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch over the data axis.

    Single-process: the full batch is laid out across local devices.
    Multi-process (jax.distributed): each process passes its LOCAL slice of
    the global batch (rank-strided loader) and the global array is assembled
    from process-local shards — the SPMD replacement for the reference's
    per-rank DataLoader + DDP (training_loop_fullbody.py:392-394).
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}
    return {k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda v: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)), tree)
    return jax.device_put(tree, sharding)


def dryrun(n_devices: int) -> None:
    """One full data-parallel training step (G+D+DP+R1+EMA+ADA) on tiny
    shapes over an n-device mesh — the driver's multi-chip validation hook."""
    cfg = smoke_config(n_devices)
    mesh = make_mesh(n_devices)
    state = init_state(cfg, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    train_step = make_train_step(cfg, mesh=mesh)
    batch = shard_batch(example_batch(cfg, np.random.RandomState(0)), mesh)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1),
                                do_r1_d=True, do_r1_dp=True)
    metrics = {k: float(v) for k, v in metrics.items()}
    print(f"dryrun_multichip({n_devices}) OK:",
          {k: round(v, 4) for k, v in sorted(metrics.items())[:6]})
