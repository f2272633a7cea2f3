"""Mesh construction + per-process data sharding (SURVEY.md §5.8).

Mesh axes: ('data',) only — the model is 1-10M params, so TP/PP/SP are
explicitly out of scope (SURVEY.md §2.2); scaling is DP over utterance
batches. Gradients all-reduce via XLA-inserted psum riding ICI within a
slice and DCN across hosts. Multi-host: `jax.distributed.initialize()` per
host, per-process file-list sharding keyed by `jax.process_index()`.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shallow_wavenet_tpu.config import MeshConfig

log = logging.getLogger(__name__)

_DISTRIBUTED_INITIALIZED = False


def make_mesh(cfg: MeshConfig | None = None) -> Mesh:
    """1-D data-parallel mesh over the visible devices.

    With multihost=True, initializes jax.distributed first (coordinator
    address etc. from the standard env vars / TPU metadata); the mesh then
    spans all processes' devices.
    """
    global _DISTRIBUTED_INITIALIZED
    cfg = cfg or MeshConfig()
    if cfg.multihost and not _DISTRIBUTED_INITIALIZED:
        import os

        # distinguish "multihost preset run on a single dev box" (tolerated)
        # from a REAL cluster launch: when a coordinator is configured, a
        # failed initialize must fail fast — silently degrading to
        # process_count()==1 would train N independent models that all
        # write checkpoints into the same workdir
        has_coordinator = any(
            os.environ.get(v) for v in
            ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
             "MEGASCALE_COORDINATOR_ADDRESS"))
        try:
            jax.distributed.initialize()
            _DISTRIBUTED_INITIALIZED = True
            log.info("jax.distributed initialized: process %d/%d",
                     jax.process_index(), jax.process_count())
        except Exception as e:
            if has_coordinator:
                raise RuntimeError(
                    "jax.distributed.initialize failed on a configured "
                    "multi-host launch — refusing to continue "
                    "single-process (checkpoint-corruption hazard)") from e
            log.warning("jax.distributed.initialize failed (%s); no "
                        "coordinator configured — continuing "
                        "single-process", e)
    devices = np.asarray(jax.devices())
    if cfg.num_devices > 0:
        devices = devices[: cfg.num_devices]
    return Mesh(devices, (cfg.data_axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_shard(items: list) -> list:
    """Static shard of a host-side list for this process (multi-host data
    loading: each host reads only its own utterances)."""
    from shallow_wavenet_tpu.data.dataset import shard_list

    return shard_list(items, jax.process_index(), jax.process_count())
