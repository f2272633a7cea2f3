"""L0 runtime: device mesh, sharding, multi-host init (SURVEY.md §2.2, §5.8).

The reference is single-process PyTorch with no distributed backend; the
TPU-native equivalent is jax.distributed + XLA collectives over ICI/DCN,
expressed as NamedShardings over a 1-D ('data',) mesh.
"""

from shallow_wavenet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    process_shard,
    data_sharding,
    replicated,
)
