"""Minimal probe: persistent HBM state via ANY-space output + in-kernel DMA.

Grid step i: load window rows from HBM ring (written at step i-2), add 1,
store back. Validates the exact mechanism the streamed-ring AR kernel needs
(cross-grid-step HBM scratch, sliced make_async_copy, DMA sems) on this
platform before the real implementation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK, B, R = 64, 8, 128
PER = 2                      # ring holds PER chunks (d = PER*CHUNK)
N_CHUNKS = 8


def kernel(out_ref, hbm_ref, win, sem):
    i = pl.program_id(0)
    p = jax.lax.rem(i, PER) * CHUNK

    @pl.when(i >= PER)
    def _load():
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(p, CHUNK)], win, sem)
        cp.start()
        cp.wait()

    @pl.when(i < PER)
    def _zero():
        win[...] = jnp.zeros((CHUNK, B, R), jnp.float32)

    win[...] = win[...] + 1.0
    out_ref[...] = win[...]

    cp = pltpu.make_async_copy(win, hbm_ref.at[pl.ds(p, CHUNK)], sem)
    cp.start()
    cp.wait()


def main():
    out, _ = pl.pallas_call(
        kernel,
        grid=(N_CHUNKS,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((CHUNK, B, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_CHUNKS * CHUNK, B, R), jnp.float32),
            jax.ShapeDtypeStruct((PER * CHUNK, B, R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, B, R), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=(len(sys.argv) > 1 and sys.argv[1] == "interpret"),
    )()
    got = np.asarray(out[:, 0, 0]).reshape(N_CHUNKS, CHUNK)[:, 0]
    want = np.arange(N_CHUNKS) // PER + 1.0
    print("per-chunk value:", got, "want:", want)
    assert np.array_equal(got, want), "MISMATCH"
    print("dma probe OK")


if __name__ == "__main__":
    main()
