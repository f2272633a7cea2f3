"""Run shallow_wavenet_tpu.bin.run with JAX pinned to CPU — for executing
the CPU-only recipe stages (0-3) of a second run while a TPU training job
holds the chip (the axon backend admits one client process).

Usage: python tools/run_cpu.py <bin.run args...>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from shallow_wavenet_tpu.bin.run import main  # noqa: E402

main(sys.argv[1:])
