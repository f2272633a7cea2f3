"""shallow_wavenet_tpu — a TPU-native shallow-WaveNet vocoder framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference repo `patrickltobing/shallow-wavenet` (see SURVEY.md; the
reference mount was empty, so component parity is pinned to SURVEY.md §2's
inventory C1..C13 and BASELINE.json's config contract).

Layout (maps to SURVEY.md §1's layer map):
  ops/       — L2 signal ops: mu-law, STFT/mel, mcep, MLSA, Pallas AR kernel
  models/    — L3 model layer: Flax WaveNet, output heads, AR generation
  data/      — L1 data/IO: wav, HDF5, file lists, segment batching
  parallel/  — L0 runtime: mesh, sharding, multi-host init
  training/  — trainer: jit/shard_map step, optimizer, Orbax checkpointing
  bin/       — L4 entry points: feature_extract, calc_stats, noise_shaping,
               train, decode, restore; plus the L5 recipe runner (run)
  config.py  — dataclass config tree + named presets (BASELINE.json configs 1-5)
"""

__version__ = "0.1.0"
