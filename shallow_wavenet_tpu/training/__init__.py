"""Trainer: jit/pjit teacher-forced training loop, Adam, Orbax checkpoints.

Component C11 of SURVEY.md §2.1 (reference `src/bin/train.py`, unmountable).
"""

from shallow_wavenet_tpu.training.trainer import Trainer, TrainState  # noqa: F401
