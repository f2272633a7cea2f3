"""Training-trajectory parity: JAX/optax vs torch/Adam (SURVEY.md §4.1).

BASELINE.json's contract says "training matches the reference PyTorch loss
curves". The reference is unmountable (SURVEY.md §0), so this is the
executable stand-in: both frameworks start from the SAME flax-initialized
parameters, consume the SAME batch sequence, and run the SAME recipe
(global-norm clip 10 + Adam); the per-step losses must track.
"""

import numpy as np
import pytest


from shallow_wavenet_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)
from shallow_wavenet_tpu.training import Trainer

from . import torch_trainref as ttr

N_STEPS = 25


def _cfg(head, n_speakers=0):
    c = Config(name="parity")
    c.model = ModelConfig(
        n_stacks=1, stack_size=3, residual_channels=16, gate_channels=32,
        skip_channels=24, aux_channels=8, upsample_factors=(2, 2),
        cond_channels=12, head=head, compute_dtype="float32",
        n_speakers=n_speakers,
    )
    c.data = DataConfig(sample_rate=8000, hop_length=4, n_mels=8,
                        segment_length=64, batch_size=2)
    # lr_decay_rate=1.0 -> constant lr, so torch.optim.Adam at fixed lr is
    # the exact twin of the optax schedule
    c.train = TrainConfig(steps=N_STEPS, learning_rate=1e-3,
                          lr_decay_rate=1.0, grad_clip_norm=10.0)
    return c


def _batches(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    rf = cfg.model.receptive_field
    hop = cfg.data.hop_length
    pad = -(-rf // hop) * hop
    total = pad + cfg.data.segment_length
    b = cfg.data.batch_size
    out = []
    for _ in range(n):
        batch = {
            "x": rng.uniform(-0.8, 0.8, (b, total)).astype(np.float32),
            "cond": rng.standard_normal(
                (b, total // hop, cfg.model.aux_channels)
            ).astype(np.float32),
        }
        if cfg.model.n_speakers > 0:
            batch["speaker"] = rng.integers(
                0, cfg.model.n_speakers, b).astype(np.int32)
        out.append(batch)
    return out


@pytest.mark.parametrize("head,n_speakers", [
    ("laplace", 0), ("softmax", 0), ("laplace", 2),
])
def test_training_trajectory_tracks_torch(head, n_speakers):
    cfg = _cfg(head, n_speakers)
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    batches = _batches(cfg, N_STEPS)

    jax_losses = []
    for b in batches:
        state, metrics = trainer.step_fn(state, b)
        jax_losses.append(float(metrics["loss"]))

    # init_state is deterministic (seeded from cfg), so a fresh call
    # reproduces the exact parameters the JAX run started from
    init = trainer.init_state()
    tp = ttr.params_to_torch(init.params)

    quantize = None
    if head == "softmax":
        from shallow_wavenet_tpu.ops.mulaw import mulaw_quantize

        def quantize(x):
            import torch

            q = np.array(mulaw_quantize(x.numpy(),
                                        cfg.model.quantize_channels))
            return torch.from_numpy(q)

    torch_losses = ttr.train_steps(
        tp, cfg.model, cfg.data.segment_length, batches,
        lr=cfg.train.learning_rate, clip_norm=cfg.train.grad_clip_norm,
        quantize=quantize)

    jl, tl = np.asarray(jax_losses), np.asarray(torch_losses)
    # fp32 on CPU in both frameworks; small op-order differences compound
    # through Adam, so the gate is a trajectory band, not bitwise equality
    np.testing.assert_allclose(jl, tl, rtol=5e-3, atol=5e-3)
    # and both must actually be LEARNING the same amount
    assert jl[-1] < jl[0]
    assert abs((jl[0] - jl[-1]) - (tl[0] - tl[-1])) < 0.02
