"""Worker for the 2-process CPU cluster test (SURVEY.md §5.8; VERDICT r1
item 2). Run as `python -m tests.multiproc_worker <pid> <port> <workdir>
<result_json>` with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 in the environment:
each of the 2 processes contributes 4 fake CPU devices, jax.distributed
wires them into one 8-device ('data',) mesh with Gloo collectives, and the
full production training path runs — Trainer.fit with steps_per_call>1
(multi_step_fn), per-process SegmentSampler shards feeding
make_array_from_process_local_data, process-0-gated artifact writes, and a
multi-process Orbax save/restore.

The shared config/corpus builders live here so the pytest side
(tests/test_multiprocess.py) constructs the bit-identical single-process
reference run.
"""

from __future__ import annotations

import json
import sys

import numpy as np

N_PROCESSES = 2
GLOBAL_BATCH = 8
STEPS = 12
N_UTTS = 8


def build_cfg():
    from shallow_wavenet_tpu.config import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig,
    )

    cfg = Config(name="multiproc")
    cfg.model = ModelConfig(
        n_stacks=1, stack_size=4, residual_channels=16, gate_channels=32,
        skip_channels=24, aux_channels=8, upsample_factors=(4, 5, 4),
        cond_channels=12, head="laplace", compute_dtype="float32",
    )
    cfg.data = DataConfig(sample_rate=8000, hop_length=80, n_mels=8,
                          segment_length=400, batch_size=GLOBAL_BATCH)
    cfg.train = TrainConfig(steps=STEPS, learning_rate=1e-4,
                            steps_per_call=4, log_every=1,
                            checkpoint_every=6)
    cfg.mesh = MeshConfig()
    return cfg


def build_utts(cfg):
    """Deterministic corpus: synthetic wavs + rng conditioning features
    (identical in every process and in the reference run)."""
    from shallow_wavenet_tpu.data.dataset import Utterance
    from shallow_wavenet_tpu.data.synthetic import synth_utterance

    utts = []
    for i in range(N_UTTS):
        wav = synth_utterance(1000 + i, cfg.data.sample_rate)
        n_frames = len(wav) // cfg.data.hop_length
        feats = np.random.default_rng(2000 + i).standard_normal(
            (n_frames, cfg.model.aux_channels)).astype(np.float32)
        utts.append(Utterance(wav=wav, feats=feats))
    return utts


def make_sampler(cfg, utts, shard: int):
    """Per-process sampler over this shard's utterances (local batch rows;
    seed varies per shard so shards draw independent streams)."""
    from shallow_wavenet_tpu.data.dataset import SegmentSampler, shard_list

    return SegmentSampler(
        shard_list(utts, shard, N_PROCESSES),
        batch_size=GLOBAL_BATCH // N_PROCESSES,
        segment_length=cfg.data.segment_length,
        hop_length=cfg.data.hop_length,
        receptive_field=cfg.model.receptive_field,
        seed=100 + shard,
    )


EVAL_FRAMES = 20


def build_eval_cond(cfg):
    """Deterministic eval conditioning + shared decode noise for the DP
    generation leg (identical in every process and on the pytest side, so
    sample-equality can be asserted across the process boundary)."""
    rng = np.random.default_rng(4242)
    cond = rng.standard_normal(
        (GLOBAL_BATCH, EVAL_FRAMES, cfg.model.aux_channels)
    ).astype(np.float32)
    hop = int(np.prod(cfg.model.upsample_factors))
    noise = rng.uniform(1e-7, 1 - 1e-7,
                        (GLOBAL_BATCH, EVAL_FRAMES * hop)).astype(np.float32)
    return cond, noise


class ConcatSampler:
    """Single-process reference: the global batch is the row-concat of the
    per-shard samplers' local batches — the same logical batch the
    2-process run assembles via make_array_from_process_local_data (mesh
    device order is process-major)."""

    def __init__(self, samplers):
        self.samplers = samplers

    def __iter__(self):
        return self

    def __next__(self):
        parts = [next(s) for s in self.samplers]
        return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    def state(self):
        return {"shards": [s.state() for s in self.samplers]}


def main(pid: int, port: int, workdir: str, result_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=N_PROCESSES, process_id=pid)
    assert jax.process_count() == N_PROCESSES
    assert len(jax.devices()) == 8, jax.devices()

    from jax.sharding import Mesh

    from shallow_wavenet_tpu.training import Trainer

    cfg = build_cfg()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state()
    utts = build_utts(cfg)
    sampler = make_sampler(cfg, utts, jax.process_index())

    state = trainer.fit(state, sampler, workdir, steps=STEPS)
    assert int(state.step) == STEPS

    # multi-process Orbax restore round-trip: restored replicated params
    # must equal the in-memory final state on every process
    restored, sampler_state, step = trainer.restore(workdir,
                                                    trainer.init_state())
    assert step == STEPS, step
    assert sampler_state is not None
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(
            np.asarray(a.addressable_shards[0].data),
            np.asarray(b.addressable_shards[0].data))

    # --- DP generation ACROSS the process boundary (VERDICT r2 item 2):
    # shard_map over a mesh containing non-addressable devices is a
    # genuinely different code path from the single-process dryrun — each
    # process computes only its local utterance shard, and the pytest side
    # asserts the assembled shards equal a single-process decode ---
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shallow_wavenet_tpu.models import extract_plain_params
    from shallow_wavenet_tpu.models.generate import generate_dp

    variables = {"params": state.params}
    cond, noise = build_eval_cond(cfg)
    n_local = GLOBAL_BATCH // N_PROCESSES
    rows = slice(pid * n_local, (pid + 1) * n_local)
    sh = NamedSharding(mesh, P("data"))
    cond_g = jax.make_array_from_process_local_data(sh, cond[rows])
    noise_g = jax.make_array_from_process_local_data(sh, noise[rows])
    c_up = jax.jit(
        lambda v, c: trainer.model.apply(v, c, method="upsample_cond"),
        out_shardings=sh)(variables, cond_g)
    pp = extract_plain_params(variables, cfg.model)
    shards = {}
    for name, w in (
        ("scan", generate_dp(pp, cfg.model, c_up, noise_g, mesh,
                             use_pallas=False)),
        ("pallas", generate_dp(pp, cfg.model, c_up, noise_g, mesh,
                               use_pallas=True, interpret=True, chunk=64)),
    ):
        for s in w.addressable_shards:
            shards[f"{name}_{s.index[0].start or 0}"] = np.asarray(s.data)
    # export the exact conditioning consumed: the equality contract is on
    # the GENERATION path (shard_map over non-addressable devices vs a
    # single-device scan) — the sharded upsample compile is allowed its own
    # fp fusion, so the reference decode must start from this c_up
    for s in c_up.addressable_shards:
        shards[f"cup_{s.index[0].start or 0}"] = np.asarray(s.data)
    np.savez(result_path + ".wavs.npz", **shards)

    with open(result_path, "w") as f:
        json.dump({"ok": True, "process": pid,
                   "process_count": jax.process_count(),
                   "final_step": int(state.step)}, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
