"""Trainer smoke tests: loss decreases, checkpoint round-trips (§4.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)
from shallow_wavenet_tpu.data.dataset import SegmentSampler, Utterance
from shallow_wavenet_tpu.ops import log_mel_spectrogram
from shallow_wavenet_tpu.data.synthetic import synth_utterance
from shallow_wavenet_tpu.training import Trainer


def tiny_train_cfg(head="laplace") -> Config:
    c = Config(name="test")
    c.model = ModelConfig(
        n_stacks=1, stack_size=4, residual_channels=16, gate_channels=32,
        skip_channels=24, aux_channels=8, head=head, upsample_factors=(4, 5, 4),
        cond_channels=12, compute_dtype="float32",
    )
    c.data = DataConfig(sample_rate=8000, n_fft=256, hop_length=80,
                        win_length=200, n_mels=8, fmax=3800.0,
                        segment_length=800, batch_size=2)
    c.train = TrainConfig(steps=60, learning_rate=3e-3, checkpoint_every=30,
                          log_every=10, seed=0)
    return c


def make_sampler(cfg: Config, n_utts=2, seed=0):
    utts = []
    for i in range(n_utts):
        wav = synth_utterance(seed + i, cfg.data.sample_rate, 0.5)
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(wav), cfg.data.sample_rate, cfg.data.n_fft,
            cfg.data.hop_length, cfg.data.win_length, cfg.data.n_mels,
            cfg.data.fmin, cfg.data.fmax))[: len(wav) // cfg.data.hop_length]
        utts.append(Utterance(wav=wav, feats=mel))
    return SegmentSampler(
        utts, batch_size=cfg.data.batch_size,
        segment_length=cfg.data.segment_length,
        hop_length=cfg.data.hop_length,
        receptive_field=cfg.model.receptive_field, seed=seed,
    )


def losses_of(workdir):
    import json
    recs = [json.loads(l) for l in (workdir / "metrics.jsonl").read_text().splitlines()]
    return [r["loss"] for r in recs]


def test_loss_decreases_laplace(tmp_path):
    cfg = tiny_train_cfg("laplace")
    tr = Trainer(cfg)
    state = tr.init_state()
    state = tr.fit(state, make_sampler(cfg), tmp_path, steps=60)
    ls = losses_of(tmp_path)
    assert int(state.step) == 60
    assert ls[-1] < ls[0] - 0.5, f"loss did not decrease: {ls}"


def test_loss_decreases_softmax(tmp_path):
    import dataclasses

    cfg = tiny_train_cfg("softmax")
    # 256-way CE needs more steps than the Laplace head to move visibly
    cfg.train = dataclasses.replace(cfg.train, learning_rate=2e-3)
    tr = Trainer(cfg)
    state = tr.fit(tr.init_state(), make_sampler(cfg), tmp_path, steps=250)
    ls = losses_of(tmp_path)
    # CE starts near ln(256) ~ 5.55 and must drop markedly on 2 utterances
    assert ls[0] > 4.5 and min(ls[-3:]) < ls[0] - 1.0, f"loss: {ls}"


def test_checkpoint_resume(tmp_path):
    cfg = tiny_train_cfg("laplace")
    tr = Trainer(cfg)
    sampler = make_sampler(cfg)
    state = tr.fit(tr.init_state(), sampler, tmp_path, steps=30)

    tr2 = Trainer(cfg)
    fresh = tr2.init_state()
    restored, sampler_state, step = tr2.restore(tmp_path, fresh)
    assert step == 30 and int(restored.step) == 30
    assert sampler_state is not None
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training continues without error
    sampler2 = make_sampler(cfg)
    sampler2.set_state(sampler_state)
    out = tr2.fit(restored, sampler2, tmp_path, steps=40)
    assert int(out.step) == 40


def test_restore_without_checkpoint_is_noop(tmp_path):
    cfg = tiny_train_cfg("laplace")
    tr = Trainer(cfg)
    s = tr.init_state()
    s2, samp, step = tr.restore(tmp_path / "empty", s)
    assert step == 0 and samp is None


def test_warm_start_finetune(tmp_path):
    """Fine-tuning (SURVEY.md §7 PR6): warm_start copies the source run's
    latest params into a fresh state with optimizer/step reset; training
    then continues from the pretrained point (first losses well below a
    cold start's)."""
    cfg = tiny_train_cfg("laplace")
    tr = Trainer(cfg)
    src = tmp_path / "pretrain"
    ft = tmp_path / "finetune"
    state = tr.fit(tr.init_state(), make_sampler(cfg), src, steps=60)

    warm = tr.warm_start(src, tr.init_state())
    assert int(warm.step) == 0
    jax.tree.map(np.testing.assert_array_equal, warm.params, state.params)

    tr.fit(warm, make_sampler(cfg, seed=7), ft, steps=20)
    cold = losses_of(src)
    warm_losses = losses_of(ft)
    assert warm_losses[0] < cold[0] - 0.5, (warm_losses[0], cold[0])


def test_warm_start_missing_checkpoint_raises(tmp_path):
    import pytest

    cfg = tiny_train_cfg("laplace")
    tr = Trainer(cfg)
    with pytest.raises(FileNotFoundError):
        tr.warm_start(tmp_path / "nowhere", tr.init_state())


def test_multi_step_matches_single_step(tmp_path):
    """steps_per_call > 1 (lax.scan of the step over stacked batches) must
    run the same updates in the same order as K separate calls — same
    sampler stream, same final step count, matching params."""
    import dataclasses

    cfg1 = tiny_train_cfg("laplace")
    st1 = Trainer(cfg1).fit(Trainer(cfg1).init_state(), make_sampler(cfg1),
                            tmp_path / "a", steps=24)
    cfg2 = tiny_train_cfg("laplace")
    cfg2.train = dataclasses.replace(cfg2.train, steps_per_call=8)
    st2 = Trainer(cfg2).fit(Trainer(cfg2).init_state(), make_sampler(cfg2),
                            tmp_path / "b", steps=24)
    assert int(st1.step) == int(st2.step) == 24
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_multi_step_handles_remainder_and_resume(tmp_path):
    """steps not a multiple of steps_per_call: the tail call shrinks; the
    checkpoint written at the end resumes exactly."""
    import dataclasses

    cfg = tiny_train_cfg("laplace")
    cfg.train = dataclasses.replace(cfg.train, steps_per_call=8,
                                    checkpoint_every=10)
    tr = Trainer(cfg)
    state = tr.fit(tr.init_state(), make_sampler(cfg), tmp_path, steps=30)
    assert int(state.step) == 30
    tr2 = Trainer(cfg)
    restored, sampler_state, step = tr2.restore(tmp_path, tr2.init_state())
    assert step == 30
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_matches_big_batch():
    """train.grad_accum=N (N microbatches scanned inside the dispatch,
    mean grad, one update) must match the single big-batch step — the
    B>12 backward-cliff workaround's correctness contract (BASELINE.md
    r3; config.py train.grad_accum)."""
    import dataclasses

    cfg1 = tiny_train_cfg("laplace")
    cfg1.data = dataclasses.replace(cfg1.data, batch_size=4)
    cfg2 = tiny_train_cfg("laplace")
    cfg2.data = dataclasses.replace(cfg2.data, batch_size=4)
    cfg2.train = dataclasses.replace(cfg2.train, grad_accum=4)
    tr1, tr2 = Trainer(cfg1), Trainer(cfg2)
    s1, s2 = tr1.init_state(), tr2.init_state()
    sampler = make_sampler(cfg1, n_utts=2)
    for _ in range(6):
        b = next(sampler)
        b.pop("speaker", None)
        s1, m1 = tr1.step_fn(s1, b)
        s2, m2 = tr2.step_fn(s2, b)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_grad_accum_indivisible_batch_raises():
    import dataclasses

    import pytest

    cfg = tiny_train_cfg("laplace")
    cfg.data = dataclasses.replace(cfg.data, batch_size=2)
    cfg.train = dataclasses.replace(cfg.train, grad_accum=3)
    tr = Trainer(cfg)
    state = tr.init_state()
    sampler = make_sampler(cfg)
    b = next(sampler)
    b.pop("speaker", None)
    with pytest.raises(ValueError, match="grad_accum"):
        tr.step_fn(state, b)


def test_context_dropout_mask_structure():
    """_context_dropout zeroes whole spans of the input copy: span-aligned,
    rate-controlled, deterministic per key (config.py
    train.context_dropout — the pitch-binding lever, BASELINE.md r5)."""
    import dataclasses

    cfg = tiny_train_cfg("laplace")
    cfg.train = dataclasses.replace(cfg.train, context_dropout=0.5,
                                    context_dropout_span_ms=10.0)
    tr = Trainer(cfg)
    x = jnp.ones((2, 1000), jnp.float32)
    key = jax.random.key(7)
    y = np.asarray(tr._context_dropout(x, key))
    span = int(round(10.0 * cfg.data.sample_rate / 1000.0))  # 80 samples
    assert set(np.unique(y).tolist()) <= {0.0, 1.0}
    for b in range(2):
        for s in range(0, 1000, span):
            seg = y[b, s:s + span]
            assert seg.min() == seg.max(), "mask must be constant per span"
    assert 0.0 < y.mean() < 1.0, "rate 0.5 must drop some spans, keep some"
    np.testing.assert_array_equal(y, np.asarray(tr._context_dropout(x, key)))


def test_context_dropout_step_deterministic_and_distinct():
    """The dropout key is (seed, global step): the same state must produce
    a bit-identical step (checkpoint-exact resume), while rate>0 must
    change the loss vs the knob-off trainer on the same batch."""
    import dataclasses

    cfg0 = tiny_train_cfg("laplace")
    cfg1 = tiny_train_cfg("laplace")
    cfg1.train = dataclasses.replace(cfg1.train, context_dropout=0.3,
                                     context_dropout_span_ms=10.0)
    tr0, tr1 = Trainer(cfg0), Trainer(cfg1)
    # the head is zero-init (outputs are input-independent at step 0), so
    # warm the params with a few real steps before comparing
    sampler = make_sampler(cfg1)
    state = tr1.init_state()
    for _ in range(4):
        wb = next(sampler)
        wb.pop("speaker", None)
        state, _ = tr1._step_core(state, wb)
    b = next(sampler)
    b.pop("speaker", None)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    # eager _step_core (no donation) so the same state can be stepped twice
    _, m_a = tr1._step_core(state, b)
    _, m_b = tr1._step_core(state, b)
    np.testing.assert_array_equal(np.asarray(m_a["loss"]),
                                  np.asarray(m_b["loss"]))
    # knob off, same params, same batch: dropout must move the loss
    assert float(m_a["loss"]) != float(tr0._loss_fn(state.params, b))


def test_context_dropout_full_mask_zeroes_input_only():
    """rate=1.0 with one giant span zeroes the whole AR input but leaves
    the targets untouched: the laplace loss must equal a hand-built loss
    on a zeroed input with the ORIGINAL waveform's targets."""
    import dataclasses

    from shallow_wavenet_tpu.models import heads

    cfg = tiny_train_cfg("laplace")
    cfg.train = dataclasses.replace(cfg.train, context_dropout=1.0,
                                    context_dropout_span_ms=1e6)
    tr = Trainer(cfg)
    sampler = make_sampler(cfg)
    state = tr.init_state()
    for _ in range(4):  # zero-init head: warm params so input matters
        wb = next(sampler)
        wb.pop("speaker", None)
        state, _ = tr.step_fn(state, wb)
    b = next(sampler)
    b.pop("speaker", None)
    x = jnp.asarray(b["x"])
    cond = jnp.asarray(b["cond"])
    loss = tr._loss_fn(state.params, {"x": x, "cond": cond},
                       jax.random.key(0))
    out = tr.model.apply({"params": state.params},
                         jnp.zeros_like(x[:, :-1]), cond, None)
    t = x.shape[1] - 1
    mask = (jnp.arange(t) >= (t - cfg.data.segment_length)
            ).astype(jnp.float32)[None, :]
    expected = heads.laplace_loss(out, x[:, 1:], cfg.model.log_b_min,
                                  cfg.model.log_b_max, mask)
    np.testing.assert_allclose(float(loss), float(expected),
                               rtol=1e-6, atol=1e-7)


def test_context_dropout_grad_accum_smoke():
    """grad_accum + context_dropout compose: per-microbatch sub-keys, one
    update, finite loss, and training still steps."""
    import dataclasses

    cfg = tiny_train_cfg("laplace")
    cfg.data = dataclasses.replace(cfg.data, batch_size=4)
    cfg.train = dataclasses.replace(cfg.train, grad_accum=2,
                                    context_dropout=0.3)
    tr = Trainer(cfg)
    state = tr.init_state()
    sampler = make_sampler(cfg)
    for _ in range(3):
        b = next(sampler)
        b.pop("speaker", None)
        state, m = tr.step_fn(state, b)
        assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 3
