"""Teacher-forced training loop (component C11; call stack SURVEY.md §3.3).

TPU-first notes:
- One jitted train step over the whole (B, R+L) segment batch; the dilated
  conv stack is a single fused XLA program (hot loop of §3.3).
- Data parallelism is expressed with NamedSharding over a 1-D ('data',)
  mesh: batch sharded on the data axis, params/opt state replicated. Under
  jit, XLA inserts the gradient all-reduce (psum) over ICI/DCN itself —
  this is the TPU-native equivalent of the reference's (absent) NCCL path
  (SURVEY.md §2.2, §5.8). Single-device runs use the same code with a
  1-device mesh.
- Checkpoint/resume via Orbax: params, opt state, step, and the data
  iterator's RNG state (SURVEY.md §5.4 — the sampler state IS the run's
  random stream; the train step itself is deterministic).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shallow_wavenet_tpu.config import Config
from shallow_wavenet_tpu.models import WaveNet, heads
from shallow_wavenet_tpu.ops.mulaw import mulaw_quantize

log = logging.getLogger(__name__)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    def __init__(self, cfg: Config, mesh: Mesh | None = None):
        self.cfg = cfg
        self.model = WaveNet(cfg.model)
        self.mesh = mesh
        sched = optax.exponential_decay(
            cfg.train.learning_rate,
            transition_steps=cfg.train.lr_decay_steps,
            decay_rate=cfg.train.lr_decay_rate,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip_norm),
            optax.adamw(sched, weight_decay=cfg.train.weight_decay)
            if cfg.train.weight_decay > 0
            else optax.adam(sched),
        )
        self._jit_step = None
        self._jit_loss = None

    # ---- init ------------------------------------------------------------
    def init_state(self, seed: int | None = None) -> TrainState:
        cfg = self.cfg
        seed = cfg.train.seed if seed is None else seed
        rf = cfg.model.receptive_field
        hop = cfg.data.hop_length
        pad = -(-rf // hop) * hop
        t_total = pad + cfg.data.segment_length
        b = cfg.data.batch_size
        if cfg.model.head == "softmax":
            x = jnp.zeros((b, t_total - 1), jnp.int32)
        else:
            x = jnp.zeros((b, t_total - 1), jnp.float32)
        c = jnp.zeros((b, t_total // hop, cfg.model.aux_channels), jnp.float32)
        spk = jnp.zeros((b,), jnp.int32) if cfg.model.n_speakers > 0 else None
        variables = self.model.init(jax.random.key(seed), x, c, spk)
        params = variables["params"]
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        log.info("model %s: %.2fM params, receptive field %d samples",
                 cfg.name, n_params / 1e6, rf)
        state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            state = jax.device_put(state, repl)
        return state

    # ---- the step --------------------------------------------------------
    def _context_dropout(self, x, key):
        """Zero random spans of the waveform used as AR input.

        Span length = train.context_dropout_span_ms; each span is dropped
        i.i.d. with probability train.context_dropout. Only the INPUT copy
        of the waveform is masked (the caller keeps the unmasked waveform
        for targets), so the model is still supervised on real samples —
        it just cannot read pitch/periodicity out of the masked context
        and must take it from the conditioning instead.
        """
        cfg = self.cfg
        t = x.shape[1]
        span = max(1, int(round(cfg.train.context_dropout_span_ms
                                * cfg.data.sample_rate / 1000.0)))
        n_spans = -(-t // span)
        keep = jax.random.bernoulli(
            key, 1.0 - cfg.train.context_dropout, (x.shape[0], n_spans))
        mask = jnp.repeat(keep, span, axis=1)[:, :t].astype(x.dtype)
        return x * mask

    def _loss_fn(self, params, batch, key=None):
        import chex

        cfg = self.cfg
        x = batch["x"]                         # (B, R+L) float waveform
        cond = batch["cond"]                   # (B, (R+L)/H, F)
        # shape/dtype guards (SURVEY.md §5.2) — trace-time, zero runtime cost
        chex.assert_rank([x, cond], [2, 3])
        chex.assert_type([x, cond], jnp.float32)
        chex.assert_equal(cond.shape[1] * self.cfg.data.hop_length, x.shape[1])
        chex.assert_equal(cond.shape[2], cfg.model.aux_channels)
        spk = batch.get("speaker") if cfg.model.n_speakers > 0 else None
        # AR-context dropout masks the input copy only; key is None at
        # eval (eval_loss) and when context_dropout == 0, leaving this
        # path byte-identical to the knobless trainer
        x_in_src = (self._context_dropout(x, key)
                    if key is not None and cfg.train.context_dropout > 0.0
                    else x)
        if cfg.model.head == "softmax":
            x_in = mulaw_quantize(x_in_src, cfg.model.quantize_channels)[:, :-1]
            target = mulaw_quantize(x, cfg.model.quantize_channels)[:, 1:]
        else:
            x_in, target = x_in_src[:, :-1], x[:, 1:]
        out = self.model.apply({"params": params}, x_in, cond, spk)
        t = x_in.shape[1]
        seg = cfg.data.segment_length
        # loss only where the receptive field is fully inside the context
        mask = (jnp.arange(t) >= (t - seg)).astype(jnp.float32)[None, :]
        if cfg.model.head == "softmax":
            loss = heads.softmax_loss(out, target, mask)
        else:
            loss = heads.laplace_loss(out, target, cfg.model.log_b_min,
                                      cfg.model.log_b_max, mask)
        return loss

    def _step_core(self, state: TrainState, batch):
        accum = max(1, int(self.cfg.train.grad_accum))
        # context-dropout key: (seed, global step) so the mask stream is
        # deterministic and checkpoint-exact across resume; None when the
        # knob is off (static branch — no RNG ops are traced at all)
        key = (jax.random.fold_in(jax.random.key(self.cfg.train.seed),
                                  state.step)
               if self.cfg.train.context_dropout > 0.0 else None)
        if accum == 1:
            loss, grads = jax.value_and_grad(self._loss_fn)(state.params,
                                                            batch, key)
        else:
            # in-dispatch gradient accumulation: scan N microbatches of
            # B/N rows, mean the grads, ONE optimizer update — the same
            # math as a big-batch step, at the per-microbatch backward
            # cost (the B>12 XLA backward cliff workaround; config.py
            # train.grad_accum)
            b = batch["x"].shape[0]
            if b % accum:
                raise ValueError(
                    f"batch_size {b} not divisible by grad_accum {accum}")
            micro = jax.tree.map(
                lambda v: v.reshape((accum, b // accum) + v.shape[1:]),
                batch)

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            init = (jnp.zeros((), jnp.float32), zeros)
            if key is None:
                def body(carry, mb):
                    l_acc, g_acc = carry
                    l_i, g_i = jax.value_and_grad(self._loss_fn)(state.params,
                                                                 mb)
                    return (l_acc + l_i,
                            jax.tree.map(jnp.add, g_acc, g_i)), None

                (l_sum, g_sum), _ = jax.lax.scan(body, init, micro)
            else:
                # one sub-key per microbatch so masks differ across them
                keys = jax.random.split(key, accum)

                def body(carry, mb_key):
                    mb, k = mb_key
                    l_acc, g_acc = carry
                    l_i, g_i = jax.value_and_grad(self._loss_fn)(state.params,
                                                                 mb, k)
                    return (l_acc + l_i,
                            jax.tree.map(jnp.add, g_acc, g_i)), None

                (l_sum, g_sum), _ = jax.lax.scan(body, init, (micro, keys))
            loss = l_sum / accum
            grads = jax.tree.map(lambda g: g / accum, g_sum)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    def _make_step(self):
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            # prefix sharding: batch dim of every batch leaf on the data axis
            data = NamedSharding(self.mesh, P(self.cfg.mesh.data_axis))
            return jax.jit(
                self._step_core,
                in_shardings=(repl, data),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(self._step_core, donate_argnums=(0,))

    def _make_multi_step(self):
        """K optimizer steps per dispatch: lax.scan of the train step over
        K stacked batches (leaf shape (K, B, ...)). Same math and update
        order as K single calls; one host->device round-trip instead of K —
        the dispatch latency, not the compute, bounds small-model training
        throughput (hardware-probed ~3x on a remote-attached v5e)."""
        def multi_fn(state: TrainState, batches):
            return jax.lax.scan(self._step_core, state, batches)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh,
                                 P(None, self.cfg.mesh.data_axis))
            return jax.jit(
                multi_fn,
                in_shardings=(repl, data),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(multi_fn, donate_argnums=(0,))

    @property
    def step_fn(self):
        if self._jit_step is None:
            self._jit_step = self._make_step()
        return self._jit_step

    @property
    def multi_step_fn(self):
        if getattr(self, "_jit_multi", None) is None:
            self._jit_multi = self._make_multi_step()
        return self._jit_multi

    def shard_batch(self, batch: dict[str, np.ndarray]) -> dict:
        """Host numpy batch -> device array(s) with the data-axis sharding."""
        if self.cfg.model.n_speakers == 0:
            batch = {k: v for k, v in batch.items() if k != "speaker"}
        else:
            batch = dict(batch)
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, batch)
        data = NamedSharding(self.mesh, P(self.cfg.mesh.data_axis))
        if jax.process_count() > 1:
            # each host supplies only its local rows (batch is per-process;
            # SURVEY.md §5.8 per-process data loading)
            return {k: jax.make_array_from_process_local_data(data, v)
                    for k, v in batch.items()}
        return {k: jax.device_put(v, data) for k, v in batch.items()}

    def shard_batches(self, batches: list[dict]) -> dict:
        """K host batches -> stacked device leaves (K, B, ...) with the
        data axis on dim 1 — the input of multi_step_fn."""
        stacked = {k: np.stack([b[k] for b in batches])
                   for k in batches[0]}
        return self.shard_stacked(stacked)

    def shard_stacked(self, stacked: dict) -> dict:
        """Already-stacked (K, B, ...) host leaves -> sharded device
        arrays. Runs inside the prefetch worker thread in multi-step mode
        so the H2D transfer overlaps the device step."""
        if self.cfg.model.n_speakers == 0:
            stacked = {k: v for k, v in stacked.items() if k != "speaker"}
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, stacked)
        data = NamedSharding(self.mesh, P(None, self.cfg.mesh.data_axis))
        if jax.process_count() > 1:
            return {k: jax.make_array_from_process_local_data(data, v)
                    for k, v in stacked.items()}
        return {k: jax.device_put(v, data) for k, v in stacked.items()}

    # ---- eval ------------------------------------------------------------
    def eval_loss(self, state: TrainState, batches: list[dict]) -> float:
        if self._jit_loss is None:
            self._jit_loss = jax.jit(self._loss_fn)
        losses = [float(self._jit_loss(state.params, self.shard_batch(b)))
                  for b in batches]
        return float(np.mean(losses))

    # ---- checkpointing ---------------------------------------------------
    def _ckpt_manager(self, workdir: str | Path) -> ocp.CheckpointManager:
        path = Path(workdir).resolve() / "checkpoints"
        return ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.cfg.train.keep_checkpoints, create=True
            ),
        )

    def save(self, mngr: ocp.CheckpointManager, state: TrainState,
             sampler_state: dict | None = None) -> None:
        # the sampler item is always present ({} when the iterator exposes
        # no state) so restore() never has to guess the checkpoint layout
        payload = {
            "state": ocp.args.StandardSave(state),
            "sampler": ocp.args.JsonSave(
                _json_safe(sampler_state) if sampler_state is not None else {}
            ),
        }
        mngr.save(int(state.step), args=ocp.args.Composite(**payload))

    def restore(self, workdir: str | Path, state: TrainState
                ) -> tuple[TrainState, dict | None, int]:
        """Restore latest checkpoint into the structure of `state`.
        Returns (state, sampler_state, step); untouched state if none."""
        mngr = self._ckpt_manager(workdir)
        latest = mngr.latest_step()
        if latest is None:
            return state, None, 0
        restored = mngr.restore(
            latest,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state),
                sampler=ocp.args.JsonRestore(),
            ),
        )
        log.info("restored checkpoint at step %d", latest)
        sampler_state = restored.get("sampler") or None
        return restored["state"], sampler_state, latest

    def warm_start(self, init_workdir: str | Path,
                   state: TrainState) -> TrainState:
        """Fine-tuning init (SURVEY.md §7 PR6, reference `--resume`-with-
        new-run convention): copy the PARAMS of another run's latest
        checkpoint into a fresh TrainState — optimizer state, step counter
        and LR schedule restart from zero. The source run must have the
        same model config (shapes are checked by the restore)."""
        restored, _, latest = self.restore(init_workdir, state)
        if latest == 0:
            raise FileNotFoundError(
                f"no checkpoint to warm-start from under {init_workdir}")
        log.info("warm start: params from %s step %d (optimizer/step reset)",
                 init_workdir, latest)
        return state.replace(params=restored.params)

    # ---- the loop --------------------------------------------------------
    def fit(self, state: TrainState, sampler: Iterator[dict],
            workdir: str | Path, steps: int | None = None,
            eval_batches: list[dict] | None = None) -> TrainState:
        cfg = self.cfg
        steps = cfg.train.steps if steps is None else steps
        workdir = Path(workdir)
        # multi-host: every process computes (SPMD) but only process 0
        # writes run artifacts — concurrent appends to one metrics.jsonl on
        # shared storage would interleave/corrupt records
        is_main = jax.process_index() == 0
        workdir.mkdir(parents=True, exist_ok=True)
        if is_main:
            (workdir / "config.json").write_text(cfg.to_json())
        metrics_path = workdir / "metrics.jsonl"
        mngr = self._ckpt_manager(workdir)

        from shallow_wavenet_tpu.data.prefetch import Prefetcher
        from shallow_wavenet_tpu.utils.observability import MetricsWriter

        tb = MetricsWriter(workdir / "tb") if is_main else None
        K = max(1, int(cfg.train.steps_per_call))
        # overlap host batch assembly AND the H2D transfer with the device
        # step: the worker thread stacks (multi-step mode) and device_puts.
        # GroupSampler is bounded by the remaining step budget so the tail
        # group (steps % K) is drawn at exact size — the sampler state saved
        # with the final checkpoint matches the batches actually consumed
        from shallow_wavenet_tpu.data.prefetch import GroupSampler

        start = int(state.step)
        prefetch = Prefetcher(
            sampler if K == 1 else GroupSampler(sampler, K,
                                                total=max(steps - start, 0)),
            put_fn=self.shard_batch if K == 1 else self.shard_stacked)
        t0 = time.time()
        samples_per_batch = None
        step = start
        mf = metrics_path.open("a") if is_main else None
        try:
            while step < steps:
                k = min(K, steps - step)
                if K == 1:
                    batch = next(prefetch)
                    if samples_per_batch is None:
                        samples_per_batch = int(np.prod(batch["x"].shape))
                    state, m = self.step_fn(state, batch)
                    last = m
                else:
                    group = next(prefetch)      # device (k, B, ...) leaves
                    state, ms = self.multi_step_fn(state, group)
                    if samples_per_batch is None:
                        samples_per_batch = int(
                            np.prod(group["x"].shape)) // k
                    last = {kk: v[-1] for kk, v in ms.items()}
                prev, step = step, step + k
                # cadence: act whenever the call crossed a boundary (steps
                # advance by k at a time); no per-step device sync. Eval
                # rides the CHECKPOINT cadence, independent of log cadence
                le, ce = cfg.train.log_every, cfg.train.checkpoint_every
                log_due = step // le > prev // le or step == steps
                ckpt_due = step // ce > prev // ce or step == steps
                if log_due or (ckpt_due and eval_batches is not None):
                    dt = time.time() - t0
                    done = step - start
                    rec = {
                        "step": step,
                        "loss": float(last["loss"]),
                        "grad_norm": float(last["grad_norm"]),
                        "steps_per_s": done / max(dt, 1e-9),
                        "samples_per_s": done * samples_per_batch / max(dt, 1e-9),
                    }
                    if ckpt_due and eval_batches is not None:
                        # all processes participate (sharded compute)...
                        rec["eval_loss"] = self.eval_loss(state, eval_batches)
                    if is_main:
                        # ...only process 0 records
                        mf.write(json.dumps(rec) + "\n")
                        mf.flush()
                        tb.scalars(step, rec)
                        log.info("step %(step)d loss %(loss).4f gnorm "
                                 "%(grad_norm).2f %(steps_per_s).2f it/s",
                                 rec)
                if ckpt_due:
                    self.save(mngr, state, prefetch.state())
        finally:
            # on ANY exit (exception, NaN abort, Ctrl-C): stop the prefetch
            # worker, flush TB, and let an in-flight async save commit
            prefetch.close()
            if tb is not None:
                tb.close()
            if mf is not None:
                mf.close()
            mngr.wait_until_finished()
        return state


def _json_safe(obj):
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
