"""Observability: TensorBoard scalars, JSONL metrics, jax.profiler traces,
debug (NaN/shape) guards — SURVEY.md §5.1/§5.2/§5.5.

The reference had logging prints only; this framework writes machine-
readable JSONL (the baseline artifacts), TensorBoard summaries (viewable
with the installed tensorboard + profile plugin), and optional profiler
traces of the hot train/decode regions.
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path

log = logging.getLogger(__name__)


class MetricsWriter:
    """TensorBoard scalar writer (tensorboardX), no-op if unavailable."""

    def __init__(self, logdir: str | Path, enabled: bool = True):
        self._w = None
        if not enabled:
            return
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(str(logdir))
        except Exception as e:  # pragma: no cover
            log.warning("tensorboard writer unavailable: %s", e)

    def scalars(self, step: int, values: dict[str, float]) -> None:
        if self._w is None:
            return
        import numbers

        for k, v in values.items():
            # numbers.Real also admits numpy scalars (np.float32 etc.),
            # which a plain (int, float) isinstance silently drops
            if isinstance(v, numbers.Real):
                self._w.add_scalar(k, float(v), step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


@contextlib.contextmanager
def maybe_profile(logdir: str | Path | None):
    """jax.profiler trace of the enclosed region when logdir is given;
    view with tensorboard's profile plugin (SURVEY.md §5.1)."""
    if not logdir:
        yield
        return
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


def enable_debug_mode() -> None:
    """NaN debugging: fail fast inside jit (SURVEY.md §5.2 — the TPU analog
    of a sanitizer, alongside Pallas interpret-mode tests)."""
    import jax

    jax.config.update("jax_debug_nans", True)
    log.info("jax_debug_nans enabled")
