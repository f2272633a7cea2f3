"""Training-throughput microbenchmark on the attached TPU.

Times the jitted train step (and the K-step scanned variant) on random
batches of the given preset's geometry and reports MFU from XLA's own
FLOPs cost analysis of the compiled step (VERDICT r2 item 4: training
throughput needs a roofline row, not just steps/s). Usage:
  python tools/train_bench.py [preset] [batch] [K ...] [segment=N]
                              [accum=N] [fold=0|1]

accum=N turns on in-dispatch gradient accumulation (train.grad_accum):
`batch` stays the EFFECTIVE batch; each backward runs at batch/N rows —
the B>12 XLA backward-cliff workaround's throughput row (BASELINE.md r3).
fold=1 folds the causal-conv taps into one K=k*R contraction
(model.fold_taps — the shallow-MFU probe of VERDICT r3 item 4).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from shallow_wavenet_tpu.config import get_config  # noqa: E402
from shallow_wavenet_tpu.training import Trainer  # noqa: E402

_pos = [a for a in sys.argv[1:] if "=" not in a]
_kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
PRESET = _pos[0] if len(_pos) > 0 else "shallow_laplace_single"
BATCH = int(_pos[1]) if len(_pos) > 1 else 8
KS = [int(a) for a in _pos[2:]] or [1, 8, 32]
SEGMENT = int(_kw.get("segment", 0))
ACCUM = int(_kw.get("accum", 1))
FOLD = bool(int(_kw.get("fold", "0")))

# v5e bf16 MXU peak; the presets train with compute_dtype=bfloat16
V5E_PEAK = 197e12


def main():
    cfg = get_config(PRESET)
    import dataclasses

    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   **({"segment_length": SEGMENT}
                                      if SEGMENT else {}))
    if ACCUM > 1:
        cfg.train = dataclasses.replace(cfg.train, grad_accum=ACCUM)
    if FOLD:
        cfg.model = dataclasses.replace(cfg.model, fold_taps=True)
    tr = Trainer(cfg)
    state = tr.init_state()
    rf = cfg.model.receptive_field
    hop = cfg.data.hop_length
    pad = -(-rf // hop) * hop
    total = pad + cfg.data.segment_length
    rng = np.random.default_rng(0)

    def host_batch():
        return {
            "x": rng.uniform(-1, 1, (BATCH, total)).astype(np.float32),
            "cond": rng.standard_normal(
                (BATCH, total // hop, cfg.model.aux_channels)
            ).astype(np.float32),
        }

    n_samples = BATCH * total
    print(f"{PRESET} B={BATCH}{f' accum={ACCUM}' if ACCUM > 1 else ''} "
          f"segment+rf={total} samples/batch={n_samples} "
          f"device={jax.devices()}")
    # XLA's own FLOPs count of the compiled fwd+bwd step -> MFU. (The
    # count is of the HLO as written — fp32 ops in a bf16-peak
    # denominator make the MFU conservative.)
    step_flops = None
    try:
        ca = tr.step_fn.lower(state, tr.shard_batch(host_batch())) \
            .compile().cost_analysis()
        step_flops = float(ca["flops"])
        scale = 1
        if ACCUM > 1:
            # XLA's cost analysis counts the lax.scan BODY once, not per
            # trip (measured r4: accum=4 reports exactly 1/4 the
            # flops/sample of the accum=1 step). Do NOT hard-code that:
            # measure the ratio against the no-accum step at the same
            # effective batch and only correct when the body really was
            # counted once (ADVICE r4 — a future jaxlib multiplying by
            # trip count would otherwise double-count MFU undetected)
            import dataclasses as _dc

            tr1 = Trainer(_dc.replace(
                cfg, train=_dc.replace(cfg.train, grad_accum=1)))
            ca1 = tr1.step_fn.lower(tr1.init_state(),
                                    tr1.shard_batch(host_batch())) \
                .compile().cost_analysis()
            ratio = float(ca1["flops"]) / step_flops
            if ratio > ACCUM / 2:      # body counted once -> ratio ~ACCUM
                scale = ACCUM
            else:                      # trip count already included
                print(f"cost analysis already per-trip (accum=1/accum "
                      f"flops ratio {ratio:.2f}); no correction applied")
        step_flops *= scale
        print(f"XLA flops/step {step_flops / 1e9:.2f} GF "
              f"({step_flops / n_samples / 1e6:.3f} MF/sample; "
              f"scan-body x{scale})")
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}")
    for K in KS:
        if K == 1:
            b = tr.shard_batch(host_batch())
            state, m = tr.step_fn(state, b)          # compile
            np.asarray(m["loss"])                    # D2H = real barrier
            t0 = time.time()
            n = 30
            for _ in range(n):
                state, m = tr.step_fn(state, b)
            np.asarray(m["loss"])
            dt = (time.time() - t0) / n
        else:
            bs = tr.shard_batches([host_batch() for _ in range(K)])
            state, m = tr.multi_step_fn(state, bs)   # compile
            np.asarray(m["loss"])                    # D2H = real barrier
            calls = max(1, 30 // K)
            t0 = time.time()
            for _ in range(calls):
                state, m = tr.multi_step_fn(state, bs)
            np.asarray(m["loss"])
            dt = (time.time() - t0) / (calls * K)
        mfu = (f"  MFU {step_flops / dt / V5E_PEAK * 100:5.1f}%"
               if step_flops else "")
        print(f"K={K:3d}: {dt * 1e3:7.2f} ms/step  {1 / dt:7.1f} steps/s  "
              f"{n_samples / dt / 1e6:7.2f} M samples/s{mfu}")


if __name__ == "__main__":
    main()
