"""Analysis-synthesis oracle: the MCD floor of the feature chain + metric
on a corpus, independent of any neural model (VERDICT r2 item 5 — anchors
the speechlike-vs-harmonic quality gap to corpus difficulty).

Per eval utterance: extract the `world` feature set from the TRUE wav,
resynthesize with the classical source-filter vocoder
(ops/synthesis.world_synthesis), and score MCD / F0-RMSE / VUV against
the original. A trained neural vocoder conditioned on these features
cannot be expected below this floor on the same metric.

Usage: python tools/as_oracle.py [corpus=speechlike|harmonic] [n=4]
                                 [sr=16000] [smooth=0|1] [pb=0|1] [det=0|1]

pb=0 (default) mixes pulse/noise by the per-frame band-MEAN aperiodicity;
pb=1 mixes PER BAND (WORLD's multiband convention, ops/synthesis.py's
default). det=1 zeroes voiced-frame aperiodicity (pulse-only voiced
excitation). The r4 grid (BASELINE.md) measured per-frame as the best
floor on every corpus/rate: pure pulses dig inter-harmonic spectral
nulls where the real signal has a noise floor (det +1.4 dB), while
band-resolved noise re-randomizes an envelope the MLSA filter had
already reproduced (pb=1 +0.8-1.6 dB) — the per-frame mean sits between
the two failure modes, so it defines the oracle floor and pb/det stay
as the dated A/B (VERDICT r3 items 3/7).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

_kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
CORPUS = _kw.get("corpus", "speechlike")
N = int(_kw.get("n", 4))
SR = int(_kw.get("sr", 16000))
SMOOTH = bool(int(_kw.get("smooth", "0")))
PER_BAND = bool(int(_kw.get("pb", "0")))
DET = bool(int(_kw.get("det", "0")))


def main():
    from shallow_wavenet_tpu.bin.feature_extract import extract_one
    from shallow_wavenet_tpu.bin.mcd_eval import eval_pair
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.data.audio_io import read_wav
    from shallow_wavenet_tpu.data.synthetic import make_corpus
    from shallow_wavenet_tpu.ops.synthesis import world_synthesis

    cfg = get_config("shallow_laplace_ns", [
        "data.feature_type=world", "model.aux_channels=31",
        f"data.sample_rate={SR}",
        f"data.envelope_smoothing={'true' if SMOOTH else 'false'}",
    ])
    with tempfile.TemporaryDirectory() as root:
        lists = make_corpus(root, n_train=1, n_eval=N, sample_rate=SR,
                            style=CORPUS)
        rows = []
        for p in lists["eval"]:
            wav, _ = read_wav(p)
            feats = extract_one(p, cfg)         # UN-normalized world set
            if DET:
                # pulse-only voiced excitation: zero the bap columns
                feats = np.array(feats)
                feats[:, 2 + cfg.noise_shaping.mcep_order + 1:] = 0.0
            syn = np.asarray(world_synthesis(
                feats, jax.random.key(0), SR, cfg.data.hop_length,
                cfg.noise_shaping.mcep_order, cfg.noise_shaping.alpha,
                t_len=len(wav), per_band=PER_BAND))
            m = eval_pair(wav[: len(syn)], syn, cfg)
            rows.append(m)
            f0r = m.get("f0_rmse_hz")
            print(f"{os.path.basename(p)}: MCD {m['mcd_db']:.3f} dB  "
                  f"F0-RMSE {f0r if f0r is None else round(f0r, 1)} Hz  "
                  f"VUV-err {m['vuv_error_rate']:.3f}  "
                  f"LSD {m['lsd_db']:.2f} dB")
        mcds = [r["mcd_db"] for r in rows]
        print(f"oracle (corpus={CORPUS} sr={SR} smooth={int(SMOOTH)} "
              f"pb={int(PER_BAND)} det={int(DET)}): "
              f"mean MCD {np.mean(mcds):.3f} dB over {len(rows)} utts")


if __name__ == "__main__":
    main()
