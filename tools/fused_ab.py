"""Trained-model decode A/B: fused=W kernel vs the default (unfused).

Replays recipe stages 5-6 twice on an existing workdir — same checkpoint,
same seed (identical noise streams) — once per kernel variant, and prints
the copy-synthesis MCD of each plus the delta. The quality gate for the
non-bit-exact fused variant, mirroring the bf16-vs-fp32 A/B precedent
(0.023 dB, BASELINE.md row 2-ab).

Usage: python tools/fused_ab.py <workdir> [W]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

WD = sys.argv[1]
W = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main():
    from shallow_wavenet_tpu.bin import decode, mcd_eval, noise_shaping

    cfg_args = ["--config", f"{WD}/model/config.json"]
    eval_scp = f"{WD}/corpus/eval.scp"
    results = {}
    for tag, extra in (("unfused", []), (f"fused{W}", ["--fused", str(W)])):
        gen = f"{WD}/gen_{tag}"
        restored = f"{WD}/restored_{tag}"
        decode.main(["--eval-scp", eval_scp, "--feats-dir", f"{WD}/feats",
                     "--stats", f"{WD}/stats.h5", "--workdir", f"{WD}/model",
                     "--outdir", gen, "--seed", "0", *extra, *cfg_args])
        noise_shaping.main(["--wav-scp", eval_scp, "--stats",
                            f"{WD}/stats.h5", "--outdir", restored, "--inv",
                            "--indir", gen, *cfg_args])
        mcd_eval.main(["--ref-scp", eval_scp, "--gen-dir", restored,
                       "--out", f"{WD}/mcd_{tag}.json", *cfg_args])
        results[tag] = json.load(open(f"{WD}/mcd_{tag}.json"))["mcd_db_mean"]
    tags = list(results)
    print(f"A/B: {tags[0]} {results[tags[0]]:.3f} dB, "
          f"{tags[1]} {results[tags[1]]:.3f} dB, "
          f"|delta| {abs(results[tags[0]] - results[tags[1]]):.3f} dB")


if __name__ == "__main__":
    main()
