"""Collect the round-5 measurement artifacts under /root/runs into one
printable summary (the BASELINE.md round-5 write-up's data source).

Reads whatever exists and skips the rest, so it can run mid-queue:
- <run>/mcd.json          from stage 6 (bin/mcd_eval.py --out)
- r5_pitch_fmt150_eval.json  from tools/pitch_eval.py
- r5_roofline_*.json      from tools/train_roofline.py
- r5_pool8.log            from tools/stream_bench.py pool mode
- r5_bench.log            from bench.py

Usage: python tools/r5_collect.py [runs_root=/root/runs]
"""

import json
import sys
from pathlib import Path


def show_mcd(root: Path, name: str) -> None:
    p = root / name / "mcd.json"
    if not p.exists():
        print(f"[{name}] mcd.json: MISSING")
        return
    d = json.loads(p.read_text())
    print(f"[{name}] mean MCD {d.get('mcd_db_mean')} dB  "
          f"LSD {d.get('lsd_db_mean')}  silence_db {d.get('silence_db_mean')}")
    for utt, u in d.get("per_utterance", {}).items():
        sil, lsd = u.get("silence_db"), u.get("lsd_db")
        f0r = u.get("f0_rmse_hz")
        print(f"    {utt:24s} MCD {u.get('mcd_db'):.2f}  "
              f"LSD {f'{lsd:.2f}' if lsd is not None else 'n/a'}  "
              f"silence {f'{sil:.1f}' if sil is not None else 'n/a'} dB  "
              f"F0-RMSE {f'{f0r:.1f}' if f0r is not None else 'n/a'} "
              f"VUV {u.get('vuv_error_rate')}")


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/runs")
    for name in ("r5_deep_v2", "r5_pitch_fmt", "pitch_dropout",
                 "r5_multispk", "r5_ft_warm", "r5_ft_scratch"):
        show_mcd(root, name)

    for p in (root / "r5_pitch_fmt150_eval.json",
              root / "pitch_dropout" / "pitch_eval.json"):
        if not p.exists():
            print(f"[pitch {p.parent.name}/{p.name}]: MISSING")
            continue
        print(f"[pitch eval: {p}]")
        d = json.loads(p.read_text())
        for pair in d["pairs"]:
            rows = pair["rows"]
            errs = [r["ratio_err_pct"] for r in rows
                    if r["ratio_err_pct"] is not None]
            print(f"[pitch] factor {pair['factor']}: "
                  + "  ".join(
                      f"{r['utt']}:{r['ratio']:.3f}"
                      f"({r['mcd_vs_transposed_oracle']:.2f}dB)"
                      for r in rows if r["ratio"] is not None)
                  + (f"  | mean|err| {sum(errs)/len(errs):.1f}% "
                     f"worst {max(errs):.1f}%" if errs else "  (none)"))

    for rf in sorted(root.glob("r5_roofline_*.json")):
        d = json.loads(rf.read_text())
        print(f"[roofline {rf.stem.replace('r5_roofline_', '')}] "
              + json.dumps(d, separators=(",", ":"))[:400])

    for logname in ("r5_pool8.log", "r5_pool4.log", "r5_bench.log"):
        p = root / logname
        if p.exists():
            lines = [ln for ln in p.read_text().splitlines() if ln.strip()]
            print(f"[{logname}]")
            for ln in lines[-12:]:
                print("   ", ln)
        else:
            print(f"[{logname}]: MISSING")


if __name__ == "__main__":
    main()
