"""End-to-end recipe tests on CPU (SURVEY.md §3.1 call stack; test §4.5
golden copy-synthesis, tiny version). Exercises every layer L0-L5 once:
synthetic corpus -> features -> stats -> (noise shaping) -> train ->
decode -> (restore) -> MCD."""

import json
from pathlib import Path

import numpy as np
import pytest

from shallow_wavenet_tpu.bin import run as run_cli

TINY = [
    "data.sample_rate=8000", "data.n_fft=256", "data.hop_length=80",
    "data.win_length=200", "data.n_mels=16", "data.fmax=3800.0",
    "data.segment_length=800", "data.batch_size=2",
    "model.aux_channels=16", "model.stack_size=4",
    "model.residual_channels=16", "model.gate_channels=32",
    "model.skip_channels=24", "model.cond_channels=12",
    "model.upsample_factors=[4,5,4]", "model.compute_dtype=float32",
    "train.checkpoint_every=10", "train.log_every=5",
]


def run_stages(tmp_path, preset, extra=(), stages=(0, 6), steps=10,
               n_train=2, n_eval=1):
    run_cli.main([
        "--preset", preset, "--workdir", str(tmp_path),
        "--stage", str(stages[0]), "--stop-stage", str(stages[1]),
        "--steps", str(steps), "--n-train", str(n_train),
        "--n-eval", str(n_eval), *TINY, *extra,
    ])


def test_recipe_softmax_end_to_end(tmp_path):
    run_stages(tmp_path, "shallow_softmax_single")
    # every stage artifact exists
    assert (tmp_path / "corpus/train.scp").exists()
    assert (tmp_path / "stats.h5").exists()
    assert (tmp_path / "model/metrics.jsonl").exists()
    gen = list((tmp_path / "gen_wav").glob("*.wav"))
    assert len(gen) == 1
    mcd = json.loads((tmp_path / "mcd.json").read_text())
    assert mcd["mcd_db_mean"] is not None and np.isfinite(mcd["mcd_db_mean"])
    summary = json.loads((tmp_path / "gen_wav/decode_summary.json").read_text())
    assert summary["model_step"] == 10


def test_recipe_noise_shaping_end_to_end(tmp_path):
    run_stages(tmp_path, "shallow_laplace_ns",
               extra=["noise_shaping.mcep_order=12"])
    # shaped train (2) AND dev (1) wavs — dev eval loss measures the same
    # pre-emphasized distribution training sees — + restored eval wavs
    assert len(list((tmp_path / "shaped_wav").glob("*.wav"))) == 3
    assert len(list((tmp_path / "restored_wav").glob("*.wav"))) == 1
    mcd = json.loads((tmp_path / "mcd.json").read_text())
    assert np.isfinite(mcd["mcd_db_mean"])


def test_recipe_multispeaker(tmp_path):
    run_stages(tmp_path, "multispk_dp", n_train=4,
               extra=["noise_shaping.enabled=false", "mesh.num_devices=2"])
    assert (tmp_path / "model/metrics.jsonl").exists()
    # two speakers present in the corpus file names
    spks = {p.name.split("_")[0] for p in (tmp_path / "corpus/wav/train").iterdir()}
    assert len(spks) >= 2


def test_decode_dp_cli(tmp_path):
    """`decode --dp` (BASELINE.json:10, VERDICT r1 item 6): the sharded
    generation path is a user-facing CLI capability, and its output is
    sample-identical to single-device decode with the same seed — the
    3-utterance batch is row-padded to the 8-device mesh inside
    _decode_batch_dp and trimmed back."""
    from shallow_wavenet_tpu.bin import decode

    run_stages(tmp_path, "shallow_laplace_single", steps=5, n_eval=3,
               extra=["noise_shaping.enabled=false"])
    single = {p.name: p.read_bytes()
              for p in (tmp_path / "gen_wav").glob("*.wav")}
    assert len(single) == 3
    decode.main([
        "--eval-scp", str(tmp_path / "corpus/eval.scp"),
        "--feats-dir", str(tmp_path / "feats"),
        "--stats", str(tmp_path / "stats.h5"),
        "--workdir", str(tmp_path / "model"),
        "--outdir", str(tmp_path / "dp_wav"), "--dp",
        "--preset", "shallow_laplace_single", *TINY,
        "noise_shaping.enabled=false",
    ])
    dp = {p.name: p.read_bytes()
          for p in (tmp_path / "dp_wav").glob("*.wav")}
    assert dp == single


def test_recipe_external_corpus(tmp_path):
    """Stage 0 `--wav-dir` ingestion of a messy EXTERNAL corpus (VERDICT r1
    item 4): mixed sample rates, 24-bit and stereo wavs, mixed lengths, one
    silence-heavy utterance — all resampled/downmixed on load, driven
    through the full 7-stage pipeline."""
    import wave

    import numpy as np

    from shallow_wavenet_tpu.data.synthetic import synth_utterance

    ext = tmp_path / "external"
    ext.mkdir()

    def put(name, x, sr, ch=1, sw=2):
        x = np.asarray(x, np.float64)
        if ch == 2:
            x = np.stack([x, 0.5 * x], axis=1).reshape(-1)
        scale = {2: 32767, 3: 8388607}[sw]
        q = np.clip(np.round(x * scale), -scale - 1, scale).astype(np.int64)
        if sw == 2:
            frames = q.astype("<i2").tobytes()
        else:
            frames = b"".join(int(v).to_bytes(3, "little", signed=True)
                              for v in q)
        with wave.open(str(ext / name), "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(sw)
            w.setframerate(sr)
            w.writeframes(frames)

    put("a_24bit_22k.wav", synth_utterance(1, 22050, 1.3), 22050, sw=3)
    put("b_stereo_16k.wav", synth_utterance(2, 16000, 0.9), 16000, ch=2)
    put("c_8k.wav", synth_utterance(3, 8000, 1.1), 8000)
    silence = np.zeros(12000)
    silence[4000:6000] = synth_utterance(4, 8000, 0.25)[:2000]
    put("d_silence_heavy.wav", silence, 8000)
    put("e_eval_11k.wav", synth_utterance(5, 11025, 1.0), 11025)

    run_cli.main([
        "--preset", "shallow_softmax_single", "--workdir", str(tmp_path),
        "--stage", "0", "--stop-stage", "6", "--steps", "5",
        "--wav-dir", str(ext), "--n-eval", "1", *TINY,
    ])
    train_list = (tmp_path / "corpus/train.scp").read_text().split()
    assert len(train_list) == 4
    # every utterance produced features at the CONFIG rate geometry
    mcd = json.loads((tmp_path / "mcd.json").read_text())
    assert np.isfinite(mcd["mcd_db_mean"])
    gen = list((tmp_path / "gen_wav").glob("*.wav"))
    assert [p.name for p in gen] == ["e_eval_11k.wav"]
    # generated audio length matches the RESAMPLED (8 kHz) duration
    import wave as _w

    with _w.open(str(gen[0]), "rb") as w:
        assert abs(w.getnframes() - 8000) <= 80 * 2   # ~1.0 s at 8 kHz
        assert w.getframerate() == 8000


def test_recipe_stage_resume(tmp_path):
    """--stage N resumes mid-pipeline (SURVEY.md §5.3)."""
    run_stages(tmp_path, "shallow_softmax_single", stages=(0, 2))
    assert (tmp_path / "stats.h5").exists()
    assert not (tmp_path / "model").exists()
    run_stages(tmp_path, "shallow_softmax_single", stages=(4, 4), steps=5)
    recs = [json.loads(l) for l in
            (tmp_path / "model/metrics.jsonl").read_text().splitlines()]
    assert recs[-1]["step"] == 5


def test_config_file_roundtrip(tmp_path):
    """--config file.json drives the CLIs identically to --preset (config
    serde, SURVEY.md §5.6)."""
    from shallow_wavenet_tpu.config import Config, get_config

    cfg = get_config("shallow_softmax_single", [o for o in TINY])
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(cfg.to_json())
    back = Config.from_json(cfg_path.read_text())
    assert back.to_dict() == cfg.to_dict()

    run_cli.main([
        "--preset", "shallow_softmax_single",  # ignored when --config given
        "--config", str(cfg_path), "--workdir", str(tmp_path),
        "--stage", "0", "--stop-stage", "2", "--steps", "1",
        "--n-train", "2", "--n-eval", "1",
    ])
    assert (tmp_path / "stats.h5").exists()


def test_egs_run_sh_shell_surface(tmp_path):
    """The egs/<corpus>/<recipe>/run.sh shell surface (component C1's
    literal form) drives stages 0-2 from its conf/config.json."""
    import os
    import subprocess
    import sys

    repo = Path(__file__).resolve().parent.parent
    script = repo / "egs/synthetic/shallow_softmax_single/run.sh"
    # hermetic: strip the accelerator-plugin env so the subprocess runs on
    # CPU instead of contending for the (single) TPU another job may hold
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "TPU_NAME")}
    env["JAX_PLATFORMS"] = "cpu"
    # run.sh execs bare `python`: make sure it resolves to THIS
    # interpreter (venv installs are not always on the caller's PATH)
    env["PATH"] = (os.path.dirname(sys.executable) + os.pathsep
                   + env.get("PATH", ""))
    r = subprocess.run(
        [str(script), "--workdir", str(tmp_path), "--stage", "0",
         "--stop_stage", "2", "--n_train", "2", "--n_eval", "1", *TINY],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "stats.h5").exists()


def test_egs_confs_match_presets():
    """The egs conf/config.json files must not drift from config.PRESETS
    (run.sh users and --preset users must train the same model)."""
    from shallow_wavenet_tpu.config import PRESETS, Config

    repo = Path(__file__).resolve().parent.parent
    for name, mk in PRESETS.items():
        conf = repo / "egs/synthetic" / name / "conf/config.json"
        assert conf.exists(), f"missing egs conf for preset {name}"
        assert Config.from_json(conf.read_text()).to_dict() == mk().to_dict()


def test_stage1_rejects_duplicate_stems(tmp_path):
    """A train/eval wav-stem collision would silently cross-wire one
    split's waveforms with the other's features (shared feats dir keyed by
    stem) — stage 1 must refuse to run."""
    import numpy as np

    from shallow_wavenet_tpu.data.audio_io import write_wav

    corpus = tmp_path / "corpus"
    for sub in ("wav/train", "wav/eval"):
        (corpus / sub).mkdir(parents=True)
    w = (0.1 * np.sin(np.linspace(0, 400, 8000))).astype(np.float32)
    tr = corpus / "wav/train/spk0_utt000.wav"
    ev = corpus / "wav/eval/spk0_utt000.wav"  # same stem, different split
    write_wav(str(tr), w, 8000)
    write_wav(str(ev), w, 8000)
    (corpus / "train.scp").write_text(f"{tr}\n")
    (corpus / "eval.scp").write_text(f"{ev}\n")

    with pytest.raises(ValueError, match="duplicate wav stem"):
        run_stages(tmp_path, "shallow_softmax_single", stages=(1, 1))
