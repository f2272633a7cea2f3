"""Deterministic synthetic speech-like corpus (test strategy §4.5).

Harmonic signals with slowly varying F0 and spectral envelope plus a noise
floor — enough structure for copy-synthesis smoke tests without any real
speech data in the image.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from shallow_wavenet_tpu.data.audio_io import write_wav


def synth_utterance(seed: int, sample_rate: int, duration_s: float = 1.0
                    ) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(sample_rate * duration_s)
    t = np.arange(n) / sample_rate
    # slowly varying F0 in 80-300 Hz
    f0_base = rng.uniform(90.0, 250.0)
    f0 = f0_base * (1.0 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t))
    phase = 2 * np.pi * np.cumsum(f0) / sample_rate
    x = np.zeros(n)
    n_harm = int((sample_rate / 2 - 200) // f0_base)
    decay = rng.uniform(0.5, 0.9)
    for k in range(1, min(n_harm, 20) + 1):
        amp = decay ** (k - 1) * rng.uniform(0.6, 1.0)
        x += amp * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
    # amplitude envelope (syllable-ish) + noise floor
    env = 0.3 + 0.7 * 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 5) * t
                                        + rng.uniform(0, 2 * np.pi)))
    x = x * env + 0.01 * rng.standard_normal(n)
    x = 0.6 * x / np.max(np.abs(x))
    return x.astype(np.float32)


def make_corpus(root: str | Path, *, n_train: int = 8, n_eval: int = 2,
                sample_rate: int = 16000, duration_s: float = 1.0,
                seed: int = 1234, n_speakers: int = 1) -> dict[str, list[str]]:
    """Write wavs + scp file lists under `root`. Returns {'train': [...],
    'eval': [...]} wav paths. Speaker id is seed % n_speakers (encoded in
    the filename `spkN_uttM.wav`)."""
    root = Path(root)
    lists: dict[str, list[str]] = {}
    idx = 0
    for split, count in (("train", n_train), ("eval", n_eval)):
        paths = []
        for _ in range(count):
            spk = idx % n_speakers
            wav = synth_utterance(seed + idx, sample_rate, duration_s)
            # stem is unique ACROSS splits: feature files are keyed by stem
            # in one shared feats dir (bin/common.feats_path_for), so a
            # train/eval stem collision would silently cross-wire waveforms
            # with the other split's features
            p = root / "wav" / split / f"spk{spk}_utt{idx:03d}.wav"
            write_wav(p, wav, sample_rate)
            paths.append(str(p))
            idx += 1
        (root / f"{split}.scp").write_text("\n".join(paths) + "\n")
        lists[split] = paths
    return lists


def speaker_of(path: str | Path) -> int:
    """Parse the speaker id out of a `spkN_uttM.wav` filename (0 if absent)."""
    name = Path(path).stem
    if name.startswith("spk") and "_" in name:
        try:
            return int(name.split("_")[0][3:])
        except ValueError:
            return 0
    return 0
