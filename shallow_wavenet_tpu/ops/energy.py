"""Frame log-energy conditioning channel (component C2 periphery).

The world feature set encodes digital silence exactly like unvoiced noise
(vuv=0, bap=1; only the floored mcep differs), so a world-conditioned deep
AR model cues a low noise floor in silent stretches instead of emitting
digital zero (BASELINE.md r4: -21..-29 dB hiss in short silences). This
channel is the explicit silence/energy cue (`data.energy_feature`): frame
log-RMS of the waveform, floored so digital zero maps to one exact constant.

numpy-only on purpose — the same function is called from the JAX feature
path AND the spawned-pool native path (utils/native.world_features_native),
so the two extraction modes stay bit-identical with no C++ twin needed.
"""

from __future__ import annotations

import numpy as np

# amplitude floor: log(1e-5) = -11.51; digital-zero frames all land exactly
# here, ~ -100 dBFS — far below any voiced/unvoiced content
ENERGY_FLOOR = 1e-5


def frame_log_energy(wav: np.ndarray, hop_length: int,
                     n_frames: int = 0) -> np.ndarray:
    """(T,) waveform -> (n_frames, 1) float32 log frame RMS.

    Frames are the exact hop partition wav[i*hop:(i+1)*hop] — aligned with
    the feature trimming convention of bin/feature_extract (T // hop
    frames), no window overlap, so a digitally silent frame reads exactly
    log(ENERGY_FLOOR).
    """
    wav = np.asarray(wav, np.float32)
    if n_frames <= 0:
        n_frames = len(wav) // hop_length
    fr = wav[: n_frames * hop_length].astype(np.float64)
    fr = fr.reshape(n_frames, hop_length)
    rms = np.sqrt(np.mean(fr * fr, axis=1))
    return np.log(np.maximum(rms, ENERGY_FLOOR)).astype(np.float32)[:, None]
