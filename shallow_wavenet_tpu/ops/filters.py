"""Waveform pre-filters (component C2 periphery).

The reference recipes high-pass the corpus (remove DC/rumble below ~70 Hz)
before feature extraction and training. scipy is in the image; this runs on
host CPU at data-prep time (it is not in any device hot path).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import butter, sosfiltfilt


def highpass(x: np.ndarray, sample_rate: int, cutoff: float,
             order: int = 5) -> np.ndarray:
    """Zero-phase Butterworth high-pass; no-op for cutoff <= 0."""
    if cutoff <= 0:
        return x
    sos = butter(order, cutoff, btype="highpass", fs=sample_rate,
                 output="sos")
    return sosfiltfilt(sos, x).astype(np.float32)
