"""L2 signal ops — pure jnp/Pallas functions, array in → array out.

TPU-native replacements for the reference's external native DSP deps
(WORLD C++, SPTK C; SURVEY.md §2.3): STFT/mel as rFFT + matmul filterbank,
mcep via a dense freqt warping matrix, MLSA noise shaping as lax.scan (with
a C++ CPU fast path in native/), and the Pallas persistent AR kernel.
"""

from shallow_wavenet_tpu.ops.mulaw import (  # noqa: F401
    mulaw_encode,
    mulaw_decode,
    mulaw_quantize,
    mulaw_dequantize,
)
from shallow_wavenet_tpu.ops.stft import (  # noqa: F401
    stft_magnitude,
    mel_filterbank,
    log_mel_spectrogram,
)
