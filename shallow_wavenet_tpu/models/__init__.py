"""L3 model layer — Flax WaveNet (shallow/deep), output heads, AR generation.

Component C6-C8 of SURVEY.md §2.1, built to the paper-exact specs in
SURVEY.md Appendix A.2/A.3/A.6 (the reference mount was empty; see §0).
"""

from shallow_wavenet_tpu.models.wavenet import (  # noqa: F401
    WaveNet,
    extract_plain_params,
)
from shallow_wavenet_tpu.models import heads  # noqa: F401
from shallow_wavenet_tpu.models.streaming import (  # noqa: F401
    StreamingSynthesizer, StreamPool,
)
