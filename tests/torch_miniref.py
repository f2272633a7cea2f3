"""PyTorch mini-reference of the WaveNet forward (SURVEY.md §4.1).

Thin no-grad wrapper over tests/torch_trainref.py — the single torch twin
of shallow_wavenet_tpu/models/wavenet.py — consuming the flax parameter
tree and returning numpy. Keeping ONE copy of the torch forward math means
a model change can't silently desynchronize the forward-parity and
training-trajectory-parity suites.
"""

from __future__ import annotations

import numpy as np
import torch

from tests import torch_trainref as ttr


def forward(params, cfg, x_prev, cond, speaker=None):
    """Mirror of WaveNet.__call__ in float32. params = flax
    variables['params']; x_prev is int class ids for the softmax head."""
    tp = ttr.params_to_torch(params)
    x_prev = np.asarray(x_prev)
    x = (torch.from_numpy(x_prev).long() if cfg.head == "softmax"
         else torch.from_numpy(x_prev.astype(np.float32)))
    c = torch.from_numpy(np.asarray(cond, dtype=np.float32))
    spk = (torch.from_numpy(np.asarray(speaker)).long()
           if speaker is not None else None)
    with torch.no_grad():
        return ttr.forward(tp, cfg, x, c, spk).numpy()
