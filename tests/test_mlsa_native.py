"""C++ native MLSA == JAX lax.scan MLSA (cross-implementation check).

The native lib is the framework's counterpart of the reference's SPTK C
dependency (SURVEY.md §2.3); both sides realize the identical Pade
structure, so agreement is to float32 rounding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shallow_wavenet_tpu.data.synthetic import synth_utterance
from shallow_wavenet_tpu.ops.mlsa import mc2b, mlsa_filter
from shallow_wavenet_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)

ALPHA = 0.466


def _coeffs(seed=0, order=24):
    rng = np.random.default_rng(seed)
    c = np.zeros(order + 1)
    c[1:] = rng.standard_normal(order) * 0.25 / np.arange(1, order + 1)
    return c


def test_mc2b_native_matches_jax():
    c = _coeffs()
    b_n = native.mc2b_native(c, ALPHA)
    # jax computes in float32 (x64 disabled) — compare at fp32 precision
    b_j = np.asarray(mc2b(jnp.asarray(c, jnp.float32), ALPHA))
    np.testing.assert_allclose(b_n, b_j, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("inverse", [False, True])
def test_native_filter_matches_scan(inverse):
    c = _coeffs(1)
    b = native.mc2b_native(c, ALPHA)
    x = synth_utterance(2, 16000, 0.2)
    y_n = native.mlsa_filter_native(x, b, ALPHA, 5, inverse)
    y_j = np.asarray(
        mlsa_filter(jnp.asarray(x), jnp.asarray(b, jnp.float32), ALPHA,
                    5, inverse)
    )
    np.testing.assert_allclose(y_n, y_j, atol=2e-6)


def test_native_roundtrip_below_16bit_floor():
    c = _coeffs(3)
    b = native.mc2b_native(c, ALPHA)
    x = synth_utterance(4, 16000, 0.2)
    y = native.mlsa_filter_native(x, b, ALPHA, 5, False)
    back = native.mlsa_filter_native(y, b, ALPHA, 5, True)
    assert np.abs(back - x).max() < 3e-5
