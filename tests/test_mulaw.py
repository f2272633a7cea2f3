"""Round-trip tests for the mu-law codec (test strategy SURVEY.md §4.3)."""

import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.ops import (
    mulaw_decode,
    mulaw_dequantize,
    mulaw_encode,
    mulaw_quantize,
)


def test_encode_decode_roundtrip():
    x = jnp.asarray(np.linspace(-1, 1, 1001, dtype=np.float32))
    y = mulaw_decode(mulaw_encode(x))
    # float32 exp/log round trip: ~7e-5 worst case
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_encode_range_and_sign():
    x = jnp.asarray([-1.0, -0.5, 0.0, 0.5, 1.0], dtype=jnp.float32)
    y = mulaw_encode(x)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.sign(y), np.sign(x))
    # companding expands small amplitudes
    assert float(mulaw_encode(jnp.float32(0.1))) > 0.5


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 4096).astype(np.float32))
    q = mulaw_quantize(x)
    assert q.dtype == jnp.int32
    assert int(q.min()) >= 0 and int(q.max()) <= 255
    xr = mulaw_dequantize(q)
    # mu-law 8-bit max error is bounded; generous tolerance near |x|=1
    assert float(jnp.max(jnp.abs(xr - x))) < 0.031  # half-bin * max decode slope ln(256)*256/255/256


def test_quantize_extremes():
    assert int(mulaw_quantize(jnp.float32(-1.0))) == 0
    assert int(mulaw_quantize(jnp.float32(1.0))) == 255
    assert int(mulaw_quantize(jnp.float32(0.0))) in (127, 128)
