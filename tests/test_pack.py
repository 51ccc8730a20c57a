"""Bit-packing round-trip and layout tests (analogue of the reference's
engine/test_packing_kernel.cu)."""

import numpy as np
import jax.numpy as jnp

from flexq_tpu.packing import pack6, pack6_np, packed_nbytes, unpack6, unpack6_np


def rand_int6(rng, k, n):
    return rng.integers(-32, 32, size=(k, n), dtype=np.int32)


def test_roundtrip_jax():
    rng = np.random.default_rng(0)
    w = rand_int6(rng, 256, 384)
    hi, lo = pack6(jnp.asarray(w))
    out = np.asarray(unpack6(hi, lo))
    np.testing.assert_array_equal(out, w.astype(np.int8))


def test_roundtrip_numpy_matches_jax():
    rng = np.random.default_rng(1)
    w = rand_int6(rng, 128, 128)
    hi_j, lo_j = pack6(jnp.asarray(w))
    hi_n, lo_n = pack6_np(w)
    np.testing.assert_array_equal(np.asarray(hi_j), hi_n)
    np.testing.assert_array_equal(np.asarray(lo_j), lo_n)
    np.testing.assert_array_equal(unpack6_np(hi_n, lo_n), w.astype(np.int8))


def test_extremes():
    # full range incl. -32 (sign corner) and 31
    w = np.tile(np.arange(-32, 32, dtype=np.int32).repeat(2), (128, 1)).T  # [128,128]
    assert w.shape == (128, 128)
    hi, lo = pack6_np(w)
    np.testing.assert_array_equal(unpack6_np(hi, lo), w.astype(np.int8))


def test_sizes():
    k, n = 512, 256
    rng = np.random.default_rng(2)
    hi, lo = pack6_np(rand_int6(rng, k, n))
    assert hi.nbytes + lo.nbytes == packed_nbytes(k, n)
    assert packed_nbytes(k, n) * 8 == 6 * k * n  # exactly 6 bits per value
