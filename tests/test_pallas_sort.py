"""Bitonic sorters (ops/pallas/sort2) vs np.lexsort ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from rapmap_tpu.ops.pallas.sort2 import (
    bitonic_sort_pairs,
    bitonic_sort_pairs_pallas,
)


def _ref(hi, lo):
    order = np.lexsort((lo, hi))
    return hi[order], lo[order]


@pytest.mark.parametrize("n", [128, 1024, 8192])
def test_jax_bitonic_matches_lexsort(n):
    rng = np.random.default_rng(n)
    hi = rng.integers(0, 2**32, n, dtype=np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint32)
    eh, el = _ref(hi, lo)
    h, l = bitonic_sort_pairs(jnp.asarray(hi), jnp.asarray(lo))
    assert np.array_equal(np.asarray(h), eh)
    assert np.array_equal(np.asarray(l), el)


def test_jax_bitonic_duplicates_and_extremes():
    rng = np.random.default_rng(0)
    n = 2048
    # heavy duplication + sentinel values (collate pads with 0xFFFFFFFF)
    hi = rng.integers(0, 4, n).astype(np.uint32)
    lo = rng.integers(0, 4, n).astype(np.uint32)
    hi[::7] = np.uint32(0xFFFFFFFF)
    lo[::7] = np.uint32(0xFFFFFFFF)
    eh, el = _ref(hi, lo)
    h, l = bitonic_sort_pairs(jnp.asarray(hi), jnp.asarray(lo))
    assert np.array_equal(np.asarray(h), eh)
    assert np.array_equal(np.asarray(l), el)


@pytest.mark.parametrize("n", [1024, 4096])
def test_pallas_bitonic_matches_lexsort(n):
    rng = np.random.default_rng(n + 1)
    hi = rng.integers(0, 2**32, n, dtype=np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint32)
    eh, el = _ref(hi, lo)
    h, l = bitonic_sort_pairs_pallas(
        jnp.asarray(hi), jnp.asarray(lo), interpret=True
    )
    assert np.array_equal(np.asarray(h), eh)
    assert np.array_equal(np.asarray(l), el)
