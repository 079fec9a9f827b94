"""semiring/: algebraic laws every registered semiring must satisfy."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparseharness_tpu.semiring import REGISTRY, get_semiring, Semiring


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_add_identity_and_annihilator(name):
    sr = get_semiring(name)
    vals = _samples(sr)
    zero = jnp.asarray(sr.zero, sr.dtype)
    # a ⊕ 0̄ = a
    np.testing.assert_array_equal(np.asarray(sr.add(vals, jnp.full_like(vals, zero))), np.asarray(vals))
    # a ⊗ 0̄ = 0̄  (mul(vector_elem, matrix_zero) — the padding contract)
    prod = sr.mul(vals, jnp.full_like(vals, zero))
    np.testing.assert_array_equal(
        np.asarray(prod), np.asarray(jnp.full_like(vals, zero))
    )


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - {"max_right"}))
def test_mul_identity(name):
    sr = get_semiring(name)
    vals = _samples(sr)
    one = jnp.asarray(sr.one, sr.dtype)
    np.testing.assert_allclose(
        np.asarray(sr.mul(vals, jnp.full_like(vals, one))), np.asarray(vals)
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_add_commutative_associative(name):
    sr = get_semiring(name)
    a, b, c = _samples(sr), _samples(sr, 1), _samples(sr, 2)
    np.testing.assert_array_equal(
        np.asarray(sr.add(a, b)), np.asarray(sr.add(b, a))
    )
    np.testing.assert_allclose(
        np.asarray(sr.add(sr.add(a, b), c)),
        np.asarray(sr.add(a, sr.add(b, c))),
        rtol=1e-6,
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_add_reduce_agrees_with_pairwise(name):
    sr = get_semiring(name)
    a = _samples(sr).reshape(2, -1)
    red = sr.add_reduce(a, axis=0)
    np.testing.assert_allclose(
        np.asarray(red), np.asarray(sr.add(a[0], a[1])), rtol=1e-6
    )


def test_fold_axby_short_circuits():
    sr = get_semiring("plus_times")
    dp = jnp.asarray([1.0, 2.0])
    y = jnp.asarray([10.0, 20.0])
    np.testing.assert_allclose(np.asarray(sr.fold_axby(1.0, dp, 0.0, y)), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(sr.fold_axby(2.0, dp, 1.0, y)), [12.0, 24.0])


def test_registry_unknown():
    with pytest.raises(KeyError):
        get_semiring("nope")


def _samples(sr: Semiring, seed: int = 0):
    rng = np.random.default_rng(seed)
    dt = np.dtype(sr.dtype)
    if dt == np.bool_:
        return jnp.asarray(rng.random(8) < 0.5)
    if np.issubdtype(dt, np.integer):
        return jnp.asarray(rng.integers(0, 100, 8).astype(dt))
    return jnp.asarray(rng.uniform(0.1, 5.0, 8).astype(dt))
