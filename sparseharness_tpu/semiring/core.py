"""First-class semirings.

The reference encodes each semiring as C functions (``add``, ``mult``,
``doubleMultiplyAdd``) textually embedded in its Lift-generated OpenCL kernel
JSONs (e.g. /root/reference/example/kernel.json for float +/*, and
example/sssp/kernel.json for min-plus) — one kernel corpus per semiring.
Here a semiring is a frozen dataclass of traced-closure ops, so a *single*
kernel implementation serves every semiring: the ops are closed over at trace
time and XLA/Mosaic specializes the compiled code.

The canonical SpMV this framework computes (README.md:27-56 of the reference,
and the ``doubleMultiplyAdd`` fold present in every corpus kernel) is::

    y_out[i] = (alpha ⊗ (⊕_j  A[i, j] ⊗ x[j]))  ⊕  (beta ⊗ y[i])

with ⊕-identity ``zero`` used as both the reduction seed and the padding
annihilator (a ⊗ zero = zero for all semirings here, so padded ELL/BSR slots
vanish under the reduction).

Note ``mul(x_j, a_ij)`` takes the *vector* element first and the *matrix*
element second, matching the reference kernels' ``mult(l=vector, r=matrix)``
argument order — this matters for the non-commutative MAX_RIGHT semiring used
by SCC label propagation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax.numpy as jnp
import numpy as np

Array = Any


@dataclasses.dataclass(frozen=True)
class Semiring:
    """A commutative-monoid ⊕ with an (optionally non-commutative) ⊗.

    Attributes:
      name: registry key.
      add: elementwise ⊕ of two arrays.
      mul: elementwise ⊗; called as ``mul(x_vector_elem, a_matrix_elem)``.
      zero: identity of ⊕ and annihilator of ⊗ (python scalar).
      one: identity of ⊗ (python scalar).
      dtype: canonical element dtype on device.
      add_reduce: reduction of ⊕ along an axis (must agree with ``add``).
      exact_convergence: fixpoint convergence uses exact equality (int/bool
        semirings) rather than |Δ| < delta (float semirings) — mirrors
        app/bfs.cpp:154-174 (exact) vs app/sssp.cpp:157-176 (delta).
    """

    name: str
    add: Callable[[Array, Array], Array]
    mul: Callable[[Array, Array], Array]
    zero: Any
    one: Any
    dtype: Any
    add_reduce: Callable[..., Array]
    exact_convergence: bool = False

    # ------------------------------------------------------------------
    def zeros(self, shape) -> Array:
        return jnp.full(shape, self.zero, dtype=self.dtype)

    def ones(self, shape) -> Array:
        return jnp.full(shape, self.one, dtype=self.dtype)

    def scale(self, alpha, a: Array) -> Array:
        """alpha ⊗ a, skipping the op entirely when alpha is the static ⊗-identity.

        The static short-circuit matters on TPU: alpha=one is the common case
        (reference apps pass alpha=1, beta=0 — app/spmv.cpp:119-120) and
        skipping it removes a full elementwise pass over HBM.
        """
        if _is_static(alpha, self.one):
            return a
        return self.mul(jnp.asarray(alpha, self.dtype), a)

    def fold_axby(self, alpha, dp: Array, beta, y: Array) -> Array:
        """(alpha ⊗ dp) ⊕ (beta ⊗ y) — the reference's doubleMultiplyAdd."""
        left = self.scale(alpha, dp)
        if _is_static(beta, self.zero):
            # beta = ⊕-identity ⊗-annihilator ⇒ (beta ⊗ y) = zero ⇒ ⊕ no-op.
            return left
        return self.add(left, self.mul(jnp.asarray(beta, self.dtype), y))

    # numpy mirrors (used by gold/) -------------------------------------
    def np_zero(self):
        return np.asarray(self.zero, dtype=np.dtype(self.dtype))


def _is_static(v, const) -> bool:
    """True iff v is a concrete python/numpy scalar equal to const."""
    if isinstance(v, (int, float, bool, np.generic)):
        return bool(v == const)
    return False


# ----------------------------------------------------------------------
# Registry — the six op families of the reference kernel corpus
# (example/{spmv,sssp,bfs,pr,scc}/kernel*.json) plus max-times for
# widest-path style problems.
# ----------------------------------------------------------------------

REGISTRY: Dict[str, Semiring] = {}


def register_semiring(sr: Semiring) -> Semiring:
    REGISTRY[sr.name] = sr
    return sr


def get_semiring(name: str) -> Semiring:
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown semiring {name!r}; known: {sorted(REGISTRY)}"
        ) from None


#: float arithmetic (+, ×) — spmv / pagerank / eigenvector
#: (reference: example/kernel.json `add`=+, `mult`=×)
PLUS_TIMES = register_semiring(
    Semiring(
        name="plus_times",
        add=jnp.add,
        mul=jnp.multiply,
        zero=0.0,
        one=1.0,
        dtype=jnp.float32,
        add_reduce=jnp.sum,
    )
)

#: tropical (min, +) — SSSP (reference: example/sssp/kernel.json,
#: README.md:34-39: zero=float max, add=min, mult=+)
MIN_PLUS = register_semiring(
    Semiring(
        name="min_plus",
        add=jnp.minimum,
        mul=jnp.add,
        zero=float(np.finfo(np.float32).max),
        one=0.0,
        dtype=jnp.float32,
        add_reduce=jnp.min,
    )
)

#: boolean (or, and) carried on int32 — BFS reachability
#: (reference: example/bfs/kernel*.json; app/bfs.cpp:42 runs "bool" on int)
OR_AND = register_semiring(
    Semiring(
        name="or_and",
        add=jnp.logical_or,
        mul=jnp.logical_and,
        zero=False,
        one=True,
        dtype=jnp.bool_,
        add_reduce=jnp.any,
        exact_convergence=True,
    )
)

#: (max, min) — bottleneck / widest path
MAX_MIN = register_semiring(
    Semiring(
        name="max_min",
        add=jnp.maximum,
        mul=jnp.minimum,
        zero=float(-np.finfo(np.float32).max),
        one=float(np.finfo(np.float32).max),
        dtype=jnp.float32,
        add_reduce=jnp.max,
    )
)

#: (max, ×) on nonneg floats — max-probability paths
MAX_TIMES = register_semiring(
    Semiring(
        name="max_times",
        add=jnp.maximum,
        mul=jnp.multiply,
        zero=0.0,
        one=1.0,
        dtype=jnp.float32,
        add_reduce=jnp.max,
    )
)


def _select_left(l, r):
    """⊗ that propagates the vector element through any present edge.

    Non-commutative `select` product: y[i] = max_j present(A[i,j]) ? x[j].
    The annihilator is encoded by the *structure* (absent edges padded with
    `zero`), and mul must map (x_j, pad=zero) → zero, so we gate on r.
    """
    return jnp.where(r == jnp.asarray(INT_MIN, r.dtype), r, l)


INT_MIN = int(np.iinfo(np.int32).min)
INT_MAX = int(np.iinfo(np.int32).max)


def _select_left_min(l, r):
    """⊗ for min-label propagation: pass x[j] through present edges; absent
    edges (padded with zero = INT_MAX) annihilate."""
    return jnp.where(r == jnp.asarray(INT_MAX, r.dtype), r, l)


#: (min, select-vector-elem) on int32 — connected-components min-label
#: propagation (undirected CC; the MIN dual of max_right)
MIN_RIGHT = register_semiring(
    Semiring(
        name="min_right",
        add=jnp.minimum,
        mul=_select_left_min,
        zero=INT_MAX,
        one=0,  # unused: `one` has no meaning for the select product
        dtype=jnp.int32,
        add_reduce=jnp.min,
        exact_convergence=True,
    )
)

#: (max, select-vector-elem) on int32 — SCC max-label propagation
#: (reference: app/scc.cpp — matrix values are vertex ids via scc_normalise,
#: src/sparse_matrix.cpp:433; x = iota of vertex labels; add = max).
MAX_RIGHT = register_semiring(
    Semiring(
        name="max_right",
        add=jnp.maximum,
        mul=_select_left,
        zero=INT_MIN,
        one=0,  # unused: `one` has no meaning for the select product
        dtype=jnp.int32,
        add_reduce=jnp.max,
        exact_convergence=True,
    )
)
