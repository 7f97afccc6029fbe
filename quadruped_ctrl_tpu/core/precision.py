"""Matmul-precision control for the small-matrix control path.

On TPU, the ambient default matmul precision is bf16 (one MXU pass). That is
the right trade for the MPC solver's large batched kernels — which choose
their precision explicitly op-by-op (mpc/formation.py, solver/admm.py,
ops/ns_inverse.py) — but wrong for the per-robot control path: estimator,
kinematics, and SRB-simulation matrices are 3x3..28x28, where bf16 rounding
is semantically significant (the KF's innovation covariance goes indefinite
and its Cholesky NaNs on the very first tick) and HIGHEST costs nothing
(the MXU pads tiny matmuls to a tile either way).

`exact_matmuls` pins jax.default_matmul_precision("highest") while the
decorated function traces, so every matmul/einsum under it that does not
pass an explicit `precision=` runs exact-f32 on TPU — matching the CPU
backend the tests validate against (tests/conftest.py).
"""

from __future__ import annotations

import functools

import jax


def exact_matmuls(fn):
    """Trace `fn` (and everything it calls) under HIGHEST matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
