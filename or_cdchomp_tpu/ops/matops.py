"""Dense-matrix helper parity layer (libcd cd_mat, mat.h:30-51).

Almost all of cd_mat is subsumed by jax.numpy (set_zero → jnp.zeros,
memcpy → array assignment, add/sub/scale → arithmetic, trace →
jnp.trace, transpose → .T).  The functions below exist for the two
behaviors that are NOT one-liner jnp idioms, plus the formatting
helper, so callers porting reference code have named equivalents:

 - ``cross_accum``: the reference's cd_mat_cross ACCUMULATES into its
   result argument (mat.c:126-132) — an easy porting trap.
 - ``set_diag``: writes a value on the diagonal of a (possibly
   non-square) matrix, zeroing the rest (mat.c:39-46).
 - ``vec_to_str``: cd_mat_vec_fprintf-style "%8.4f" formatting
   (mat.c:134-158) for logs and golden files.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cross_accum(a, b, res):
    """res + a × b — cd_mat_cross accumulates (mat.c:126-132)."""
    return res + jnp.cross(a, b)


def set_diag(m, n, value, dtype=jnp.float32):
    """(m, n) matrix with ``value`` on the main diagonal, zeros
    elsewhere (mat.c:39-46)."""
    return value * jnp.eye(m, n, dtype=dtype)


def trace(A):
    """Matrix trace (mat.c:118-124); rectangular allowed."""
    return jnp.trace(A, axis1=-2, axis2=-1)


def vec_to_str(prefix, a, fmt="%8.4f"):
    """Reference-style vector print string: ``prefix[ v0 v1 ... ]``
    (mat.c:134-158)."""
    body = " ".join(fmt % v for v in np.asarray(a).ravel())
    return f"{prefix}[ {body} ]"
