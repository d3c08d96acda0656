"""Gradient-safe power functions.

The reference's numeric guards (reference: src/utils/pytorch.py:31-36,
src/utils/superquadric.py:22-28) are load-bearing for optimization
stability: superquadric exponents hit |base| == 0 at mesh vertices that sit
exactly on coordinate planes, where naive autodiff of ``|x|**p`` w.r.t. the
exponent produces ``0 * log(0) = NaN``. Torch happens to define that limit
as 0; JAX does not, so we install explicit custom JVPs.

All functions are elementwise, jit/vmap-friendly, f32-exact.
"""

import jax
import jax.numpy as jnp

SQRT_EPS = 1e-6
_LOG_TINY = 1e-30


@jax.custom_jvp
def signed_pow(t, p):
    """sign(t) * |t|**p with NaN-free gradients at t == 0.

    Reference: src/utils/pytorch.py:31-32. Gradients:
      d/dt = p * |t|**(p-1)            (inf at 0 for p<1 -> clamped via |t| eps)
      d/dp = sign(t) * |t|**p * log|t| (0*log0 -> defined as 0, like torch)
    """
    return jnp.sign(t) * jnp.abs(t) ** p


@signed_pow.defjvp
def _signed_pow_jvp(primals, tangents):
    t, p = primals
    dt, dp = tangents
    a = jnp.abs(t)
    out = jnp.sign(t) * a**p
    # d/dt: p * a**(p-1); guard a==0 (reference torch gives inf there for p<1,
    # but those gradients multiply structurally-zero cotangents in our use sites;
    # we clamp the base so the product stays finite).
    da = p * jnp.maximum(a, SQRT_EPS) ** (p - 1.0)
    # d/dp: out * log(a); at a==0 out==0 so define as 0 (match torch behavior).
    dlog = out * jnp.log(jnp.maximum(a, _LOG_TINY))
    return out, da * dt + dlog * dp


@jax.custom_jvp
def safe_pow(t, p, eps=SQRT_EPS):
    """clamp(t, eps)**p — matches torch ``t.clamp(eps).pow(p)``.

    Reference: src/utils/pytorch.py:35-36. Gradient w.r.t. t is 0 below eps
    (clamp kills it), p * t**(p-1) above.
    """
    return jnp.maximum(t, eps) ** p


@safe_pow.defjvp
def _safe_pow_jvp(primals, tangents):
    t, p, eps = primals
    dt, dp, _ = tangents
    b = jnp.maximum(t, eps)
    out = b**p
    da = jnp.where(t > eps, p * b ** (p - 1.0), 0.0)
    dlog = out * jnp.log(jnp.maximum(b, _LOG_TINY))
    return out, da * dt + dlog * dp


def safe_sqrt(t, eps=SQRT_EPS):
    """sqrt with clamped input, zero gradient at/below 0 (used by l2 TV norm,
    reference: src/model/loss.py:45)."""
    return safe_pow(t, 0.5, eps)
