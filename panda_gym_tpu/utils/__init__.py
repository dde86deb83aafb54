"""Vector math helpers mirroring the reference's panda_gym/utils.py."""
import jax.numpy as jnp


def distance(a, b):
    """L2 distance rounded to 6 decimals — the rounding is part of the
    reference's observable semantics (utils.py:4-16) and matters for bitwise
    reproduction of rewards/success flags."""
    d = jnp.linalg.norm(a - b, axis=-1)
    return jnp.round(d * 1e6) / 1e6


def angle_distance(a, b):
    """Quaternion geodesic distance 1 - <a,b>^2 (utils.py:19-31)."""
    return 1.0 - jnp.sum(a * b, axis=-1) ** 2


def unit_vector(a, b):
    """Unit vector from a to b with nan_to_num (utils.py:33-35)."""
    v = b - a
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), 0.0)
