"""EMA (exponential moving average) parameter helper.

The reference keeps shadow params and copies them in at inference
(reference: diffusion/models/ema.py). Functional here: an EMA state is
just a params pytree; ``update`` decays it toward live params, ``swap``
is trivial (return the shadow)."""

from __future__ import annotations

import jax


def ema_init(params):
    return jax.tree.map(lambda p: p, params)


def ema_update(shadow, params, rate: float = 0.999):
    """shadow = rate * shadow + (1 - rate) * params
    (reference: diffusion/models/ema.py update)."""
    return jax.tree.map(lambda s, p: rate * s + (1.0 - rate) * p, shadow, params)
