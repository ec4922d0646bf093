"""Fixed-step Euler ODE integration (LightGODE's post-training graph ODE).

The reference integrates ``dx/dt = Â·x + e₀`` with torchdiffeq's euler
solver over ``t = [0, T]`` (models/LightGODE.py:115-118). With no
step-size option, torchdiffeq's fixed-grid solver uses the output
times themselves as the grid — i.e. a SINGLE euler step of size T:
``x(T) = e₀ + T·(Â·e₀ + e₀)``. `odeint_euler` reproduces exactly that
grid semantics for an arbitrary time list.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def odeint_euler(f: Callable, y0: jnp.ndarray, ts) -> jnp.ndarray:
    """Integrate y' = f(t, y) with euler steps on the grid ``ts``.

    Returns y at the final time. ts is a static python sequence
    (torchdiffeq grid semantics: one step per consecutive pair).
    """
    y = y0
    for t0, t1 in zip(ts[:-1], ts[1:]):
        y = y + (t1 - t0) * f(t0, y)
    return y
