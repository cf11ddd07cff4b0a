"""Correlation-shape probe: the multi-lag correlation function around the
prompt, accumulated sign-coherently over blocks.

The reference carries this as commented-out debug scaffolding
(track-gps-l1cp.py:47-55: 320 lags at 0.0125-chip spacing, sign-corrected
by the prompt's I arm); here it is a supported diagnostic.  On device the
lag sweep is one batched correlate — lags are just one more vmap axis.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_lags", "subcarrier", "code_length"))
def correlation_shape(x, code_tab, code_p, cf, lag_spacing, n_lags: int,
                      code_length: int, subcarrier: str = "none"):
    """Correlate one carrier-wiped block against `n_lags` code lags
    centered on code_p: lag_k = lag_spacing * (k - n_lags//2).

    x: split-complex [n]; code_tab int8 [L].
    Returns split [n_lags] correlation function.
    """
    n = x[0].shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)

    def one(k):
        lag = lag_spacing * (k - n_lags // 2).astype(jnp.float32)
        v = code_p + lag
        vint = jnp.floor(v)
        fr = v - vint
        cp_i = fr + i.astype(jnp.float32) * cf
        cidx = jnp.mod(vint.astype(jnp.int32)
                       + jnp.floor(cp_i).astype(jnp.int32), code_length)
        chips = jnp.take(code_tab, cidx).astype(jnp.float32)
        if subcarrier != "none":
            bp = jnp.mod(jnp.floor(2.0 * cp_i).astype(jnp.int32), 2)
            boc = (1 - 2 * bp).astype(jnp.float32)
            if subcarrier == "boc11":
                chips = chips * boc
            elif subcarrier == "cboc":
                bp6 = jnp.mod(jnp.floor(12.0 * cp_i).astype(jnp.int32), 2)
                chips = chips * (0.953463 * boc
                                 + 0.301511 * (1 - 2 * bp6).astype(jnp.float32))
            elif subcarrier == "tmboc":
                bp6 = jnp.mod(jnp.floor(12.0 * cp_i).astype(jnp.int32), 2)
                boc6 = (1 - 2 * bp6).astype(jnp.float32)
                u = jnp.mod(cidx, 33)
                slot = ((u == 0) | (u == 4) | (u == 6) | (u == 29)
                        ).astype(jnp.float32)
                chips = chips * (slot * boc6 + (1.0 - slot) * boc)
        return jnp.sum(x[0] * chips), jnp.sum(x[1] * chips)

    re, im = jax.vmap(one)(jnp.arange(n_lags))
    return re, im


class ShapeAccumulator:
    """Sign-coherent multi-block accumulation (the reference's
    `s.shape[dci] +=/-= pp` with the data-bit wipe)."""

    def __init__(self, n_lags: int = 320, lag_spacing: float = 0.0125):
        self.n_lags = int(n_lags)
        self.lag_spacing = float(lag_spacing)
        self.re = np.zeros(self.n_lags)
        self.im = np.zeros(self.n_lags)
        self.blocks = 0

    def update(self, x_wiped, code_tab, code_p: float, cf: float,
               prompt_re: float, code_length: int, subcarrier="none"):
        s = 1.0 if prompt_re > 0 else -1.0
        re, im = correlation_shape(
            x_wiped, code_tab, jnp.float32(code_p), jnp.float32(cf),
            jnp.float32(self.lag_spacing), self.n_lags,
            code_length, subcarrier)
        self.re += s * np.asarray(re)
        self.im += s * np.asarray(im)
        self.blocks += 1

    def lags(self) -> np.ndarray:
        return self.lag_spacing * (np.arange(self.n_lags) - self.n_lags // 2)
