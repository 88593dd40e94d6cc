"""Recurrent layers as scans (TPU-friendly LSTM building blocks).

The sequential nature of LSTMs is the main TPU-unfriendly ingredient of
this model zoo (DCCRN complex LSTMs, TF-GridNet BLSTMs). The layout
used here amortizes it:

* the input projection ``x @ W_ih`` for *all* timesteps is one large
  MXU matmul outside the scan,
* the scan body only carries the ``h @ W_hh`` recurrent matmul and the
  elementwise gate math,
* callers fold extra axes (frequency bands, batch) into the batch axis
  so the recurrent matmul stays wide.

Parameter layout matches torch ``nn.LSTM`` (separate ``b_ih``/``b_hh``
biases, i/f/g/o gate order) so parameter-count parity with the
reference holds exactly.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_cell(gates, h_prev, c_prev, w_hh):
    """One LSTM step given precomputed input gates (i/f/g/o order)."""
    gates = gates + h_prev @ w_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return new_h, c


class LSTM(nn.Module):
    """Unidirectional single-layer LSTM over ``(batch, time, features)``.

    Zero initial state; returns the full hidden-state sequence.
    ``unroll`` trades compile time for fewer sequential scan steps
    (per-step overhead is the latency bound on TPU).
    """

    hidden_size: int
    reverse: bool = False
    unroll: int = 8

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        h = self.hidden_size
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      -scale, scale)

        w_ih = self.param('w_ih', uniform_init, (in_features, 4 * h))
        w_hh = self.param('w_hh', uniform_init, (h, 4 * h))
        b_ih = self.param('b_ih', uniform_init, (4 * h,))
        b_hh = self.param('b_hh', uniform_init, (4 * h,))

        # one big MXU matmul for the input path, outside the scan
        gates_x = x @ w_ih + (b_ih + b_hh)  # (B, T, 4h)
        gates_x = jnp.swapaxes(gates_x, 0, 1)  # (T, B, 4h)

        def step(carry, gx):
            h_prev, c_prev = carry
            new_h, c = _lstm_cell(gx, h_prev, c_prev, w_hh)
            return (new_h, c), new_h

        batch = x.shape[0]
        init = (
            jnp.zeros((batch, h), x.dtype),
            jnp.zeros((batch, h), x.dtype),
        )
        _, hidden = jax.lax.scan(step, init, gates_x,
                                 reverse=self.reverse,
                                 unroll=self.unroll)
        return jnp.swapaxes(hidden, 0, 1)  # (B, T, h)


class BLSTM(nn.Module):
    """Bidirectional LSTM: concatenated forward/backward hidden states
    (torch ``nn.LSTM(bidirectional=True)`` layout).

    Both directions run in ONE scan: the backward direction sees the
    time-reversed sequence, weights are stacked on a leading direction
    axis, and the recurrent matmul is a batched einsum. This halves the
    sequential step count versus two scans — the scans, not the
    matmuls, bound LSTM latency on TPU.
    """

    hidden_size: int
    unroll: int = 8

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        h = self.hidden_size
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      -scale, scale)

        # direction-stacked parameters (0 = forward, 1 = backward)
        w_ih = self.param('w_ih', uniform_init, (2, in_features, 4 * h))
        w_hh = self.param('w_hh', uniform_init, (2, h, 4 * h))
        b_ih = self.param('b_ih', uniform_init, (2, 4 * h))
        b_hh = self.param('b_hh', uniform_init, (2, 4 * h))

        batch, time, _ = x.shape
        both = jnp.stack([x, jnp.flip(x, axis=1)], axis=0)  # (2, B, T, F)
        gates_x = jnp.einsum('dbtf,dfk->dbtk', both, w_ih) \
            + (b_ih + b_hh)[:, None, None, :]
        gates_x = jnp.moveaxis(gates_x, 2, 0)  # (T, 2, B, 4h)

        def step(carry, gx):
            h_prev, c_prev = carry  # (2, B, h)
            gates = gx + jnp.einsum('dbh,dhk->dbk', h_prev, w_hh)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c_prev \
                + jax.nn.sigmoid(i) * jnp.tanh(g)
            new_h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (new_h, c), new_h

        init = (
            jnp.zeros((2, batch, h), x.dtype),
            jnp.zeros((2, batch, h), x.dtype),
        )
        _, hidden = jax.lax.scan(step, init, gates_x, unroll=self.unroll)
        fwd = jnp.moveaxis(hidden[:, 0], 0, 1)            # (B, T, h)
        bwd = jnp.flip(jnp.moveaxis(hidden[:, 1], 0, 1), axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)
