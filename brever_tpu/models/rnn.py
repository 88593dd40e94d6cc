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


class LSTM(nn.Module):
    """Unidirectional single-layer LSTM over ``(batch, time, features)``.

    Zero initial state; returns the full hidden-state sequence.
    """

    hidden_size: int
    reverse: bool = False

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
            gates = gx + h_prev @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c_prev + i * g
            new_h = o * jnp.tanh(c)
            return (new_h, c), new_h

        batch = x.shape[0]
        init = (
            jnp.zeros((batch, h), x.dtype),
            jnp.zeros((batch, h), x.dtype),
        )
        _, hidden = jax.lax.scan(step, init, gates_x,
                                 reverse=self.reverse)
        return jnp.swapaxes(hidden, 0, 1)  # (B, T, h)


class BLSTM(nn.Module):
    """Bidirectional LSTM: concatenated forward/backward hidden states
    (torch ``nn.LSTM(bidirectional=True)`` layout)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        fwd = LSTM(self.hidden_size, name='forward')(x)
        bwd = LSTM(self.hidden_size, reverse=True, name='backward')(x)
        return jnp.concatenate([fwd, bwd], axis=-1)
