"""Causal (cumulative-over-time) normalization ops.

Running statistics are cumulative sums along the time axis, so frame ``t``
is normalized using only frames ``<= t`` — the causality contract the
reference pins with a NaN-probe test (reference
brever/modules/normalization.py:5-72, tests/test_modules.py:185-218).

Pure functions over arrays; flax modules in the model zoo wrap these with
learned gain/bias parameters.
"""

import jax.numpy as jnp


def causal_group_norm(x, num_groups, gain=None, bias=None, time_dim=-1,
                      eps=1e-10):
    """Cumulative group norm.

    Parameters
    ----------
    x : array
        Shape ``(batch, channels, ...)``.
    num_groups : int
        Number of channel groups; ``channels`` must be divisible by it.
    gain, bias : array or None
        Per-channel affine parameters of shape ``(channels,)``.
    time_dim : int
        The time axis (must not be the batch or channel axis).
    """
    time_dim = list(range(x.ndim))[time_dim]
    if time_dim in (0, 1):
        raise ValueError('time_dim cannot be the batch (0) or channel (1) '
                         'dimension')
    n_channels = x.shape[1]
    if n_channels % num_groups != 0:
        raise ValueError('num_channels must be divisible by num_groups')

    orig_shape = x.shape
    grouped = x.reshape(
        x.shape[0], num_groups, n_channels // num_groups, *x.shape[2:]
    )
    t_axis = time_dim + 1  # channel axis was split in two

    reduce_axes = tuple(
        i for i in range(grouped.ndim) if i not in (0, 1, t_axis)
    )
    # elements per time step within a group
    count_per_step = 1
    for i in reduce_axes:
        count_per_step *= grouped.shape[i]
    steps = jnp.arange(1, grouped.shape[t_axis] + 1, dtype=x.dtype)
    shape = [1] * grouped.ndim
    shape[t_axis] = grouped.shape[t_axis]
    count = (steps * count_per_step).reshape(shape)

    mean = jnp.cumsum(
        grouped.sum(axis=reduce_axes, keepdims=True), axis=t_axis
    ) / count
    var = jnp.cumsum(
        (grouped**2).sum(axis=reduce_axes, keepdims=True), axis=t_axis
    ) / count - mean**2
    normed = (grouped - mean) / jnp.sqrt(var + eps)
    normed = normed.reshape(orig_shape)

    if gain is not None:
        param_shape = [n_channels if i == 1 else 1 for i in range(x.ndim)]
        normed = normed * gain.reshape(param_shape)
        if bias is not None:
            normed = normed + bias.reshape(param_shape)
    return normed


def causal_layer_norm(x, gain=None, bias=None, time_dim=-1, eps=1e-10):
    """Cumulative layer norm (single group over all channels)."""
    return causal_group_norm(x, 1, gain, bias, time_dim, eps)


def causal_instance_norm(x, gain=None, bias=None, time_dim=-1, eps=1e-10):
    """Cumulative instance norm (one group per channel)."""
    return causal_group_norm(x, x.shape[1], gain, bias, time_dim, eps)
