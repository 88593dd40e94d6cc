"""Streaming (chunked, stateful) inference for causal models.

Serving-oriented API the reference does not have: a causal model
processes an unbounded audio stream chunk by chunk through ONE jitted
fixed-shape step — constant memory, constant latency, no recompiles —
and produces the same samples the offline forward would (up to float
reassociation in the cumulative-norm statistics; pinned by
``tests/test_streaming.py``).

The first implementation covers causal Conv-TasNet
(``ConvTasNet(causal=True)``; offline twin:
``brever_tpu/models/convtasnet.py``, reference architecture
brever/models/convtasnet/convtasnet.py:20-268). Streamed state:

* encoder: the ``filter_length - stride`` input-sample tail;
* TCN input norm and each block's two cumulative layer norms: running
  ``(frames_seen, sum, sum_of_squares)`` — the cumulative statistics
  are exactly the reference's cLN contract, continued across chunks;
* each block's causal dilated depthwise conv: the last ``2 * dilation``
  frames of its input;
* decoder (transposed conv): the ``filter_length - stride`` sample
  overlap-add tail.

Usage::

    enhancer = StreamingEnhancer(model, variables, chunk_samples=4096)
    state = enhancer.init_state(batch_size=1)
    for chunk in chunks:                  # (B, chunk_samples) each
        state, out = enhancer.step(state, chunk)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8  # CausalLayerNormModule default


# ---------------------------------------------------------------------------
# streaming cumulative layer norm

def _cln_init(batch, channels, dtype=jnp.float32):
    return {
        'frames': jnp.zeros((batch,), jnp.int32),
        'sum': jnp.zeros((batch,), dtype),
        'sumsq': jnp.zeros((batch,), dtype),
    }


def _cln_step(state, x, scale, bias, eps=_EPS):
    """x: (B, T, C); continues the cumulative statistics in ``state``."""
    b, t, c = x.shape
    s = state['sum'][:, None] + jnp.cumsum(x.sum(axis=2), axis=1)
    ss = state['sumsq'][:, None] + jnp.cumsum((x ** 2).sum(axis=2), axis=1)
    frames = state['frames'][:, None] + jnp.arange(1, t + 1)[None, :]
    count = (frames * c).astype(x.dtype)
    mean = s / count
    var = ss / count - mean ** 2
    normed = (x - mean[..., None]) / jnp.sqrt(var[..., None] + eps)
    out = normed * scale + bias
    new_state = {
        'frames': state['frames'] + t,
        'sum': s[:, -1],
        'sumsq': ss[:, -1],
    }
    return new_state, out


def _prelu(z, alpha):
    return jnp.where(z >= 0, z, alpha.astype(z.dtype) * z)


class StreamingEnhancer:
    """Stateful chunked twin of ``ConvTasNet(causal=True)._enhance``.

    ``chunk_samples`` must be a multiple of the encoder stride
    (``filter_length // 2``). ``step`` is jitted once; every call runs
    the same executable.
    """

    def __init__(self, model, variables, chunk_samples):
        from .models.convtasnet import ConvTasNet

        if not isinstance(model, ConvTasNet):
            raise TypeError(
                'streaming is implemented for ConvTasNet; got '
                f'{type(model).__name__}')
        mod = model.module
        if not mod.causal:
            raise ValueError('streaming requires a causal model '
                             '(ConvTasNet(causal=True))')
        self.stride = mod.filter_length // 2
        if chunk_samples % self.stride:
            raise ValueError(
                f'chunk_samples must be a multiple of the encoder '
                f'stride {self.stride}, got {chunk_samples}')
        self.model = model
        self.module = mod
        self.params = variables['params']
        self.chunk = chunk_samples
        self._step = jax.jit(self._step_impl)

    # -- state ----------------------------------------------------------

    def _block_specs(self):
        """(param_subtree_getter, repeat_index_or_None, dilation, last)
        for every block in forward order."""
        mod = self.module
        specs = []
        tcn = self.params['tcn']
        for r in range(mod.repeats - 1):
            for i in range(mod.layers):
                specs.append((tcn['sweeps'][f'block_{i}'], r, 2 ** i,
                              False))
        for i in range(mod.layers):
            last = i == mod.layers - 1
            specs.append((tcn[f'block_last_{i}'], None, 2 ** i, last))
        return specs

    def init_state(self, batch_size):
        mod = self.module
        b = batch_size
        flt, s = mod.filter_length, self.stride
        state = {
            'in_tail': jnp.zeros((b, flt - s), jnp.float32),
            'tcn_norm': _cln_init(b, mod.filters),
            'ola_tail': jnp.zeros((b * mod.sources, flt - s),
                                  jnp.float32),
            'blocks': [],
        }
        for _, _, d, _ in self._block_specs():
            state['blocks'].append({
                'norm1': _cln_init(b, mod.hidden_channels),
                'ctx': jnp.zeros((b, 2 * d, mod.hidden_channels),
                                 jnp.float32),
                'norm2': _cln_init(b, mod.hidden_channels),
            })
        return state

    # -- step -----------------------------------------------------------

    def step(self, state, chunk):
        """chunk: (B, chunk_samples) mono waveform -> (state, out)
        where out is (B, chunk_samples) (or (B, sources, chunk) for
        multi-source models)."""
        return self._step(state, jnp.asarray(chunk, jnp.float32))

    def _block_params(self, p, r):
        """Materialize one block's params (indexing the scan-stacked
        repeat axis when ``r`` is not None)."""
        if r is None:
            return p
        return jax.tree.map(lambda x: x[r], p)

    def _step_impl(self, state, chunk):
        mod = self.module
        p = self.params
        flt, s = mod.filter_length, self.stride
        b = chunk.shape[0]
        new_state = {'blocks': []}

        # encoder: frames over [tail | chunk], stride s, VALID
        xin = jnp.concatenate([state['in_tail'], chunk], axis=1)
        n_frames = chunk.shape[1] // s
        fidx = (np.arange(n_frames)[:, None] * s
                + np.arange(flt)[None, :])
        frames = xin[:, fidx]                       # (B, T, flt)
        w_enc = p['encoder']['kernel'][:, 0, :]     # (flt, filters)
        encoded = jnp.einsum('btk,kf->btf', frames, w_enc)
        new_state['in_tail'] = xin[:, n_frames * s:]

        # TCN
        tcn = p['tcn']
        norm = tcn['CausalLayerNormModule_0']
        new_state['tcn_norm'], x = _cln_step(
            state['tcn_norm'], encoded, norm['scale'], norm['bias'])
        x = x @ tcn['bottleneck']['kernel'] + tcn['bottleneck']['bias']
        skip_sum = jnp.zeros((b, n_frames, mod.skip_channels), x.dtype)

        for spec, bstate in zip(self._block_specs(), state['blocks']):
            ptree, r, d, last = spec
            bp = self._block_params(ptree, r)
            nstate = {}
            h = _prelu(x @ bp['conv_in']['kernel']
                       + bp['conv_in']['bias'],
                       bp['prelu_1']['alpha'][0])
            n1 = bp['CausalLayerNormModule_0']
            nstate['norm1'], y1 = _cln_step(
                bstate['norm1'], h, n1['scale'], n1['bias'])
            # causal dilated depthwise over [ctx | y1]
            cat = jnp.concatenate([bstate['ctx'], y1], axis=1)
            w_dw = bp['depthwise']['kernel'].reshape(
                mod.kernel_size, mod.hidden_channels)
            z2 = cat[:, :n_frames] * w_dw[0]
            for k in range(1, mod.kernel_size):
                z2 = z2 + cat[:, k * d:k * d + n_frames] * w_dw[k]
            z2 = z2 + bp['depthwise']['bias']
            nstate['ctx'] = cat[:, n_frames:]
            h2 = _prelu(z2, bp['prelu_2']['alpha'][0])
            n2 = bp['CausalLayerNormModule_1']
            nstate['norm2'], y2 = _cln_step(
                bstate['norm2'], h2, n2['scale'], n2['bias'])
            skip_sum = skip_sum + (
                y2 @ bp['skip']['kernel'] + bp['skip']['bias'])
            if not last:
                x = x + y2 @ bp['res']['kernel'] + bp['res']['bias']
            new_state['blocks'].append(nstate)

        out = _prelu(skip_sum, tcn['prelu_out']['alpha'][0])
        out = out @ tcn['mask']['kernel'] + tcn['mask']['bias']
        mask = jax.nn.sigmoid(out).reshape(
            b, n_frames, mod.sources, mod.filters)

        # mask + decoder (transposed conv as frame overlap-add)
        masked = encoded[:, :, None, :] * mask      # (B, T, S, F)
        masked = masked.transpose(0, 2, 1, 3).reshape(
            b * mod.sources, n_frames, mod.filters)
        # flax ConvTranspose applies the FLIPPED kernel (convolution,
        # not correlation): frame t contributes kernel[::-1] at t*s
        w_dec = p['decoder']['kernel'][::-1, :, 0]  # (flt, filters)
        contrib = jnp.einsum('btf,kf->btk', masked, w_dec)
        total = n_frames * s + (flt - s)
        buf = jnp.zeros((b * mod.sources, total), jnp.float32)
        oidx = (np.arange(n_frames)[:, None] * s
                + np.arange(flt)[None, :])
        buf = buf.at[:, oidx].add(contrib)
        buf = buf.at[:, :flt - s].add(state['ola_tail'])
        out_flat = buf[:, :n_frames * s]
        new_state['ola_tail'] = buf[:, n_frames * s:]

        out = out_flat.reshape(b, mod.sources, n_frames * s)
        if self.model.output_sources == 1:
            out = out[:, 0]
        return new_state, out
