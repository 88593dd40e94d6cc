"""Streaming (chunked, stateful) inference for causal models.

Serving-oriented API the reference does not have: a causal model
processes an unbounded audio stream chunk by chunk through ONE jitted
fixed-shape step — constant memory, constant latency, no recompiles —
and produces the same samples the offline forward would (up to float
reassociation in the cumulative-norm statistics; pinned by
``tests/test_streaming.py``).

Two models are covered: causal Conv-TasNet (``StreamingEnhancer``) and
DCCRN (``StreamingDCCRN`` — the canonical real-time enhancement
architecture; see its class docstring for the overlap-recompute
design). Conv-TasNet streamed state (offline twin:
``brever_tpu/models/convtasnet.py``, reference architecture
brever/models/convtasnet/convtasnet.py:20-268):

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


class StreamingDCCRN:
    """Stateful chunked twin of ``DCCRN._enhance`` (eval mode).

    Design: DCCRN's time geometry (kernel 2, stride 1, VALID) gives
    each of the L encoder layers one frame of lookahead, so the
    streaming pipeline keeps a raw-input tail long enough to RECOMPUTE
    the last ``L`` STFT frames every chunk: the encoder pyramid then
    consumes exactly those overlap frames ((F + L) spec frames -> F
    bottleneck frames) with no per-layer state and bit-identical
    numerics (the offline conv modules are applied as-is — time-VALID
    convs are local). Carried state: the raw tail, the complex-LSTM
    (h, c) per layer, one input frame per decoder transposed conv, and
    the windowed-overlap-add numerator/denominator tails of the iSTFT.

    The zero-initialized tail makes the streamed output exactly the
    offline forward on the input left-padded with
    ``L*hop + frame_length - hop`` zeros, delayed by
    ``frame_length - hop`` output samples (the OLA completion lag);
    ``tests/test_streaming.py`` pins the alignment.
    """

    def __init__(self, model, variables, chunk_samples):
        from .models.dccrn import DCCRN

        if not isinstance(model, DCCRN):
            raise TypeError('StreamingDCCRN needs a DCCRN model')
        if model.module.complex_batchnorm:
            raise NotImplementedError(
                'streaming supports the plain-batchnorm DCCRN variant '
                '(use_complex_batchnorm=False)')
        self.model = model
        self.hop = model.stft.hop_length
        self.frame = model.stft.frame_length
        if chunk_samples % self.hop:
            raise ValueError(
                f'chunk_samples must be a multiple of the STFT hop '
                f'{self.hop}, got {chunk_samples}')
        self.n_frames = chunk_samples // self.hop
        self.L = len(model.channels)
        if self.n_frames < 1:
            raise ValueError('chunk too short')
        self.params = variables['params']
        self.stats = variables.get('batch_stats', {})
        self.chunk = chunk_samples
        # raw tail: L overlap frames + framing remainder
        self.tail_len = self.L * self.hop + self.frame - self.hop
        self._step = jax.jit(self._step_impl)

    def init_state(self, batch_size):
        model, b = self.model, batch_size
        mod = model.module
        state = {
            'in_tail': jnp.zeros((b, self.tail_len), jnp.float32),
            'lstm': [
                {
                    net: (jnp.zeros((2 * b, mod.lstm_channels)),
                          jnp.zeros((2 * b, mod.lstm_channels)))
                    for net in ('real', 'imag')
                }
                for _ in range(mod.lstm_layers)
            ],
            'dec_ctx': [],
            'ola_num': jnp.zeros((b, self.frame - self.hop)),
            'ola_den': jnp.zeros((self.frame - self.hop,)),
        }
        # decoder layer j input (after skip concat): freq size of
        # encoder level L-1-j, channels 4x that level's channel count
        # (real|skip_real|imag|skip_imag)
        n_freqs = mod.n_freqs
        freqs = []
        f = n_freqs
        kf, _ = mod.kernel_size
        sf, _ = mod.stride
        pf, _ = mod.padding
        for _ in range(self.L):
            f = (f + 2 * pf - kf) // sf + 1
            freqs.append(f)
        for j in range(self.L):
            lvl = self.L - 1 - j
            ch = mod.channels[lvl]
            state['dec_ctx'].append(
                jnp.zeros((b, freqs[lvl], 1, 4 * ch)))
        return state

    def step(self, state, chunk):
        return self._step(state, jnp.asarray(chunk, jnp.float32))

    # -- helpers mirroring the module's eval-mode layers ---------------

    def _bn(self, x, name):
        p = self.params[name]
        s = self.stats[name]
        inv = jax.lax.rsqrt(s['var'] + 1e-5)
        return (x - s['mean']) * inv * p['scale'] + p['bias']

    def _prelu_p(self, x, name):
        alpha = self.params[name]['alpha']
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)

    def _step_impl(self, state, chunk):
        from .models.dccrn import _ComplexConv, _split

        model = self.model
        mod = model.module
        stft = model.stft
        p = self.params
        b = chunk.shape[0]
        kf, kt = mod.kernel_size
        sf, st = mod.stride
        pf, _ = mod.padding
        opf, _ = mod.output_padding
        new_state = {'lstm': [], 'dec_ctx': []}

        # --- STFT over [tail | chunk]: F + L frames ---
        xin = jnp.concatenate([state['in_tail'], chunk], axis=1)
        n_sp = self.n_frames + self.L
        fidx = (np.arange(n_sp)[:, None] * self.hop
                + np.arange(self.frame)[None, :])
        frames = xin[:, fidx] * stft.window
        spec = jnp.fft.rfft(frames, n=stft.n_fft, axis=-1)
        if stft.normalized:
            spec = spec / stft._win_norm
        spec = jnp.swapaxes(spec, -1, -2)[:, 1:, :]   # drop DC
        spec_ri = jnp.stack([spec.real, spec.imag], axis=-1)
        new_state['in_tail'] = xin[:, self.n_frames * self.hop:]

        # --- encoder pyramid over the overlap window ---
        h = spec_ri
        skips = []
        for i, ch in enumerate(mod.channels):
            h = _ComplexConv(
                features=ch, kernel_size=(kf, kt), strides=(sf, st),
                padding=((pf, pf), (0, 0)),
            ).apply({'params': p[f'enc_conv_{i}']}, h)
            h = self._bn(h, f'enc_norm_{i}')
            h = self._prelu_p(h, f'enc_prelu_{i}')
            skips.append(h)

        # --- complex LSTM bottleneck (carried state) ---
        batch, freqs, frames_n, ch2 = h.shape
        ch = ch2 // 2
        hr, hi = _split(h)

        def to_seq(v):
            return v.transpose(0, 2, 3, 1).reshape(
                batch, frames_n, ch * freqs)

        seq_r, seq_i = to_seq(hr), to_seq(hi)
        for li in range(mod.lstm_layers):
            stacked = jnp.concatenate([seq_r, seq_i], axis=0)
            lp = p[f'lstm_{li}']
            outs = {}
            lstate = {}
            for net in ('real', 'imag'):
                w = lp[net]
                gates_x = stacked @ w['w_ih'] + (w['b_ih'] + w['b_hh'])
                h0, c0 = state['lstm'][li][net]

                def cell(carry, gx, w_hh=w['w_hh']):
                    h_prev, c_prev = carry
                    gates = gx + jnp.matmul(h_prev, w_hh)
                    i_, f_, g_, o_ = jnp.split(gates, 4, axis=-1)
                    c = (jax.nn.sigmoid(f_) * c_prev
                         + jax.nn.sigmoid(i_) * jnp.tanh(g_))
                    hh = jax.nn.sigmoid(o_) * jnp.tanh(c)
                    return (hh, c), hh

                (hT, cT), hseq = jax.lax.scan(
                    cell, (h0, c0), jnp.swapaxes(gates_x, 0, 1))
                outs[net] = jnp.swapaxes(hseq, 0, 1)
                lstate[net] = (hT, cT)
            new_state['lstm'].append(lstate)
            rr, ri = outs['real'][:batch], outs['real'][batch:]
            ir, ii = outs['imag'][:batch], outs['imag'][batch:]
            seq_r, seq_i = rr - ii, ri + ir
        seq_r = seq_r @ p['lstm_proj_real']['kernel'] \
            + p['lstm_proj_real']['bias']
        seq_i = seq_i @ p['lstm_proj_imag']['kernel'] \
            + p['lstm_proj_imag']['bias']

        def from_seq(v):
            return v.reshape(batch, frames_n, ch, freqs) \
                .transpose(0, 3, 1, 2)

        h = jnp.concatenate([from_seq(seq_r), from_seq(seq_i)], axis=-1)

        # --- decoder (1-frame carry per transposed conv) ---
        F = self.n_frames
        for j, i in enumerate(reversed(range(self.L))):
            skip = skips[i][:, :, :F]
            hr, hi = _split(h[:, :, :F])
            sr, si = _split(skip)
            hcat = jnp.concatenate([hr, sr, hi, si], axis=-1)
            hin = jnp.concatenate([state['dec_ctx'][j], hcat], axis=2)
            new_state['dec_ctx'].append(hin[:, :, -1:])
            out_ch = 1 if i == 0 else mod.channels[i - 1]
            # time padding (0, 0) on the [ctx | F] stream yields the F
            # outputs aligned with the offline layer's (1, 1)-padded
            # output at these stream positions
            h = _ComplexConv(
                features=out_ch, kernel_size=(kf, kt), strides=(sf, st),
                padding=((kf - 1 - pf, kf - 1 - pf + opf), (0, 0)),
                transpose=True,
            ).apply({'params': p[f'dec_conv_{j}']}, hin)
            if i != 0:
                h = self._bn(h, f'dec_norm_{j}')
                h = self._prelu_p(h, f'dec_prelu_{j}')

        mask = h                                     # (B, F_bins-1, F, 2)

        # --- mask + iSTFT with carried OLA tails ---
        out_spec = model._apply_mask(spec_ri[:, :, :F], mask)
        out = jax.lax.complex(out_spec[..., 0], out_spec[..., 1])
        out = jnp.pad(out, ((0, 0), (1, 0), (0, 0)))  # DC bin
        x = out / stft.scale_factor
        if stft.normalized:
            x = x * stft._win_norm
        x = jnp.swapaxes(x, -1, -2)
        fr = jnp.fft.irfft(x, n=stft.n_fft, axis=-1) * stft.window
        total = F * self.hop + (self.frame - self.hop)
        oidx = (np.arange(F)[:, None] * self.hop
                + np.arange(self.frame)[None, :])
        num = jnp.zeros((b, total)).at[:, oidx].add(fr)
        num = num.at[:, :self.frame - self.hop].add(state['ola_num'])
        win2 = jnp.broadcast_to(stft.window ** 2, (F, self.frame))
        den = jnp.zeros((total,)).at[oidx].add(win2)
        den = den.at[:self.frame - self.hop].add(state['ola_den'])
        new_state['ola_num'] = num[:, F * self.hop:]
        new_state['ola_den'] = den[F * self.hop:]
        emit_den = den[:F * self.hop]
        emit = num[:, :F * self.hop] / jnp.where(
            emit_den > 1e-11, emit_den, 1.0)
        return new_state, emit
