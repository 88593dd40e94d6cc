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

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

#: scan unroll factor: fewer sequential XLA loop iterations (each
#: costs fixed overhead on TPU) at the price of a bigger compiled
#: body. Env-overridable for benchmarking experiments.
DEFAULT_UNROLL = int(os.environ.get('BREVER_LSTM_UNROLL', '8'))

#: scans at most this long are fully unrolled: the whole recurrence
#: becomes straight-line code (no while-loop state machine), which XLA
#: schedules dramatically better, and the compile-time cost is bounded
#: by the scan length instead of the unroll knob. TF-GridNet's
#: intra-band scans (~32 steps) live entirely under this threshold.
FULL_UNROLL_MAX = int(os.environ.get('BREVER_LSTM_FULL_UNROLL', '64'))


def _resolve_unroll(n_steps, unroll):
    return n_steps if n_steps <= FULL_UNROLL_MAX else unroll


# ---------------------------------------------------------------------------
# memory-lean LSTM scan (custom VJP)
#
# Autodiff through an LSTM scan saves every nonlinearity's
# linearization point per step (~6 gate-sized arrays) to HBM in the
# forward and re-reads them in the backward. This custom VJP saves
# only the hidden and cell sequences (the hidden sequence is the
# output, so the true extra cost is c_seq alone) and rebuilds the gate
# activations in the backward with ONE large MXU matmul over all
# timesteps — h_prev is known from the saved sequence, so the
# recompute has no sequential dependency. The remaining reverse scan
# carries only the (dh, dc) recurrences. Net effect: ~4x less
# scan-residual HBM traffic at the price of MXU-cheap recompute FLOPs
# (the flash-TCN trade applied to recurrence).

def _lstm_scan_impl(gates_x, w_hh, unroll):
    """gates_x: (T, ..., 4h) input-projected gates (i/f/g/o);
    w_hh: (..., h, 4h) broadcastable against the row dims."""
    n_hidden = w_hh.shape[-2]
    shape = gates_x.shape[1:-1] + (n_hidden,)
    unroll = _resolve_unroll(gates_x.shape[0], unroll)

    def step(carry, gx):
        h_prev, c_prev = carry
        gates = gx + jnp.matmul(h_prev, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), (h, c)

    init = (jnp.zeros(shape, gates_x.dtype),
            jnp.zeros(shape, gates_x.dtype))
    _, (h_seq, c_seq) = jax.lax.scan(step, init, gates_x, unroll=unroll)
    return h_seq, c_seq


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_scan(gates_x, w_hh, unroll=DEFAULT_UNROLL):
    h_seq, _ = _lstm_scan_impl(gates_x, w_hh, unroll)
    return h_seq


def _lstm_scan_fwd(gates_x, w_hh, unroll):
    h_seq, c_seq = _lstm_scan_impl(gates_x, w_hh, unroll)
    return h_seq, (gates_x, w_hh, h_seq, c_seq)


def _lstm_scan_bwd(unroll, residuals, dh_seq):
    gates_x, w_hh, h_seq, c_seq = residuals
    unroll = _resolve_unroll(dh_seq.shape[0], unroll)
    zero = jnp.zeros_like(h_seq[:1])
    h_prev = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zero, c_seq[:-1]], axis=0)
    # gate recompute for ALL timesteps in one MXU matmul (bit-identical
    # contraction to the forward's per-step matmuls)
    pre = gates_x + jnp.matmul(h_prev, w_hh)
    i, f, g, o = jnp.split(pre, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    tc = jnp.tanh(c_seq)
    w_hh_t = jnp.swapaxes(w_hh, -1, -2)

    def bstep(carry, xs):
        dh_rec, dc_rec = carry
        dh_t, i_t, f_t, g_t, o_t, tc_t, cp_t = xs
        dh = dh_t + dh_rec
        do = dh * tc_t * o_t * (1 - o_t)
        dc = dh * o_t * (1 - tc_t * tc_t) + dc_rec
        di = dc * g_t * i_t * (1 - i_t)
        df = dc * cp_t * f_t * (1 - f_t)
        dg = dc * i_t * (1 - g_t * g_t)
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)
        dh_prev = jnp.matmul(dgates, w_hh_t)
        dc_prev = dc * f_t
        return (dh_prev, dc_prev), dgates

    init = (jnp.zeros_like(dh_seq[0]), jnp.zeros_like(dh_seq[0]))
    _, dgates_seq = jax.lax.scan(
        bstep, init, (dh_seq, i, f, g, o, tc, c_prev),
        reverse=True, unroll=unroll)
    # dW_hh = sum_t h_prev[t]^T dgates[t] — one batched MXU matmul.
    # Expressed as moveaxis+reshape+matmul rather than a t-summing
    # einsum: the einsum form triggered an XLA:TPU post-optimization
    # layout ICE ("Expected instruction to have shape equal to
    # f32[64,8]") in the full DCCRN backward graph.
    lead = h_prev.shape[1:-2]
    hp = jnp.moveaxis(h_prev, 0, -3).reshape(*lead, -1, h_prev.shape[-1])
    dg = jnp.moveaxis(dgates_seq, 0, -3).reshape(
        *lead, -1, dgates_seq.shape[-1])
    dw_hh = jnp.matmul(
        jnp.swapaxes(hp, -1, -2), dg,
        preferred_element_type=jnp.float32).astype(w_hh.dtype)
    return dgates_seq, dw_hh


lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)


def _min_fused_rows():
    """MXU row floor for the fused scan (BREVER_LSTM_MIN_ROWS).

    A sub-128-row recurrence idles part of the MXU, but the narrow
    scans below the floor (DCCRN's packed complex bottleneck: 32 rows
    x ~500 steps) are BYTE-bound, not MXU-bound — the kernel's win is
    keeping the (T, R, 4H) gate stashes out of HBM, which holds at
    any width. The default is set by hardware A/B (see PERF.md)."""
    return int(os.environ.get('BREVER_LSTM_MIN_ROWS', '128'))


def _use_fused_scan(gates_x, w_hh):
    """flash-LSTM engages on TPU for lane-aligned hidden sizes and
    row counts wide enough to feed the MXU (see
    ops/pallas/lstm_scan.py); BREVER_FUSED_LSTM=0 disables.

    Default ON where the kernel applies: measured on v5e hardware
    (benchmarks/r3_measure.log round 3) it takes tfgridnet from
    131.7 to 106.2 ms/step (scan blocks) and 99.6 to 73.1 ms/step
    (inline blocks); parity is pinned by the interpreter-mode tests
    (tests/test_lstm_fused.py). BREVER_FUSED_LSTM=0 opts out."""
    if os.environ.get('BREVER_FUSED_LSTM', '1') != '1':
        return False
    from ..ops.pallas.lstm_scan import lstm_pallas_available
    n_hidden = w_hh.shape[-2]
    n_rows = gates_x.shape[-2]
    return (lstm_pallas_available()
            and n_hidden % 128 == 0
            and gates_x.shape[-1] == 4 * n_hidden
            and gates_x.ndim in (3, 4)
            and n_rows >= _min_fused_rows())


def _dispatch_scan(gates_x, w_hh, unroll):
    """Route to the fused Pallas scan when it applies, else the
    XLA-scan custom VJP."""
    if _use_fused_scan(gates_x, w_hh):
        from ..ops.pallas.lstm_scan import lstm_scan_fused
        if gates_x.ndim == 3:     # (T, B, 4H) unidirectional
            out = lstm_scan_fused(gates_x[:, None], w_hh[None])
            return out[:, 0]
        return lstm_scan_fused(gates_x, w_hh)
    return lstm_scan(gates_x, w_hh, unroll)


def _use_fused_scan_x(n_hidden, n_rows):
    """Gate for the v2 projection-fused kernel: same hardware/shape
    conditions as v1 (the feature dim is zero-padded to lanes inside
    the wrapper, so only the hidden width and MXU row floor gate)."""
    if os.environ.get('BREVER_FUSED_LSTM', '1') != '1':
        return False
    from ..ops.pallas.lstm_scan import lstm_pallas_available
    return (lstm_pallas_available()
            and n_hidden % 128 == 0
            and n_rows >= _min_fused_rows())


def _dispatch_scan_x(x_seq, w_ih, bias, w_hh, unroll):
    """Fused projection+scan over ``x_seq (T, D, R, E)`` with
    direction-stacked weights; falls back to the projection-outside
    pipeline (which itself may use the v1 fused scan)."""
    if _use_fused_scan_x(w_hh.shape[-2], x_seq.shape[-2]):
        from ..ops.pallas.lstm_scan import lstm_scan_fused_x
        dt = jnp.result_type(x_seq, w_ih)
        return lstm_scan_fused_x(
            x_seq.astype(dt), w_ih.astype(dt),
            bias.astype(dt), w_hh.astype(dt))
    gates_x = jnp.einsum('tdrf,dfk->tdrk', x_seq, w_ih) \
        + bias[None, :, None, :]
    return _dispatch_scan(gates_x, w_hh, unroll)


class LSTM(nn.Module):
    """Unidirectional single-layer LSTM over ``(batch, time, features)``.

    Zero initial state; returns the full hidden-state sequence.
    ``unroll`` trades compile time for fewer sequential scan steps
    (per-step overhead is the latency bound on TPU).
    """

    hidden_size: int
    reverse: bool = False
    unroll: int = DEFAULT_UNROLL

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

        # the input projection happens inside the fused kernel (one
        # per-chunk MXU matmul overlapping the recurrence) or as one
        # big XLA matmul on the fallback path
        xs = jnp.flip(x, axis=1) if self.reverse else x
        xs = jnp.swapaxes(xs, 0, 1)[:, None]  # (T, 1, B, F)
        hidden = _dispatch_scan_x(
            xs, w_ih[None], (b_ih + b_hh)[None], w_hh[None],
            self.unroll)[:, 0]
        hidden = jnp.swapaxes(hidden, 0, 1)  # (B, T, h)
        if self.reverse:
            hidden = jnp.flip(hidden, axis=1)
        return hidden


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
    unroll: int = DEFAULT_UNROLL

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
        # (T, 2, B, F) scan layout: one F-wide copy — cheaper than the
        # 4h-wide gate copy this layout used to require, and on the
        # fused path the projection never touches HBM at all
        x_seq = jnp.moveaxis(both, 2, 0)
        hidden = _dispatch_scan_x(
            x_seq, w_ih, b_ih + b_hh, w_hh, self.unroll)  # (T, 2, B, h)
        fwd = jnp.moveaxis(hidden[:, 0], 0, 1)            # (B, T, h)
        bwd = jnp.flip(jnp.moveaxis(hidden[:, 1], 0, 1), axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)
