"""Fused LSTM scan as a streaming Pallas TPU kernel (flash-LSTM).

Drop-in accelerator for :func:`brever_tpu.models.rnn.lstm_scan` — the
recurrence

    gates[t] = gates_x[t] + h[t-1] @ w_hh          (i | f | g | o)
    c[t] = sig(f) * c[t-1] + sig(i) * tanh(g)
    h[t] = sig(o) * tanh(c[t])

with ``gates_x: (T, D, R, 4H)`` (direction-stacked rows, D=1 for a
unidirectional LSTM) and ``w_hh: (D, H, 4H)``.

Why a kernel: under XLA the scan is a while-loop whose every step
round-trips the carry through HBM and whose backward re-materializes
the (T, D, R, 4H) gate pre-activations (the memory-lean custom VJP in
``models.rnn`` recomputes them with one monolithic matmul, but that
matmul's output still lands in HBM before the reverse scan re-reads
it).  Here the recurrence streams through VMEM: the grid is
``(D, R/tile, T/chunk)`` with time innermost, so the pipeline
prefetches gate chunks while the MXU works, the (h, c) carry lives in
VMEM scratch across time chunks, and the backward walks a
time-REVERSED grid recomputing each step's gates from the saved
``h_seq`` with one extra per-step matmul (FLOPs are free, bytes are
not).  HBM traffic per element: read gates_x + dh, write h/c forward
and dgates backward — within ~1.3x of the tensors' own size, with no
per-step XLA dispatch.

VMEM is bounded by the (chunk, tile) block sizes regardless of T, so
arbitrarily long sequences stream (the earlier design held the whole
(T, tile, 4H) row slab in VMEM, which stops fitting near T ~ 200).

Numerics: identical operation order to the jnp twin
(``models.rnn._lstm_scan_impl``): the recurrent matmul accumulates in
f32 and is cast back to the carry dtype, gate nonlinearities in f32
cast back to the carry dtype (XLA's bf16 sigmoid/tanh upcast
internally too).  Parity is pinned by interpreter-mode tests
(tests/test_lstm_fused.py).

Behavioral reference for the consumers: torch ``nn.LSTM`` semantics
(reference brever/models/tfgridnet/tfgridnet.py:276-318, dccrn.py,
manner modules).
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

#: scoped VMEM ceiling for the pallas_call (v5e cores have 128 MB)
_VMEM_LIMIT = 100 * 1024 * 1024

#: target byte size of one streamed gates_x block (sets the time chunk)
_CHUNK_BYTES = 2 * 1024 * 1024

#: cap for one streamed block at the minimum time chunk (8 steps) —
#: bounds the double-buffered VMEM however many rows fold into a tile
_MAX_TILE_BLOCK_BYTES = 8 * 1024 * 1024

# test hook: route the fused path through the Pallas interpreter
FORCE_INTERPRET = False


def lstm_pallas_available():
    if FORCE_INTERPRET:
        return _PALLAS_OK
    return _PALLAS_OK and jax.default_backend() in ('tpu',)


def _round_up(n, m):
    return -(-n // m) * m


def _pick_blocks(t_steps, n_rows, n_hidden, itemsize):
    """(row tile, time chunk) sized so streamed blocks pipeline well.

    Rows are the scan's only PARALLEL axis; grid instances run
    sequentially on the core, so every row tile is another serial
    pass over the whole sequence.  The tile therefore covers ALL rows
    whenever the streamed blocks fit VMEM — an earlier 256-row cap
    split tfgridnet's 2016-row intra scan into 8 serial full-sequence
    passes (the carry scratch for all 2016 rows is only ~0.26 MB).
    The cap is set by the block bytes at the minimum time chunk; the
    time chunk then targets _CHUNK_BYTES per streamed block so double
    buffering stays far under the VMEM ceiling however long the
    sequence is."""
    row_bytes = 4 * n_hidden * itemsize
    cap = max(256, _MAX_TILE_BLOCK_BYTES // (8 * row_bytes) // 16 * 16)
    tile = min(cap, _round_up(n_rows, 16))
    # both block dims prefer EXACT divisors: padded rows/steps cost a
    # full pad copy of every kernel operand (x/h/c/dh) plus the
    # slice-back — measured ~2.4 ms/step of pure movement on
    # tfgridnet. The row tile must stay a multiple of 16 (f32 sublane
    # tiling of the (rows, gates) blocks); the time chunk is a MAJOR
    # block dim with no alignment requirement at all, so any divisor
    # works, bounded only by the streamed-block VMEM budget (2x the
    # min-chunk cap: the scan is compute-bound per chunk, so fewer,
    # bigger DMAs pipeline fine).
    if n_rows % tile:
        for k in range(2, n_rows // 16 + 1):
            if n_rows % k == 0 and (n_rows // k) % 16 == 0 \
                    and n_rows // k <= cap:
                tile = n_rows // k
                break
    chunk = _CHUNK_BYTES // (tile * row_bytes)
    chunk = max(8, min(_round_up(t_steps, 8), _round_up(chunk, 8)))
    if t_steps % chunk:
        max_chunk = min(
            _round_up(t_steps, 8),
            max(chunk, 2 * _MAX_TILE_BLOCK_BYTES // (tile * row_bytes)))
        best, best_pad = chunk, -t_steps % chunk
        for n in range(1, t_steps + 1):
            cand = -(-t_steps // n)  # ceil
            if cand > max_chunk:
                continue
            if cand < max(8, chunk // 2):
                break
            pad = cand * n - t_steps
            if pad < best_pad:
                best, best_pad = cand, pad
                if pad == 0:
                    break
        chunk = best
    return tile, chunk


def _sig(x):
    # Mosaic mis-lowers bf16 logistic directly (f32 constant broadcast
    # into a bf16 vector fails verification); compute in f32 and cast
    # back — matching XLA's internal upcast, so numerics match the twin
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _tanh(x):
    return jnp.tanh(x.astype(jnp.float32)).astype(x.dtype)


def _gate_slices(gates, h_dim):
    i = _sig(gates[:, :h_dim])
    f = _sig(gates[:, h_dim:2 * h_dim])
    g = _tanh(gates[:, 2 * h_dim:3 * h_dim])
    o = _sig(gates[:, 3 * h_dim:])
    return i, f, g, o


# ---------------------------------------------------------------------------
# forward

def _fwd_kernel(gx_ref, whh_ref, h_ref, c_ref, h_scr, c_scr,
                *, n_hidden):
    t_chunk = gx_ref.shape[0]
    w = whh_ref[0]

    @pl.when(pl.program_id(2) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def step(t, _):
        h_prev = h_scr[...]
        gates = gx_ref[t, 0] + jnp.dot(
            h_prev, w, preferred_element_type=jnp.float32
        ).astype(h_prev.dtype)
        i, f, g, o = _gate_slices(gates, n_hidden)
        c = f * c_scr[...] + i * g
        h = o * _tanh(c)
        h_scr[...] = h
        c_scr[...] = c
        h_ref[t, 0] = h
        c_ref[t, 0] = c
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0, unroll=False)


def _fwd_pallas(gates_x, w_hh):
    t_steps, n_dir, n_rows, gdim = gates_x.shape
    n_hidden = gdim // 4
    dt = gates_x.dtype
    tile, chunk = _pick_blocks(t_steps, n_rows, n_hidden, dt.itemsize)
    pad_r = -n_rows % tile
    pad_t = -t_steps % chunk
    if pad_r or pad_t:
        gates_x = jnp.pad(
            gates_x, ((0, pad_t), (0, 0), (0, pad_r), (0, 0)))
    t_pad, r_pad = t_steps + pad_t, n_rows + pad_r

    out_sd = jax.ShapeDtypeStruct((t_pad, n_dir, r_pad, n_hidden), dt)
    kernel = functools.partial(_fwd_kernel, n_hidden=n_hidden)
    h_seq, c_seq = pl.pallas_call(
        kernel,
        out_shape=(out_sd, out_sd),
        grid=(n_dir, r_pad // tile, t_pad // chunk),
        in_specs=[
            pl.BlockSpec((chunk, 1, tile, gdim),
                         lambda d, r, t: (t, d, r, 0)),
            pl.BlockSpec((1, n_hidden, gdim), lambda d, r, t: (d, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((chunk, 1, tile, n_hidden),
                         lambda d, r, t: (t, d, r, 0)),
            pl.BlockSpec((chunk, 1, tile, n_hidden),
                         lambda d, r, t: (t, d, r, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, n_hidden), dt),
            pltpu.VMEM((tile, n_hidden), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * n_dir * r_pad * n_hidden * gdim,
            bytes_accessed=t_pad * n_dir * r_pad
            * (gdim + 2 * n_hidden) * dt.itemsize,
            transcendentals=t_pad * n_dir * r_pad * gdim,
        ),
        interpret=FORCE_INTERPRET,
    )(gates_x, w_hh)
    if pad_r or pad_t:
        h_seq = h_seq[:t_steps, :, :n_rows]
        c_seq = c_seq[:t_steps, :, :n_rows]
    return h_seq, c_seq


# ---------------------------------------------------------------------------
# backward: time-reversed grid; gates recomputed from the saved h_seq

def _bwd_kernel(gx_ref, whh_ref, h_ref, c_ref, hb_ref, cb_ref, dh_ref,
                dgx_ref, dwhh_ref, dh_scr, dc_scr, *, n_hidden):
    t_chunk = gx_ref.shape[0]
    w = whh_ref[0]
    dt = gx_ref.dtype

    @pl.when(pl.program_id(2) == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)

    def prev_of(ref, boundary_ref, t):
        # value at chunk-local step t-1; the chunk boundary row holds
        # the previous chunk's final step (zeros for the first chunk)
        inside = ref[jnp.maximum(t - 1, 0), 0]
        return jnp.where(t == 0, boundary_ref[0, 0], inside)

    def bstep(k, dw):
        t = t_chunk - 1 - k
        h_prev = prev_of(h_ref, hb_ref, t)
        c_prev = prev_of(c_ref, cb_ref, t)
        gates = gx_ref[t, 0] + jnp.dot(
            h_prev, w, preferred_element_type=jnp.float32).astype(dt)
        i, f, g, o = _gate_slices(gates, n_hidden)
        tc = _tanh(c_ref[t, 0])
        dh = dh_ref[t, 0] + dh_scr[...]
        do = dh * tc * o * (1 - o)
        dc = dh * o * (1 - tc * tc) + dc_scr[...]
        di = dc * g * i * (1 - i)
        df = dc * c_prev * f * (1 - f)
        dg = dc * i * (1 - g * g)
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)
        # "NT" matmul (contract the gate dim of both operands) instead
        # of materializing w.T in-kernel
        dh_scr[...] = jax.lax.dot_general(
            dgates, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        dc_scr[...] = dc * f
        dgx_ref[t, 0] = dgates
        # dW_hh accumulates in f32 but multiplies at the carry dtype:
        # under bf16 amp that is one MXU pass per step (an f32 x f32
        # dot lowers to a 3-6x multi-pass sequence), and it is what
        # differentiating the jnp twin computes; no-op for f32 inputs
        return dw + jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32)

    dw = jax.lax.fori_loop(
        0, t_chunk, bstep,
        jnp.zeros(dwhh_ref.shape[1:], jnp.float32), unroll=False)
    dwhh_ref[0] += dw


def _bwd_pallas(gates_x, w_hh, h_seq, c_seq, dh_seq):
    t_steps, n_dir, n_rows, gdim = gates_x.shape
    n_hidden = gdim // 4
    dt = gates_x.dtype
    tile, chunk = _pick_blocks(t_steps, n_rows, n_hidden, dt.itemsize)
    pad_r = -n_rows % tile
    pad_t = -t_steps % chunk
    if pad_r or pad_t:
        pad = ((0, pad_t), (0, 0), (0, pad_r), (0, 0))
        gates_x = jnp.pad(gates_x, pad)
        h_seq = jnp.pad(h_seq, pad[:2] + pad[2:3] + ((0, 0),))
        c_seq = jnp.pad(c_seq, pad[:2] + pad[2:3] + ((0, 0),))
        dh_seq = jnp.pad(dh_seq, pad[:2] + pad[2:3] + ((0, 0),))
    t_pad, r_pad = t_steps + pad_t, n_rows + pad_r
    n_chunks = t_pad // chunk

    # chunk-boundary carries: (h, c) at the final step of the chunk
    # BEFORE each chunk (zeros before the first)
    zero = jnp.zeros((1, n_dir, r_pad, n_hidden), dt)
    h_bound = jnp.concatenate(
        [zero, h_seq[chunk - 1::chunk][:-1]], axis=0)
    c_bound = jnp.concatenate(
        [zero, c_seq[chunk - 1::chunk][:-1]], axis=0)

    # time-REVERSED visit order: grid step t processes source chunk
    # (n_chunks - 1 - t) so the (dh, dc) carries flow backwards
    def rev(d, r, t):
        return (n_chunks - 1 - t, d, r, 0)

    kernel = functools.partial(_bwd_kernel, n_hidden=n_hidden)
    seq_spec = pl.BlockSpec((chunk, 1, tile, n_hidden), rev)
    dgates, dw_hh = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, n_dir, r_pad, gdim), dt),
            jax.ShapeDtypeStruct((n_dir, n_hidden, gdim), jnp.float32),
        ),
        grid=(n_dir, r_pad // tile, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1, tile, gdim), rev),
            pl.BlockSpec((1, n_hidden, gdim), lambda d, r, t: (d, 0, 0)),
            seq_spec,
            seq_spec,
            pl.BlockSpec((1, 1, tile, n_hidden), rev),
            pl.BlockSpec((1, 1, tile, n_hidden), rev),
            seq_spec,
        ],
        out_specs=(
            pl.BlockSpec((chunk, 1, tile, gdim), rev),
            # same dw block revisited by every (r, t) step: accumulate
            pl.BlockSpec((1, n_hidden, gdim), lambda d, r, t: (d, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, n_hidden), dt),            # dh carry
            pltpu.VMEM((tile, n_hidden), dt),            # dc carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * t_pad * n_dir * r_pad * n_hidden * gdim,
            bytes_accessed=t_pad * n_dir * r_pad
            * (2 * gdim + 3 * n_hidden) * dt.itemsize,
            transcendentals=2 * t_pad * n_dir * r_pad * gdim,
        ),
        interpret=FORCE_INTERPRET,
    )(gates_x, w_hh, h_seq, c_seq, h_bound, c_bound, dh_seq)
    if pad_r or pad_t:
        dgates = dgates[:t_steps, :, :n_rows]
    return dgates, dw_hh.astype(w_hh.dtype)


# ---------------------------------------------------------------------------
# custom-VJP wrapper (same contract as models.rnn.lstm_scan)

@jax.custom_vjp
def lstm_scan_fused(gates_x, w_hh):
    """Fused scan over ``gates_x (T, D, R, 4H)`` with ``w_hh (D, H, 4H)``."""
    h_seq, _ = _fwd_pallas(gates_x, w_hh)
    return h_seq


def _fused_fwd(gates_x, w_hh):
    h_seq, c_seq = _fwd_pallas(gates_x, w_hh)
    return h_seq, (gates_x, w_hh, h_seq, c_seq)


def _fused_bwd(residuals, dh_seq):
    gates_x, w_hh, h_seq, c_seq = residuals
    return _bwd_pallas(gates_x, w_hh, h_seq, c_seq, dh_seq)


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# v2: input projection fused into the scan (flash-LSTM-x)
#
# The v1 kernel still pays for the (T, D, R, 4H) gate tensors at the
# HBM boundary three times each way: XLA materializes gates_x before
# the call, the kernel re-reads it forward and backward, and the
# backward's dgates output feeds two more full-size XLA matmuls (dx,
# dW_ih). The round-4 tfgridnet census put the two 817 MB gates_x
# buffers at the top of the per-instruction table. Here the projection
# x @ W_ih + b moves INSIDE the scan step (same total MXU FLOPs - the
# big parallel matmul just becomes per-chunk matmuls overlapping the
# recurrence), so HBM sees only x, h, c, dh, dx at their natural
# widths: ~11 H-equivalent passes per element instead of ~33 when
# E == 2H.

def _fwd_x_kernel(x_ref, wih_ref, b_ref, whh_ref, h_ref, c_ref,
                  h_scr, c_scr, *, n_hidden):
    t_chunk = x_ref.shape[0]
    w = whh_ref[0]
    wi = wih_ref[0]
    b32 = b_ref[0].astype(jnp.float32)
    dt = h_ref.dtype

    @pl.when(pl.program_id(2) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def step(t, _):
        h_prev = h_scr[...]
        # mirror the unfused pipeline's dtype boundaries: the
        # projection accumulates in f32 and lands at the carry dtype
        # (what the XLA einsum emitted), then the recurrent term adds
        gx = (jnp.dot(x_ref[t, 0], wi,
                      preferred_element_type=jnp.float32)
              + b32).astype(dt)
        gates = gx + jnp.dot(
            h_prev, w, preferred_element_type=jnp.float32).astype(dt)
        i, f, g, o = _gate_slices(gates, n_hidden)
        c = f * c_scr[...] + i * g
        h = o * _tanh(c)
        h_scr[...] = h
        c_scr[...] = c
        h_ref[t, 0] = h
        c_ref[t, 0] = c
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0, unroll=False)


def _pad_feature(x, w_ih):
    """zero-pad the feature dim to a lane multiple (padded columns
    contribute nothing to the projection or its gradients)."""
    e = x.shape[-1]
    pad_e = -e % 128
    if pad_e:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad_e),))
        w_ih = jnp.pad(w_ih, ((0, 0), (0, pad_e), (0, 0)))
    return x, w_ih


def _fwd_x_pallas(x_seq, w_ih, bias, w_hh):
    t_steps, n_dir, n_rows, _ = x_seq.shape
    gdim = w_hh.shape[-1]
    n_hidden = gdim // 4
    dt = x_seq.dtype
    x_seq, w_ih = _pad_feature(x_seq, w_ih)
    e_pad = x_seq.shape[-1]
    tile, chunk = _pick_blocks(
        t_steps, n_rows, max(n_hidden, e_pad // 4), dt.itemsize)
    pad_r = -n_rows % tile
    pad_t = -t_steps % chunk
    if pad_r or pad_t:
        x_seq = jnp.pad(
            x_seq, ((0, pad_t), (0, 0), (0, pad_r), (0, 0)))
    t_pad, r_pad = t_steps + pad_t, n_rows + pad_r

    out_sd = jax.ShapeDtypeStruct((t_pad, n_dir, r_pad, n_hidden), dt)
    kernel = functools.partial(_fwd_x_kernel, n_hidden=n_hidden)
    h_seq, c_seq = pl.pallas_call(
        kernel,
        out_shape=(out_sd, out_sd),
        grid=(n_dir, r_pad // tile, t_pad // chunk),
        in_specs=[
            pl.BlockSpec((chunk, 1, tile, e_pad),
                         lambda d, r, t: (t, d, r, 0)),
            pl.BlockSpec((1, e_pad, gdim), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, gdim), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, n_hidden, gdim), lambda d, r, t: (d, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((chunk, 1, tile, n_hidden),
                         lambda d, r, t: (t, d, r, 0)),
            pl.BlockSpec((chunk, 1, tile, n_hidden),
                         lambda d, r, t: (t, d, r, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, n_hidden), dt),
            pltpu.VMEM((tile, n_hidden), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * n_dir * r_pad * gdim * (e_pad + n_hidden),
            bytes_accessed=t_pad * n_dir * r_pad
            * (e_pad + 2 * n_hidden) * dt.itemsize,
            transcendentals=t_pad * n_dir * r_pad * gdim,
        ),
        interpret=FORCE_INTERPRET,
    )(x_seq, w_ih, bias[:, None], w_hh)
    if pad_r or pad_t:
        h_seq = h_seq[:t_steps, :, :n_rows]
        c_seq = c_seq[:t_steps, :, :n_rows]
    return h_seq, c_seq


def _bwd_x_kernel(x_ref, wih_ref, b_ref, whh_ref, h_ref, c_ref,
                  hb_ref, cb_ref, dh_ref,
                  dx_ref, dwih_ref, db_ref, dwhh_ref,
                  dh_scr, dc_scr, *, n_hidden):
    t_chunk = x_ref.shape[0]
    w = whh_ref[0]
    wi = wih_ref[0]
    b32 = b_ref[0].astype(jnp.float32)
    dt = h_ref.dtype

    @pl.when(pl.program_id(2) == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        dwih_ref[...] = jnp.zeros_like(dwih_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)

    def prev_of(ref, boundary_ref, t):
        inside = ref[jnp.maximum(t - 1, 0), 0]
        return jnp.where(t == 0, boundary_ref[0, 0], inside)

    def bstep(k, acc):
        dwi, db, dw = acc
        t = t_chunk - 1 - k
        h_prev = prev_of(h_ref, hb_ref, t)
        c_prev = prev_of(c_ref, cb_ref, t)
        x_t = x_ref[t, 0]
        gx = (jnp.dot(x_t, wi, preferred_element_type=jnp.float32)
              + b32).astype(dt)
        gates = gx + jnp.dot(
            h_prev, w, preferred_element_type=jnp.float32).astype(dt)
        i, f, g, o = _gate_slices(gates, n_hidden)
        tc = _tanh(c_ref[t, 0])
        dh = dh_ref[t, 0] + dh_scr[...]
        do = dh * tc * o * (1 - o)
        dc = dh * o * (1 - tc * tc) + dc_scr[...]
        di = dc * g * i * (1 - i)
        df = dc * c_prev * f * (1 - f)
        dg = dc * i * (1 - g * g)
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)
        dh_scr[...] = jax.lax.dot_general(
            dgates, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        dc_scr[...] = dc * f
        # dx stays in VMEM -> HBM once, at the input's own width
        dx_ref[t, 0] = jax.lax.dot_general(
            dgates, wi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        dwi = dwi + jnp.dot(
            x_t.T, dgates, preferred_element_type=jnp.float32)
        db = db + jnp.sum(
            dgates.astype(jnp.float32), axis=0, keepdims=True)
        dw = dw + jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32)
        return dwi, db, dw

    dwi, db, dw = jax.lax.fori_loop(
        0, t_chunk, bstep,
        (jnp.zeros(dwih_ref.shape[1:], jnp.float32),
         jnp.zeros(db_ref.shape[1:], jnp.float32),
         jnp.zeros(dwhh_ref.shape[1:], jnp.float32)),
        unroll=False)
    dwih_ref[0] += dwi
    db_ref[0] += db
    dwhh_ref[0] += dw


def _bwd_x_pallas(x_seq, w_ih, bias, w_hh, h_seq, c_seq, dh_seq):
    t_steps, n_dir, n_rows, _ = x_seq.shape
    gdim = w_hh.shape[-1]
    n_hidden = gdim // 4
    dt = x_seq.dtype
    e_orig = x_seq.shape[-1]
    x_seq, w_ih = _pad_feature(x_seq, w_ih)
    e_pad = x_seq.shape[-1]
    tile, chunk = _pick_blocks(
        t_steps, n_rows, max(n_hidden, e_pad // 4), dt.itemsize)
    pad_r = -n_rows % tile
    pad_t = -t_steps % chunk
    if pad_r or pad_t:
        pad = ((0, pad_t), (0, 0), (0, pad_r), (0, 0))
        x_seq = jnp.pad(x_seq, pad)
        h_seq = jnp.pad(h_seq, pad[:3] + ((0, 0),))
        c_seq = jnp.pad(c_seq, pad[:3] + ((0, 0),))
        dh_seq = jnp.pad(dh_seq, pad[:3] + ((0, 0),))
    t_pad, r_pad = t_steps + pad_t, n_rows + pad_r
    n_chunks = t_pad // chunk

    zero = jnp.zeros((1, n_dir, r_pad, n_hidden), dt)
    h_bound = jnp.concatenate(
        [zero, h_seq[chunk - 1::chunk][:-1]], axis=0)
    c_bound = jnp.concatenate(
        [zero, c_seq[chunk - 1::chunk][:-1]], axis=0)

    def rev(d, r, t):
        return (n_chunks - 1 - t, d, r, 0)

    kernel = functools.partial(_bwd_x_kernel, n_hidden=n_hidden)
    seq_spec = pl.BlockSpec((chunk, 1, tile, n_hidden), rev)
    dx, dw_ih, db, dw_hh = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, n_dir, r_pad, e_pad), dt),
            jax.ShapeDtypeStruct((n_dir, e_pad, gdim), jnp.float32),
            jax.ShapeDtypeStruct((n_dir, 1, gdim), jnp.float32),
            jax.ShapeDtypeStruct((n_dir, n_hidden, gdim), jnp.float32),
        ),
        grid=(n_dir, r_pad // tile, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk, 1, tile, e_pad), rev),
            pl.BlockSpec((1, e_pad, gdim), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, gdim), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, n_hidden, gdim), lambda d, r, t: (d, 0, 0)),
            seq_spec,
            seq_spec,
            pl.BlockSpec((1, 1, tile, n_hidden), rev),
            pl.BlockSpec((1, 1, tile, n_hidden), rev),
            seq_spec,
        ],
        out_specs=(
            pl.BlockSpec((chunk, 1, tile, e_pad), rev),
            # weight/bias grads: same block revisited, accumulated
            pl.BlockSpec((1, e_pad, gdim), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, 1, gdim), lambda d, r, t: (d, 0, 0)),
            pl.BlockSpec((1, n_hidden, gdim), lambda d, r, t: (d, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, n_hidden), dt),
            pltpu.VMEM((tile, n_hidden), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * t_pad * n_dir * r_pad * gdim * (e_pad + n_hidden),
            bytes_accessed=t_pad * n_dir * r_pad
            * (2 * e_pad + 3 * n_hidden) * dt.itemsize,
            transcendentals=2 * t_pad * n_dir * r_pad * gdim,
        ),
        interpret=FORCE_INTERPRET,
    )(x_seq, w_ih, bias[:, None], w_hh,
      h_seq, c_seq, h_bound, c_bound, dh_seq)
    dx = dx[:t_steps, :, :n_rows, :e_orig]
    return (dx, dw_ih[:, :e_orig].astype(w_ih.dtype),
            db[:, 0].astype(bias.dtype), dw_hh.astype(w_hh.dtype))


@jax.custom_vjp
def lstm_scan_fused_x(x_seq, w_ih, bias, w_hh):
    """Fused projection+scan: ``x_seq (T, D, R, E)``,
    ``w_ih (D, E, 4H)``, ``bias (D, 4H)`` (= b_ih + b_hh),
    ``w_hh (D, H, 4H)`` -> ``h_seq (T, D, R, H)``."""
    h_seq, _ = _fwd_x_pallas(x_seq, w_ih, bias, w_hh)
    return h_seq


def _fused_x_fwd(x_seq, w_ih, bias, w_hh):
    h_seq, c_seq = _fwd_x_pallas(x_seq, w_ih, bias, w_hh)
    return h_seq, (x_seq, w_ih, bias, w_hh, h_seq, c_seq)


def _fused_x_bwd(residuals, dh_seq):
    x_seq, w_ih, bias, w_hh, h_seq, c_seq = residuals
    return _bwd_x_pallas(
        x_seq, w_ih, bias, w_hh, h_seq, c_seq, dh_seq)


lstm_scan_fused_x.defvjp(_fused_x_fwd, _fused_x_bwd)
