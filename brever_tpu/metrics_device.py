"""On-device (jax) validation metrics: STOI/ESTOI (+ PESQ, see below).

Why this exists: the trainer's validation loop enhances audio on the
device and then scores it with host metrics, which forces a
device-to-host fetch of the enhanced batch every validation period. On
remote-tunneled TPU backends that transfer runs at ~0.08 MB/s (a 4 MB
validation batch costs ~50 s); with device metrics only the per-item
scalar scores cross the wire. The reference has no equivalent — it
scores on host with pystoi/pesq (brever/metrics.py:19-44,47-99) because
torch-side metrics would not have helped its GPU-local setup.

These are f32 jax twins of the host f64 implementations
(:mod:`brever_tpu.stoi`, :mod:`brever_tpu.pesq`) with identical
algorithmic structure; numerics match to ~1e-3 (f32 + reduction
order), pinned by ``tests/test_metrics_device.py``. The host versions
remain the scoring authority for test-set evaluation
(``scripts/test_model.py``); the device twins serve the in-training
validation loop (model selection / monitoring), where a 1e-3 MOS/STOI
deviation is far below the epoch-to-epoch noise.

Data-dependent control flow (silent-frame removal, utterance gating)
is re-expressed with masks and compaction scatters so every metric is
a single static-shape jittable graph, batched over items with
per-item ``lengths``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stoi import (
    _OBM,
    _STOI_BETA,
    _STOI_DYN_RANGE,
    _STOI_FRAME,
    _STOI_FS,
    _STOI_HOP,
    _STOI_NFFT,
    _STOI_SEG,
    _WIN,
    _resample_window_oct,
)

EPS32 = np.float32(np.finfo(np.float64).eps)


# ---------------------------------------------------------------------------
# octave-compatible rational resampling (scipy.signal.resample_poly
# semantics: upsample-by-p zero stuffing, full convolution with the
# centered kaiser FIR, downsample-by-q, matching offset trim)

@functools.lru_cache(maxsize=8)
def _resample_plan(fs_in, fs_out):
    g = np.gcd(int(fs_out), int(fs_in))
    p, q = int(fs_out) // g, int(fs_in) // g
    h = _resample_window_oct(p, q)
    h = h / h.sum() * p
    half_len = (len(h) - 1) // 2
    n_pre_pad = (q - half_len % q)
    h = np.concatenate([np.zeros(n_pre_pad), h])
    n_pre_remove = (half_len + n_pre_pad) // q
    return p, q, h.astype(np.float32), n_pre_remove


def _resample_poly_jnp(x, fs_in, fs_out):
    """Batched resample_poly twin; x (B, T) -> (B, ceil(T*p/q))."""
    p, q, h, n_pre_remove = _resample_plan(fs_in, fs_out)
    b, t = x.shape
    n_out = -(-t * p // q)
    xu = jnp.zeros((b, t * p), x.dtype).at[:, ::p].set(x)
    # full convolution via conv_general_dilated with left/right padding
    y = jax.lax.conv_general_dilated(
        xu[:, None, :], jnp.asarray(h, x.dtype)[None, None, ::-1],
        window_strides=(1,), padding=[(len(h) - 1, len(h) - 1)],
        dimension_numbers=('NCW', 'OIW', 'NCW'))[:, 0]
    y = y[:, ::q]
    return jax.lax.dynamic_slice_in_dim(y, n_pre_remove, n_out, axis=1)


# ---------------------------------------------------------------------------
# STOI / ESTOI

def _frame_index(t, frame, hop):
    """pystoi framing grid: ceil((t - frame)/hop) frames (the frame
    that fits exactly at the end is dropped)."""
    n = max(-(-(t - frame) // hop), 0)
    return np.arange(n)[:, None] * hop + np.arange(frame)[None, :]


def _stoi_one(deg, ref, n, extended):
    """One item: deg/ref (T,) f32 at 10 kHz, n = valid samples."""
    t = deg.shape[0]
    idx = _frame_index(t, _STOI_FRAME, _STOI_HOP)
    n_static = idx.shape[0]
    if n_static == 0:
        return jnp.float32(1e-5)
    win = jnp.asarray(_WIN, jnp.float32)
    x_frames = ref[idx] * win            # x = clean (mask source)
    y_frames = deg[idx] * win
    # per-item frame validity: pystoi frames the sliced x[:n]
    n_valid = jnp.maximum(-(-(n - _STOI_FRAME) // _STOI_HOP), 0)
    valid = jnp.arange(n_static) < n_valid

    energies = 20.0 * jnp.log10(
        jnp.linalg.norm(x_frames, axis=1) + EPS32)
    emax = jnp.max(jnp.where(valid, energies, -jnp.inf))
    mask = (energies > emax - _STOI_DYN_RANGE) & valid

    # compact retained frames to the front (stable), then overlap-add
    tgt = jnp.where(mask, jnp.cumsum(mask) - 1, n_static)
    x_c = jnp.zeros((n_static + 1, _STOI_FRAME), jnp.float32) \
        .at[tgt].set(x_frames, mode='drop')[:n_static]
    y_c = jnp.zeros((n_static + 1, _STOI_FRAME), jnp.float32) \
        .at[tgt].set(y_frames, mode='drop')[:n_static]
    k = jnp.sum(mask)

    ola_len = (n_static - 1) * _STOI_HOP + _STOI_FRAME
    oidx = (np.arange(n_static)[:, None] * _STOI_HOP
            + np.arange(_STOI_FRAME)[None, :])
    x_sig = jnp.zeros(ola_len, jnp.float32).at[oidx].add(x_c)
    y_sig = jnp.zeros(ola_len, jnp.float32).at[oidx].add(y_c)

    # band envelopes over the resynthesized signals; valid spectral
    # frames = k - 1 (length (k-1)*hop + frame, exact-fit frame drops)
    sidx = _frame_index(ola_len, _STOI_FRAME, _STOI_HOP)
    m_static = sidx.shape[0]
    xf = x_sig[sidx] * win
    yf = y_sig[sidx] * win
    obm = jnp.asarray(_OBM, jnp.float32)
    x_spec = jnp.sqrt(
        obm @ (jnp.abs(jnp.fft.rfft(xf, _STOI_NFFT, axis=1)) ** 2).T)
    y_spec = jnp.sqrt(
        obm @ (jnp.abs(jnp.fft.rfft(yf, _STOI_NFFT, axis=1)) ** 2).T)

    # sliding segments of SEG consecutive frames, step 1 (only
    # segments fully inside the k-1 valid spectral frames count)
    n_seg_static = m_static - _STOI_SEG + 1
    if n_seg_static <= 0:
        return jnp.float32(1e-5)
    gidx = np.arange(n_seg_static)[:, None] + np.arange(_STOI_SEG)
    x_seg = jnp.moveaxis(x_spec[:, gidx], 0, 1)   # (M, bands, SEG)
    y_seg = jnp.moveaxis(y_spec[:, gidx], 0, 1)
    n_seg_valid = jnp.maximum((k - 1) - _STOI_SEG + 1, 0)
    seg_ok = jnp.arange(n_seg_static) < n_seg_valid

    if extended:
        def row_col_normalize(seg):
            def safe_inv_norm(s, axis):
                n2 = jnp.sum(s ** 2, axis=axis, keepdims=True)
                return jnp.where(
                    n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, EPS32)), 0.0)
            seg = seg - seg.mean(axis=2, keepdims=True)
            seg = seg * safe_inv_norm(seg, 2)
            seg = seg - seg.mean(axis=1, keepdims=True)
            seg = seg * safe_inv_norm(seg, 1)
            return seg

        x_n = row_col_normalize(x_seg)
        y_n = row_col_normalize(y_seg)
        per_seg = jnp.sum(x_n * y_n, axis=(1, 2)) / _STOI_SEG
        score = jnp.sum(jnp.where(seg_ok, per_seg, 0.0)) \
            / jnp.maximum(n_seg_valid, 1)
    else:
        norm_const = (
            jnp.linalg.norm(x_seg, axis=2, keepdims=True)
            / (jnp.linalg.norm(y_seg, axis=2, keepdims=True) + EPS32))
        y_norm = y_seg * norm_const
        clip_val = 10.0 ** (-_STOI_BETA / 20.0)
        y_prime = jnp.minimum(y_norm, x_seg * (1 + clip_val))
        y_prime = y_prime - y_prime.mean(axis=2, keepdims=True)
        x_cs = x_seg - x_seg.mean(axis=2, keepdims=True)
        y_prime = y_prime / (
            jnp.linalg.norm(y_prime, axis=2, keepdims=True) + EPS32)
        x_cs = x_cs / (
            jnp.linalg.norm(x_cs, axis=2, keepdims=True) + EPS32)
        per_seg = jnp.sum(y_prime * x_cs, axis=(1, 2))
        score = jnp.sum(jnp.where(seg_ok, per_seg, 0.0)) \
            / (jnp.maximum(n_seg_valid, 1) * x_seg.shape[1])

    # pystoi warns and returns 1e-5 with < SEG frames after removal
    return jnp.where(k - 1 < _STOI_SEG, jnp.float32(1e-5), score)


@functools.partial(jax.jit, static_argnames=('fs', 'extended'))
def _stoi_device_jit(deg, ref, lengths, fs, extended):
    t = deg.shape[-1]
    # zero out padding so batched resampling sees what the host sees
    # when it slices x[:n] (zeros beyond n either way)
    smask = jnp.arange(t)[None, :] < lengths[:, None]
    deg = jnp.where(smask, deg, 0.0).astype(jnp.float32)
    ref = jnp.where(smask, ref, 0.0).astype(jnp.float32)
    if fs != _STOI_FS:
        p, q, _, _ = _resample_plan(fs, _STOI_FS)
        deg = _resample_poly_jnp(deg, fs, _STOI_FS)
        ref = _resample_poly_jnp(ref, fs, _STOI_FS)
        lengths = -(-lengths * p // q)
    return jax.vmap(lambda d, r, n: _stoi_one(d, r, n, extended))(
        deg, ref, lengths)


def stoi_device(x, y, lengths=None, fs=16000, extended=False):
    """Batched on-device STOI (x = estimate, y = clean reference).

    Accepts (T,) or (B, T) device or host arrays; returns (B,) f32
    scores on device ((,) for unbatched input).
    """
    x, y = jnp.asarray(x), jnp.asarray(y)
    unbatched = x.ndim == 1
    if unbatched:
        x, y = x[None], y[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[-1], jnp.int32)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
    out = _stoi_device_jit(x, y, lengths, int(fs), bool(extended))
    return out[0] if unbatched else out


def estoi_device(x, y, lengths=None, fs=16000):
    return stoi_device(x, y, lengths=lengths, fs=fs, extended=True)


def snr_device(x, y, lengths=None):
    from .criterion import CriterionRegistry
    x, y = jnp.asarray(x), jnp.asarray(y)
    unbatched = x.ndim == 1
    if unbatched:
        x, y = x[None], y[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[-1], jnp.int32)
    out = -CriterionRegistry.get('snr')(
        x[:, None], y[:, None], jnp.asarray(lengths))
    return out[0] if unbatched else out


def sisnr_device(x, y, lengths=None):
    from .criterion import CriterionRegistry
    x, y = jnp.asarray(x), jnp.asarray(y)
    unbatched = x.ndim == 1
    if unbatched:
        x, y = x[None], y[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[-1], jnp.int32)
    out = -CriterionRegistry.get('sisnr')(
        x[:, None], y[:, None], jnp.asarray(lengths))
    return out[0] if unbatched else out


#: device twins the trainer substitutes for host metrics during
#: validation when ``device_val_metrics=True``
DEVICE_METRICS = {
    'stoi': stoi_device,
    'estoi': estoi_device,
    'snr': snr_device,
    'sisnr': sisnr_device,
}


# ---------------------------------------------------------------------------
# PESQ (perceptual model of brever_tpu.pesq as one static-shape graph)
#
# Deviation from the host twin, by design: time alignment uses the
# single global delay only (no utterance splitting / per-utterance fine
# delays / bad-interval realignment). For speech-enhancement outputs —
# time-aligned with their references by construction — every utterance
# delay the host estimates is the global delay, and realignment
# normally re-confirms it; but a heavily degraded aligned signal (early
# training / very low SNR) can still cross the disturbance-30 threshold
# and land the host re-search on a spurious correlation peak, shifting
# the host score away from this twin. Signals with genuinely
# time-varying delay should always be scored on host.

def _pesq_plan(fs, mode, t_in):
    """Host-side static tables for a (fs, mode, padded-length) plan."""
    from .pesq import (
        DATAPADDING_MS,
        SEARCHBUFFER,
        _Config,
        _IRS_FILTER_DB,
        _WB_IIR_16K,
    )
    cfg = _Config(fs, mode)
    pad_front = SEARCHBUFFER * cfg.downsample
    pad_back = SEARCHBUFFER * cfg.downsample + DATAPADDING_MS * fs // 1000
    length = pad_front + t_in + pad_back
    plan = {
        'cfg': cfg,
        'pad_front': pad_front,
        'length': length,
        'n_frames': (t_in + DATAPADDING_MS * fs // 1000
                     - cfg.nf) // cfg.hop + 1,
        'span': SEARCHBUFFER * cfg.downsample,
        'datapad': DATAPADDING_MS * fs // 1000,
    }
    freqs = np.fft.rfftfreq(length, 1.0 / fs)
    plan['hp_mask'] = (freqs >= 300.0).astype(np.float32)
    if mode == 'nb':
        gain_db = np.interp(freqs, _IRS_FILTER_DB[:, 0],
                            _IRS_FILTER_DB[:, 1])
        plan['input_gain'] = (10.0 ** (gain_db / 20.0)).astype(np.float32)
        plan['fir'] = None
    else:
        # the P.862.2 biquad's impulse response is < 1e-9 past ~350
        # taps (pole radius 0.946): a truncated-IR FIR convolution is
        # exact to f32 precision and avoids a 77k-step sequential scan
        b0, b1, b2, a1, a2 = _WB_IIR_16K
        n_taps = 384
        imp = np.zeros(n_taps)
        imp[0] = 1.0
        h = np.zeros(n_taps)
        y1 = y2 = 0.0
        x1 = x2 = 0.0
        for i in range(n_taps):
            y = (b0 * imp[i] + b1 * x1 + b2 * x2
                 - a1 * y1 - a2 * y2)
            h[i] = y
            x2, x1 = x1, imp[i]
            y2, y1 = y1, y
        plan['input_gain'] = None
        plan['fir'] = h.astype(np.float32)
    nfft2 = 1 << int(np.ceil(np.log2(2 * length)))
    plan['xcorr_nfft'] = nfft2
    return plan


@functools.lru_cache(maxsize=8)
def _pesq_tables(fs, mode):
    """jnp-ready perceptual-model constants shared across lengths."""
    from .pesq import _Config
    cfg = _Config(fs, mode)
    return {
        'window': np.asarray(cfg.window, np.float32),
        'group': np.asarray(cfg.group, np.float32),
        'abs_thresh': np.asarray(cfg.abs_thresh, np.float32),
        'centre_bark': np.asarray(cfg.centre_bark, np.float32),
        'width_bark': np.asarray(cfg.width_bark, np.float32),
        'nf': cfg.nf,
        'hop': cfg.hop,
        'n_bins': cfg.n_bins,
    }


def _pesq_graph(deg, ref, lengths, fs, mode, plan, tab):
    """(B, T) f32 in, (B,) MOS-LQO out; everything masked by lengths."""
    from .pesq import (
        D_WEIGHT,
        DA_WEIGHT,
        MAX_SCALE,
        MIN_SCALE,
        SL,
        SP,
        SYLLABLE_FRAMES,
        TARGET_AVG_POWER,
        ZWICKER_POWER,
    )
    b, t_in = deg.shape
    pad_front = plan['pad_front']
    length = plan['length']
    smask = jnp.arange(t_in)[None, :] < lengths[:, None]
    deg = jnp.where(smask, deg, 0.0)
    ref = jnp.where(smask, ref, 0.0)
    zf = jnp.zeros((b, pad_front), jnp.float32)
    zb = jnp.zeros((b, length - pad_front - t_in), jnp.float32)
    deg = jnp.concatenate([zf, deg, zb], axis=1)
    ref = jnp.concatenate([zf, ref, zb], axis=1)

    n_active = pad_front + lengths              # (B,)

    def fix_power_level(x):
        spec = jnp.fft.rfft(x, axis=1) * plan['hp_mask'][None, :]
        hp = jnp.fft.irfft(spec, length, axis=1)
        amask = jnp.arange(length)[None, :] < n_active[:, None]
        power = jnp.sum(jnp.where(amask, hp, 0.0) ** 2, axis=1) \
            / jnp.maximum(n_active, 1)
        return x * jnp.sqrt(
            TARGET_AVG_POWER / jnp.maximum(power, 1e-20))[:, None], power

    def input_filter(x):
        if plan['input_gain'] is not None:
            spec = jnp.fft.rfft(x, axis=1) * plan['input_gain'][None, :]
            return jnp.fft.irfft(spec, length, axis=1)
        h = jnp.asarray(plan['fir'])
        return jax.lax.conv_general_dilated(
            x[:, None, :], h[None, None, ::-1], window_strides=(1,),
            padding=[(len(plan['fir']) - 1, 0)],
            dimension_numbers=('NCW', 'OIW', 'NCW'))[:, 0]

    ref_s, ref_power = fix_power_level(ref)
    deg_s, _ = fix_power_level(deg)
    silent = ref_power <= 0.0
    ref_f = input_filter(ref_s)
    deg_f = input_filter(deg_s)

    # global delay: full-signal FFT cross-correlation restricted to
    # +-span (host pesq._estimate_delay)
    span = plan['span']
    nfft2 = plan['xcorr_nfft']
    corr = jnp.fft.irfft(
        jnp.fft.rfft(deg_f, nfft2, axis=1)
        * jnp.conj(jnp.fft.rfft(ref_f, nfft2, axis=1)), nfft2, axis=1)
    lags = np.concatenate([np.arange(span + 1), np.arange(-span, 0)])
    vals = jnp.concatenate(
        [corr[:, :span + 1], corr[:, nfft2 - span:]], axis=1)
    delay = jnp.asarray(lags)[jnp.argmax(vals, axis=1)]      # (B,)

    # frames over the active region; degraded frames shifted by the
    # global delay (host: per-utterance delays; equal here — see module
    # docstring)
    nf, hop, n_bins = tab['nf'], tab['hop'], tab['n_bins']
    f_static = plan['n_frames']
    fidx = (np.arange(f_static)[:, None] * hop
            + np.arange(nf)[None, :] + pad_front)            # (F, nf)
    n_valid = (lengths + plan['datapad'] - nf) // hop + 1    # (B,)
    fmask = jnp.arange(f_static)[None, :] < n_valid[:, None]  # (B, F)
    win = jnp.asarray(tab['window'])
    group = jnp.asarray(tab['group'])
    abs_thresh = jnp.asarray(tab['abs_thresh'])

    def spectra(x, offs):
        idx = jnp.clip(fidx[None, :, :] + offs[:, None, None],
                       0, length - 1)
        fr = jnp.take_along_axis(
            x[:, None, :], idx.reshape(b, -1)[:, None, :], axis=2
        ).reshape(b, f_static, nf) * win
        spec = jnp.fft.rfft(fr, nf, axis=2)[:, :, :n_bins]
        return jnp.abs(spec) ** 2

    pp_ref = SP * jnp.einsum('bfk,ck->bfc', spectra(ref_f, 0 * delay),
                             group)
    pp_deg = SP * jnp.einsum('bfk,ck->bfc', spectra(deg_f, delay), group)

    def total_audible(pp, factor=1.0):
        aud = jnp.where(pp[..., 1:] > factor * abs_thresh[1:],
                        pp[..., 1:], 0.0)
        return aud.sum(axis=-1)                              # (B, F)

    tot_ref = total_audible(pp_ref)
    tot_deg = total_audible(pp_deg)

    active = (tot_ref > 1e7) & fmask                         # (B, F)
    # host twin raises NoUtterancesError when nothing is speech-active;
    # the batched graph marks the item NaN instead
    silent = silent | (active.sum(axis=1) == 0)
    n_act = jnp.maximum(active.sum(axis=1), 1)
    avg_ref = jnp.sum(jnp.where(active[..., None], pp_ref, 0.0),
                      axis=1) / n_act[:, None]
    avg_deg = jnp.sum(jnp.where(active[..., None], pp_deg, 0.0),
                      axis=1) / n_act[:, None]
    band_comp = jnp.clip((avg_deg + 1000.0) / (avg_ref + 1000.0),
                         0.01, 100.0)
    pp_ref_c = pp_ref * band_comp[:, None, :]

    tot_ref_c = total_audible(pp_ref_c)
    inst = (tot_ref_c + 5e3) / (tot_deg + 5e3)               # (B, F)

    def gain_step(h, x):
        inst_i, valid_i, first_i = x
        h_new = jnp.where(first_i, inst_i, 0.2 * h + 0.8 * inst_i)
        h = jnp.where(valid_i, h_new, h)
        return h, h

    first = jnp.arange(f_static) == 0
    _, gains = jax.lax.scan(
        gain_step, jnp.ones((b,), jnp.float32),
        (inst.T, fmask.T, first))
    gains = jnp.clip(gains.T, MIN_SCALE, MAX_SCALE)
    pp_deg_c = pp_deg * gains[..., None]

    def loudness(pp):
        thresh = abs_thresh[None, None, :]
        h = jnp.minimum(6.0 / (tab['centre_bark'][None, None, :] + 2.0),
                        2.0) ** 0.15
        exponent = ZWICKER_POWER * jnp.where(
            tab['centre_bark'][None, None, :] < 4.0, h, 1.0)
        loud = ((thresh / 0.5) ** exponent
                * ((0.5 + 0.5 * pp / thresh) ** exponent - 1.0))
        return SL * jnp.where(pp > thresh, loud, 0.0)

    loud_ref = loudness(pp_ref_c)
    loud_deg = loudness(pp_deg_c)

    d = loud_deg - loud_ref
    m = 0.25 * jnp.minimum(loud_deg, loud_ref)
    disturbance = jnp.sign(d) * jnp.maximum(jnp.abs(d) - m, 0.0)

    ratio = ((pp_deg_c + 50.0) / (pp_ref_c + 50.0)) ** 1.2
    asym = jnp.where(ratio < 3.0, 0.0, jnp.minimum(ratio, 12.0))
    disturbance_asym = disturbance * asym

    widths = jnp.asarray(tab['width_bark'])

    def pseudo_lp(dd, p):
        w = widths[None, None, 1:]
        total_w = widths[1:].sum()
        res = (jnp.sum((jnp.abs(dd[..., 1:]) * w) ** p, axis=-1)
               / total_w) ** (1.0 / p)
        return res * total_w                                 # (B, F)

    frame_d = pseudo_lp(disturbance, 2.0)
    frame_da = pseudo_lp(disturbance_asym, 1.0)

    weight = ((tot_ref_c + 1e5) / 1e7) ** 0.04
    frame_d = jnp.minimum(frame_d / weight, 45.0)
    frame_da = jnp.minimum(frame_da / weight, 45.0)

    def lpq(fd, p_syll=6.0, p_time=2.0):
        # L6 over 20-frame syllables sliding by 10, masked per item
        step = SYLLABLE_FRAMES // 2
        starts = np.arange(0, f_static, step)
        num = jnp.zeros((b,), jnp.float32)
        den = jnp.zeros((b,), jnp.float32)
        for s in starts:
            width = min(SYLLABLE_FRAMES, f_static - s)
            cm = (jnp.arange(s, s + width)[None, :]
                  < n_valid[:, None])                        # (B, w)
            cnt = jnp.maximum(cm.sum(axis=1), 1)
            chunk = fd[:, s:s + width]
            syll = (jnp.sum(jnp.where(cm, chunk ** p_syll, 0.0), axis=1)
                    / cnt) ** (1.0 / p_syll)
            block_on = (s < n_valid).astype(jnp.float32)
            num = num + block_on * syll ** p_time
            den = den + block_on
        return (num / jnp.maximum(den, 1.0)) ** (1.0 / p_time)

    d_ind = lpq(frame_d)
    da_ind = lpq(frame_da)

    raw = jnp.clip(4.5 - D_WEIGHT * d_ind - DA_WEIGHT * da_ind,
                   -0.5, 4.5)
    if mode == 'nb':
        mos = 0.999 + 4.0 / (1.0 + jnp.exp(-1.4945 * raw + 4.6607))
    else:
        mos = 0.999 + 4.0 / (1.0 + jnp.exp(-1.3669 * raw + 3.8224))
    return jnp.where(silent, jnp.nan, mos)


@functools.partial(jax.jit, static_argnames=('fs', 'mode'))
def _pesq_device_jit(deg, ref, lengths, fs, mode):
    plan = _pesq_plan(fs, mode, deg.shape[-1])
    tab = _pesq_tables(fs, mode)
    return _pesq_graph(deg.astype(jnp.float32), ref.astype(jnp.float32),
                       lengths, fs, mode, plan, tab)


def pesq_device(x, y, lengths=None, fs=16000, mode='wb'):
    """Batched on-device PESQ MOS-LQO (x = estimate, y = clean).

    Same perceptual model as :func:`brever_tpu.pesq.pesq` (which itself
    approximates ITU P.862 — see its deviation list) with global-delay
    time alignment only; exact for time-aligned signals. Returns (B,)
    f32 scores on device, NaN for silent references.
    """
    from .pesq import _check_fs_mode
    _check_fs_mode(fs, mode)
    x, y = jnp.asarray(x), jnp.asarray(y)
    unbatched = x.ndim == 1
    if unbatched:
        x, y = x[None], y[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[-1], jnp.int32)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
    out = _pesq_device_jit(x, y, lengths, int(fs), str(mode))
    return out[0] if unbatched else out


DEVICE_METRICS['pesq'] = pesq_device
DEVICE_METRICS['pesq_approx'] = pesq_device
