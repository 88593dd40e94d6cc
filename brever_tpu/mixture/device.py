"""Batched on-device mixture synthesis (jit/vmap over the scene batch).

The reference synthesizes mixtures one at a time on the CPU with
``scipy.signal.oaconvolve`` (brever/mixture/mixture.py:25-47) — the
dataset-creation hot loop. Here the same scene algebra runs as a single
jitted program over a *batch* of scenes: FFT-based binaural
convolution, BRIR early/late splitting, synthetic decay tails, colored
noise via ``jax.random``, and the SNR/TMR/RMS gain stages — all static
shapes, vmapped over the batch.

Division of labor: the host rolls metadata (bit-compatible numpy
randomizers) and gathers raw material into padded arrays (speech,
BRIRs, noise segments + their lengths); the device turns them into
mixtures. This is the input pipeline used for on-device dynamic mixing
and large dataset synthesis.

Numerical parity with the numpy path is pinned by tests (same inputs ->
same mixture within float32 tolerance).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import eps


def fft_convolve(x, kernel, out_length):
    """Linear convolution via rFFT, truncated to ``out_length``.

    ``x``: (..., n); ``kernel``: (..., m); broadcasts leading dims.
    """
    n = x.shape[-1] + kernel.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()  # next power of two
    spec = jnp.fft.rfft(x, nfft) * jnp.fft.rfft(kernel, nfft)
    return jnp.fft.irfft(spec, nfft)[..., :out_length]


def spatialize(x, brir, out_length=None):
    """Binaural convolution: (n,) x (m, 2) -> (out, 2)."""
    out_length = x.shape[-1] if out_length is None else out_length
    out = fft_convolve(x[..., None, :], jnp.moveaxis(brir, -1, -2),
                       out_length)
    return jnp.moveaxis(out, -2, -1)


def split_brir(brir, brir_length, reflection_boundary=50e-3, fs=16e3,
               max_itd=1e-3):
    """Early/late split with ITD-consistent peaks (traced version of
    mixture.dsp.split_brir; ``brir_length`` masks zero padding)."""
    n = brir.shape[0]
    idx = jnp.arange(n)
    valid = (idx < brir_length)[:, None]
    mag = jnp.abs(brir) * valid
    peak_idx = jnp.argmax(mag, axis=0)
    peak_val = jnp.max(mag, axis=0)
    max_delay = round(max_itd * fs)

    strong = jnp.where(peak_val[0] > peak_val[1], 0, 1)
    weak = 1 - strong
    anchor = peak_idx[strong]
    # re-estimate the weak ear's peak within max_itd of the anchor
    window = (idx >= anchor) & (idx < anchor + max_delay)
    weak_mag = jnp.where(window, mag[:, weak], -1.0)
    weak_peak = jnp.argmax(weak_mag)
    peak_idx = jnp.where(
        jnp.arange(2) == weak, weak_peak, peak_idx)

    boundary = round(reflection_boundary * fs)
    early_win = (idx[:, None] < peak_idx[None, :] + boundary) \
        .astype(brir.dtype)
    return early_win * brir, (1 - early_win) * brir


def colored_noise(rng, color_alpha, n_samples):
    """Device colored noise with 1/f^alpha PSD (alpha traced scalar)."""
    freqs = jnp.arange(n_samples // 2 + 1) / n_samples
    shaping = freqs.at[0].set(freqs[1])**(-color_alpha / 2)
    white = jax.random.normal(rng, (n_samples,))
    spectrum = jnp.fft.rfft(white) * shaping
    return jnp.fft.irfft(spectrum, n_samples)


def decay_tail(rng, brir, brir_length, rt60, drr, delay, color_alpha, fs):
    """Append a decaying-colored-noise tail (traced BRIRDecay).

    The output buffer length is static (the padded BRIR length); the
    tail occupies ``2*(rt60+delay)*fs`` samples like the reference, so
    the caller must size the BRIR buffer (``max_brir`` in
    ``pack_scenes``) to at least that many samples or the tail is
    truncated.
    """
    n = brir.shape[0]
    idx = jnp.arange(n)
    valid = (idx < brir_length)[:, None]
    mag = jnp.abs(brir) * valid
    offset = jnp.min(jnp.argmax(mag, axis=0))
    i_start = jnp.round(delay * fs).astype(jnp.int32) + offset
    tail_end = jnp.round(2 * (rt60 + delay) * fs).astype(jnp.int32)

    t = jnp.maximum(idx - i_start, 0) / fs
    envelope = jnp.exp(-t / jnp.maximum(rt60, 1e-6) * 3 * jnp.log(10.0))
    noise = colored_noise(rng, color_alpha, n)
    window = ((idx >= i_start) & (idx < jnp.maximum(tail_end, brir_length))) \
        .astype(brir.dtype)
    tail = (envelope * noise * window)[:, None] * jnp.ones((1, 2))

    # scale the tail to the target direct-to-reverberant ratio
    e_brir = jnp.sum((brir * valid).mean(axis=1)**2)
    e_tail = jnp.sum(tail.mean(axis=1)**2)
    gain = jnp.sqrt(10**(-drr / 10) * e_brir / (e_tail + eps))
    no_decay = rt60 == 0
    return jnp.where(no_decay, brir, brir * valid + gain * tail)


def _masked_energy(x, length, start=0):
    idx = jnp.arange(x.shape[0])
    mask = ((idx >= start) & (idx < length)).astype(x.dtype)
    return jnp.sum((x.mean(axis=-1) * mask)**2)


def match_ltas(x, ltas, n_fft=512, hop_length=256):
    """STFT-domain EQ of ``x`` (samples, 2) to a target long-term
    average spectrum (traced version of dsp.match_ltas: same EQ math,
    plain Hann framing instead of scipy's boundary extension)."""
    n = x.shape[0]
    window = 0.5 * (1.0 - jnp.cos(
        2.0 * jnp.pi * jnp.arange(n_fft) / n_fft))
    pad_x = jnp.pad(x, ((n_fft // 2, n_fft), (0, 0)))
    n_frames = (pad_x.shape[0] - n_fft) // hop_length + 1
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = pad_x[idx] * window[None, :, None]       # (T, n_fft, 2)
    spec = jnp.fft.rfft(frames, axis=1)               # (T, F, 2)
    # scipy.signal.stft scales by 1/win.sum(); the target ltas (from
    # calc_ltas / dsp.match_ltas) lives in those units
    current = jnp.mean(jnp.abs(spec)**2, axis=(0, 2)) \
        / jnp.sum(window)**2
    eq = jnp.sqrt(ltas / jnp.maximum(current, eps))
    spec = spec * eq[None, :, None]
    frames = jnp.fft.irfft(spec, n_fft, axis=1) * window[None, :, None]
    # overlap-add with window-square normalization
    out = jnp.zeros_like(pad_x)
    norm = jnp.zeros((pad_x.shape[0],))
    out = out.at[idx].add(frames)
    norm = norm.at[idx].add(window[None, :]**2)
    out = out / jnp.maximum(norm, eps)[:, None]
    return out[n_fft // 2:n_fft // 2 + n]


def synthesize_scene(rng, speech, speech_length, target_brir,
                     target_brir_length, noises, noise_brirs,
                     noise_brir_lengths, noise_mask, snr, rms_jitter,
                     decay_params=None, fs=16000,
                     reflection_boundary=0.05, pad=0,
                     diffuse_brirs=None, diffuse_brir_lengths=None,
                     diffuse_mask=None, diffuse_color_alpha=None,
                     ltas=None, ndr=None, tmr=None, use_snr=True):
    """One scene: returns dict with mixture/foreground/background/....

    Shapes (all static): speech (n,), target_brir (m, 2), noises
    (k, n), noise_brirs (k, m, 2); ``noise_mask`` (k,) selects active
    noises; lengths mask zero padding. ``decay_params`` is an optional
    (rt60, drr, delay, color_alpha) tuple of traced scalars.

    Optional scene features (reference maker.py:112-124 order:
    diffuse -> ndr -> snr -> tmr -> rms):

    * diffuse field: one colored noise per room BRIR (``diffuse_brirs``
      (k2, m, 2) + ``diffuse_mask``), optionally EQ'd to ``ltas``;
    * ``ndr``: directional-to-diffuse ratio (scales the diffuse field);
    * ``snr``: foreground/background ratio over the speech-active
      region, realized by scaling the noise components only (reference
      dsp semantics);
    * ``tmr``: target-to-masker energy ratio in [0, 1], scaling the
      whole background (late speech + noises); applied instead of snr
      when the dataset rolls uniform tmr.
    """
    rng_decay, rng_noise_decay, rng_diffuse = jax.random.split(rng, 3)

    brir = target_brir
    if decay_params is not None:
        brir = decay_tail(rng_decay, brir, target_brir_length,
                          *decay_params, fs=fs)
        noise_keys = jax.random.split(
            rng_noise_decay, noise_brirs.shape[0])
        noise_brirs = jax.vmap(
            lambda key, b, n: decay_tail(key, b, n, *decay_params, fs=fs),
            in_axes=(0, 0, 0),
        )(noise_keys, noise_brirs, noise_brir_lengths)

    early_brir, late_brir = split_brir(
        brir,
        brir.shape[0] if decay_params is not None else target_brir_length,
        reflection_boundary, fs)

    n_out = speech.shape[0] + 2 * pad
    padded_speech = jnp.pad(speech, (pad, pad))
    early = spatialize(padded_speech, early_brir, n_out)
    late = spatialize(padded_speech, late_brir, n_out)
    if pad:
        early = jnp.pad(early, ((pad, pad), (0, 0)))[:n_out]
        late = jnp.pad(late, ((pad, pad), (0, 0)))[:n_out]

    # directional noises: convolve each and mask
    padded_noises = jnp.pad(noises, ((0, 0), (pad, pad)))[:, :n_out]
    spatialized = jax.vmap(lambda x, b: spatialize(x, b, n_out))(
        padded_noises, noise_brirs)
    dir_noise = (spatialized * noise_mask[:, None, None]).sum(axis=0)
    has_noise = noise_mask.sum() > 0

    # diffuse field: one colored noise per room BRIR, summed
    use_diffuse = diffuse_brirs is not None
    if use_diffuse:
        keys = jax.random.split(rng_diffuse, diffuse_brirs.shape[0])
        diff_noises = jax.vmap(
            lambda k: colored_noise(k, diffuse_color_alpha, n_out))(keys)
        diff_spat = jax.vmap(lambda x, b: spatialize(x, b, n_out))(
            diff_noises, diffuse_brirs)
        diffuse = (diff_spat * diffuse_mask[:, None, None]).sum(axis=0)
        if ltas is not None:
            diffuse = match_ltas(diffuse, ltas)
        has_diffuse = diffuse_mask.sum() > 0
    else:
        diffuse = jnp.zeros_like(dir_noise)
        has_diffuse = False

    # ndr: directional-to-diffuse ratio (reference dsp.Mixture.set_ndr
    # = adjust_snr(dir_noise, diffuse, ndr) over the full signal)
    if use_diffuse and ndr is not None:
        e_dir = _masked_energy(dir_noise, n_out)
        e_diff = _masked_energy(diffuse, n_out)
        g = jnp.sqrt(10**(-ndr / 10) * e_dir
                     / jnp.maximum(e_diff, eps))
        diffuse = jnp.where(has_noise & has_diffuse, g * diffuse,
                            diffuse)

    noise = dir_noise + diffuse
    speech_start = pad
    speech_end = pad + speech_length

    # target SNR over the speech active region: gain from fg/bg ratio,
    # applied to the noise components only (reference set_snr)
    if use_snr:
        e_fg = _masked_energy(early, speech_end, speech_start)
        e_bg = _masked_energy(late + noise, speech_end, speech_start)
        g = jnp.sqrt(10**(-snr / 10) * e_fg / jnp.maximum(e_bg, eps))
        apply = has_noise | has_diffuse
        dir_noise = jnp.where(apply, g * dir_noise, dir_noise)
        diffuse = jnp.where(apply, g * diffuse, diffuse)
        noise = dir_noise + diffuse

    # tmr: fg/(fg+bg) energy ratio over the full signal, realized by
    # scaling the whole background incl. late speech (reference
    # set_tmr + scale_background)
    if tmr is not None:
        e_fg_full = _masked_energy(early, n_out)
        e_bg_full = _masked_energy(late + noise, n_out)
        g = jnp.sqrt(e_fg_full * (1.0 / jnp.maximum(tmr, eps) - 1.0)
                     / jnp.maximum(e_bg_full, eps))
        late, dir_noise, diffuse = g * late, g * dir_noise, g * diffuse
        noise = dir_noise + diffuse

    mixture = early + late + noise

    # RMS jitter: reference does set_rms(get_rms() + jitter), i.e. a
    # plain 10^(jitter/20) gain on everything
    rms = jnp.sqrt(jnp.mean(mixture**2, axis=0)).max()
    rms_db = 20 * jnp.log10(rms + eps) + rms_jitter
    gain = 10**(rms_db / 20) / (rms + eps)
    early, late, noise = gain * early, gain * late, gain * noise
    mixture = early + late + noise

    return {
        'mixture': mixture,
        'foreground': early,
        'background': late + noise,
        'speech': early + late,
        'noise': noise,
    }


@partial(jax.jit, static_argnames=('fs', 'reflection_boundary', 'pad',
                                   'use_decay', 'use_diffuse',
                                   'use_ltas', 'use_ndr', 'use_tmr',
                                   'use_snr', 'use_device_noise',
                                   'brir_total_len'))
def synthesize_batch(rng, speech, speech_lengths, target_brirs,
                     target_brir_lengths, noises, noise_brirs,
                     noise_brir_lengths, noise_masks, snrs, rms_jitters,
                     decay_rt60=None, decay_drr=None, decay_delay=None,
                     decay_color_alpha=None,
                     diffuse_brirs=None, diffuse_brir_lengths=None,
                     diffuse_masks=None, diffuse_color_alpha=None,
                     ltas=None, ndrs=None, tmrs=None,
                     noise_color_alphas=None, noise_color_masks=None,
                     fs=16000,
                     reflection_boundary=0.05, pad=0, use_decay=False,
                     use_diffuse=False, use_ltas=False, use_ndr=False,
                     use_tmr=False, use_snr=True,
                     use_device_noise=False, brir_total_len=None):
    """Batched scene synthesis; every argument carries a leading batch
    axis (``ltas`` is shared: (n_fft//2+1,)). Returns a dict of
    (batch, samples, 2) arrays.

    Host-transfer minimizers (both optional, both measured against the
    first e2e TPU run where host noise synthesis was 152 ms/batch and
    the decay-padded BRIR buffers 6 MB/batch of h2d):

    * ``use_device_noise``: entries flagged in ``noise_color_masks``
      are synthesized ON DEVICE as 1/f^alpha noise
      (``noise_color_alphas``) instead of being read from ``noises``;
      pass ``noises=None`` when every noise is device-generated and
      the zero buffer is created in-graph (no transfer at all).
    * ``brir_total_len``: BRIR buffers arrive packed at their true
      data length and are zero-extended to this static total length
      IN-GRAPH (the decay tail writes into the extension), so the
      host never ships the mostly-zero decay headroom.
    """
    batch = speech.shape[0]
    keys = jax.random.split(rng, batch)
    zeros = jnp.zeros(batch)

    if brir_total_len is not None \
            and brir_total_len > target_brirs.shape[1]:
        grow = brir_total_len - target_brirs.shape[1]
        target_brirs = jnp.pad(
            target_brirs, ((0, 0), (0, grow), (0, 0)))
        noise_brirs = jnp.pad(
            noise_brirs, ((0, 0), (0, 0), (0, grow), (0, 0)))
        if diffuse_brirs is not None:
            diffuse_brirs = jnp.pad(
                diffuse_brirs, ((0, 0), (0, 0), (0, grow), (0, 0)))

    if use_device_noise:
        if noises is None:
            noises = jnp.zeros(
                (batch, noise_color_masks.shape[1], speech.shape[1]),
                speech.dtype)
        n_samples = noises.shape[-1]

        def gen_row(key, alphas, sp_len):
            ks = jax.random.split(
                jax.random.fold_in(key, 110), alphas.shape[0])
            nz = jax.vmap(
                lambda kk, a: colored_noise(kk, a, n_samples))(ks, alphas)
            return nz * (jnp.arange(n_samples)[None, :] < sp_len)

        gen = jax.vmap(gen_row)(keys, noise_color_alphas,
                                speech_lengths)
        noises = jnp.where(noise_color_masks[..., None] > 0, gen,
                           noises)

    if not use_decay:
        decay_rt60 = decay_drr = decay_delay = decay_color_alpha = zeros
    if not use_diffuse:
        diffuse_brirs = jnp.zeros(
            (batch, 1) + target_brirs.shape[1:], target_brirs.dtype)
        diffuse_brir_lengths = jnp.ones((batch, 1), jnp.int32)
        diffuse_masks = jnp.zeros((batch, 1))
        diffuse_color_alpha = zeros
    if ndrs is None or not use_ndr:
        ndrs = zeros
    if tmrs is None or not use_tmr:
        tmrs = zeros

    def one(key, sp, sp_len, tb, tb_len, nz, nb, nb_len, nm, snr, rj,
            rt60, drr, delay, alpha, db, db_len, dm, d_alpha, ndr, tmr):
        decay_params = (rt60, drr, delay, alpha) if use_decay else None
        return synthesize_scene(
            key, sp, sp_len, tb, tb_len, nz, nb, nb_len, nm, snr, rj,
            decay_params=decay_params, fs=fs,
            reflection_boundary=reflection_boundary, pad=pad,
            diffuse_brirs=db if use_diffuse else None,
            diffuse_brir_lengths=db_len if use_diffuse else None,
            diffuse_mask=dm if use_diffuse else None,
            diffuse_color_alpha=d_alpha if use_diffuse else None,
            ltas=ltas if (use_diffuse and use_ltas) else None,
            ndr=ndr if use_ndr else None,
            tmr=tmr if use_tmr else None,
            use_snr=use_snr)

    return jax.vmap(
        one,
        in_axes=(0,) * 21,
    )(keys, speech, speech_lengths, target_brirs, target_brir_lengths,
      noises, noise_brirs, noise_brir_lengths, noise_masks, snrs,
      rms_jitters, decay_rt60, decay_drr, decay_delay,
      decay_color_alpha, diffuse_brirs, diffuse_brir_lengths,
      diffuse_masks, diffuse_color_alpha, ndrs, tmrs)


def pack_scenes(scenes, max_samples, max_brir, max_noises,
                max_diffuse=0):
    """Host helper: pad a list of scene dicts into the static arrays
    ``synthesize_batch`` consumes.

    Each scene: {'speech': (n,), 'target_brir': (m, 2),
    'noises': [(n_i,)...], 'noise_brirs': [(m_i, 2)...], 'snr': float,
    'rms_jitter': float, optional 'decay': (rt60, drr, delay, alpha),
    optional 'diffuse_brirs': [(m_i, 2)...] (+ 'diffuse_color_alpha'),
    optional 'ndr'/'tmr' floats}. ``max_diffuse`` > 0 adds the diffuse
    arrays.

    Optional 'noise_colors': list aligned with 'noises' where a
    non-None entry is the 1/f^alpha exponent of a noise to synthesize
    ON DEVICE (`synthesize_batch(use_device_noise=True)`); the
    corresponding 'noises' entry may be None (no host waveform). When
    any scene carries it, the packed dict gains
    ``noise_color_alphas``/``noise_color_masks``.
    """
    batch = len(scenes)
    speech = np.zeros((batch, max_samples), np.float32)
    speech_lengths = np.zeros(batch, np.int32)
    target_brirs = np.zeros((batch, max_brir, 2), np.float32)
    target_brir_lengths = np.zeros(batch, np.int32)
    noises = np.zeros((batch, max_noises, max_samples), np.float32)
    noise_brirs = np.zeros((batch, max_noises, max_brir, 2), np.float32)
    noise_brir_lengths = np.ones((batch, max_noises), np.int32)
    noise_masks = np.zeros((batch, max_noises), np.float32)
    snrs = np.zeros(batch, np.float32)
    rms_jitters = np.zeros(batch, np.float32)
    decay = np.zeros((batch, 4), np.float32)
    if max_diffuse:
        diffuse_brirs = np.zeros(
            (batch, max_diffuse, max_brir, 2), np.float32)
        diffuse_brir_lengths = np.ones((batch, max_diffuse), np.int32)
        diffuse_masks = np.zeros((batch, max_diffuse), np.float32)
        diffuse_color_alpha = np.zeros(batch, np.float32)
    ndrs = np.zeros(batch, np.float32)
    tmrs = np.full(batch, 0.5, np.float32)
    any_colors = any(
        c is not None
        for scene in scenes
        for c in scene.get('noise_colors', []))
    noise_color_alphas = np.zeros((batch, max_noises), np.float32)
    noise_color_masks = np.zeros((batch, max_noises), np.float32)

    for i, scene in enumerate(scenes):
        n = len(scene['speech'])
        speech[i, :n] = scene['speech']
        speech_lengths[i] = n
        m = len(scene['target_brir'])
        target_brirs[i, :m] = scene['target_brir']
        target_brir_lengths[i] = m
        colors = scene.get('noise_colors', [])
        for j, (noise, brir) in enumerate(
                zip(scene.get('noises', []),
                    scene.get('noise_brirs', []))):
            alpha = colors[j] if j < len(colors) else None
            if alpha is not None:
                noise_color_alphas[i, j] = alpha
                noise_color_masks[i, j] = 1.0
            else:
                k = min(len(noise), max_samples)
                noises[i, j, :k] = noise[:k]
            mb = len(brir)
            noise_brirs[i, j, :mb] = brir
            noise_brir_lengths[i, j] = mb
            noise_masks[i, j] = 1.0
        snrs[i] = scene.get('snr', 0.0)
        rms_jitters[i] = scene.get('rms_jitter', 0.0)
        if 'decay' in scene:
            decay[i] = scene['decay']
        ndrs[i] = scene.get('ndr', 0.0)
        tmrs[i] = scene.get('tmr', 0.5)
        if max_diffuse:
            for j, brir in enumerate(
                    scene.get('diffuse_brirs', [])[:max_diffuse]):
                mb = len(brir)
                diffuse_brirs[i, j, :mb] = brir
                diffuse_brir_lengths[i, j] = mb
                diffuse_masks[i, j] = 1.0
            diffuse_color_alpha[i] = scene.get('diffuse_color_alpha',
                                               0.0)

    out = dict(
        speech=speech, speech_lengths=speech_lengths,
        target_brirs=target_brirs,
        target_brir_lengths=target_brir_lengths,
        noises=noises, noise_brirs=noise_brirs,
        noise_brir_lengths=noise_brir_lengths, noise_masks=noise_masks,
        snrs=snrs, rms_jitters=rms_jitters,
        decay_rt60=decay[:, 0], decay_drr=decay[:, 1],
        decay_delay=decay[:, 2], decay_color_alpha=decay[:, 3],
        ndrs=ndrs, tmrs=tmrs,
    )
    if max_diffuse:
        out.update(
            diffuse_brirs=diffuse_brirs,
            diffuse_brir_lengths=diffuse_brir_lengths,
            diffuse_masks=diffuse_masks,
            diffuse_color_alpha=diffuse_color_alpha,
        )
    if any_colors:
        out.update(noise_color_alphas=noise_color_alphas,
                   noise_color_masks=noise_color_masks)
        if noise_color_masks.sum() == noise_masks.sum():
            # every active noise is device-generated: drop the zero
            # waveform buffer, synthesize_batch creates it in-graph
            out['noises'] = None
    return out
