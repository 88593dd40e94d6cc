"""Mixture-synthesis DSP primitives and the Mixture container.

Host-side numpy implementation used by dataset creation and dynamic
mixing workers (behavioral reference: brever/mixture/mixture.py:7-416).
A batched on-device JAX variant lives in ``mixture.device`` for the
in-pipeline synthesis path.
"""

import numpy as np
import scipy.signal

from ..utils import fft_freqs, pad

NOISE_COLORS = {
    'brown': 2,
    'pink': 1,
    'white': 0,
    'blue': -1,
    'violet': -2,
}


def rms(x, axis=0):
    """Root mean square along ``axis``."""
    return np.sqrt(np.mean(x**2, axis=axis))


def spatialize(x, brir):
    """Convolve a mono signal with a binaural IR, truncated to input length.

    ``x``: ``(n,)``; ``brir``: ``(m, 2)``; returns ``(n, 2)``.
    """
    n = len(x)
    out = np.empty((n, 2))
    for ch in range(2):
        out[:, ch] = scipy.signal.oaconvolve(x, brir[:, ch], mode='full')[:n]
    return out


def colored_noise(color, n_samples, seed=None):
    """Noise with ``1/f**alpha`` PSD (brown/pink/white/blue/violet)."""
    try:
        alpha = NOISE_COLORS[color]
    except KeyError:
        raise ValueError(
            f'color must be one of {sorted(NOISE_COLORS)}, got {color}'
        ) from None
    shaping = fft_freqs(fs=1, n_fft=n_samples)
    shaping[0] = shaping[1]  # avoid division by zero at DC
    shaping **= -alpha / 2
    white = np.random.RandomState(seed).randn(n_samples)
    spectrum = np.fft.rfft(white) * shaping
    return np.fft.irfft(spectrum, n_samples).real


def match_ltas(x, ltas, n_fft=512, hop_length=256):
    """EQ a signal in the STFT domain to a target long-term spectrum."""
    flat_input = x.ndim == 1
    if flat_input:
        x = x[:, None]
    n = len(x)
    noverlap = n_fft - hop_length
    _, _, spec = scipy.signal.stft(x, nperseg=n_fft, noverlap=noverlap,
                                   axis=0)
    current = np.mean(np.abs(spec**2), axis=(1, 2))
    eq = np.sqrt(ltas / current)
    spec *= eq[:, None, None]
    _, y = scipy.signal.istft(spec, nperseg=n_fft, noverlap=noverlap,
                              freq_axis=0)
    y = y.T[:n]
    return y.ravel() if flat_input else y


def split_brir(brir, reflection_boundary=50e-3, fs=16e3, max_itd=1e-3):
    """Split a BRIR into early/late parts at the reflection boundary.

    The impulse peak of the weaker ear is re-estimated within ``max_itd``
    of the stronger ear's peak so both windows are ITD-consistent.
    """
    peak_idx = np.argmax(np.abs(brir), axis=0)
    peak_val = np.max(np.abs(brir), axis=0)
    max_delay = round(max_itd * fs)
    strong = int(peak_val[0] <= peak_val[1])  # 0 if left stronger
    weak = 1 - strong
    search = np.abs(
        brir[peak_idx[strong]:peak_idx[strong] + max_delay, weak])
    peak_idx[weak] = peak_idx[strong] + np.argmax(search)

    boundary = round(reflection_boundary * fs)
    early_win = np.zeros(brir.shape)
    early_win[:peak_idx[0] + boundary, 0] = 1
    early_win[:peak_idx[1] + boundary, 1] = 1
    return early_win * brir, (1 - early_win) * brir


def adjust_snr(signal, noise, snr, slice_=None):
    """Scale ``noise`` so the channel-mean SNR against ``signal`` is
    ``snr`` dB (optionally measured over ``slice_``)."""
    if slice_ is None:
        slice_ = np.s_[:]
    energy_signal = np.sum(signal[slice_].mean(axis=1)**2)
    energy_noise = np.sum(noise[slice_].mean(axis=1)**2)
    if energy_signal == 0:
        raise ValueError('cannot scale noise signal if target signal is 0')
    if energy_noise == 0:
        raise ValueError('cannot scale noise signal if it equals 0')
    gain = np.sqrt(10**(-snr / 10) * energy_signal / energy_noise)
    return gain * noise, gain


def adjust_rms(signal, rms_dB):
    """Scale a signal so its loudest channel has the requested RMS in
    dB re 1."""
    gain = 10**(rms_dB / 20) / rms(signal).max()
    return gain * signal, gain


class Mixture:
    """Composable noisy/reverberant scene.

    Components: ``early_speech``/``late_speech`` (split reverberant
    target), ``dir_noise`` (sum of directional noises), ``diffuse``.
    Derived views: ``speech``, ``noise``, ``mixture``,
    ``foreground`` (= early speech), ``background`` (= late + noise).
    """

    def __init__(self):
        self.early_speech = None
        self.late_speech = None
        self.dir_noise = None
        self.diffuse = None
        self.speech_idx = None

    @property
    def mixture(self):
        return self.speech + self.noise

    @property
    def speech(self):
        return self.early_speech + self.late_speech

    @property
    def noise(self):
        out = np.zeros(self.shape)
        for component in (self.dir_noise, self.diffuse):
            if component is not None:
                out += component
        return out

    @property
    def foreground(self):
        return self.early_speech

    @property
    def background(self):
        return self.late_speech + self.noise

    @property
    def shape(self):
        return self.early_speech.shape

    def __len__(self):
        return len(self.early_speech)

    def add_speech(self, x, brir, reflection_boundary, padding, fs):
        brir_early, brir_late = split_brir(brir, reflection_boundary, fs)
        n_pad = round(padding * fs)
        self.speech_idx = (n_pad, n_pad + len(x))
        x = pad(x, n_pad, where='both')
        self.early_speech = pad(spatialize(x, brir_early), n_pad,
                                where='both')
        self.late_speech = pad(spatialize(x, brir_late), n_pad,
                               where='both')

    def add_noises(self, xs, brirs):
        if len(xs) != len(brirs):
            raise ValueError('xs and brirs must have same number of elements')
        if not xs:
            raise ValueError('xs and brirs cannot be empty')
        self.dir_noise = np.zeros(self.shape)
        for x, brir in zip(xs, brirs):
            self.dir_noise += spatialize(x, brir)

    def add_diffuse_noise(self, brirs, color, ltas=None):
        if not brirs:
            raise ValueError('brirs cannot be empty')
        self.diffuse = np.zeros(self.shape)
        for brir in brirs:
            self.diffuse += spatialize(colored_noise(color, len(self)), brir)
        if ltas is not None:
            self.diffuse = match_ltas(self.diffuse, ltas)

    def set_ndr(self, ndr):
        """Directional-to-diffuse noise ratio."""
        self.diffuse, _ = adjust_snr(self.dir_noise, self.diffuse, ndr)

    def set_snr(self, snr):
        """Foreground-to-background SNR over the speech active region."""
        _, gain = adjust_snr(
            self.foreground, self.background, snr, slice(*self.speech_idx)
        )
        if self.dir_noise is not None:
            self.dir_noise *= gain
        if self.diffuse is not None:
            self.diffuse *= gain

    def set_tmr(self, tmr):
        """Target-to-masker energy ratio in [0, 1]."""
        target_energy = np.sum(self.foreground.mean(axis=1)**2)
        new_masker = target_energy * (1 / tmr - 1)
        old_masker = np.sum(self.background.mean(axis=1)**2)
        self.scale_background(np.sqrt(new_masker / old_masker))

    def set_rms(self, rms_dB):
        _, gain = adjust_rms(self.mixture, rms_dB)
        self.early_speech *= gain
        self.late_speech *= gain
        if self.dir_noise is not None:
            self.dir_noise *= gain
        if self.diffuse is not None:
            self.diffuse *= gain

    def get_rms(self):
        return 20 * np.log10(rms(self.mixture).max())

    def get_long_term_label(self, label='tmr'):
        target = self.early_speech
        maskers = {
            'tmr': lambda: self.late_speech + self.noise,
            'tnr': lambda: self.noise,
            'trr': lambda: self.late_speech,
        }
        if label not in maskers:
            raise ValueError(f'label must be tmr, tnr or trr, got {label}')
        masker = maskers[label]()
        slice_ = slice(*self.speech_idx)
        e_target = np.sum(target[slice_].mean(axis=-1)**2)
        e_masker = np.sum(masker[slice_].mean(axis=-1)**2)
        return e_target / (e_target + e_masker)

    def scale_background(self, gain):
        self.late_speech = gain * self.late_speech
        if self.dir_noise is not None:
            self.dir_noise = gain * self.dir_noise
        if self.diffuse is not None:
            self.diffuse = gain * self.diffuse

    def transform(self, func):
        for name in ('early_speech', 'late_speech', 'dir_noise', 'diffuse'):
            value = getattr(self, name)
            if value is not None:
                setattr(self, name, func(value))


class BRIRDecay:
    """Append a synthetic exponentially-decaying noise tail to a BRIR.

    Tail length ``2*(rt60+delay)*fs``, starting ``delay`` after the
    direct-path peak, scaled to the target direct-to-reverberant ratio.
    """

    def __init__(self, rt60, drr, delay, color, fs):
        self.rt60 = rt60
        self.drr = drr
        self.delay = delay
        self.color = color
        self.fs = fs

    def __call__(self, brir, seed=None):
        if self.rt60 == 0:
            return brir
        n = max(int(round(2 * (self.rt60 + self.delay) * self.fs)),
                len(brir))
        offset = min(np.argmax(np.abs(brir), axis=0))
        i_start = int(round(self.delay * self.fs)) + offset
        padded = np.zeros((n, 2))
        padded[:len(brir)] = brir
        t = np.arange(n - i_start).reshape(-1, 1) / self.fs
        noise = colored_noise(self.color, n - i_start, seed).reshape(-1, 1)
        tail = np.zeros((n, 2))
        tail[i_start:] = np.exp(-t / self.rt60 * 3 * np.log(10)) * noise
        tail, _ = adjust_snr(padded, tail, self.drr)
        return padded + tail
