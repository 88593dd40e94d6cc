"""PyTorch twins of the benchmarked architectures — baseline ONLY.

Fresh, minimal implementations of the same architectures the reference
trains (written from the papers and from ``brever_tpu``'s model
docstrings, NOT copied from the reference), so ``bench.py`` and
``PERF.md`` can report an audio-throughput ratio against the reference
PyTorch stack on the hardware available to it in this environment (the
host CPU).  Architectural identity is asserted by parameter-count
parity against the pinned JAX models in
``tests/test_torch_baselines.py``.

Usage::

    python benchmarks/torch_baselines.py [arch ...]

Measures one full train step (transform + forward + loss + backward +
Adam, matching each JAX model's criterion and grad clip) per
architecture at the same workload as ``bench_models.py`` and merges the
results into ``benchmarks/baseline_torch_cpu_all.json``.
"""

import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

EPS = float(np.finfo(np.float32).eps)
FS = 16000
SECONDS = 4
ARCH_BATCH = {'tfgridnet': 4, 'sgmsepm': 4}
DEFAULT_BATCH = 16


def _stft(x, n_fft, hop, window=None, win_length=None):
    """Batched complex STFT over the last axis; leading dims preserved."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    win = None
    if window == 'hann':
        win = torch.hann_window(win_length or n_fft)
    spec = torch.stft(flat, n_fft, hop_length=hop,
                      win_length=win_length or n_fft, window=win,
                      center=True, return_complex=True)
    return spec.reshape(*shape[:-1], *spec.shape[-2:])


def _mel_matrix(n_filters=64, n_fft=512, fs=FS):
    """Triangular mel filterbank (n_filters, n_fft//2 + 1)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0**(m / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fs / 2), n_filters + 2)
    freqs = mel_to_hz(mels)
    bins = np.linspace(0.0, fs / 2, n_bins)
    fb = np.zeros((n_filters, n_bins), np.float32)
    for i in range(n_filters):
        lo, mid, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (bins - lo) / max(mid - lo, 1e-9)
        down = (hi - bins) / max(hi - mid, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return torch.from_numpy(fb)


# ---------------------------------------------------------------------------
# ffnn: mel-feature MLP predicting an IRM (1,509,440 params)

class TorchFFNN(nn.Module):

    def __init__(self, mel_filters=64, stacks=5, hidden=(1024, 1024),
                 dropout=0.2):
        super().__init__()
        self.stacks = stacks
        self.register_buffer('mel', _mel_matrix(mel_filters))
        in_size = mel_filters * (stacks + 1)
        layers = []
        prev = in_size
        for h in hidden:
            layers += [nn.Linear(prev, h), nn.ReLU(), nn.Dropout(dropout)]
            prev = h
        layers += [nn.Linear(prev, mel_filters), nn.Sigmoid()]
        self.mlp = nn.Sequential(*layers)

    def _features(self, batch):
        spec = _stft(batch, 512, 256, 'hann')     # (B, 2, 2, 257, T)
        mix, fg = spec[:, 0], spec[:, 1]
        bg = mix - fg
        power = (mix.abs()**2).mean(dim=1)        # channel mean
        fbe = torch.einsum('mf,bft->bmt', self.mel, power)
        feats = torch.log(fbe + EPS)
        parts = [feats]
        for i in range(self.stacks):
            rolled = torch.roll(feats, i + 1, dims=-1)
            rolled = torch.cat([
                feats[..., :1].repeat(1, 1, i + 1), rolled[..., i + 1:],
            ], dim=-1)
            parts.append(rolled)
        feats = torch.cat(parts, dim=-2)          # (B, 384, T)
        fg_mel = torch.einsum(
            'mf,bft->bmt', self.mel, (fg.abs()**2).mean(dim=1))
        bg_mel = torch.einsum(
            'mf,bft->bmt', self.mel, (bg.abs()**2).mean(dim=1))
        irm = (1 + bg_mel / (fg_mel + EPS))**-0.5
        return feats, irm

    def loss(self, batch):
        feats, irm = self._features(batch)
        out = self.mlp(feats.transpose(-1, -2)).transpose(-1, -2)
        return ((out - irm)**2).sum(dim=-1).mean() / irm.shape[-1]


# ---------------------------------------------------------------------------
# dccrn: complex U-Net + complex LSTM bottleneck (3,671,053 params)

class _CConv(nn.Module):
    """Complex conv(-transpose): two real convs, Gauss combination."""

    def __init__(self, cin, cout, transpose=False):
        super().__init__()
        kw = dict(kernel_size=(5, 2), stride=(2, 1), padding=(2, 0))
        if transpose:
            conv = nn.ConvTranspose2d
            kw['output_padding'] = (1, 0)
        else:
            conv = nn.Conv2d
        self.re = conv(cin, cout, **kw)
        self.im = conv(cin, cout, **kw)

    def forward(self, xr, xi):
        return self.re(xr) - self.im(xi), self.re(xi) + self.im(xr)


class _CLSTM(nn.Module):
    """Complex LSTM layer: real/imag nets, Gauss combination."""

    def __init__(self, in_size, hidden):
        super().__init__()
        self.re = nn.LSTM(in_size, hidden, batch_first=True)
        self.im = nn.LSTM(in_size, hidden, batch_first=True)

    def forward(self, xr, xi):
        rr, _ = self.re(xr)
        ri = self.re(xi)[0]
        ir = self.im(xr)[0]
        ii = self.im(xi)[0]
        return rr - ii, ri + ir


class TorchDCCRN(nn.Module):

    def __init__(self, channels=(16, 32, 64, 128, 128, 128),
                 lstm_hidden=128, lstm_layers=2, n_fft=512, hop=128):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        self.enc = nn.ModuleList()
        self.enc_bn = nn.ModuleList()
        self.enc_act = nn.ModuleList()
        cin = 1
        freqs = n_fft // 2
        for ch in channels:
            self.enc.append(_CConv(cin, ch))
            self.enc_bn.append(nn.BatchNorm2d(2 * ch, eps=1e-5))
            self.enc_act.append(nn.PReLU())
            cin = ch
            freqs = (freqs + 4 - 5) // 2 + 1
        flat = channels[-1] * freqs
        self.lstms = nn.ModuleList([
            _CLSTM(flat if i == 0 else lstm_hidden, lstm_hidden)
            for i in range(lstm_layers)
        ])
        self.proj_re = nn.Linear(lstm_hidden, flat)
        self.proj_im = nn.Linear(lstm_hidden, flat)
        self.dec = nn.ModuleList()
        self.dec_bn = nn.ModuleList()
        self.dec_act = nn.ModuleList()
        for i in reversed(range(len(channels))):
            out_ch = 1 if i == 0 else channels[i - 1]
            self.dec.append(_CConv(2 * channels[i], out_ch, transpose=True))
            if i != 0:
                self.dec_bn.append(nn.BatchNorm2d(2 * out_ch, eps=1e-5))
                self.dec_act.append(nn.PReLU())

    def forward(self, spec_r, spec_i):
        # spec: (B, 1, F, T)
        hr, hi = spec_r, spec_i
        skips = []
        for conv, bn, act in zip(self.enc, self.enc_bn, self.enc_act):
            hr, hi = conv(hr, hi)
            h = act(bn(torch.cat([hr, hi], dim=1)))
            hr, hi = h.chunk(2, dim=1)
            skips.append((hr, hi))
        b, ch, fr, t = hr.shape
        seq_r = hr.permute(0, 3, 1, 2).reshape(b, t, ch * fr)
        seq_i = hi.permute(0, 3, 1, 2).reshape(b, t, ch * fr)
        for lstm in self.lstms:
            seq_r, seq_i = lstm(seq_r, seq_i)
        seq_r = self.proj_re(seq_r)
        seq_i = self.proj_im(seq_i)
        hr = seq_r.reshape(b, t, ch, fr).permute(0, 2, 3, 1)
        hi = seq_i.reshape(b, t, ch, fr).permute(0, 2, 3, 1)
        n = len(self.dec)
        for j, conv in enumerate(self.dec):
            sr, si = skips[n - 1 - j]
            hr, hi = conv(torch.cat([hr, sr], 1), torch.cat([hi, si], 1))
            if j != n - 1:
                h = self.dec_act[j](
                    self.dec_bn[j](torch.cat([hr, hi], dim=1)))
                hr, hi = h.chunk(2, dim=1)
        return hr, hi  # (B, 1, F, T) complex mask

    def loss(self, batch):
        mono = batch.mean(dim=2)                       # (B, 2, L)
        mix, clean = mono[:, 0], mono[:, 1]
        spec = _stft(mix, self.n_fft, self.hop, 'hann')[:, 1:, :]
        sr = spec.real[:, None]
        si = spec.imag[:, None]
        mr, mi = self.forward(sr, si)
        in_mag = torch.sqrt(sr**2 + si**2)
        in_phase = torch.atan2(si, sr)
        m_mag = torch.tanh(torch.sqrt(mr**2 + mi**2 + 1e-7))
        m_phase = torch.atan2(mi, mr + (mr == 0) * 1e-7)
        mag = in_mag * m_mag
        phase = in_phase + m_phase
        out = torch.complex(mag * torch.cos(phase), mag * torch.sin(phase))
        out = F.pad(out[:, 0], (0, 0, 1, 0))           # re-add DC bin
        wav = torch.istft(out, self.n_fft, hop_length=self.hop,
                          window=torch.hann_window(self.n_fft),
                          length=mix.shape[-1])
        num = (clean**2).sum(dim=-1)
        den = ((clean - wav)**2).sum(dim=-1) + EPS
        return (-10 * torch.log10(num / den + EPS)).mean()


# ---------------------------------------------------------------------------
# tfgridnet: alternating sub-band/full-band BLSTMs + attention
# (3,735,344 params)

class _GridAttnNorm(nn.Module):
    """Per-head PReLU + layer norm over (emb, freq) with per-(head,
    freq, emb) affine."""

    def __init__(self, n_head, emb, n_freqs, eps=1e-5):
        super().__init__()
        self.alpha = nn.Parameter(torch.full((n_head, 1, 1, 1), 0.25))
        self.gamma = nn.Parameter(torch.ones(n_head, 1, n_freqs, emb))
        self.beta = nn.Parameter(torch.zeros(n_head, 1, n_freqs, emb))
        self.eps = eps
        self.n_head, self.emb = n_head, emb

    def forward(self, x):
        # x: (B, T, F, H*E) -> (B, H, T, F, E)
        b, t, f, _ = x.shape
        x = x.reshape(b, t, f, self.n_head, self.emb).permute(0, 3, 1, 2, 4)
        x = torch.where(x >= 0, x, self.alpha * x)
        mean = x.mean(dim=(3, 4), keepdim=True)
        var = x.var(dim=(3, 4), keepdim=True, unbiased=False)
        return (x - mean) / torch.sqrt(var + self.eps) * self.gamma \
            + self.beta  # (B, H, T, F, E)


class _GridBlock(nn.Module):

    def __init__(self, emb=32, ks=4, n_freqs=129, hidden=128, n_head=4,
                 approx_qk=512, eps=1e-5):
        super().__init__()
        self.ks, self.emb, self.n_head = ks, emb, n_head
        self.intra_norm = nn.LayerNorm(emb, eps=eps)
        self.intra_rnn = nn.LSTM(ks * emb, hidden, batch_first=True,
                                 bidirectional=True)
        self.intra_linear = nn.Linear(2 * hidden, ks * emb)
        self.inter_norm = nn.LayerNorm(emb, eps=eps)
        self.inter_rnn = nn.LSTM(ks * emb, hidden, batch_first=True,
                                 bidirectional=True)
        self.inter_linear = nn.Linear(2 * hidden, ks * emb)
        e_qk = math.ceil(approx_qk / n_freqs)
        e_v = emb // n_head
        self.q = nn.Linear(emb, n_head * e_qk)
        self.k = nn.Linear(emb, n_head * e_qk)
        self.v = nn.Linear(emb, n_head * e_v)
        self.q_norm = _GridAttnNorm(n_head, e_qk, n_freqs, eps)
        self.k_norm = _GridAttnNorm(n_head, e_qk, n_freqs, eps)
        self.v_norm = _GridAttnNorm(n_head, e_v, n_freqs, eps)
        self.proj = nn.Linear(n_head * e_v, emb)
        self.prelu = nn.PReLU()
        self.out_gamma = nn.Parameter(torch.ones(1, 1, n_freqs, emb))
        self.out_beta = nn.Parameter(torch.zeros(1, 1, n_freqs, emb))
        self.eps = eps

    def forward(self, x):
        # x: (B, T, F, C)
        b, old_t, old_f, c = x.shape
        ks = self.ks
        pad_t, pad_f = -old_t % ks, -old_f % ks
        x = F.pad(x, (0, 0, 0, pad_f, 0, pad_t))
        t, f = old_t + pad_t, old_f + pad_f

        h = self.intra_norm(x).reshape(b * t, f // ks, ks * c)
        h = self.intra_linear(self.intra_rnn(h)[0])
        x = x + h.reshape(b, t, f, c)

        sw = x.transpose(1, 2)  # (B, F, T, C)
        h = self.inter_norm(sw).reshape(b * f, t // ks, ks * c)
        h = self.inter_linear(self.inter_rnn(h)[0])
        sw = sw + h.reshape(b, f, t, c)
        x = sw.transpose(1, 2)[:, :old_t, :old_f]

        q = self.q_norm(self.q(x))   # (B, H, T, F, E)
        k = self.k_norm(self.k(x))
        v = self.v_norm(self.v(x))

        def flat(z):
            bb, hh, tt, ff, ee = z.shape
            return z.reshape(bb * hh, tt, ff * ee)

        qf, kf, vf = flat(q), flat(k), flat(v)
        attn = torch.softmax(
            torch.einsum('bte,bse->bts', qf, kf) * qf.shape[-1]**-0.5,
            dim=-1)
        out = torch.einsum('bts,bse->bte', attn, vf)
        e_v = self.emb // self.n_head
        out = out.reshape(b, self.n_head, old_t, old_f, e_v)
        out = out.permute(0, 2, 3, 1, 4).reshape(b, old_t, old_f, -1)
        out = self.prelu(self.proj(out))
        mean = out.mean(dim=(2, 3), keepdim=True)
        var = out.var(dim=(2, 3), keepdim=True, unbiased=False)
        out = (out - mean) / torch.sqrt(var + self.eps) * self.out_gamma \
            + self.out_beta
        return x + out


class TorchTFGridNet(nn.Module):

    def __init__(self, n_fft=256, hop=128, n_layers=6, emb=32):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        n_freqs = n_fft // 2 + 1
        self.embed = nn.Conv2d(4, emb, 3, padding=1)
        self.embed_norm = nn.GroupNorm(1, emb, eps=1e-5)
        self.blocks = nn.ModuleList(
            [_GridBlock(emb=emb, n_freqs=n_freqs) for _ in range(n_layers)])
        self.deconv = nn.ConvTranspose2d(emb, 2, 3, padding=1)

    def loss(self, batch):
        inputs = batch[:, 0]                   # (B, 2, L)
        labels = batch[:, 1:].mean(dim=2)      # (B, 1, L) -> (B, L)
        labels = labels[:, 0]
        std = inputs.std(dim=(1, 2), keepdim=True).clamp_min(1e-8)
        x = inputs / std
        spec = _stft(x, self.n_fft, self.hop, 'hann')  # (B, 2, F, T)
        net_in = torch.cat([spec.real, spec.imag], dim=1)  # (B, 4, F, T)
        net_in = net_in.transpose(2, 3)        # (B, 4, T, F)
        h = self.embed_norm(self.embed(net_in))
        h = h.permute(0, 2, 3, 1)              # (B, T, F, C)
        for block in self.blocks:
            h = block(h)
        out = self.deconv(h.permute(0, 3, 1, 2))  # (B, 2, T, F)
        est = torch.complex(out[:, 0], out[:, 1]).transpose(1, 2)
        wav = torch.istft(est, self.n_fft, hop_length=self.hop,
                          window=torch.hann_window(self.n_fft),
                          length=inputs.shape[-1])
        wav = wav * std[:, 0]
        # multiresyu: 0.5 * time-domain L1 + 0.5 * STFT(512/256) mag L1
        t_l1 = (wav - labels).abs().sum(dim=-1)
        w_mag = _stft(wav, 512, 256).abs()
        l_mag = _stft(labels, 512, 256).abs()
        s_l1 = (w_mag - l_mag).abs().sum(dim=(-2, -1))
        return (0.5 * t_l1 + 0.5 * s_l1).mean()


# ---------------------------------------------------------------------------
# manner: multi-view attention U-Net over the waveform (21,253,921 params)

class _BasicConv1d(nn.Module):

    def __init__(self, cin, cout, kernel=1, stride=1, padding=0,
                 relu=True, bias=False):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, kernel, stride=stride,
                              padding=padding, bias=bias)
        self.bn = nn.BatchNorm1d(cout)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.relu else x


class _ResCon(nn.Module):
    """Residual Conformer block: PW-GLU -> depthwise -> PW, +shortcut."""

    def __init__(self, cin, growth1=2.0, growth2=2.0, kernel=31):
        super().__init__()
        out1 = int(cin * growth1)
        out2 = int(cin * growth2)
        self.pw1 = nn.Conv1d(cin, out1, 1, bias=True)
        self.pw1_bn = nn.BatchNorm1d(out1)
        self.dw = nn.Conv1d(cin, cin, kernel, padding=(kernel - 1) // 2,
                            groups=cin, bias=False)
        self.dw_bn = nn.BatchNorm1d(cin)
        self.pw2 = nn.Conv1d(cin, out2, 1, bias=True)
        self.pw2_bn = nn.BatchNorm1d(out2)
        self.out_conv = _BasicConv1d(out2, out2, relu=False)
        self.shortcut = _BasicConv1d(cin, out2, relu=False)

    def forward(self, x):
        h = self.pw1_bn(self.pw1(x))
        a, b = h.chunk(2, dim=1)
        h = a * torch.sigmoid(b)
        h = self.dw_bn(self.dw(h))
        h = h * torch.sigmoid(h)
        h = self.pw2_bn(self.pw2(h))
        h = h * torch.sigmoid(h)
        return F.relu(self.out_conv(h) + self.shortcut(x))


class _MVAttention(nn.Module):
    """Three-view attention: channel / global-chunk / local-chunk."""

    def __init__(self, channels, chunk=64):
        super().__init__()
        inter = channels // 3
        self.inter, self.chunk, self.hop = inter, chunk, chunk // 2
        self.in0 = _BasicConv1d(channels, inter)
        self.in1 = _BasicConv1d(channels, inter)
        self.in2 = _BasicConv1d(channels, inter)
        self.ch_fc1 = nn.Linear(inter, inter // 2)
        self.ch_fc2 = nn.Linear(inter // 2, inter)
        self.wq = nn.Linear(chunk, chunk, bias=False)
        self.wk = nn.Linear(chunk, chunk, bias=False)
        self.wv = nn.Linear(chunk, chunk, bias=False)
        self.fc = nn.Linear(chunk, chunk, bias=False)
        self.local_dw = nn.Conv1d(inter, inter, 31, padding=15,
                                  groups=inter, bias=False)
        self.local_bn = nn.BatchNorm1d(inter)
        self.gate_conv = _BasicConv1d(2, 1, kernel=7, padding=3, relu=False)
        self.out0 = _BasicConv1d(inter, inter, kernel=3, padding=1)
        self.out1 = _BasicConv1d(inter, inter, kernel=3, padding=1)
        self.out2 = _BasicConv1d(inter, inter, kernel=3, padding=1)
        self.merge = _BasicConv1d(3 * inter, channels, relu=False)
        self.short = _BasicConv1d(channels, channels, relu=False)
        self.gate_tanh = nn.Conv1d(channels, channels, 1)
        self.gate_sig = nn.Conv1d(channels, channels, 1)
        self.gate_out = nn.Conv1d(channels, channels, 1)

    def _chunks(self, x):
        # (B, C, T) -> (B, C, P, chunk), chunk zero-pad on both sides
        x = F.pad(x, (self.chunk, self.chunk))
        return x.unfold(-1, self.chunk, self.hop)

    def _unchunk(self, chunks, out_len):
        # (B, C, P, chunk) -> (B, C, T) overlap-add
        b, c, p, k = chunks.shape
        flat = chunks.permute(0, 1, 3, 2).reshape(b, c * k, p)
        total = (p - 1) * self.hop + k
        out = F.fold(flat, output_size=(1, total), kernel_size=(1, k),
                     stride=(1, self.hop))[:, :, 0]
        out = out[..., self.chunk:self.chunk + out_len]
        return out / (self.chunk / self.hop)

    def forward(self, x):
        # x: (B, C, T)
        t = x.shape[-1]
        x0, x1, x2 = self.in0(x), self.in1(x), self.in2(x)

        # channel attention (stats over time)
        def fc(v):
            return self.ch_fc2(F.relu(self.ch_fc1(v)))

        gate = torch.sigmoid(
            fc(x0.max(dim=-1).values) + fc(x0.mean(dim=-1)))
        x0 = x0 * gate[:, :, None]

        # global attention across chunks (tokens = chunks)
        c1 = self._chunks(x1)                 # (B, C, P, chunk)
        b, ci, p, k = c1.shape
        tok = c1.reshape(b * ci, p, k)
        q, kk, v = self.wq(tok), self.wk(tok), self.wv(tok)
        attn = torch.softmax(
            torch.einsum('bpd,bqd->bpq', q / k**0.5, kk), dim=-1)
        tok = self.fc(torch.einsum('bpq,bqd->bpd', attn, v))
        x1 = self._unchunk(tok.reshape(b, ci, p, k), t)

        # local attention inside chunks
        c2 = self._chunks(x2)                 # (B, C, P, chunk)
        h = c2.permute(0, 2, 1, 3).reshape(b * p, ci, k)
        h = self.local_bn(self.local_dw(h))
        h = h * torch.sigmoid(h)
        pooled = torch.stack(
            [h.max(dim=1).values, h.mean(dim=1)], dim=1)  # (B*P, 2, k)
        lgate = torch.sigmoid(self.gate_conv(pooled))     # (B*P, 1, k)
        c2 = c2 * lgate.reshape(b, p, 1, k).permute(0, 2, 1, 3)
        x2 = self._unchunk(c2, t)

        out = torch.cat([self.out0(x0), self.out1(x1), self.out2(x2)],
                        dim=1)
        out = self.merge(out)
        short = self.short(x)
        gated = torch.tanh(self.gate_tanh(out)) \
            * torch.sigmoid(self.gate_sig(out))
        return short + F.relu(self.gate_out(gated))


class TorchMANNER(nn.Module):

    def __init__(self, hidden=60, depth=4, kernel=8, stride=4,
                 segment_len=64, eps=1e-3):
        super().__init__()
        self.depth, self.kernel, self.stride, self.eps = \
            depth, kernel, stride, eps
        self.in_conv = nn.Conv1d(1, hidden, 3, padding=1)
        self.in_bn = nn.BatchNorm1d(hidden)
        enc_ch = [hidden * 2**i for i in range(depth)]      # 60..480
        self.enc_down = nn.ModuleList()
        self.enc_bn = nn.ModuleList()
        self.enc_rescon = nn.ModuleList()
        prev = hidden
        for layer, ch in enumerate(enc_ch):
            self.enc_down.append(nn.Conv1d(prev, ch, kernel, stride=stride))
            self.enc_bn.append(nn.BatchNorm1d(ch))
            self.enc_rescon.append(_ResCon(ch, 2.0, 2.0))
            prev = 2 * ch
        self.enc_attn = _MVAttention(2 * enc_ch[-1], segment_len)
        self.linear = nn.Linear(2 * enc_ch[-1], 2 * enc_ch[-1], bias=False)
        self.dec_rescon = nn.ModuleList()
        self.dec_up = nn.ModuleList()
        self.dec_bn = nn.ModuleList()
        for ch in reversed(enc_ch):                         # 480..60
            self.dec_rescon.append(_ResCon(2 * ch, 2.0, 0.5))
            self.dec_up.append(nn.ConvTranspose1d(ch, ch, kernel,
                                                  stride=stride))
            self.dec_bn.append(nn.BatchNorm1d(ch))
        self.dec_attn = _MVAttention(enc_ch[-1], segment_len)
        self.mask_tanh = nn.Conv1d(hidden, hidden, 1)
        self.mask_sig = nn.Conv1d(hidden, hidden, 1)
        self.mask_out = nn.Conv1d(hidden, hidden, 1)
        self.out_conv = nn.Conv1d(hidden, 1, 3, padding=1)

    def _padded_length(self, length):
        for _ in range(self.depth):
            length = math.ceil((length - self.kernel) / self.stride) + 1
            length = max(length, 1)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel
        return int(math.ceil(length))

    def forward(self, x):
        # x: (B, 1, L)
        std = x.float().mean(dim=1, keepdim=True).std(
            dim=-1, keepdim=True)
        x = x / (self.eps + std)
        length = x.shape[-1]
        x = F.pad(x, (0, self._padded_length(length) - length))
        h = F.relu(self.in_bn(self.in_conv(x)))
        enc_out = h
        skips = []
        for layer in range(self.depth):
            h = F.relu(self.enc_bn[layer](self.enc_down[layer](h)))
            h = self.enc_rescon[layer](h)
            if layer == self.depth - 1:
                h = self.enc_attn(h)
            skips.append(h)
        h = F.relu(self.linear(h.transpose(1, 2))).transpose(1, 2)
        for j in range(self.depth):
            layer = self.depth - 1 - j
            skip = skips.pop()
            h = h + skip[..., :h.shape[-1]]
            h = self.dec_rescon[j](h)
            h = F.relu(self.dec_bn[j](self.dec_up[j](h)))
            if layer == self.depth - 1:
                h = self.dec_attn(h)
        mask = torch.tanh(self.mask_tanh(h)) \
            * torch.sigmoid(self.mask_sig(h))
        mask = F.relu(self.mask_out(mask))
        out = self.out_conv(enc_out * mask)[..., :length]
        return std * out

    @staticmethod
    def _mrstft(x, y):
        sc_total, mag_total = 0.0, 0.0
        resolutions = [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]
        for fft, hop, win in resolutions:
            w = torch.hann_window(win)
            xs = torch.stft(x, fft, hop, win_length=win, window=w,
                            center=True, pad_mode='reflect',
                            return_complex=True)
            ys = torch.stft(y, fft, hop, win_length=win, window=w,
                            center=True, pad_mode='reflect',
                            return_complex=True)
            x_mag = torch.sqrt((xs.abs()**2).clamp_min(1e-7))
            y_mag = torch.sqrt((ys.abs()**2).clamp_min(1e-7))
            sc = torch.linalg.norm(y_mag - x_mag, dim=(-2, -1)) \
                / torch.linalg.norm(y_mag, dim=(-2, -1))
            mag = (y_mag.log() - x_mag.log()).abs().mean(dim=(-2, -1))
            sc_total = sc_total + sc
            mag_total = mag_total + mag
        n = len(resolutions)
        return 0.5 * sc_total / n + 0.5 * mag_total / n

    def loss(self, batch):
        mono = batch.mean(dim=2)                # (B, 2, L)
        mix, clean = mono[:, :1], mono[:, 1]
        noise = mix[:, 0] - clean
        est = self.forward(mix)[:, 0]
        noise_est = mix[:, 0] - est
        loss_c = (est - clean).abs().mean(dim=-1) + self._mrstft(est, clean)
        loss_n = (noise_est - noise).abs().mean(dim=-1) \
            + self._mrstft(noise_est, noise)
        e_c = (clean**2).sum(dim=-1)
        e_n = (noise**2).sum(dim=-1)
        a = e_c / (e_c + e_n + 2e-7)
        return (a * loss_c + (1 - a) * loss_n).mean()


# ---------------------------------------------------------------------------
# sgmsepm: score-based diffusion (NCSN++ M variant) in the compressed
# complex STFT domain

class _FIRResampler:
    """Parameterless FIR 2x resampler with a padding stack (odd-shape
    round-trip), matching brever_tpu.ops.resampling semantics."""

    def __init__(self, fir_kernel=(1, 3, 3, 1)):
        k = torch.tensor(fir_kernel, dtype=torch.float32)
        k2 = torch.outer(k, k)
        self.kernel = (k2 / k2.sum())[None, None]
        self.stack = []

    def down(self, x):
        b, c, h, w = x.shape
        ksize = self.kernel.shape[-1]
        pad = tuple(
            math.ceil(ksize / 2) - 1 if dim % 2 == 0
            else math.ceil((ksize + 1) / 2) - 1
            for dim in (h, w))
        out_pad = tuple(
            0 if (dim + 2 * p - ksize) % 2 == 0 else 1
            for dim, p in zip((h, w), pad))
        self.stack.append((pad, out_pad))
        out = F.conv2d(x.reshape(b * c, 1, h, w), self.kernel,
                       stride=2, padding=pad)
        return out.reshape(b, c, *out.shape[-2:])

    def up(self, x):
        b, c, h, w = x.shape
        ksize = self.kernel.shape[-1]
        if self.stack:
            pad, out_pad = self.stack.pop()
        else:
            pad, out_pad = ((ksize - 1) // 2,) * 2, (0, 0)
        out = F.conv_transpose2d(x.reshape(b * c, 1, h, w),
                                 self.kernel * 4, stride=2,
                                 padding=pad, output_padding=out_pad)
        return out.reshape(b, c, *out.shape[-2:])

    def __call__(self, x, up_or_down):
        return self.down(x) if up_or_down == 'down' else self.up(x)


class _GN(nn.Module):

    def __init__(self, channels, silu=False):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(channels))
        self.bias = nn.Parameter(torch.zeros(channels))
        self.groups = min(32, channels // 4)
        self.silu = silu

    def forward(self, x):
        x = F.group_norm(x, self.groups, self.weight, self.bias, eps=1e-6)
        return F.silu(x) if self.silu else x


class _UAttn(nn.Module):

    def __init__(self, ch):
        super().__init__()
        self.norm = _GN(ch)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.out = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        n = self.norm(x)

        def flat(z):
            return z.reshape(b, c, h * w).transpose(1, 2)

        q, k, v = flat(self.q(n)), flat(self.k(n)), flat(self.v(n))
        attn = torch.softmax(
            torch.einsum('bqc,bkc->bqk', q, k / c**0.5), dim=-1)
        o = torch.einsum('bqk,bkc->bqc', attn, v)
        o = o.transpose(1, 2).reshape(b, c, h, w)
        return x + self.out(o)


class _UBlock(nn.Module):

    def __init__(self, cin, cout, emb_ch, attention=False,
                 up_or_down='none', skip_scale=0.5**0.5):
        super().__init__()
        self.norm1 = _GN(cin, silu=True)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.linear = nn.Linear(emb_ch, cout)
        self.norm2 = _GN(cout, silu=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.skip = nn.Conv2d(cin, cout, 1) \
            if cin != cout or up_or_down != 'none' else None
        self.attn = _UAttn(cout) if attention else None
        self.up_or_down = up_or_down
        self.skip_scale = skip_scale

    def forward(self, x, emb, resampler=None):
        h = self.norm1(x)
        if resampler is not None:
            h = resampler(h, self.up_or_down)
            x = resampler(x, self.up_or_down)
        h = self.conv1(h)
        h = self.norm2(h + self.linear(emb)[:, :, None, None])
        h = self.conv2(h)
        if self.skip is not None:
            x = self.skip(x)
        x = self.skip_scale * (x + h)
        if self.attn is not None:
            x = self.skip_scale * self.attn(x)
        return x


class TorchSGMSEpM(nn.Module):
    """NCSN++ M variant (channel_mult 1,2,2,2; 1 block/res; bottleneck
    attention only; skip encoder/decoder), richter preconditioning and
    the richter-ouve SDE."""

    def __init__(self, base=128, channel_mult=(1, 2, 2, 2),
                 blocks_per_res=1, num_freqs=256, n_fft=512, hop=128):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        self.base = base
        emb_ch = base * 4
        noise_ch = base * 2
        self.register_buffer('fourier',
                             torch.randn(noise_ch // 2) * 16.0)
        self.emb1 = nn.Linear(noise_ch, emb_ch)
        self.emb2 = nn.Linear(emb_ch, emb_ch)
        num_res = len(channel_mult)
        channels = [base * m for m in channel_mult]
        self.num_res, self.channels = num_res, channels
        self.blocks_per_res = blocks_per_res

        self.input_conv = nn.Conv2d(4, base, 3, padding=1)
        self.enc = nn.ModuleDict()
        self.aux_down = nn.ModuleDict()
        for i in range(num_res):
            in_ch = base if i == 0 else channels[i - 1]
            has_resample = i != num_res - 1
            n_blocks = blocks_per_res + (1 if has_resample else 0)
            for b in range(n_blocks):
                is_down = has_resample and b == n_blocks - 1
                self.enc[f'{i}_{b}'] = _UBlock(
                    in_ch if b == 0 else channels[i], channels[i],
                    emb_ch, up_or_down='down' if is_down else 'none')
            if has_resample:
                self.aux_down[str(i)] = nn.Conv2d(4, channels[i], 1)
        self.bottleneck_1 = _UBlock(channels[-1], channels[-1], emb_ch,
                                    attention=True)
        self.bottleneck_2 = _UBlock(channels[-1], channels[-1], emb_ch)
        self.dec = nn.ModuleDict()
        self.aux_up_norm = nn.ModuleDict()
        self.aux_up_conv = nn.ModuleDict()
        # mirror the encoder's skip bookkeeping to size decoder blocks
        skip_channels = [base]
        for i in range(num_res):
            has_resample = i != num_res - 1
            n_blocks = blocks_per_res + (1 if has_resample else 0)
            skip_channels += [channels[i]] * n_blocks
        for i in reversed(range(num_res)):
            in_ch = channels[i] if i == num_res - 1 else channels[i + 1]
            if i != num_res - 1:
                self.dec[f'{i}_up'] = _UBlock(in_ch, in_ch, emb_ch,
                                              up_or_down='up')
            for b in range(blocks_per_res + 1):
                skip_ch = skip_channels.pop()
                self.dec[f'{i}_{b}'] = _UBlock(
                    skip_ch + (in_ch if b == 0 else channels[i]),
                    channels[i], emb_ch)
            self.aux_up_norm[str(i)] = _GN(channels[i], silu=True)
            self.aux_up_conv[str(i)] = nn.Conv2d(channels[i], 4, 3,
                                                 padding=1)
        self.output_conv = nn.Conv2d(4, 2, 1)

    def net(self, x, cnoise):
        # x: (B, 4, F, T)
        angles = 2 * math.pi * cnoise[:, None] * self.fourier[None, :]
        h = torch.cat([angles.sin(), angles.cos()], dim=-1)
        emb = F.silu(self.emb2(F.silu(self.emb1(h))))

        resampler = _FIRResampler()
        aux = x
        h = self.input_conv(x)
        skips = [h]
        for i in range(self.num_res):
            has_resample = i != self.num_res - 1
            n_blocks = self.blocks_per_res + (1 if has_resample else 0)
            for b in range(n_blocks):
                is_down = has_resample and b == n_blocks - 1
                h = self.enc[f'{i}_{b}'](
                    h, emb, resampler if is_down else None)
                if b != n_blocks - 1:
                    skips.append(h)
            if has_resample:
                aux = resampler.down(aux)
                h = h + self.aux_down[str(i)](aux)
            skips.append(h)

        h = self.bottleneck_1(h, emb)
        h = self.bottleneck_2(h, emb)

        out_aux = None
        for i in reversed(range(self.num_res)):
            if i != self.num_res - 1:
                h = self.dec[f'{i}_up'](h, emb, resampler)
            for b in range(self.blocks_per_res + 1):
                skip = skips.pop()
                h = self.dec[f'{i}_{b}'](
                    torch.cat([h, skip], dim=1), emb)
            if i != self.num_res - 1 and out_aux is not None:
                out_aux = resampler.up(out_aux)
            a = self.aux_up_conv[str(i)](self.aux_up_norm[str(i)](h))
            out_aux = a if out_aux is None else out_aux + a
        return self.output_conv(out_aux)

    # -- richter-ouve SDE + richter preconditioning ---------------------
    STIFF, SMIN, SMAX = 1.5, 0.05, 0.5

    def _sigma(self, t):
        ratio = self.SMAX / self.SMIN
        s = torch.exp(-self.STIFF * t)
        return self.SMIN * torch.sqrt(
            ((ratio**t / s)**2 - 1)
            / (1 + self.STIFF / math.log(ratio)))

    def loss(self, batch):
        mono = batch.mean(dim=2)                     # (B, 2, L)
        norm = mono[:, :1].abs().amax(dim=-1, keepdim=True).clamp_min(1e-10)
        mono = mono / norm
        spec = _stft(mono, self.n_fft, self.hop, 'hann')[..., :-1, :]
        spec = (spec.abs()**0.5) * torch.exp(1j * spec.angle()) * 0.15
        y, x0 = spec[:, :1], spec[:, 1:]
        b = x0.shape[0]
        t = torch.rand(b, 1, 1, 1) * 0.99 + 0.01
        sigma = self._sigma(t)
        scaling = torch.exp(-self.STIFF * t)
        n = sigma * torch.complex(torch.randn_like(x0.real),
                                  torch.randn_like(x0.real))
        x = x0 - y + n
        # richter preconditioning
        cin, cskip = scaling, 1.0
        cout = -scaling * sigma**2 / t
        cnoise = torch.log(t).reshape(-1)
        x_in = cin * x + y
        net_in = torch.cat([x_in[:, 0].real[:, None],
                            x_in[:, 0].imag[:, None],
                            y[:, 0].real[:, None],
                            y[:, 0].imag[:, None]], dim=1)
        out = self.net(net_in, cnoise)
        denoised = torch.complex(out[:, 0], out[:, 1])[:, None]
        d = cskip * x + cout * denoised
        weight = (1 / sigma**2).reshape(-1)
        err = (d - (x0 - y)).abs()**2
        per_item = err.sum(dim=-1).mean(dim=(1, 2)) / err.shape[-1]
        return (weight * per_item).mean()


# ---------------------------------------------------------------------------
# runner

def _count(model):
    return sum(p.numel() for p in model.parameters() if p.requires_grad)


BUILDERS = {
    'ffnn': (TorchFFNN, 1e-4, None),
    'dccrn': (TorchDCCRN, 1e-4, 5.0),
    'tfgridnet': (TorchTFGridNet, 1e-3, 1.0),
    'manner': (TorchMANNER, 1e-5, None),
    'sgmsepm': (TorchSGMSEpM, 1e-4, None),
}


class _ConvTasNetStep(nn.Module):
    """Adds the training objective (mono mixdown + SI-SNR) around the
    bare TorchConvTasNet forward."""

    def __init__(self):
        super().__init__()
        from torch_convtasnet import TorchConvTasNet
        self.net = TorchConvTasNet()

    def loss(self, batch):
        mono = batch.mean(dim=2)             # (B, 2, L)
        mix, clean = mono[:, 0], mono[:, 1]
        est = self.net(mix)[:, 0]
        est = est - est.mean(dim=-1, keepdim=True)
        ref = clean - clean.mean(dim=-1, keepdim=True)
        proj = (est * ref).sum(-1, keepdim=True) * ref \
            / (ref**2).sum(-1, keepdim=True)
        noise = est - proj
        ratio = (proj**2).sum(-1) / ((noise**2).sum(-1) + EPS)
        return (-10 * torch.log10(ratio + EPS)).mean()


def build(arch):
    if arch == 'convtasnet':
        return _ConvTasNetStep(), 1e-3, 5.0
    cls, lr, clip = BUILDERS[arch]
    return cls(), lr, clip


def measure(arch, max_steps=2, budget_s=300.0):
    torch.manual_seed(0)
    model, lr, clip = build(arch)
    batch_size = ARCH_BATCH.get(arch, DEFAULT_BATCH)
    batch = torch.randn(batch_size, 2, 2, SECONDS * FS)
    opt = torch.optim.Adam(model.parameters(), lr=lr)

    times = []
    for _ in range(max_steps):
        t0 = time.perf_counter()
        opt.zero_grad()
        loss = model.loss(batch)
        loss.backward()
        if clip:
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()
        times.append(time.perf_counter() - t0)
        if times[-1] > budget_s:
            break
    step_s = min(times)
    return {
        'arch': arch,
        'params': _count(model),
        'batch': batch_size,
        'seconds_per_item': SECONDS,
        'seconds_per_step': round(step_s, 2),
        'steps_per_sec': round(1.0 / step_s, 6),
        'audio_sec_per_sec': round(batch_size * SECONDS / step_s, 3),
        'n_steps_timed': len(times),
        'torch': torch.__version__,
        'threads': torch.get_num_threads(),
    }


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    out_path = os.path.join(here, 'baseline_torch_cpu_all.json')
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    archs = sys.argv[1:] or ['ffnn', 'dccrn', 'tfgridnet']
    for arch in archs:
        print(f'# measuring {arch}', file=sys.stderr, flush=True)
        r = measure(arch)
        results[arch] = r
        print(json.dumps(r), flush=True)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
