"""PyTorch Conv-TasNet used only as the benchmark baseline.

A fresh, minimal implementation of the same architecture the reference
trains (Luo & Mesgarani 2019; same hyperparameters as
brever/models/convtasnet defaults) so `bench.py` can compare our JAX
TPU step rate against a torch step on the hardware available to the
reference stack in this environment (CPU).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _Block(nn.Module):
    def __init__(self, bn=128, hidden=512, skip=128, kernel=3, dilation=1,
                 last=False):
        super().__init__()
        self.inp = nn.Conv1d(bn, hidden, 1)
        self.act1 = nn.PReLU()
        self.norm1 = nn.GroupNorm(1, hidden, eps=1e-8)
        self.pad = (kernel - 1) * dilation // 2
        self.dw = nn.Conv1d(hidden, hidden, kernel, dilation=dilation,
                            groups=hidden, padding=self.pad)
        self.act2 = nn.PReLU()
        self.norm2 = nn.GroupNorm(1, hidden, eps=1e-8)
        self.res = None if last else nn.Conv1d(hidden, bn, 1)
        self.skip = nn.Conv1d(hidden, skip, 1)

    def forward(self, x):
        h = self.norm1(self.act1(self.inp(x)))
        h = self.norm2(self.act2(self.dw(h)))
        res = None if self.res is None else x + self.res(h)
        return res, self.skip(h)


class TorchConvTasNet(nn.Module):
    def __init__(self, filters=512, filter_length=32, bn=128, hidden=512,
                 skip=128, kernel=3, layers=8, repeats=3, sources=1):
        super().__init__()
        stride = filter_length // 2
        self.encoder = nn.Conv1d(1, filters, filter_length, stride=stride,
                                 bias=False)
        self.decoder = nn.ConvTranspose1d(filters, 1, filter_length,
                                          stride=stride, bias=False)
        self.norm = nn.GroupNorm(1, filters, eps=1e-8)
        self.bottleneck = nn.Conv1d(filters, bn, 1)
        self.blocks = nn.ModuleList([
            _Block(bn, hidden, skip, kernel, 2**i,
                   last=(r == repeats - 1 and i == layers - 1))
            for r in range(repeats) for i in range(layers)
        ])
        self.act = nn.PReLU()
        self.mask = nn.Conv1d(skip, filters * sources, 1)
        self.sources = sources
        self.filters = filters

    def forward(self, x):
        n = x.shape[-1]
        encoded = self.encoder(x.unsqueeze(1))
        h = self.bottleneck(self.norm(encoded))
        skip_sum = 0
        for block in self.blocks:
            h, skip = block(h)
            skip_sum = skip_sum + skip
        masks = torch.sigmoid(self.mask(self.act(skip_sum)))
        b, _, t = masks.shape
        masks = masks.view(b, self.sources, self.filters, t)
        out = (encoded.unsqueeze(1) * masks).view(
            b * self.sources, self.filters, t)
        out = self.decoder(out).view(b, self.sources, -1)
        return F.pad(out, (0, max(0, n - out.shape[-1])))[..., :n]
