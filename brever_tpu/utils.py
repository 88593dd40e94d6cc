"""Small shared utilities (numpy/jnp helpers, console table).

Reference surface: brever/utils.py (pad, fft_freqs, pretty_table).
"""

import shutil

import numpy as np

eps = float(np.finfo(np.float32).eps)


def pad(x, n, axis=0, where='right'):
    """Zero-pad ``x`` with ``n`` zeros along ``axis``.

    ``where`` is one of ``'left'``, ``'right'`` or ``'both'``.
    Works on numpy and jax arrays (uses the array's own ``pad`` namespace).
    Reference: brever/utils.py:8-37.
    """
    widths = [(0, 0)] * x.ndim
    if where == 'left':
        widths[axis] = (n, 0)
    elif where == 'right':
        widths[axis] = (0, n)
    elif where == 'both':
        widths[axis] = (n, n)
    else:
        raise ValueError(f'where must be left, right or both, got {where}')
    xp = _array_namespace(x)
    return xp.pad(x, widths)


def _array_namespace(x):
    # jax arrays pad with jnp, everything else with numpy
    mod = type(x).__module__
    if mod.startswith('jax'):
        import jax.numpy as jnp
        return jnp
    return np


def fft_freqs(fs=16e3, n_fft=512, onesided=True):
    """FFT bin center frequencies.

    One-sided output matches ``np.fft.rfft`` bin frequencies; two-sided
    matches ``np.fft.fft`` (with negative frequencies in the upper half).
    Reference: brever/utils.py:40-66.
    """
    freqs = np.arange(n_fft) * fs / n_fft
    above_nyquist = freqs > fs / 2
    if onesided:
        return freqs[~above_nyquist]
    freqs[above_nyquist] -= fs
    return freqs


def pretty_table(dict_, key_header='', order_by=None, reverse=False,
                 float_round=None):
    """Render a dict-of-dicts as an aligned console table.

    Behaves like the reference renderer (brever/utils.py:69-143): the outer
    keys form the first column, the inner keys the remaining columns; long
    tables wrap into column groups that fit the terminal width.
    """
    if not dict_:
        raise ValueError('input is empty')

    if float_round is not None:
        dict_ = {
            k: {sk: round(sv, float_round) if isinstance(sv, float) else sv
                for sk, sv in v.items()}
            for k, v in dict_.items()
        }

    sub_keys = None
    for value in dict_.values():
        if sub_keys is None:
            sub_keys = list(value.keys())
        elif list(value.keys()) != sub_keys:
            raise ValueError('values in input do not all have same keys')

    widths = [max(len(key_header), max(len(str(k)) for k in dict_))]
    for sk in sub_keys:
        widths.append(
            max(len(str(sk)), max(len(str(v[sk])) for v in dict_.values()))
        )

    if order_by is None:
        rows = list(dict_.items())
    else:
        cast = float
        for v in dict_.values():
            try:
                float(v[order_by])
            except (ValueError, TypeError):
                cast = str
                break
        rows = sorted(dict_.items(), key=lambda kv: cast(kv[1][order_by]),
                      reverse=reverse)

    header = ' '.join(f'{str(h):<{w}} ' for h, w in
                      zip([key_header] + sub_keys, widths))
    rule = ' '.join(f'{"-" * w} ' for w in widths)
    lines = [header, rule]
    for key, items in rows:
        cells = [key] + [items[sk] for sk in sub_keys]
        lines.append(' '.join(f'{str(c):>{w}} ' for c, w in
                              zip(cells, widths)))

    # wrap into groups of columns that fit the console
    console_width = shutil.get_terminal_size().columns
    first_width = widths[0] + 2
    col_idx = 1
    while len(lines[0]) > first_width:
        for i, line in enumerate(lines):
            end, j = first_width, col_idx
            while j < len(widths) and end + widths[j] + 2 <= console_width:
                end += widths[j] + 2
                j += 1
            print(line[:end])
            lines[i] = line[:first_width] + line[end:]
        col_idx = j
        print('')


class MathDict(dict):
    """A dict supporting elementwise arithmetic, for running loss means.

    Reference: the trainer keeps per-key running means of loss dicts
    (brever/training.py:343-353).
    """

    def _binary(self, other, op):
        if isinstance(other, dict):
            return MathDict({k: op(v, other[k]) for k, v in self.items()})
        return MathDict({k: op(v, other) for k, v in self.items()})

    def __add__(self, other):
        return self._binary(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._binary(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._binary(other, lambda a, b: a * b)

    def __truediv__(self, other):
        return self._binary(other, lambda a, b: a / b)

    __radd__ = __add__
    __rmul__ = __mul__
