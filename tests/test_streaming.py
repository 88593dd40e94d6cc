"""Streaming (chunked, stateful) inference vs the offline forward.

The streaming pipeline's zero input tail is equivalent to running the
offline causal model on the input left-padded with
``filter_length - stride`` zeros (8 samples at the default geometry):
the streamed samples must match that offline output exactly up to
float reassociation in the cumulative-norm statistics.
"""

import jax
import numpy as np
import pytest

from brever_tpu.models import ModelRegistry
from brever_tpu.streaming import StreamingEnhancer


def _make(causal=True, **kw):
    kwargs = dict(filters=32, filter_length=16, bottleneck_channels=16,
                  hidden_channels=32, skip_channels=16, layers=3,
                  repeats=2, causal=causal)
    kwargs.update(kw)
    model = ModelRegistry.get('convtasnet')(**kwargs)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def test_streaming_matches_offline():
    model, variables = _make()
    mod = model.module
    pad = mod.filter_length - mod.filter_length // 2
    chunk = 512
    n_chunks = 6
    length = chunk * n_chunks
    x = np.random.RandomState(0).randn(2, length).astype('float32')

    enhancer = StreamingEnhancer(model, variables, chunk_samples=chunk)
    state = enhancer.init_state(batch_size=2)
    outs = []
    for i in range(n_chunks):
        state, out = enhancer.step(state, x[:, i * chunk:(i + 1) * chunk])
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, axis=-1)
    assert streamed.shape == (2, length)

    x_padded = np.concatenate(
        [np.zeros((2, pad), 'float32'), x], axis=-1)
    offline = np.asarray(model.enhance(variables, x_padded[:, None]))
    np.testing.assert_allclose(streamed, offline[:, :length],
                               atol=2e-5, rtol=1e-4)


def test_streaming_state_is_fixed_shape():
    model, variables = _make()
    enhancer = StreamingEnhancer(model, variables, chunk_samples=256)
    state = enhancer.init_state(batch_size=1)
    shapes0 = jax.tree.map(lambda a: a.shape, state)
    x = np.random.RandomState(1).randn(1, 256).astype('float32')
    state, out = enhancer.step(state, x)
    assert out.shape == (1, 256)
    assert jax.tree.map(lambda a: a.shape, state) == shapes0


def test_streaming_rejects_noncausal():
    model, variables = _make(causal=False)
    with pytest.raises(ValueError):
        StreamingEnhancer(model, variables, chunk_samples=256)


def test_streaming_rejects_misaligned_chunk():
    model, variables = _make()
    with pytest.raises(ValueError):
        StreamingEnhancer(model, variables, chunk_samples=100)


def _make_dccrn(**kw):
    kwargs = dict(channels=[4, 8], lstm_channels=16, lstm_layers=1)
    kwargs.update(kw)
    model = ModelRegistry.get('dccrn')(**kwargs)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


@pytest.mark.parametrize('lstm_layers', [1, 2])
def test_streaming_dccrn_matches_offline(lstm_layers):
    """Streamed DCCRN == offline forward on the left-padded input,
    delayed by frame//2 output samples (the center-trim of the iSTFT):
    streamed[n + frame//2] == offline(pad_left(x, tail - frame//2))[n].
    """
    from brever_tpu.streaming import StreamingDCCRN

    model, variables = _make_dccrn(channels=[4, 8, 8],
                                   lstm_layers=lstm_layers)
    hop = model.stft.hop_length
    frame = model.stft.frame_length
    chunk, n_chunks = 1024, 4
    length = chunk * n_chunks
    x = np.random.RandomState(0).randn(1, length).astype('float32')

    se = StreamingDCCRN(model, variables, chunk_samples=chunk)
    pad = se.tail_len - frame // 2
    state = se.init_state(1)
    outs = []
    for i in range(n_chunks):
        state, out = se.step(state, x[:, i * chunk:(i + 1) * chunk])
        assert out.shape == (1, chunk)
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, -1)

    xp = np.concatenate([np.zeros((1, pad), 'float32'), x], -1)
    offline = np.asarray(model.enhance(variables, xp[:, None]))
    half = frame // 2
    n = length - half
    np.testing.assert_allclose(streamed[:, half:], offline[:, :n],
                               atol=1e-5, rtol=1e-4)


def test_streaming_dccrn_state_fixed_shape():
    from brever_tpu.streaming import StreamingDCCRN

    model, variables = _make_dccrn()
    se = StreamingDCCRN(model, variables, chunk_samples=512)
    state = se.init_state(batch_size=2)
    shapes0 = jax.tree.map(lambda a: a.shape, state)
    x = np.random.RandomState(1).randn(2, 512).astype('float32')
    state, out = se.step(state, x)
    assert out.shape == (2, 512)
    assert jax.tree.map(lambda a: a.shape, state) == shapes0


def test_streaming_dccrn_rejects_misaligned_chunk():
    from brever_tpu.streaming import StreamingDCCRN

    model, variables = _make_dccrn()
    with pytest.raises(ValueError):
        StreamingDCCRN(model, variables, chunk_samples=100)
