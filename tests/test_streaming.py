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
