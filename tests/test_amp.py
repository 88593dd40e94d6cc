"""bf16 mixed-precision (amp) contracts.

The trainer's ``use_amp`` path casts params and the batch to bfloat16
inside the jitted loss (training.py).  STFT front-ends are complex64,
so without an explicit cast at the STFT->network boundary every
spectral model silently promotes its trunk back to float32 and amp
buys nothing (the bandwidth-bound models pay double HBM traffic).
These tests pin the boundary contract:

* the network trunk actually *runs* in bf16 when given bf16 params
  (dtype probe through ``module.apply``),
* the amp loss stays finite and close to the f32 loss,
* an end-to-end ``use_amp=True`` training run completes.

No reference counterpart (torch autocast handles this implicitly);
the contract matches brever/training.py:272 (``use_amp`` +
``GradScaler``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.models import ModelRegistry
from brever_tpu.models.base import param_dtype, sample_weighted_mean

from test_training import GOLDEN_KWARGS, make_trainer


def _bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _amp_loss(model, variables, batch, lengths, rng):
    cast_vars = dict(variables)
    cast_vars['params'] = _bf16(variables['params'])
    out = model.loss(cast_vars, _bf16(batch), lengths, rng, train=True)
    per_item = out[0] if isinstance(out, tuple) else out
    return sample_weighted_mean(per_item.astype(jnp.float32), lengths)


def _f32_loss(model, variables, batch, lengths, rng):
    out = model.loss(variables, batch, lengths, rng, train=True)
    per_item = out[0] if isinstance(out, tuple) else out
    return sample_weighted_mean(per_item.astype(jnp.float32), lengths)


# dccrn/tfgridnet/sgmsepm cost 35-60 s each on XLA-CPU: slow-suite
AMP_ARCHS = [
    'ffnn', 'convtasnet',
    pytest.param('dccrn', marks=pytest.mark.slow),
    pytest.param('tfgridnet', marks=pytest.mark.slow),
    pytest.param('sgmsepm', marks=pytest.mark.slow),
]


@pytest.mark.parametrize('arch', AMP_ARCHS)
def test_amp_loss_finite_and_close(arch):
    model = ModelRegistry.get(arch)(**GOLDEN_KWARGS[arch])
    variables = model.init_variables(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    x = np.random.RandomState(0).randn(2, 2, 2, 8192).astype('float32')
    batch = jnp.asarray(x)
    lengths = jnp.full((2,), 8192, dtype=jnp.int32)
    amp = float(jax.jit(
        lambda v, b: _amp_loss(model, v, b, lengths, rng)
    )(variables, batch))
    ref = float(jax.jit(
        lambda v, b: _f32_loss(model, v, b, lengths, rng)
    )(variables, batch))
    assert np.isfinite(amp)
    assert np.isfinite(ref)
    # bf16 trunk: ~3 significant digits propagated through the model
    assert amp == pytest.approx(ref, rel=0.1), (amp, ref)


@pytest.mark.slow
def test_tfgridnet_trunk_runs_bf16():
    model = ModelRegistry.get('tfgridnet')(**GOLDEN_KWARGS['tfgridnet'])
    variables = model.init_variables(jax.random.PRNGKey(0))
    cast_vars = {'params': _bf16(variables['params'])}
    assert param_dtype(cast_vars) == jnp.bfloat16
    x = jnp.zeros((1, 2, 4096))
    spec = model._to_input(x).astype(param_dtype(cast_vars))
    out = jax.eval_shape(
        lambda v, s: model.module.apply(v, s), cast_vars, spec)
    assert out.dtype == jnp.bfloat16


@pytest.mark.slow
def test_dccrn_trunk_runs_bf16():
    model = ModelRegistry.get('dccrn')(**GOLDEN_KWARGS['dccrn'])
    variables = model.init_variables(jax.random.PRNGKey(0))
    cast_vars = dict(variables)
    cast_vars['params'] = _bf16(variables['params'])
    spec = model._to_input(jnp.zeros((1, 4096))) \
        .astype(param_dtype(cast_vars))
    out = jax.eval_shape(
        lambda v, s: model.module.apply(v, s, train=False),
        cast_vars, spec)
    assert out.dtype == jnp.bfloat16


@pytest.mark.slow
def test_sgmse_trunk_runs_bf16():
    model = ModelRegistry.get('sgmsepm')(
        **{**GOLDEN_KWARGS['sgmsepm']})
    variables = model.init_variables(jax.random.PRNGKey(0))
    cast_vars = dict(variables)
    cast_vars['params'] = _bf16(variables['params'])
    n_freqs = model.stft.frame_length // 2
    net_in = jnp.zeros((1, n_freqs, 8, 4), jnp.bfloat16)
    cnoise = jnp.zeros((1,), jnp.bfloat16)
    out = jax.eval_shape(
        lambda v, x, c: model.module.apply(
            v, x, c, deterministic=True),
        cast_vars, net_in, cnoise)
    assert out.dtype == jnp.bfloat16


def test_amp_trainer_end_to_end(tmp_path):
    model = ModelRegistry.get('convtasnet')(**GOLDEN_KWARGS['convtasnet'])
    trainer = make_trainer(tmp_path, model, epochs=1, use_amp=True)
    trainer.run()
    assert all(
        np.isfinite(x) for x in trainer.loss_logger.train_loss
        if isinstance(x, float))
