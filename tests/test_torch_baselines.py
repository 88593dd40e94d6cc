"""The torch baseline models must be the same architectures as the
pinned JAX models (parameter-count parity), or the benchmark's
vs-baseline ratios compare different networks.

Pins mirror tests/test_training.py (which asserts the same counts on
the JAX side against the reference's pinned geometry).
"""

import os
import sys

import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'benchmarks'))


def _count(model):
    return sum(p.numel() for p in model.parameters() if p.requires_grad)


@pytest.mark.parametrize('arch,pin', [
    ('convtasnet', 4935217),
    ('ffnn', 1509440),
    ('dccrn', 3671053),
    ('tfgridnet', 3735344),
    ('manner', 21253921),
    # pinned against the live JAX tree:
    # sum(x.size for x in jax.tree.leaves(sgmsepm.init_variables()))
    ('sgmsepm', 27756186),
])
def test_torch_baseline_param_parity(arch, pin):
    from torch_baselines import build
    model, _, _ = build(arch)
    assert _count(model) == pin


def test_torch_baseline_tiny_step():
    """One tiny fwd+bwd per arch: the baselines must actually train."""
    from torch_baselines import build
    for arch in ['ffnn', 'dccrn', 'tfgridnet']:
        model, lr, clip = build(arch)
        batch = torch.randn(1, 2, 2, 4096)
        loss = model.loss(batch)
        loss.backward()
        assert torch.isfinite(loss).item()


@pytest.mark.slow
def test_torch_baseline_tiny_step_heavy():
    """manner/sgmsepm tiny steps (several seconds each on this host)."""
    from torch_baselines import build
    for arch in ['manner', 'sgmsepm']:
        model, lr, clip = build(arch)
        batch = torch.randn(1, 2, 2, 8000)
        loss = model.loss(batch)
        loss.backward()
        assert torch.isfinite(loss).item()
