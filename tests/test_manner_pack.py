"""MANNER space-to-depth lane packing: the packed trunk must be a pure
layout transform — identical parameter tree, identical math (up to fp
reassociation) versus the unpacked module."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.models.manner import (
    _MannerModule,
    _pack2,
    _PConv,
    _PConvTranspose,
    _unpack2,
)


def test_pack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 6)
                    .astype('float32'))
    np.testing.assert_array_equal(np.asarray(_unpack2(_pack2(x))), x)
    # c-major phase order: packed channel c*2+j
    p = np.asarray(_pack2(x))
    np.testing.assert_array_equal(p[0, 0, ::2], np.asarray(x)[0, 0])
    np.testing.assert_array_equal(p[0, 0, 1::2], np.asarray(x)[0, 1])


@pytest.mark.parametrize('cin,cout,k,s,p,groups,out_pack', [
    (1, 60, 3, 1, 1, 1, True),      # in_conv / out_conv geometry
    (60, 60, 8, 4, 0, 1, True),     # enc_0_down
    (60, 120, 8, 4, 0, 1, False),   # enc_1_down (unpacked output)
    (60, 120, 1, 1, 0, 1, True),    # pointwise
    (60, 60, 31, 1, 15, 60, True),  # depthwise
])
def test_packed_conv_matches_logical(cin, cout, k, s, p, groups,
                                     out_pack):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 68, cin).astype('float32'))
    ref = nn.Conv(cout, (k,), strides=(s,), padding=((p, p),),
                  feature_group_count=groups, use_bias=True)
    variables = ref.init(jax.random.PRNGKey(1), x)
    pk = _PConv(cout, k, s, p, groups=groups, out_pack=out_pack)
    y_ref = np.asarray(ref.apply(variables, x))
    y_pk = pk.apply(variables, _pack2(x))
    y_pk = np.asarray(_unpack2(y_pk) if out_pack else y_pk)
    np.testing.assert_allclose(y_ref, y_pk, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('in_pack', [True, False])
def test_packed_conv_transpose_matches_logical(in_pack):
    rs = np.random.RandomState(0)
    cin, cout = (120, 60) if in_pack else (240, 120)
    x = jnp.asarray(rs.randn(2, 64, cin).astype('float32'))
    ref = nn.ConvTranspose(cout, (8,), strides=(4,), padding='VALID')
    variables = ref.init(jax.random.PRNGKey(1), x)
    pk = _PConvTranspose(cout, 8, 4, in_pack=in_pack)
    y_ref = np.asarray(ref.apply(variables, x))
    y_pk = np.asarray(_unpack2(
        pk.apply(variables, _pack2(x) if in_pack else x)))
    np.testing.assert_allclose(y_ref, y_pk, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope='module')
def modules_and_variables():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 4000)
                    .astype('float32'))
    m_ref = _MannerModule(pack=False)
    m_pk = _MannerModule(pack=True)
    variables = m_ref.init(rng, x, train=False)
    return m_ref, m_pk, variables, x


@pytest.mark.slow
def test_param_tree_layout_independent(modules_and_variables):
    m_ref, m_pk, variables, x = modules_and_variables
    v_pk = m_pk.init(jax.random.PRNGKey(0), x, train=False)
    ref_flat = jax.tree_util.tree_leaves_with_path(variables)
    pk_flat = jax.tree_util.tree_leaves_with_path(v_pk)
    assert len(ref_flat) == len(pk_flat)
    for (p1, l1), (p2, l2) in zip(ref_flat, pk_flat):
        assert p1 == p2
        assert l1.shape == l2.shape
        np.testing.assert_allclose(l1, l2, err_msg=str(p1))


@pytest.mark.slow
def test_packed_forward_matches_unpacked(modules_and_variables):
    m_ref, m_pk, variables, x = modules_and_variables
    y_ref = np.asarray(m_ref.apply(variables, x, train=False))
    y_pk = np.asarray(m_pk.apply(variables, x, train=False))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pk, y_ref, atol=1e-4 * scale)

    y_ref, up_ref = m_ref.apply(variables, x, train=True,
                                mutable=['batch_stats'])
    y_pk, up_pk = m_pk.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               atol=1e-4 * scale)
    for (p1, s1), (p2, s2) in zip(
            jax.tree_util.tree_leaves_with_path(up_ref),
            jax.tree_util.tree_leaves_with_path(up_pk)):
        assert p1 == p2
        np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-6,
                                   err_msg=str(p1))


@pytest.mark.slow
def test_packed_gradients_match_unpacked(modules_and_variables):
    m_ref, m_pk, variables, x = modules_and_variables

    def loss(v, m):
        out, _ = m.apply(v, x, train=True, mutable=['batch_stats'])
        return (out**2).mean()

    g_ref = jax.grad(loss)(variables, m_ref)
    g_pk = jax.grad(loss)(variables, m_pk)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_pk)):
        assert p1 == p2
        # atol covers f32 reassociation over the ~64k-term contraction
        # sums (packed convs group the reductions differently); a real
        # wiring bug shows up orders of magnitude above this
        np.testing.assert_allclose(
            l2, l1, rtol=2e-3, atol=5e-4, err_msg=str(p1))
