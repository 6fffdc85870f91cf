"""Multi-chip sharding on the 8-device virtual CPU mesh: sharded
NLML+grad, sharded prediction, and cross-device MCMC chains all match
their single-device counterparts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpyreg_tpu as gpr
from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.core.nlml import get_fns
from gpyreg_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    N, D = 32, 3
    X = rng.normal(size=(N, D))
    y = np.sum(np.sin(X), axis=1, keepdims=True)
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    m = pmesh.make_mesh(8)
    return spec, m, X, y, rng


def test_sharded_nlml_grad_matches_local(setup):
    spec, m, X, y, rng = setup
    hyps = 0.1 * rng.normal(size=(16, spec.hyp_N))
    vals, grads = pmesh.sharded_nlml_grad(spec, m, hyps, X, y)

    fns = get_fns(spec, False, False)
    v_ref, g_ref = fns["obj_grad_batch"](
        jnp.asarray(hyps), jnp.asarray(X), jnp.asarray(y)
    )
    assert np.allclose(np.asarray(vals), np.asarray(v_ref), atol=1e-10)
    assert np.allclose(np.asarray(grads), np.asarray(g_ref), atol=1e-9)


def test_sharded_chains_match_unsharded(setup):
    spec, m, X, y, rng = setup
    x0s = np.tile(
        np.concatenate([np.zeros(3), [0.0], [-1.0], [0.0]]), (8, 1)
    ) + 0.05 * rng.normal(size=(8, spec.hyp_N))
    key = jax.random.key(0)
    s_sharded, f_sharded = pmesh.sharded_sample_chains(
        spec, m, x0s, key, X, y,
        widths=np.ones(spec.hyp_N), LB=x0s.min(0) - 5, UB=x0s.max(0) + 5,
        n_samples=20, burn=10,
    )

    from gpyreg_tpu.inference import device_slice

    fns = get_fns(spec, False, False)
    s_local, f_local = device_slice.sample_chains(
        fns["log_post_raw"], x0s, key,
        widths=np.ones(spec.hyp_N), LB=x0s.min(0) - 5, UB=x0s.max(0) + 5,
        n_samples=20, burn=10,
        f_args=(jnp.asarray(X), jnp.asarray(y)),
    )
    assert s_sharded.shape == (8, 20, spec.hyp_N)
    assert np.allclose(s_sharded, s_local, atol=1e-12)
    assert np.allclose(f_sharded, f_local, atol=1e-10)
