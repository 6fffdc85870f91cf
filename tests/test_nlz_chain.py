"""nlz_chain (the memory-lean chain-eval schedule) vs nlz equality.

The chain-batched MCMC eval (fit(options={"n_chains": B})) runs through
core.nlml.nlz_chain, which reschedules the jitter-escalation retry so
~3 instead of ~5 live (B, N, N) buffers exist under vmap (VERDICT r4
#2; reference retry semantics gaussian_process.py:2413-2421).  The
VALUE must match nlz exactly: bit-identical when the first
factorization succeeds, identical multiplier semantics on retry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.core.nlml import nlz, nlz_chain

jax.config.update("jax_enable_x64", True)


def _data(N, D, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, D)).astype(dtype)
    y = np.sum(np.sin(X), axis=1, keepdims=True).astype(dtype)
    y += 0.1 * rng.normal(size=(N, 1)).astype(dtype)
    return X, y


def _hyp(spec, seed=1):
    rng = np.random.default_rng(seed)
    return 0.3 * rng.normal(size=(spec.hyp_N,))


SPECS = [
    ModelSpec(D=3, cov="se", mean="const", noise_constant=True,
              noise_user=0, noise_rectified=False),
    ModelSpec(D=2, cov="m5", mean="negquad", noise_constant=True,
              noise_user=1, noise_rectified=False),
    ModelSpec(D=2, cov="rq", mean="zero", noise_constant=True,
              noise_user=0, noise_rectified=True),
    ModelSpec(D=2, cov="se_iso", mean="const", noise_constant=True,
              noise_user=0, noise_rectified=False, outwarp="negpow"),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.cov + s.mean)
def test_nlz_chain_matches_nlz(spec):
    X, y = _data(64, spec.D)
    s2 = None
    if spec.noise_user:
        s2 = 0.01 + 0.01 * np.random.default_rng(3).random((64, 1))
    for seed in range(4):
        hyp = _hyp(spec, seed)
        a = float(nlz(spec, hyp, X, y, s2))
        b = float(nlz_chain(spec, hyp, X, y, s2))
        if np.isfinite(a):
            assert a == pytest.approx(b, rel=1e-12, abs=1e-12)
        else:
            assert not np.isfinite(b)


def test_nlz_chain_padded():
    spec = SPECS[0]
    X, y = _data(64, spec.D)
    Xp = np.concatenate([X, np.zeros((16, spec.D))])
    yp = np.concatenate([y, np.zeros((16, 1))])
    hyp = _hyp(spec)
    a = float(nlz(spec, hyp, X, y, None))
    b = float(nlz_chain(spec, hyp, Xp, yp, None, n_real=64))
    assert a == pytest.approx(b, rel=1e-10)


def test_nlz_chain_retry_path():
    """Duplicate rows + tiny noise force jitter escalation: both
    schedules must land on the same multiplier and value."""
    spec = SPECS[0]
    rng = np.random.default_rng(5)
    X = np.repeat(rng.normal(size=(24, spec.D)), 2, axis=0)
    y = np.sum(X, axis=1, keepdims=True)
    # log-noise ~ -12 => sn2 ~ 4e-11: K + sn2 I is numerically singular.
    hyp = np.concatenate(
        [np.zeros(spec.D), [0.0], [-12.0], [0.0]]
    )
    a = float(nlz(spec, hyp, X, y, None))
    b = float(nlz_chain(spec, hyp, X, y, None))
    assert np.isfinite(a) and np.isfinite(b)
    assert a == pytest.approx(b, rel=1e-8)


def test_nlz_chain_vmapped_mixed_lanes():
    """A batch where one lane needs escalation and the others don't —
    per-lane independence under vmap (the chain-parallel shape)."""
    spec = SPECS[0]
    rng = np.random.default_rng(6)
    X = np.repeat(rng.normal(size=(24, spec.D)), 2, axis=0)
    y = np.sum(X, axis=1, keepdims=True)
    hyps = np.stack(
        [
            np.concatenate([np.zeros(spec.D), [0.0], [-1.0], [0.0]]),
            np.concatenate([np.zeros(spec.D), [0.0], [-12.0], [0.0]]),
            np.concatenate([0.2 * np.ones(spec.D), [0.1], [-2.0], [0.3]]),
        ]
    )
    ref = np.array([float(nlz(spec, h, X, y, None)) for h in hyps])
    got = np.asarray(
        jax.vmap(lambda h: nlz_chain(spec, h, X, y, None))(
            jnp.asarray(hyps)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_bundle_exposes_chain_raw():
    from gpyreg_tpu.core.nlml import get_fns

    spec = SPECS[0]
    fns = get_fns(spec, False, False)
    X, y = _data(32, spec.D)
    hyp = _hyp(spec)
    a = float(fns["log_post_raw"](hyp, X, y))
    b = float(fns["log_post_chain_raw"](hyp, X, y))
    assert a == pytest.approx(b, rel=1e-12)
    # Identity-stable across calls (the compile-cache invariant).
    fns2 = get_fns(spec, False, False)
    assert fns2["log_post_chain_raw"] is fns["log_post_chain_raw"]
