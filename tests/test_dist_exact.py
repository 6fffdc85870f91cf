"""Distributed exact path (parallel/dist_exact): row-sharded kernel
build + blocked Cholesky + blocked triangular solves vs the replicated
core, on the 8-device virtual CPU mesh.

Parity oracle: core nlz / dense NumPy algebra in f64 (the same
1e-8-class contract as tests/test_parity_reference.py — here the two
sides factor the SAME scaled matrix, so agreement is machine-level).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from gpyreg_tpu.core.model import (  # noqa: E402
    ModelSpec,
    cov_matrix,
    mean_value,
    noise_variance,
)
from gpyreg_tpu.core.nlml import nlz  # noqa: E402
from gpyreg_tpu.parallel import dist_exact as de  # noqa: E402
from gpyreg_tpu.parallel import mesh as pmesh  # noqa: E402


def _data(N, D, M=64, seed=0, noisy_s2=False):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(X.sum(1))[:, None] + 0.1 * rng.normal(size=(N, 1))
    xs = rng.uniform(-3, 3, (M, D))
    s2 = None
    if noisy_s2:
        s2 = 0.01 + 0.05 * rng.uniform(size=(N, 1))
    return X, y, xs, s2


def _hyp(spec, seed=1):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [
            0.3 * rng.normal(size=spec.cov_N),
            -1.0 + 0.2 * rng.normal(size=spec.noise_N),
            0.1 * rng.normal(size=spec.mean_N),
        ]
    )


def _dense_oracle(spec, hyp, X, y, s2, xs):
    """Dense NumPy scaled-parametrization posterior + prediction."""
    N = X.shape[0]
    hyp_j = jnp.asarray(hyp)
    hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(hyp_j)
    sn2 = np.asarray(noise_variance(spec, hyp_noise, y, s2, X.dtype))
    sn2 = np.broadcast_to(np.reshape(sn2, (-1,)), (N,))
    sW = 1.0 / np.sqrt(sn2)
    K = np.asarray(cov_matrix(spec, hyp_cov, X))
    B = np.eye(N) + sW[:, None] * K * sW[None, :]
    L = np.linalg.cholesky(B)
    r = y - np.asarray(mean_value(spec, hyp_mean, X))[:, None]
    alpha = sW[:, None] * np.linalg.solve(
        L.T, np.linalg.solve(L, sW[:, None] * r)
    )
    Ks = np.asarray(cov_matrix(spec, hyp_cov, X, Z=xs))
    kss = np.asarray(cov_matrix(spec, hyp_cov, xs, diag=True))
    mu = np.asarray(mean_value(spec, hyp_mean, xs)) + Ks.T @ alpha[:, 0]
    V = np.linalg.solve(L, sW[:, None] * Ks)
    s2p = kss - (V * V).sum(0)
    return alpha, mu, s2p


MESH = pmesh.make_mesh(8)


@pytest.mark.parametrize(
    "N,b",
    [
        (512, 32),  # divisible, multiple blocks per device
        (500, 32),  # padded rows
        (130, 16),  # pads almost a full device
        (512, 64),  # one block per device
    ],
)
def test_dist_nlml_and_posterior_parity(N, b):
    D = 3
    spec = ModelSpec(
        D=D, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, xs, _ = _data(N, D)
    hyp = _hyp(spec)
    ref = float(nlz(spec, hyp, X, y, None))
    post = de.dist_exact_fit(spec, MESH, hyp, X, y, b=b)
    assert float(post.nlml) == pytest.approx(ref, rel=1e-12)

    alpha_ref, mu_ref, s2_ref = _dense_oracle(spec, hyp, X, y, None, xs)
    alpha = np.asarray(post.alpha)[:N]
    assert np.max(np.abs(alpha - alpha_ref)) < 1e-10
    # Padded alpha rows are exactly zero (inert identity blocks).
    assert np.all(np.asarray(post.alpha)[N:] == 0.0)

    mu, s2 = de.dist_exact_predict(post, xs, chunk=32)
    assert np.max(np.abs(mu - mu_ref)) < 1e-10
    assert np.max(np.abs(s2 - s2_ref)) < 1e-10


@pytest.mark.parametrize(
    "cov,mean",
    [("m5", "negquad"), ("rq", "linear"), ("se_iso", "zero")],
)
def test_dist_model_zoo(cov, mean):
    D, N = 2, 260
    spec = ModelSpec(
        D=D, cov=cov, mean=mean, noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, xs, _ = _data(N, D, seed=3)
    hyp = _hyp(spec, seed=4)
    ref = float(nlz(spec, hyp, X, y, None))
    post = de.dist_exact_fit(spec, MESH, hyp, X, y, b=16)
    assert float(post.nlml) == pytest.approx(ref, rel=1e-12)
    _, mu_ref, s2_ref = _dense_oracle(spec, hyp, X, y, None, xs)
    mu, s2 = de.dist_exact_predict(post, xs)
    assert np.max(np.abs(mu - mu_ref)) < 1e-10
    assert np.max(np.abs(s2 - s2_ref)) < 1e-10


def test_dist_heteroskedastic_and_rectified():
    """User-provided s2 plus the rectified output-dependent noise branch
    (per-row sn2 exercises the sW scaling end to end)."""
    D, N = 2, 300
    spec = ModelSpec(
        D=D, cov="se", mean="const", noise_constant=True,
        noise_user=1, noise_rectified=True,
    )
    X, y, xs, s2 = _data(N, D, seed=5, noisy_s2=True)
    hyp = _hyp(spec, seed=6)
    ref = float(nlz(spec, hyp, X, y, s2))
    post = de.dist_exact_fit(spec, MESH, hyp, X, y, s2=s2, b=32)
    assert float(post.nlml) == pytest.approx(ref, rel=1e-12)
    _, mu_ref, s2_ref = _dense_oracle(spec, hyp, X, y, s2, xs)
    mu, s2p = de.dist_exact_predict(post, xs)
    assert np.max(np.abs(mu - mu_ref)) < 1e-10
    assert np.max(np.abs(s2p - s2_ref)) < 1e-10


def test_dist_predict_chunking():
    """M not divisible by the chunk: pad chunks agree with one-shot."""
    D, N = 2, 128
    spec = ModelSpec(
        D=D, cov="se", mean="zero", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, xs, _ = _data(N, D, M=129, seed=7)
    hyp = _hyp(spec, seed=8)
    post = de.dist_exact_fit(spec, MESH, hyp, X, y, b=16)
    mu1, s21 = de.dist_exact_predict(post, xs, chunk=64)
    mu2, s22 = de.dist_exact_predict(post, xs, chunk=256)
    assert np.max(np.abs(mu1 - mu2)) < 1e-12
    assert np.max(np.abs(s21 - s22)) < 1e-12


@pytest.mark.parametrize("N,b", [(512, 32), (500, 16), (130, 16)])
def test_dist_two_level_algorithm(N, b):
    """The two-level window+strip Cholesky (~1.9x-ideal flops) matches
    the single-level masked-full loop and the oracle."""
    D = 3
    spec = ModelSpec(
        D=D, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, xs, _ = _data(N, D, seed=21)
    hyp = _hyp(spec, seed=22)
    p1 = de.dist_exact_fit(spec, MESH, hyp, X, y, b=b)
    p2 = de.dist_exact_fit(
        spec, MESH, hyp, X, y, b=b, algorithm="two_level"
    )
    assert float(p2.nlml) == pytest.approx(float(p1.nlml), rel=1e-13)
    assert np.max(
        np.abs(np.asarray(p1.alpha) - np.asarray(p2.alpha))
    ) < 1e-12
    ref = float(nlz(spec, hyp, X, y, None))
    assert float(p2.nlml) == pytest.approx(ref, rel=1e-12)
    mu1, s21 = de.dist_exact_predict(p1, xs)
    mu2, s22 = de.dist_exact_predict(p2, xs)
    assert np.max(np.abs(mu1 - mu2)) < 1e-12
    assert np.max(np.abs(s21 - s22)) < 1e-12


def test_dist_unknown_algorithm_refused():
    spec = ModelSpec(
        D=2, cov="se", mean="zero", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, _, _ = _data(64, 2)
    with pytest.raises(ValueError, match="algorithm"):
        de.dist_exact_fit(
            spec, MESH, np.zeros(spec.hyp_N), X, y, algorithm="nope"
        )


def test_dist_f32_fast_path():
    """f32 (the TPU fast-path dtype) stays conditioning-bounded close
    to the f64 oracle — B = I + sW K sW has eigenvalues >= 1, so the
    factorization itself is stable; tolerance reflects f32 rounding in
    the O(N) trailing-update accumulation."""
    D, N = 3, 384
    spec = ModelSpec(
        D=D, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, xs, _ = _data(N, D, seed=13)
    hyp = _hyp(spec, seed=14)
    post = de.dist_exact_fit(
        spec, MESH, hyp, X.astype(np.float32), y.astype(np.float32),
        b=16,
    )
    ref = float(nlz(spec, hyp, X, y, None))
    assert float(post.nlml) == pytest.approx(ref, rel=2e-4)
    _, mu_ref, s2_ref = _dense_oracle(spec, hyp, X, y, None, xs)
    mu, s2 = de.dist_exact_predict(post, xs.astype(np.float32))
    assert np.max(np.abs(mu - mu_ref)) < 5e-3 * max(
        1.0, float(np.max(np.abs(mu_ref)))
    )
    assert np.max(np.abs(s2 - s2_ref)) < 5e-3


def test_plan_alignment():
    Np, rows_local, nb = de.plan(1000, 8, 32)
    assert Np % (8 * 32) == 0 and Np >= 1000
    assert rows_local * 8 == Np and nb * 32 == Np
    # Blocks never straddle devices:
    assert rows_local % 32 == 0


def test_dist_outwarp_refused():
    spec = ModelSpec(
        D=2, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False, outwarp="negpow",
    )
    X, y, _, _ = _data(64, 2)
    with pytest.raises(ValueError, match="output"):
        de.dist_exact_fit(spec, MESH, np.zeros(spec.hyp_N), X, y)


def test_dist_jitter_stabilizer():
    """jitter inflates the diagonal of B: the NLML matches the dense
    oracle with the same inflation."""
    D, N = 2, 96
    spec = ModelSpec(
        D=D, cov="se", mean="zero", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, _, _ = _data(N, D, seed=11)
    hyp = _hyp(spec, seed=12)
    jit = 1e-3
    post = de.dist_exact_fit(spec, MESH, hyp, X, y, b=16, jitter=jit)
    hyp_j = jnp.asarray(hyp)
    hyp_cov, hyp_noise, _ = spec.split_hyp(hyp_j)
    sn2 = float(noise_variance(spec, hyp_noise, y, None, X.dtype))
    sW = np.full(N, sn2**-0.5)
    K = np.asarray(cov_matrix(spec, hyp_cov, X))
    B = (1 + jit) * np.eye(N) + sW[:, None] * K * sW[None, :]
    L = np.linalg.cholesky(B)
    z = np.linalg.solve(L, sW[:, None] * y)
    ref = (
        0.5 * float(z.T @ z)
        + float(np.sum(np.log(np.diag(L))))
        + 0.5 * N * np.log(sn2)
        + 0.5 * N * np.log(2 * np.pi)
    )
    assert float(post.nlml) == pytest.approx(ref, rel=1e-12)


def test_dist_factor_is_sharded():
    """The L slab and alpha actually live sharded over the mesh (the
    point of the path: per-device footprint N^2/P)."""
    D, N = 2, 256
    spec = ModelSpec(
        D=D, cov="se", mean="zero", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    X, y, _, _ = _data(N, D, seed=9)
    post = de.dist_exact_fit(spec, MESH, _hyp(spec, 10), X, y, b=16)
    shardings = {
        str(d.sharding.spec) for d in [post.slab, post.alpha]
    }
    assert all("batch" in s for s in shardings), shardings
