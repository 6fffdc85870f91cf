"""Multi-chip scaling for the exact-GP workload.

The reference is single-threaded NumPy (SURVEY §2.3: no DP/TP/PP, no
communication backend).  The natural parallel axes of this workload on a
TPU pod slice are:

1. **Candidate/sample/chain batch** (hyperparameter vectors): perfectly
   parallel.  We shard the leading batch axis of the vmapped NLML(+grad)
   across a 1-D device mesh; each device factorizes its own (N, N)
   kernel matrices.  Collectives appear only if a reduction over the
   batch is requested (e.g. argmin of the design objective).
2. **Test points** (prediction): shard the M axis of the
   cross-covariance; each device computes K(X, x_star_shard) and its
   predictive moments.  No cross-device communication at all.
3. **Training rows (large-N)**: shard the N axis of cross-kernel
   construction and of matvecs against posterior factors.

All sharding uses ``jax.sharding.NamedSharding`` under ``jax.jit`` so
XLA inserts any needed collectives over ICI.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.model import ModelSpec
from ..core.nlml import nlz


def make_mesh(n_devices: int = None, axis: str = "batch") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


@lru_cache(maxsize=None)
def _sharded_nlml_grad_fn(spec: ModelSpec, mesh_key):
    """Jitted batched NLML+grad with the candidate axis sharded."""
    mesh = mesh_key

    def one(hyp, X, y):
        return nlz(spec, hyp, X, y, None)

    batched = jax.vmap(jax.value_and_grad(one), in_axes=(0, None, None))

    hyp_sharding = NamedSharding(mesh, P("batch", None))
    repl = NamedSharding(mesh, P())
    out_shardings = (
        NamedSharding(mesh, P("batch")),
        NamedSharding(mesh, P("batch", None)),
    )
    return jax.jit(
        batched,
        in_shardings=(hyp_sharding, repl, repl),
        out_shardings=out_shardings,
    )


def sharded_nlml_grad(spec: ModelSpec, mesh: Mesh, hyp_batch, X, y):
    """Evaluate NLML and gradient for a batch of hyperparameter vectors,
    sharded across the mesh's 'batch' axis.

    ``hyp_batch.shape[0]`` must be divisible by the mesh size.
    """
    fn = _sharded_nlml_grad_fn(spec, mesh)
    return fn(jnp.asarray(hyp_batch), jnp.asarray(X), jnp.asarray(y))


@lru_cache(maxsize=None)
def _sharded_predict_fn(spec: ModelSpec, mesh_key):
    """Jitted prediction with the test-point axis sharded over devices
    (the 'sequence parallel' analog for GP inference: each device owns a
    slab of test points and the full posterior factors)."""
    from jax.scipy.linalg import solve_triangular

    mesh = mesh_key

    def predict(hyp, alpha, L_upper, sW, X, xs):
        from ..core.model import cov_matrix, mean_value

        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        kss = cov_matrix(spec, hyp_cov, xs, diag=True)
        Ks = cov_matrix(spec, hyp_cov, X, Z=xs)
        mu = m_star + jnp.matmul(Ks.T, alpha)[:, 0]
        V = solve_triangular(L_upper, sW * Ks, lower=False, trans=1)
        s2 = kss - jnp.sum(V * V, axis=0)
        return mu, s2

    repl = NamedSharding(mesh, P())
    xs_sharding = NamedSharding(mesh, P("batch", None))
    out_sharding = NamedSharding(mesh, P("batch"))
    return jax.jit(
        predict,
        in_shardings=(repl, repl, repl, repl, repl, xs_sharding),
        out_shardings=(out_sharding, out_sharding),
    )


def sharded_predict(spec: ModelSpec, mesh: Mesh, hyp, alpha, L_upper, sW, X, xs):
    """Predictive mean/variance with test points sharded over devices."""
    fn = _sharded_predict_fn(spec, mesh)
    return fn(
        jnp.asarray(hyp),
        jnp.asarray(alpha),
        jnp.asarray(L_upper),
        jnp.asarray(sW),
        jnp.asarray(X),
        jnp.asarray(xs),
    )


def sharded_sample_chains(
    spec: ModelSpec,
    mesh: Mesh,
    x0s,
    key,
    X,
    y,
    widths=None,
    LB=None,
    UB=None,
    n_samples: int = 100,
    thin: int = 1,
    burn: int = None,
):
    """MCMC-chain parallelism across chips (SURVEY §2.3): each device
    runs a slab of independent slice-sampling chains over the GP
    log-marginal-likelihood surface, with data replicated and chain
    state/output sharded on the leading axis.  Zero collectives — the
    chains are embarrassingly parallel; chains-per-device still batch
    into one Cholesky per sweep on each chip.

    ``x0s.shape[0]`` (number of chains) must be divisible by the mesh
    size.  Returns (samples (B, n_samples, D), f_vals (B, n_samples)).
    """
    from ..core.nlml import get_fns
    from ..inference import device_slice

    fns = get_fns(spec, False, False)
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)

    x0s = jnp.asarray(x0s, dtype=jnp.float64)
    shard = NamedSharding(mesh, P("batch", None))
    x0s = jax.device_put(x0s, shard)

    log_f = fns["log_post_raw"]
    return device_slice.sample_chains(
        log_f,
        x0s,
        key,
        widths=widths,
        LB=LB,
        UB=UB,
        n_samples=n_samples,
        thin=thin,
        burn=burn,
        f_args=(Xj, yj),
    )
