"""CLI: gradient-flow debug harness (reference test-gradients.py): verify
gradients flow through the Bayesian R2* + uncertainty-loss path on a
downsampled dataset, with numeric checks at every stage."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import physics
from ..losses import var_mse
from ..train import unsup
from .common import load_cohorts, setup_experiment

DEFAULTS = dict(
    dataset="grad-check", n_echoes=6, field=1.5, n_G_filters=8,
    downsample=8, batch_size=2,
)


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv,
                           settings_name="settings_gradcheck.yml")
    acqs, maps, te = load_cohorts(cfg)
    ds = cfg["downsample"]
    acqs = acqs[:cfg["batch_size"], :, ::ds, ::ds]
    te = te[:cfg["batch_size"]]

    ucfg = dict(unsup.DEFAULTS)
    ucfg.update(n_G_filters=cfg["n_G_filters"], out_vars="PM", UQ=True,
                UQ_R2s=True, batch_size=cfg["batch_size"])
    g_fm, g_r2 = unsup.build_models(ucfg)
    key = jax.random.PRNGKey(0)
    import optax
    state = unsup.init_state(ucfg, g_fm, g_r2, optax.adam(1e-4), key, acqs)

    def loss_fn(params_r2):
        k1, k2 = jax.random.split(key)
        a = jnp.asarray(acqs)
        te_b = jnp.asarray(te)
        out_fm = g_fm.apply({"params": state.params_fm}, a,
                            rngs={"bayes": k1})
        fm_mean, fm_sigma = out_fm.loc, out_fm.scale
        a_abs = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True))
        out_r2 = g_r2.apply({"params": params_r2}, a_abs, rngs={"bayes": k2})
        r2_mean, r2_sigma = out_r2.nu, out_r2.sigma
        pm = jnp.concatenate([fm_mean, r2_mean], axis=-1)
        wf, a_hat = physics.cycle_full(a, pm, te_b, field=cfg["field"])
        a_var = physics.acq_uncertainty(
            jax.lax.stop_gradient(wf),
            physics.Posterior(fm_mean[:, 0, ..., 0],
                              jnp.square(fm_sigma[:, 0, ..., 0])),
            physics.Posterior(r2_mean[:, 0, ..., 0],
                              jnp.square(r2_sigma[:, 0, ..., 0])),
            te_b, field=cfg["field"])
        return var_mse(a, jnp.concatenate([a_hat, a_var], axis=-1))

    # jitted: eager complex physics ops are unsupported on the TPU backend
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params_r2)
    leaves = jax.tree_util.tree_leaves(grads)
    n_finite = sum(bool(np.all(np.isfinite(np.asarray(l)))) for l in leaves)
    g_max = max(float(np.abs(np.asarray(l)).max()) for l in leaves)
    g_nonzero = sum(bool(np.abs(np.asarray(l)).max() > 0) for l in leaves)
    print(f"loss = {float(loss):.6f}")
    print(f"grad leaves: {len(leaves)}, finite: {n_finite}, "
          f"nonzero: {g_nonzero}, max|g| = {g_max:.3e}")
    assert n_finite == len(leaves), "non-finite gradients detected"
    assert g_nonzero > 0, "no gradient signal through the R2* path"
    print("gradient flow through Bayesian R2* + uncertainty loss: OK")
    return {"loss": float(loss), "max_grad": g_max}


if __name__ == "__main__":
    main()
