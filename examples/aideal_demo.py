"""End-to-end AI-DEAL demo: unsupervised physics-loss training →
PDFF accuracy, at full reference width.

Round-1 ran this at 24 filters and found the residual PDFF bias
capacity-limited (docs/DESIGN.md §6); this script is the reusable
version at the reference's 36-filter width with bf16 CNN compute and
the two-phase schedule that breaks the water–fat swap ambiguity:

  phase 1: FM net, FM_L1 = l1_w   (escape the swapped minimum)
  phase 2: FM net, FM_L1 = 0      (release the bias the prior causes)
  phase 3: R2* net, FM frozen     (reference train_G_R2 second stage)

then evaluates mean PDFF bias / MAE of the fitted water–fat maps
against the synthetic ground truth (no checkpoints needed — pure
in-memory training, ~5 min on one v5e chip at 128²).

    python examples/aideal_demo.py [--n 64 --size 128 --filters 36]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--filters", type=int, default=36)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ep1", type=int, default=100)
    ap.add_argument("--ep2", type=int, default=400)
    ap.add_argument("--ep3", type=int, default=200)
    ap.add_argument("--l1_w", type=float, default=0.05)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ideal_gan_tpu import physics
    from ideal_gan_tpu.cli.common import synthetic_dataset
    from ideal_gan_tpu.train import unsup

    acqs, maps, te = synthetic_dataset(args.n, h=args.size, w=args.size)
    nb = args.batch
    key = jax.random.PRNGKey(0)

    base = dict(unsup.DEFAULTS, n_G_filters=args.filters, batch_size=nb,
                out_vars="PM", bf16=args.bf16, learn_fm_offset=True,
                uniform_te=True, epochs=args.ep1 + args.ep2,
                epoch_decay=args.ep1 + args.ep2)
    g_fm, g_r2 = unsup.build_models(base)

    def epochs(step_fn, state, n_ep, tag):
        t0 = time.time()
        m = {}
        for ep in range(n_ep):
            perm = np.random.default_rng(ep).permutation(args.n)
            for i in range(args.n // nb):
                idx = perm[i * nb:(i + 1) * nb]
                batch = (jnp.asarray(acqs[idx]), jnp.asarray(te[idx]))
                state, m = step_fn(state, batch,
                                   jax.random.fold_in(key, ep * 1000 + i))
        jax.block_until_ready(m["G_loss"] if "G_loss" in m
                              else list(m.values())[0])
        losses = {k: float(v) for k, v in m.items()}
        print(f"{tag}: {n_ep} epochs in {time.time() - t0:.1f}s, "
              f"final {losses}")
        return state

    # phase 1: swap-breaking FM prior
    cfg1 = dict(base, FM_L1_weight=args.l1_w)
    step1, tx = unsup.make_train_step(cfg1, g_fm, g_r2)
    state = unsup.init_state(cfg1, g_fm, g_r2, tx, key, acqs[:1])
    state = epochs(step1, state, args.ep1, "phase1 (FM, L1 prior)")

    # phase 2: release the prior
    cfg2 = dict(base, FM_L1_weight=0.0)
    step2, _ = unsup.make_train_step(cfg2, g_fm, g_r2)
    state = epochs(step2, state, args.ep2, "phase2 (FM, free)")

    # phase 3: R2* net with FM frozen (reference train_G_R2)
    step3 = unsup.make_r2_train_step(cfg2, g_fm, g_r2, tx)
    state = epochs(step3, state, args.ep3, "phase3 (R2*)")

    # ---- evaluate: infer (FM, R2*) → LS fit → PDFF vs ground truth ----
    @jax.jit
    def infer(state, A, te_b):
        out_fm = g_fm.apply({"params": state.params_fm}, A, train=False,
                            rngs={"bayes": key})
        fm, _ = unsup._as_mean_sigma(out_fm)
        fm = fm + state.fm_offset
        a_abs = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))
        out_r2 = g_r2.apply({"params": state.params_r2}, a_abs,
                            train=False, rngs={"bayes": key})
        r2, _ = unsup._as_mean_sigma(out_r2)
        pm = jnp.concatenate([fm, r2], axis=-1)
        rho = physics.fit_rho(A, pm, te_b)
        return rho

    pdff_b, pdff_g = [], []
    for i in range(0, args.n, nb):
        rho = np.asarray(infer(state, jnp.asarray(acqs[i:i + nb]),
                               jnp.asarray(te[i:i + nb])))
        w = np.abs(rho[:, 0, ..., 0] + 1j * rho[:, 0, ..., 1])
        f = np.abs(rho[:, 1, ..., 0] + 1j * rho[:, 1, ..., 1])
        gt_w = np.abs(maps[i:i + nb, 0, ..., 0]
                      + 1j * maps[i:i + nb, 0, ..., 1])
        gt_f = np.abs(maps[i:i + nb, 1, ..., 0]
                      + 1j * maps[i:i + nb, 1, ..., 1])
        msk = (gt_w + gt_f) > 0.05
        pdff_b.append((f / np.maximum(w + f, 1e-6))[msk])
        pdff_g.append((gt_f / np.maximum(gt_w + gt_f, 1e-6))[msk])
    err = np.concatenate(pdff_b) - np.concatenate(pdff_g)
    print(f"PDFF bias {np.mean(err):+.4f}, MAE {np.mean(np.abs(err)):.4f}, "
          f"p95 |err| {np.percentile(np.abs(err), 95):.4f}")
    return float(np.mean(err)), float(np.mean(np.abs(err)))


if __name__ == "__main__":
    main()
