"""TE-augmentation generalization demo (VET-Net).

The point of the reference's train-IDEAL-TEaug.py is TE robustness:
training on *randomly sampled* echo trains (physics-synthesized pairs)
should yield a model that works at protocols it never saw. This script
measures that directly on synthetic phantoms:

  1. train VET-Net with per-step random TE trains (the teaug trainer),
  2. train an identical VET-Net at the FIXED default protocol only,
  3. evaluate both at an UNSEEN protocol (TE1/ΔTE shifted ~15 %)
     and at the training default, reporting (FM, R2*) map MAE.

Expected: comparable error at the default protocol, and a markedly
smaller degradation at the unseen protocol for the TE-augmented model.

    python examples/teaug_demo.py [--n 64 --size 128 --epochs 300]
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
    ap.add_argument("--epochs", type=int, default=300)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ideal_gan_tpu import physics
    from ideal_gan_tpu.cli.common import synthetic_dataset
    from ideal_gan_tpu.train import teaug

    _, maps, _ = synthetic_dataset(args.n, h=args.size, w=args.size)
    nb = args.batch
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    def train(aug: bool):
        cfg = dict(teaug.DEFAULTS, n_G_filters=args.filters, batch_size=nb,
                   epochs=args.epochs, epoch_decay=args.epochs, bf16=True,
                   G_model="VET-Net", te_input=True)
        model = teaug.build_model(cfg)
        step, tx = teaug.make_train_step(cfg, model)
        state = teaug.init_state(cfg, model, tx, key, h=args.size,
                                 w=args.size)
        t0 = time.time()
        m = {}
        for ep in range(args.epochs):
            perm = np.random.default_rng(ep).permutation(args.n)
            for i in range(args.n // nb):
                idx = perm[i * nb:(i + 1) * nb]
                te = (teaug.sample_te(rng, cfg, nb) if aug
                      else np.asarray(physics.te_train(cfg["n_echoes"],
                                                       bs=nb)))
                state, m = step(state, (jnp.asarray(maps[idx]),
                                        jnp.asarray(te)),
                                jax.random.fold_in(key, ep * 1000 + i))
        jax.block_until_ready(m["G_loss"])
        print(f"{'TE-aug' if aug else 'fixed-TE'} training: "
              f"{args.epochs} ep in {time.time() - t0:.1f}s, "
              f"final PM loss {float(m['PM_loss']):.5f}")
        return cfg, model, state

    def evaluate(cfg, model, state, te1, dte, label):
        te = np.asarray(physics.te_train(cfg["n_echoes"], bs=args.n,
                                         te1=te1, dte=dte))

        @jax.jit
        def infer(B, te_b):
            A = physics.synthesize(B[:, :3], te_b, field=cfg["field"])
            pm = model.apply({"params": state.params}, A, te_b[..., 0],
                             train=False).astype(jnp.float32)
            return pm

        errs_fm, errs_r2 = [], []
        for i in range(0, args.n, nb):
            pm = np.asarray(infer(jnp.asarray(maps[i:i + nb]),
                                  jnp.asarray(te[i:i + nb])))
            gt = maps[i:i + nb, 2:3]
            msk = (np.abs(maps[i:i + nb, 0, ..., 0])
                   + np.abs(maps[i:i + nb, 1, ..., 0]))[:, None] > 0.05
            errs_fm.append(np.abs(pm[..., 0] - gt[..., 0])[msk])
            errs_r2.append(np.abs(pm[..., 1] - gt[..., 1])[msk])
        fm = float(np.mean(np.concatenate(errs_fm))) * physics.FM_SC
        r2 = float(np.mean(np.concatenate(errs_r2))) * physics.R2_SC
        print(f"  {label}: FM MAE {fm:6.2f} Hz, R2* MAE {r2:6.2f} 1/s")
        return fm, r2

    results = {}
    for aug in (True, False):
        cfg, model, state = train(aug)
        name = "TE-aug" if aug else "fixed-TE"
        results[name, "default"] = evaluate(cfg, model, state,
                                            0.0013, 0.0021,
                                            "default protocol  ")
        results[name, "unseen"] = evaluate(cfg, model, state,
                                           0.0015, 0.0024,
                                           "unseen protocol   ")
    d_aug = results["TE-aug", "unseen"][0] - results["TE-aug", "default"][0]
    d_fix = (results["fixed-TE", "unseen"][0]
             - results["fixed-TE", "default"][0])
    print(f"FM degradation at the unseen protocol: "
          f"TE-aug {d_aug:+.2f} Hz vs fixed-TE {d_fix:+.2f} Hz")
    return results


if __name__ == "__main__":
    main()
