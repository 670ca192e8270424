"""Train-step wall-time benchmark (SURVEY §7 benchmark harness).

Times one full jitted training step (fwd + bwd + optimizer) for the main
trainers on synthetic data, plus the bare physics-cycle kernel
(fwd + bwd) in its fused-Pallas and pure-XLA variants. Run on TPU:

    python benchmarks/train_step_time.py [--size 384] [--batch 8] \
        [--json BENCH_train_r02.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--filters", type=int, default=36)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", default="", help="write results to this file")
    args = ap.parse_args()
    results = []

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ideal_gan_tpu import physics as ph
    from ideal_gan_tpu.train import sup, teaug, unsup

    nb, h = args.batch, args.size
    rng = np.random.default_rng(0)
    maps = (rng.normal(size=(nb, 3, h, h, 2)) * 0.3).astype(np.float32)
    te = np.asarray(ph.te_train(6, bs=nb))
    acqs = np.asarray(jax.jit(ph.synthesize)(jnp.asarray(maps),
                                             jnp.asarray(te)))
    key = jax.random.PRNGKey(0)

    def bench(name, step_fn, state, batch):
        state, m = step_fn(state, batch, key)  # compile
        jax.block_until_ready(m["G_loss"])
        # pipelined timing (block once at the end): cross-checked against
        # per-iteration sync — the difference is a constant ~30 ms of
        # host-sync tunnel overhead per step, not device time
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, batch, key)
        jax.block_until_ready(m["G_loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:12s}: {dt * 1e3:8.2f} ms/step "
              f"({nb / dt:7.1f} slices/s)")
        results.append({"name": name, "ms_per_step": dt * 1e3,
                        "slices_per_s": nb / dt, "batch": nb,
                        "size": h, "filters": args.filters})

    # --- bare cycle kernel, fwd+bwd: fused Pallas vs pure XLA ----------
    from ideal_gan_tpu.ops import cycle_full_fused
    from ideal_gan_tpu.physics import cycle_full

    pm = jnp.asarray(maps[:, 2:3])
    a_j, te_j = jnp.asarray(acqs), jnp.asarray(te)

    def _cycle_loss(fn, uniform):
        def loss(p, a, t):
            kw = {"uniform_te": True} if uniform else {}
            _, a_hat = fn(a, p, t, **kw)
            return jnp.mean(jnp.square(a - a_hat))
        return jax.jit(jax.value_and_grad(loss))

    for name, fn, uniform in (("cycle fused", cycle_full_fused, True),
                              ("cycle XLA", cycle_full, False)):
        g = _cycle_loss(fn, uniform)
        l, _ = g(pm, a_j, te_j)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            l, gr = g(pm, a_j, te_j)
        jax.block_until_ready(l)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:12s}: {dt * 1e3:8.2f} ms/step "
              f"({nb / dt:7.1f} slices/s) [fwd+bwd]")
        results.append({"name": name, "ms_per_step": dt * 1e3,
                        "slices_per_s": nb / dt, "batch": nb, "size": h,
                        "note": "cycle kernel fwd+bwd only"})

    for bf16 in (False, True):
        cfg = dict(sup.DEFAULTS, n_G_filters=args.filters, batch_size=nb,
                   epochs=1, out_vars="PM", bf16=bf16)
        model = sup.build_model(cfg)
        step, tx = sup.make_train_step(cfg, model)
        state = sup.init_state(cfg, model, tx, key, acqs[:1])
        bench("sup (PM)" + (" bf16" if bf16 else ""), step, state,
              (jnp.asarray(acqs), jnp.asarray(maps), jnp.asarray(te)))

    for bf16 in (False, True):
        ucfg = dict(unsup.DEFAULTS, n_G_filters=args.filters, batch_size=nb,
                    epochs=1, bf16=bf16)
        g_fm, g_r2 = unsup.build_models(ucfg)
        step, tx = unsup.make_train_step(ucfg, g_fm, g_r2)
        state = unsup.init_state(ucfg, g_fm, g_r2, tx, key, acqs[:1])
        bench("unsup (FM)" + (" bf16" if bf16 else ""), step, state,
              (jnp.asarray(acqs), jnp.asarray(te)))

    for bf16 in (False, True):
        tcfg = dict(teaug.DEFAULTS, n_G_filters=args.filters, batch_size=nb,
                    epochs=1, bf16=bf16)
        model = teaug.build_model(tcfg)
        step, tx = teaug.make_train_step(tcfg, model)
        state = teaug.init_state(tcfg, model, tx, key, h=h, w=h)
        bench("teaug (VET)" + (" bf16" if bf16 else ""), step, state,
              (jnp.asarray(maps), jnp.asarray(te)))

    # --- PI-VAE GAN g+d steps (adversarial path) -----------------------
    from ideal_gan_tpu.train import gan as gan_tr
    ff = rng.uniform(0, 0.6, (nb, h, h)).astype(np.float32)
    pd = rng.uniform(0.3, 0.9, (nb, h, h)).astype(np.float32)
    zeros = np.zeros_like(ff)
    b_mag = np.stack([
        np.stack([ff, zeros], -1),
        np.stack([pd, rng.uniform(0, .4, (nb, h, h)).astype(np.float32)],
                 -1),
        np.stack([rng.uniform(-.2, .2, (nb, h, h)).astype(np.float32),
                  rng.uniform(-.2, .2, (nb, h, h)).astype(np.float32)],
                 -1)], 1).astype(np.float32)
    A_mag = np.asarray(jax.jit(ph.synthesize_mag)(jnp.asarray(b_mag),
                                                  jnp.asarray(te)))
    # The PI-VAE trains at batch 1–4 in the reference; at 384² the f32
    # g-step backward OOMs one v5e chip at batch 8 (XLA pads the
    # 12-channel decoder temporaries ~10×), so the GAN rows run at 2.
    gb = min(nb, 2)
    for bf16 in (False, True):
        gcfg = dict(gan_tr.DEFAULTS, batch_size=gb, epochs=1,
                    adv_train=True, A_loss="pix-wise", bf16=bf16)
        name = "gan (g+d)" + (" bf16" if bf16 else "")
        try:
            gmodels = gan_tr.build_models(gcfg)
            g_step, d_step, gtxs = gan_tr.make_train_steps(gcfg, gmodels)
            gstate = gan_tr.init_state(gcfg, gmodels, gtxs, key,
                                       A_mag[:1])
            gbatch = (jnp.asarray(A_mag[:gb]), jnp.asarray(b_mag[:gb]),
                      jnp.asarray(te[:gb]))
            gstate, gm, fake = g_step(gstate, gbatch, key)
            gstate, dm_ = d_step(gstate, gbatch[0], fake)
            jax.block_until_ready(dm_["D_loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                gstate, gm, fake = g_step(gstate, gbatch, key)
                gstate, dm_ = d_step(gstate, gbatch[0], fake)
            jax.block_until_ready(dm_["D_loss"])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:12s}: {dt * 1e3:8.2f} ms/step "
                  f"({gb / dt:7.1f} slices/s)")
            results.append({"name": name, "ms_per_step": dt * 1e3,
                            "slices_per_s": gb / dt, "batch": gb,
                            "size": h, "note": "PI-VAE adversarial g+d"})
        except Exception as e:  # OOM guard: keep the other rows
            print(f"{name:12s}: FAILED ({type(e).__name__})")

    # --- LDM denoiser step on PI-VAE latents ---------------------------
    from ideal_gan_tpu.train import ldm as ldm_tr
    lat_hw = h // (2 ** gcfg["n_downsamplings"])
    lcfg = dict(ldm_tr.DEFAULTS, batch_size=nb, epochs=1, in_res=lat_hw)
    zshape = (nb, lat_hw, lat_hw, gcfg["encoded_size"])
    lmodel = ldm_tr.build_model(lcfg, channels=zshape[-1])
    sched = ldm_tr.build_schedule(lcfg)
    lstep, ltx = ldm_tr.make_train_step(lcfg, lmodel, sched, None)
    lstate = ldm_tr.init_state(lcfg, lmodel, ltx, key, (1,) + zshape[1:])
    z = jnp.asarray(rng.normal(size=zshape).astype(np.float32))
    labels = jnp.zeros((nb,), jnp.int32)
    bench("ldm (eps)", lstep, lstate, (z, labels))

    if args.json:
        import datetime
        out = {"device": str(jax.devices()[0]),
               "config": {"size": h, "batch": nb,
                          "filters": args.filters, "iters": args.iters},
               "results": results}
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
