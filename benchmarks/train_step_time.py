"""Train-step wall-time + MFU benchmark (SURVEY §7 benchmark harness).

Times one full jitted training step (fwd + bwd + optimizer) for ALL seven
trainer families on synthetic data at each trainer's REFERENCE default
width (sup/teaug 72 filters — train-sup.py:32 / train-IDEAL-TEaug.py:34;
unsup 32 — train-IDEAL-unsup.py:34; mag/single 36 — train-IDEAL-mag.py:56
/ train-IDEAL-single.py:26), plus the bare physics-cycle kernel (fwd+bwd)
fused-Pallas vs pure-XLA, and the unsup step with the fused vs pure-XLA
physics path (the training-path value of the fused kernel).

Each row carries analytic FLOPs (XLA ``cost_analysis`` of the compiled
step), achieved TFLOP/s, and MFU against the chip's bf16 peak
(v5e: 197 TFLOP/s). f32 rows use the same bf16 peak as denominator —
the number answers "how far from the hardware's best case is this step",
deliberately not flattering f32 with a lower peak.

Run on TPU (full matrix ≈ 40–60 min of tunnel compiles; use --trainers
to subset):

    python benchmarks/train_step_time.py --size 384 --batch 8 \
        --json BENCH_train_r03.json [--trainers sup,unsup,...]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# reference per-trainer default widths (see module docstring)
REF_WIDTHS = {"sup": 72, "teaug": 72, "unsup": 32, "mag": 36, "single": 36}

PEAK_BF16 = {  # per-chip bf16 peak FLOP/s
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", str(device))
    for k, v in PEAK_BF16.items():
        if k.lower() in str(kind).lower():
            return v
    return None


def _flops_of(jitted, *args) -> float | None:
    """Analytic FLOPs of the compiled computation (XLA cost analysis)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--filters", type=int, default=0,
                    help="0 = each trainer's reference width (default)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trainers", default="cycle,sup,unsup,teaug,mag,"
                    "single,gan,ldm")
    ap.add_argument("--json", default="", help="write results to this file")
    args = ap.parse_args()
    selected = set(args.trainers.split(","))
    results = []

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ideal_gan_tpu import physics as ph
    from ideal_gan_tpu.train import mag as mag_tr
    from ideal_gan_tpu.train import single as single_tr
    from ideal_gan_tpu.train import sup, teaug, unsup

    peak = _peak_flops(jax.devices()[0])

    def width(trainer):
        return args.filters or REF_WIDTHS.get(trainer, 36)

    nb, h = args.batch, args.size
    rng = np.random.default_rng(0)
    maps = (rng.normal(size=(nb, 3, h, h, 2)) * 0.3).astype(np.float32)
    te = np.asarray(ph.te_train(6, bs=nb))
    acqs = np.asarray(jax.jit(ph.synthesize)(jnp.asarray(maps),
                                             jnp.asarray(te)))
    key = jax.random.PRNGKey(0)

    def record(name, dt, batch_n, flops, extra=None):
        row = {"name": name, "ms_per_step": dt * 1e3,
               "slices_per_s": batch_n / dt, "batch": batch_n, "size": h}
        if flops:
            row["flops_per_step"] = flops
            row["achieved_tflops"] = flops / dt / 1e12
            if peak:
                row["mfu_vs_bf16_peak"] = flops / dt / peak
        if extra:
            row.update(extra)
        results.append(row)
        mfu = row.get("mfu_vs_bf16_peak")
        print(f"{name:18s}: {dt * 1e3:8.2f} ms/step "
              f"({batch_n / dt:7.1f} slices/s)"
              + (f"  {row['achieved_tflops']:6.2f} TF/s"
                 f"  MFU {mfu * 100:5.1f}%" if mfu is not None else ""))

    def bench(name, step_fn, state, batch, batch_n=None, extra=None):
        batch_n = batch_n or nb
        try:
            return _bench(name, step_fn, state, batch, batch_n, extra)
        except Exception as e:  # OOM / compile failure: keep other rows
            msg = str(e).splitlines()[0][:120] if str(e) else ""
            print(f"{name:18s}: FAILED ({type(e).__name__}) {msg}")
            results.append({"name": name, "failed": type(e).__name__,
                            "batch": batch_n, "size": h, **(extra or {})})
            # a failed compile can leave HBM allocations behind and OOM
            # every later row — drop what we can (fully clean isolation
            # needs a fresh process: re-run with --trainers <family>,
            # which is what run_matrix.sh does)
            jax.clear_caches()
            return None

    def _bench(name, step_fn, state, batch, batch_n, extra):
        state, m = step_fn(state, batch, key)  # compile
        jax.block_until_ready(m["G_loss"])
        flops = _flops_of(step_fn, state, batch, key)
        # pipelined timing (block once at the end): cross-checked against
        # per-iteration sync — the difference is a constant ~30 ms of
        # host-sync tunnel overhead per step, not device time
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, batch, key)
        jax.block_until_ready(m["G_loss"])
        dt = (time.perf_counter() - t0) / args.iters
        record(name, dt, batch_n, flops, extra)

    # --- bare cycle kernel, fwd+bwd: fused Pallas vs pure XLA ----------
    if "cycle" in selected:
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
            # drain-read: under the axon tunnel block_until_ready alone
            # does not drain the dispatch queue for repeated same-input
            # calls (docs/DESIGN.md tunnel-timing note) — round-4's
            # "cycle XLA 0.08 ms" artifact
            float(l)
            flops = _flops_of(g, pm, a_j, te_j)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                l, gr = g(pm, a_j, te_j)
            float(l)
            dt = (time.perf_counter() - t0) / args.iters
            record(name, dt, nb, flops,
                   {"note": "cycle kernel fwd+bwd only"})

    if "sup" in selected:
        # two architectures per the reference's generator selection
        # (train-sup.py:176-187): out_vars=PM → 2-decoder PM_Generator
        # (the reference-default multi-decod path), WF-PM → 3-decoder
        # MDWF (comparable to the pre-r3 sup rows, which measured MDWF)
        for out_vars in ("PM", "WF-PM"):
            for bf16 in (False, True):
                cfg = dict(sup.DEFAULTS, n_G_filters=width("sup"),
                           batch_size=nb, epochs=1, out_vars=out_vars,
                           bf16=bf16)
                model = sup.build_model(cfg)
                step, tx = sup.make_train_step(cfg, model)
                state = sup.init_state(cfg, model, tx, key, acqs[:1])
                bench(f"sup ({out_vars})" + (" bf16" if bf16 else ""),
                      step, state,
                      (jnp.asarray(acqs), jnp.asarray(maps),
                       jnp.asarray(te)),
                      extra={"filters": width("sup")})

    if "unsup" in selected:
        for bf16, fused in ((False, True), (True, True), (False, False)):
            ucfg = dict(unsup.DEFAULTS, n_G_filters=width("unsup"),
                        batch_size=nb, epochs=1, bf16=bf16,
                        fused_physics=fused)
            g_fm, g_r2 = unsup.build_models(ucfg)
            step, tx = unsup.make_train_step(ucfg, g_fm, g_r2)
            state = unsup.init_state(ucfg, g_fm, g_r2, tx, key, acqs[:1])
            name = "unsup (FM)" + (" bf16" if bf16 else "") + \
                ("" if fused else " XLA-phys")
            bench(name, step, state, (jnp.asarray(acqs), jnp.asarray(te)),
                  extra={"filters": width("unsup"),
                         "fused_physics": fused})

    if "teaug" in selected:
        # At the reference width (72f) the plain f32 step OOMs one 16 GB
        # v5e at 384²·b8 — the remat rows are the configuration that
        # actually fits (per-block rematerialization, models/unet.py).
        # IDEAL_GAN_SKIP_CRASH_ROWS=1 records the two known
        # compiler-crash f32 rows (docs/DESIGN.md) without attempting
        # them — in round 5 the crashing compile started HANGING the
        # tunnel helper indefinitely instead of failing in ~20 s, which
        # wedges the whole matrix run.
        import os as _os
        skip_crash = (_os.environ.get("IDEAL_GAN_SKIP_CRASH_ROWS") == "1"
                      and h >= 384 and nb >= 8)
        only_micro = _os.environ.get("IDEAL_GAN_ONLY_MICRO_ROW") == "1"
        variants = (() if only_micro else
                    ((False, False), (True, False), (False, True),
                     (True, True)))
        for bf16, remat in variants:
            if skip_crash and not bf16:
                results.append({
                    "name": "teaug (VET)" + (" remat" if remat else ""),
                    "failed": "known-compiler-crash (skipped; "
                              "docs/DESIGN.md f32 crash)",
                    "batch": nb, "size": h,
                    "filters": width("teaug"), "remat": remat})
                continue
            tcfg = dict(teaug.DEFAULTS, n_G_filters=width("teaug"),
                        batch_size=nb, epochs=1, bf16=bf16, remat=remat)
            model = teaug.build_model(tcfg)
            step, tx = teaug.make_train_step(tcfg, model)
            state = teaug.init_state(tcfg, model, tx, key, h=h, w=h)
            bench("teaug (VET)" + (" bf16" if bf16 else "")
                  + (" remat" if remat else ""), step, state,
                  (jnp.asarray(maps), jnp.asarray(te)),
                  extra={"filters": width("teaug"), "remat": remat})
        # The monolithic f32 384²·b8 backward crashes the XLA compiler
        # (docs/DESIGN.md); --microbatch 2 gradient accumulation keeps
        # each scan-body backward at batch 2, which compiles — this row
        # is the reference f32 72-filter config actually running.
        # IDEAL_GAN_ONLY_MICRO_ROW=1 runs JUST this row (it is the
        # longest compile of the family; isolating it keeps a tunnel
        # hang from losing the measured bf16 rows), and
        # IDEAL_GAN_SKIP_MICRO_ROW=1 skips it.
        if _os.environ.get("IDEAL_GAN_SKIP_MICRO_ROW") != "1":
            tcfg = dict(teaug.DEFAULTS, n_G_filters=width("teaug"),
                        batch_size=nb, epochs=1, microbatch=2)
            model = teaug.build_model(tcfg)
            step, tx = teaug.make_train_step(tcfg, model)
            state = teaug.init_state(tcfg, model, tx, key, h=h, w=h)
            bench("teaug (VET) micro2", step, state,
                  (jnp.asarray(maps), jnp.asarray(te)),
                  extra={"filters": width("teaug"), "microbatch": 2})

    if "mag" in selected:
        for bf16 in (False, True):
            mcfg = dict(mag_tr.DEFAULTS, n_G_filters=width("mag"),
                        batch_size=nb, epochs=1, bf16=bf16)
            model = mag_tr.build_model(mcfg)
            step, tx = mag_tr.make_train_step(mcfg, model)
            state = mag_tr.init_state(mcfg, model, tx, key, h=h, w=h)
            bench("mag (Rician)" + (" bf16" if bf16 else ""), step, state,
                  (jnp.asarray(maps), jnp.asarray(te)),
                  extra={"filters": width("mag")})

    if "single" in selected:
        for bf16 in (False, True):
            scfg = dict(single_tr.DEFAULTS, n_G_filters=width("single"),
                        epochs=1, bf16=bf16)
            g_mag, g_pha = single_tr.build_models(scfg)
            step, tx = single_tr.make_train_step(scfg, g_mag, g_pha)
            state = single_tr.init_state(scfg, g_mag, g_pha, tx, key,
                                         h=h, w=h)
            # single-subject fitter: batch 1 in the reference
            sb = 1
            bench("single (fit)" + (" bf16" if bf16 else ""), step, state,
                  (jnp.asarray(acqs[:sb]), jnp.asarray(maps[:sb]),
                   jnp.asarray(te[:sb])), batch_n=sb,
                  extra={"filters": width("single")})

    if "phys" in selected:
        # Bare physics of the single-subject fitter: synthesize_mag_phase
        # fwd+bwd at the trainer's batch (1). Quantifies how much of the
        # single (fit) step is physics vs CNN — the evidence for whether
        # an analytic Pallas backward would pay (VERDICT round-2 weak #3).
        pmp = np.concatenate(
            [rng.uniform(0, 1, (1, 1, h, h, 4)).astype(np.float32),
             rng.uniform(-1, 1, (1, 1, h, h, 4)).astype(np.float32)], 1)
        sp_fwd = jax.jit(lambda p, t: ph.synthesize_mag_phase(p, t))
        a_sp = np.asarray(sp_fwd(jnp.asarray(pmp), jnp.asarray(te[:1])))

        def sp_loss(p, a, t):
            return jnp.mean(jnp.square(a - ph.synthesize_mag_phase(p, t)))

        g_sp = jax.jit(jax.value_and_grad(sp_loss))
        p_j, a_j2, t_j = (jnp.asarray(pmp), jnp.asarray(a_sp),
                          jnp.asarray(te[:1]))
        l, _ = g_sp(p_j, a_j2, t_j)
        jax.block_until_ready(l)
        flops = _flops_of(g_sp, p_j, a_j2, t_j)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            l, gr = g_sp(p_j, a_j2, t_j)
        jax.block_until_ready(l)
        record("single physics", (time.perf_counter() - t0) / args.iters,
               1, flops,
               {"note": "bare synthesize_mag_phase fwd+bwd, batch 1 "
                        "(physics fraction of the single step)"})

    if "scale" in selected:
        # Throughput scaling at reference width: bf16 + larger per-chip
        # batch (the VERDICT round-2 item-3 lever). slices/s is the
        # figure of merit; remat trades recompute for the activation
        # memory that otherwise caps the batch.
        nb2 = 2 * nb
        maps2 = (rng.normal(size=(nb2, 3, h, h, 2)) * 0.3).astype(np.float32)
        te2 = np.asarray(ph.te_train(6, bs=nb2))
        acqs2 = np.asarray(jax.jit(ph.synthesize)(jnp.asarray(maps2),
                                                  jnp.asarray(te2)))
        import os as _os
        skip_crash = (_os.environ.get("IDEAL_GAN_SKIP_CRASH_ROWS") == "1"
                      and h >= 384 and nb >= 8)
        for bf16, remat, mult in ((True, False, 2), (True, True, 4)):
            bs = mult * nb
            if skip_crash and remat and mult == 4:
                # bf16 remat b32: known compiler crash (BENCH_train_r03;
                # in round 5 the crashing compile hangs the tunnel)
                results.append({
                    "name": f"sup (PM) bf16 remat b{bs}",
                    "failed": "known-compiler-crash (skipped; "
                              "docs/DESIGN.md f32 crash class)",
                    "batch": bs, "size": h, "filters": width("sup"),
                    "remat": True})
                continue
            cfg = dict(sup.DEFAULTS, n_G_filters=width("sup"), batch_size=bs,
                       epochs=1, out_vars="PM", bf16=bf16, remat=remat)
            model = sup.build_model(cfg)
            step, tx = sup.make_train_step(cfg, model)
            state = sup.init_state(cfg, model, tx, key, acqs[:1])
            a_b = np.concatenate([acqs2] * (mult // 2))[:bs]
            m_b = np.concatenate([maps2] * (mult // 2))[:bs]
            t_b = np.concatenate([te2] * (mult // 2))[:bs]
            bench(f"sup (PM) bf16{' remat' if remat else ''} b{bs}",
                  step, state,
                  (jnp.asarray(a_b), jnp.asarray(m_b), jnp.asarray(t_b)),
                  batch_n=bs, extra={"filters": width("sup"),
                                     "remat": remat})
        # The b32 remat backward crashes the XLA compiler monolithically
        # (BENCH_train_r03) — microbatch 8 keeps each scan-body backward
        # at the known-good b8 plan.
        bs = 4 * nb
        cfg = dict(sup.DEFAULTS, n_G_filters=width("sup"), batch_size=bs,
                   epochs=1, out_vars="PM", bf16=True, microbatch=nb)
        model = sup.build_model(cfg)
        step, tx = sup.make_train_step(cfg, model)
        state = sup.init_state(cfg, model, tx, key, acqs[:1])
        a_b = np.concatenate([acqs2, acqs2])[:bs]
        m_b = np.concatenate([maps2, maps2])[:bs]
        t_b = np.concatenate([te2, te2])[:bs]
        bench(f"sup (PM) bf16 b{bs} micro{nb}", step, state,
              (jnp.asarray(a_b), jnp.asarray(m_b), jnp.asarray(t_b)),
              batch_n=bs, extra={"filters": width("sup"),
                                 "microbatch": nb})
        for mult in (2,):
            bs = mult * nb
            tcfg = dict(teaug.DEFAULTS, n_G_filters=width("teaug"),
                        batch_size=bs, epochs=1, bf16=True, remat=True)
            model = teaug.build_model(tcfg)
            step, tx = teaug.make_train_step(tcfg, model)
            state = teaug.init_state(tcfg, model, tx, key, h=h, w=h)
            bench(f"teaug (VET) bf16 remat b{bs}", step, state,
                  (jnp.asarray(maps2[:bs]), jnp.asarray(te2[:bs])),
                  batch_n=bs, extra={"filters": width("teaug"),
                                     "remat": True})

    # --- PI-VAE GAN g+d steps (adversarial path) -----------------------
    gcfg = None
    if "gan" in selected:
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
                gf = _flops_of(g_step, gstate, gbatch, key) or 0.0
                df = _flops_of(d_step, gstate, gbatch[0], fake) or 0.0
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    gstate, gm, fake = g_step(gstate, gbatch, key)
                    gstate, dm_ = d_step(gstate, gbatch[0], fake)
                jax.block_until_ready(dm_["D_loss"])
                dt = (time.perf_counter() - t0) / args.iters
                record(name, dt, gb, (gf + df) or None,
                       {"note": "PI-VAE adversarial g+d"})
            except Exception as e:  # OOM guard: keep the other rows
                print(f"{name:18s}: FAILED ({type(e).__name__})")

    # --- LDM denoiser step on PI-VAE latents ---------------------------
    if "ldm" in selected:
        from ideal_gan_tpu.train import gan as gan_tr
        from ideal_gan_tpu.train import ldm as ldm_tr
        try:
            if gcfg is None:
                gcfg = dict(gan_tr.DEFAULTS)
            lat_hw = h // (2 ** gcfg["n_downsamplings"])
            lcfg = dict(ldm_tr.DEFAULTS, batch_size=nb, epochs=1,
                        in_res=lat_hw)
            zshape = (nb, lat_hw, lat_hw, gcfg["encoded_size"])
            lmodel = ldm_tr.build_model(lcfg, channels=zshape[-1])
            sched = ldm_tr.build_schedule(lcfg)
            lstep, ltx = ldm_tr.make_train_step(lcfg, lmodel, sched, None)
            lstate = ldm_tr.init_state(lcfg, lmodel, ltx, key,
                                       (1,) + zshape[1:])
            z = jnp.asarray(rng.normal(size=zshape).astype(np.float32))
            labels = jnp.zeros((nb,), jnp.int32)
            bench("ldm (eps)", lstep, lstate, (z, labels))
        except Exception as e:  # setup itself can OOM after leaked rows
            print(f"ldm (eps)        : FAILED ({type(e).__name__})")
            results.append({"name": "ldm (eps)",
                            "failed": type(e).__name__, "size": h})

    if args.json:
        out = {"device": str(jax.devices()[0]),
               "peak_bf16_flops": peak,
               "config": {"size": h, "batch": nb,
                          "filters": args.filters or "reference-widths",
                          "iters": args.iters},
               "results": results}
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
