"""Isolate the XLA TPU compiler crash on the f32 teaug step at reference
width (BENCH_train_r03.json failed rows: "teaug (VET)" 72f/384² f32 plain
AND remat, "sup (PM) bf16 remat b32").

Each invocation compiles ONE configuration (compiles through the tunnel
take minutes, so the bisection is driven config-by-config rather than in
one process):

    python tools/xla_crash_repro.py --variant full          # the crash
    python tools/xla_crash_repro.py --variant fwd           # forward only
    python tools/xla_crash_repro.py --variant no_physics    # G + loss, no fit
    python tools/xla_crash_repro.py --variant no_lstm       # echo-fold front
    python tools/xla_crash_repro.py --variant no_adain      # no TE AdaIN
    python tools/xla_crash_repro.py --variant no_sa         # no self-attn
    python tools/xla_crash_repro.py --variant one_decoder   # single decoder
    python tools/xla_crash_repro.py --variant unet          # plain UNet PM
    python tools/xla_crash_repro.py --variant full --filters 48   # width
    python tools/xla_crash_repro.py --variant full --size 256     # resolution

Prints COMPILED ok (+ time) or the crash class/message. Findings live in
docs/DESIGN.md ("f32 compiler crash" section); the trainer CLI steers
users hitting the crash to the bf16 operating point (cli/train_teaug.py).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full",
                    choices=["full", "fwd", "no_physics", "no_lstm",
                             "no_adain", "no_sa", "one_decoder", "unet"])
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--filters", type=int, default=72)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--run", action="store_true",
                    help="also execute one step after compiling")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ideal_gan_tpu import physics as ph
    from ideal_gan_tpu.train import teaug as tr

    nb, h, width = args.batch, args.size, args.filters
    rng = np.random.default_rng(0)
    maps = (rng.normal(size=(nb, 3, h, h, 2)) * 0.3).astype(np.float32)
    te = np.asarray(ph.te_train(6, bs=nb))
    key = jax.random.PRNGKey(0)

    cfg = dict(tr.DEFAULTS, n_G_filters=width, batch_size=nb, epochs=1,
               bf16=args.bf16, remat=args.remat)
    v = args.variant
    if v == "no_adain":
        cfg["te_input"] = False
    if v == "no_sa":
        cfg["FM_SelfAttention"] = False
    if v == "unet":
        cfg["G_model"] = "U-Net"
    model = tr.build_model(cfg)

    if v in ("full", "no_adain", "no_sa", "unet"):
        step, tx = tr.make_train_step(cfg, model)
        state = tr.init_state(cfg, model, tx, key, h=h, w=h)
        target = lambda: step.lower(state, (jnp.asarray(maps),
                                            jnp.asarray(te)), key)
    else:
        # reduced computations around the same generator
        import optax
        from ideal_gan_tpu.models import VETNet
        # no_lstm folds echoes into batch, which the per-subject TE
        # AdaIN cannot broadcast over -> drop te_input for that variant
        me = VETNet(me_layer=(v != "no_lstm"), te_input=(v != "no_lstm"),
                    filters=width, remat=args.remat,
                    fm_self_attention=True,
                    dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        if v == "one_decoder":
            from ideal_gan_tpu.models import UNet
            me = UNet(n_out=2, me_layer=True, te_input=True, filters=width,
                      remat=args.remat, self_attention=True,
                      dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        acqs = np.asarray(jax.jit(ph.synthesize)(jnp.asarray(maps),
                                                 jnp.asarray(te)))
        x = jnp.asarray(acqs) if v != "no_lstm" else \
            jnp.asarray(acqs).reshape((nb, 6, h, h, 2))
        # init on a single-subject slice (params are batch-independent;
        # eager init at the full folded batch exhausts HBM)
        init_te = () if v == "no_lstm" else (te[:1, ..., 0],)
        params = me.init({"params": key, "bayes": key}, x[:1], *init_te)[
            "params"]

        te_args = () if v == "no_lstm" else (jnp.asarray(te[..., 0]),)
        if v == "fwd":
            f = jax.jit(lambda p, x, *t: me.apply({"params": p}, x, *t))
            target = lambda: f.lower(params, x, *te_args)
        else:  # no_physics / no_lstm / one_decoder: G + MAE loss + grad
            def loss_fn(p, x, *t):
                out = me.apply({"params": p}, x, *t)
                return jnp.mean(jnp.abs(out.astype(jnp.float32)))

            f = jax.jit(jax.value_and_grad(loss_fn))
            target = lambda: f.lower(params, x, *te_args)

    label = (f"{v} {width}f {h}^2 b{nb} "
             f"{'bf16' if args.bf16 else 'f32'}"
             f"{' remat' if args.remat else ''}")
    print(f"lowering {label} ...", flush=True)
    t0 = time.time()
    try:
        lowered = target()
        print(f"lowered in {time.time() - t0:.0f}s; compiling ...",
              flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"COMPILED ok in {time.time() - t0:.0f}s "
              f"(peak hbm: {compiled.memory_analysis()})", flush=True)
        return 0
    except Exception as e:
        msg = str(e)
        print(f"CRASH after {time.time() - t0:.0f}s: {type(e).__name__}")
        print(msg[:2000])
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
