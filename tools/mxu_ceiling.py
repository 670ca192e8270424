"""Shape-constrained MXU ceiling for the training steps (roofline tool).

The v5e MXU is a 128x128 systolic array: a conv/matmul with contraction
size K and output-feature size N occupies ceil(K/128)*128 x
ceil(N/128)*128 lanes, so its best-case utilization is

    eff = K/(128*ceil(K/128)) * N/(128*ceil(N/128)).

The reference network widths (72/144/288 filters, train-sup.py:32) are
not multiples of 128, so even a perfect schedule cannot reach the chip's
bf16 peak. This tool traces a trainer's jitted step (abstract eval only
-- runs on CPU in seconds), walks the jaxpr for every
`conv_general_dilated` / `dot_general`, and reports the time-weighted
ceiling

    MFU_max = sum(FLOPs) / sum(FLOPs/eff)

i.e. the MFU an ideal scheduler would reach if every MXU op ran at its
shape-limited rate and everything else were free. Compare against the
measured MFU in BENCH_train_r03.json: the gap ceiling->measured is
scheduling/fusion/bandwidth loss; the gap ceiling->100% is the
reference's channel sizes, which parity pins.

Run:  python tools/mxu_ceiling.py [--size 384] [--batch 8]
"""

import argparse
import math
import sys
from collections import defaultdict

sys.path.insert(0, ".")


def _ceil_mult(x, m):
    return m * math.ceil(x / m)


def walk_jaxpr(jaxpr, stats):
    """Accumulate (flops, flops/eff) for every MXU op in a (closed)
    jaxpr, recursing into sub-jaxprs (scan/cond/while bodies — the
    ConvLSTM runs its convs under lax.scan). Loop trip counts scale the
    body's cost."""
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            dn = eqn.params["dimension_numbers"]
            lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
            out = eqn.outvars[0].aval.shape
            # contraction = rhs spatial taps x input features
            k_spatial = [rhs[i] for i in dn.rhs_spec[2:]]
            cin = rhs[dn.rhs_spec[1]]
            cout = out[dn.out_spec[1]]
            m = math.prod(out) // cout
            k = math.prod(k_spatial) * cin
            # feature_group_count (depthwise) divides the contraction
            k //= eqn.params.get("feature_group_count", 1)
            flops = 2.0 * m * k * cout
            eff = (k / _ceil_mult(k, 128)) * (cout / _ceil_mult(cout, 128))
            stats[(prim, k, cout)][0] += flops
            stats[(prim, k, cout)][1] += flops / eff
        elif prim == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
            k = math.prod(lhs[i] for i in lc) or 1
            nb = math.prod(rhs[i] for i in rb) or 1
            n = math.prod(rhs) // (k * nb) or 1
            mdim = math.prod(lhs) // (k * nb) or 1
            flops = 2.0 * nb * mdim * k * n
            eff = (k / _ceil_mult(k, 128)) * (n / _ceil_mult(n, 128))
            stats[(prim, k, n)][0] += flops
            stats[(prim, k, n)][1] += flops / eff
        else:
            trip = 1
            if prim == "scan":
                trip = eqn.params.get("length", 1)
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                    inner = defaultdict(lambda: [0.0, 0.0])
                    walk_jaxpr(sub.jaxpr, inner)
                    for key, (f, fe) in inner.items():
                        stats[key][0] += trip * f
                        stats[key][1] += trip * fe
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            inner = defaultdict(lambda: [0.0, 0.0])
                            walk_jaxpr(s.jaxpr, inner)
                            for key, (f, fe) in inner.items():
                                stats[key][0] += trip * f
                                stats[key][1] += trip * fe
    return stats


def ceiling_of(fn, *args):
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    stats = walk_jaxpr(jaxpr.jaxpr, defaultdict(lambda: [0.0, 0.0]))
    total_f = sum(f for f, _ in stats.values())
    total_fe = sum(fe for _, fe in stats.values())
    return stats, total_f, (total_f / total_fe if total_fe else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trainer", default="sup",
                    choices=["sup", "teaug", "unsup"])
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # abstract eval only
    import jax.numpy as jnp
    import numpy as np

    from ideal_gan_tpu import physics as ph

    nb, h = args.batch, args.size
    rng = np.random.default_rng(0)
    maps = jnp.asarray((rng.normal(size=(nb, 3, h, h, 2)) * 0.3)
                       .astype(np.float32))
    te = jnp.asarray(np.asarray(ph.te_train(6, bs=nb)))
    acqs = ph.synthesize(maps, te)
    key = jax.random.PRNGKey(0)

    if args.trainer == "sup":
        from ideal_gan_tpu.train import sup as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=72, batch_size=nb, epochs=1,
                   out_vars="PM", bf16=True)
        model = tr.build_model(cfg)
        step, tx = tr.make_train_step(cfg, model)
        state = tr.init_state(cfg, model, tx, key, acqs[:1])
        batch = (acqs, maps, te)
    elif args.trainer == "teaug":
        from ideal_gan_tpu.train import teaug as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=72, batch_size=nb, epochs=1,
                   bf16=True)
        model = tr.build_model(cfg)
        step, tx = tr.make_train_step(cfg, model)
        state = tr.init_state(cfg, model, tx, key, h=h, w=h)
        batch = (maps, te)
    else:
        from ideal_gan_tpu.train import unsup as tr
        cfg = dict(tr.DEFAULTS, n_G_filters=32, batch_size=nb, epochs=1,
                   bf16=True)
        g_fm, g_r2 = tr.build_models(cfg)
        step, tx = tr.make_train_step(cfg, g_fm, g_r2)
        state = tr.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
        batch = (acqs, te)

    stats, total_f, ceiling = ceiling_of(step, state, batch, key)
    rows = sorted(stats.items(), key=lambda kv: -kv[1][0])
    print(f"{args.trainer} step @ {h}^2 b{nb}: "
          f"{total_f / 1e12:.2f} TFLOP in MXU ops")
    print(f"{'op':22s} {'K':>6s} {'N':>6s} {'TFLOP':>8s} {'share':>7s} "
          f"{'eff':>6s}")
    for (prim, k, n), (f, fe) in rows[:args.top]:
        print(f"{prim:22s} {k:6d} {n:6d} {f / 1e12:8.3f} "
              f"{100 * f / total_f:6.1f}% {100 * f / fe:5.1f}%")
    print(f"\nshape-constrained MXU ceiling (time-weighted): "
          f"{100 * ceiling:.1f}% of peak")
    print("achieved MFU / this ceiling = scheduler+bandwidth efficiency")


if __name__ == "__main__":
    main()
