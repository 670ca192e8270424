"""Microbenchmark: fused Pallas ConvLSTM recurrence vs the unrolled XLA
path (models/convlstm.py) at reference trainer shapes.

The ME-ConvLSTM front is ~2/3 of every me_layer trainer step
(docs/DESIGN.md round-4 attribution), and the XLA path is
layout-padding-bound: F-channel state tensors are laid out with channels
padded to 128 lanes (4× HBM bytes at F=32). The Pallas kernel
(ops/pallas_convlstm.py) keeps the recurrence state in VMEM with
channel-in-sublane layout.

    python benchmarks/convlstm_kernel.py [--bf16] [--size 384] [--batch 8]
                                         [--filters 32] [--echoes 6]
                                         [--grad]

Prints ms/iter for: XLA unrolled fwd, Pallas fwd, and (--grad) full
fwd+bwd through a scalar loss for both paths.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def _drain(out):
    """Force a device->host scalar read: under the axon tunnel,
    jax.block_until_ready alone does NOT drain the dispatch queue -
    timings without a value read measure dispatch, not compute."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--filters", type=int, default=32)
    ap.add_argument("--echoes", type=int, default=6)
    ap.add_argument("--cin", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ideal_gan_tpu.ops import pallas_convlstm as pc

    nb, ne, h, f, cin = (args.batch, args.echoes, args.size, args.filters,
                         args.cin)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(nb, ne, h, h, cin)) * 0.5, dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, cin + f, 4 * f)) * 0.2, dtype)
    b = jnp.asarray(rng.normal(size=(4 * f,)) * 0.1, dtype)

    label = (f"{h}^2 b{nb} ne{ne} F{f} "
             f"{'bf16' if args.bf16 else 'f32'}")
    print(f"ConvLSTM kernel bench @ {label} ({jax.devices()[0].platform})")

    xla_fwd = jax.jit(lambda x, k, b: pc._jnp_reference(
        x, k, b, "leaky_relu", "sigmoid")[0])
    pal_fwd = jax.jit(lambda x, k, b: pc.convlstm_pallas(x, k, b))

    t_xla = timeit(xla_fwd, x, k, b, iters=args.iters)
    print(f"  fwd  xla:    {t_xla:8.2f} ms")
    try:
        t_pal = timeit(pal_fwd, x, k, b, iters=args.iters)
        print(f"  fwd  pallas: {t_pal:8.2f} ms  ({t_xla / t_pal:.2f}x)")
        ref = xla_fwd(x, k, b)
        out = pal_fwd(x, k, b)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"  fwd  max|Δ|: {err:.2e}")
    except Exception as e:
        print(f"  fwd  pallas: FAILED {type(e).__name__}: {str(e)[:400]}")

    if args.grad:
        def loss_xla(x, k, b):
            out = pc._jnp_reference(x, k, b, "leaky_relu", "sigmoid")[0]
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        def loss_fused(x, k, b):
            out = pc.convlstm_fused(x, k, b)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        g_pal = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))
        t_xla = timeit(g_xla, x, k, b, iters=args.iters)
        print(f"  grad xla:    {t_xla:8.2f} ms")
        try:
            t_pal = timeit(g_pal, x, k, b, iters=args.iters)
            print(f"  grad pallas: {t_pal:8.2f} ms  ({t_xla / t_pal:.2f}x)")
            ga = g_xla(x, k, b)
            gb = g_pal(x, k, b)
            err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                            - p.astype(jnp.float32))))
                      for a, p in zip(ga, gb))
            print(f"  grad max|Δ|: {err:.2e}")
        except Exception as e:
            print(f"  grad pallas: FAILED {type(e).__name__}: "
                  f"{str(e)[:400]}")


if __name__ == "__main__":
    main()
