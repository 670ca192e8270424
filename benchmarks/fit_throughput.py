"""Map-fitting throughput sweep (SURVEY §7 benchmark harness).

Reports slices/s for the fused fitting kernel across batch sizes and
image sizes, on both the planar serving path and the MEBCRN API, plus the
pure-XLA jnp path for comparison. Run on TPU:

    python benchmarks/fit_throughput.py [--sizes 192,384] [--batches 8,32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="192,384")
    ap.add_argument("--batches", default="8,32")
    ap.add_argument("--ne", type=int, default=6)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ideal_gan_tpu import ops as kops
    from ideal_gan_tpu import physics as ph

    def timeit(f, *a, n=args.iters):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    rng = np.random.default_rng(0)
    for size in map(int, args.sizes.split(",")):
        for nb in map(int, args.batches.split(",")):
            te = np.asarray(ph.te_train(args.ne, bs=nb))
            acqs = jax.device_put(rng.normal(
                size=(nb, args.ne, size, size, 2)).astype(np.float32) * 0.3)
            params = jax.device_put(rng.normal(
                size=(nb, 1, size, size, 2)).astype(np.float32) * 0.1)
            s_re = jax.device_put(np.asarray(acqs)[..., 0].copy())
            s_im = jax.device_put(np.asarray(acqs)[..., 1].copy())
            phi = jax.device_put(np.asarray(params)[:, 0, ..., 0].copy())
            r2s = jax.device_put(np.asarray(params)[:, 0, ..., 1].copy())
            pre = jax.jit(lambda t: kops.precompute_fit_matrices(t))(
                jnp.asarray(te))
            pre = jax.device_put(jax.tree_util.tree_map(np.asarray, pre))

            planar = jax.jit(lambda a, b, p, r: kops.fit_rho_planar(
                a, b, p, r, jnp.asarray(te), uniform_te=True,
                precomputed=pre))
            mebcrn = jax.jit(lambda a, p: kops.fit_rho_fused(
                a, p, jnp.asarray(te)))
            xla = jax.jit(lambda a, p: ph.fit_rho(a, p, jnp.asarray(te)))

            t1 = timeit(planar, s_re, s_im, phi, r2s)
            t2 = timeit(mebcrn, acqs, params)
            t3 = timeit(xla, acqs, params)
            print(f"{size}x{size} ne={args.ne} nb={nb}: "
                  f"planar {nb / t1:8.0f}  mebcrn {nb / t2:8.0f}  "
                  f"xla {nb / t3:8.0f} slices/s")


if __name__ == "__main__":
    main()
