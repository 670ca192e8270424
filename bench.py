"""Benchmark: fused IDEAL map-fitting throughput (the framework's headline
metric, BASELINE.md: ≥5000 384² 6-echo slices/s map fitting).

Measures the production serving path: acquisitions are ingested once into
planar device buffers (as a real pipeline does at load time) and the fused
Pallas fitting kernel (phasor-recurrence variant) runs per batch. An
accuracy guard checks the fitted water/fat maps against the synthetic
ground truth before timing.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "slices/s", "vs_baseline": N}

vs_baseline is measured against the driver-supplied target of 5000
slices/s (BASELINE.json; the reference publishes no numbers — it runs
map fitting eagerly on CPU/GPU TF with no recorded throughput).
"""

import json
import time

import numpy as np

TARGET_SLICES_PER_SEC = 5000.0  # BASELINE.md driver target (TPU v5e-8)


def main():
    import jax
    # Persistent compilation cache: first-compile of the Pallas kernel via
    # the remote-compile tunnel is minutes; cache it across processes.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ideal_gan_tpu import physics as ph
    from ideal_gan_tpu import ops as kops

    nb, ne, h, w = 128, 6, 384, 384
    rng = np.random.default_rng(0)

    # Realistic inputs: synthesize signals from plausible maps.
    water = rng.uniform(0.1, 0.7, (nb, h, w))
    fat = rng.uniform(0.0, 0.5, (nb, h, w))
    phi = rng.uniform(-0.3, 0.3, (nb, h, w))
    r2s = rng.uniform(0.0, 0.5, (nb, h, w))
    maps = np.stack([
        np.stack([water, np.zeros_like(water)], -1),
        np.stack([fat, np.zeros_like(fat)], -1),
        np.stack([phi, r2s], -1)], axis=1).astype(np.float32)
    te = np.asarray(ph.te_train(ne, bs=nb))
    acqs = np.asarray(jax.jit(ph.synthesize)(jnp.asarray(maps),
                                             jnp.asarray(te)))

    # Ingest once into planar device buffers (load-time conversion).
    s_re = jax.device_put(np.ascontiguousarray(acqs[..., 0]))
    s_im = jax.device_put(np.ascontiguousarray(acqs[..., 1]))
    phi_d = jax.device_put(np.ascontiguousarray(maps[:, 2, ..., 0]))
    r2s_d = jax.device_put(np.ascontiguousarray(maps[:, 2, ..., 1]))

    # Precompute the tiny TE-dependent matrices once (one protocol per
    # serving pipeline) and keep them on device.
    pre = jax.jit(lambda t: kops.precompute_fit_matrices(t))(jnp.asarray(te))
    pre = jax.device_put(jax.tree_util.tree_map(np.asarray, pre))
    fit = jax.jit(lambda a, b, p, r: kops.fit_rho_planar(
        a, b, p, r, jnp.asarray(te), uniform_te=True, precomputed=pre))
    rre, rim = fit(s_re, s_im, phi_d, r2s_d)
    jax.block_until_ready((rre, rim))

    # Accuracy guard: fitted maps must match the ground truth.
    got = np.stack([np.asarray(rre), np.asarray(rim)], axis=-1)
    max_err = float(np.abs(got - maps[:, :2]).max())
    assert max_err < 5e-2, f"fused fit inaccurate: max err {max_err}"

    n_iter = 200
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fit(s_re, s_im, phi_d, r2s_d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    slices_per_sec = nb / dt

    # bf16-echo serving mode: halves the echo bytes of the
    # bandwidth-bound kernel (math stays f32 inside). Adopted as the
    # headline only if its PDFF deviation vs the f32 path stays far
    # inside the ±0.5 % acceptance envelope.
    sb_re = jax.device_put(jnp.asarray(s_re).astype(jnp.bfloat16))
    sb_im = jax.device_put(jnp.asarray(s_im).astype(jnp.bfloat16))
    rre_b, rim_b = fit(sb_re, sb_im, phi_d, r2s_d)
    jax.block_until_ready((rre_b, rim_b))

    def pdff(rre, rim):
        # cast first: ρ may be bf16 (ml_dtypes) which numpy complex math
        # doesn't accept directly
        rre = np.asarray(rre, dtype=np.float32)
        rim = np.asarray(rim, dtype=np.float32)
        w = np.abs(rre[:, 0] + 1j * rim[:, 0])
        f = np.abs(rre[:, 1] + 1j * rim[:, 1])
        return f / np.maximum(w + f, 1e-6)

    pdff_dev = float(np.abs(pdff(rre, rim) - pdff(rre_b, rim_b)).max())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fit(sb_re, sb_im, phi_d, r2s_d)
    jax.block_until_ready(out)
    dt_b = (time.perf_counter() - t0) / n_iter
    mode = "f32"
    if pdff_dev < 3e-3 and nb / dt_b > slices_per_sec:
        slices_per_sec = nb / dt_b
        mode = "bf16-echo"

    # bf16-ρ-output mode on top of bf16 echoes: halves the output bytes
    # too (accumulation stays f32; only the final store narrows). Same
    # gate: adopted only if the end-to-end PDFF deviation stays inside
    # the envelope and it is actually faster on this hardware.
    fit_bo = jax.jit(lambda a, b, p, r: kops.fit_rho_planar(
        a, b, p, r, jnp.asarray(te), uniform_te=True, precomputed=pre,
        out_dtype=jnp.bfloat16))
    rre_o, rim_o = fit_bo(sb_re, sb_im, phi_d, r2s_d)
    jax.block_until_ready((rre_o, rim_o))
    pdff_dev_o = float(np.abs(pdff(rre, rim) - pdff(rre_o, rim_o)).max())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fit_bo(sb_re, sb_im, phi_d, r2s_d)
    jax.block_until_ready(out)
    dt_o = (time.perf_counter() - t0) / n_iter
    if pdff_dev_o < 3e-3 and nb / dt_o > slices_per_sec:
        slices_per_sec = nb / dt_o
        mode = "bf16-echo+out"
        pdff_dev = pdff_dev_o

    print(json.dumps({
        "metric": "ideal_map_fit_throughput_384x384_6echo",
        "value": round(slices_per_sec, 1),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / TARGET_SLICES_PER_SEC, 3),
        "mode": mode,
        "bf16_pdff_dev": round(pdff_dev, 6),
    }))


if __name__ == "__main__":
    main()
