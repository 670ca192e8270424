"""Fused Pallas kernels vs the pure-jnp physics reference (interpret mode
on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph
from ideal_gan_tpu import ops as kops

from test_physics import make_maps


def _setup(nb=2, h=24, w=128, ne=6, seed=11):
    maps = make_maps(nb=nb, h=h, w=w, seed=seed)
    te = ph.te_train(ne, bs=nb)
    acqs = ph.synthesize(jnp.asarray(maps), te)
    params = jnp.asarray(maps[:, 2:3])
    return maps, te, acqs, params


class TestFusedFit:
    def test_matches_jnp_reference(self):
        _, te, acqs, params = _setup()
        fused = np.asarray(kops.fit_rho_fused(acqs, params, te))
        ref = np.asarray(ph.fit_rho(acqs, params, te))
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_nonaligned_rows_padded(self):
        # H*W/128 = 9 rows → not a multiple of 8, exercises padding.
        _, te, acqs, params = _setup(h=9, w=128)
        fused = np.asarray(kops.fit_rho_fused(acqs, params, te))
        ref = np.asarray(ph.fit_rho(acqs, params, te))
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference(self):
        _, te, acqs, params = _setup(nb=1, h=8, w=128)

        def loss_fused(a, p):
            return jnp.sum(jnp.square(kops.fit_rho_fused(a, p, te)))

        def loss_ref(a, p):
            return jnp.sum(jnp.square(ph.fit_rho(a, p, te)))

        ga, gp = jax.grad(loss_fused, argnums=(0, 1))(acqs, params)
        ra, rp = jax.grad(loss_ref, argnums=(0, 1))(acqs, params)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), rtol=1e-3, atol=1e-4)


class TestFusedCycle:
    def test_matches_jnp_reference(self):
        _, te, acqs, params = _setup()
        fused = np.asarray(kops.cycle_fused(acqs, params, te))
        ref = np.asarray(ph.cycle(acqs, params, te))
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_idempotent_on_consistent_signal(self):
        _, te, acqs, params = _setup()
        out = np.asarray(kops.cycle_fused(acqs, params, te))
        np.testing.assert_allclose(out, np.asarray(acqs), rtol=2e-2, atol=2e-3)

    def test_gradient_matches_reference(self):
        _, te, acqs, params = _setup(nb=1, h=8, w=128)

        def loss_fused(p):
            return jnp.mean(jnp.square(kops.cycle_fused(acqs, p, te) - acqs))

        def loss_ref(p):
            return jnp.mean(jnp.square(ph.cycle(acqs, p, te) - acqs))

        gf = jax.grad(loss_fused)(params + 0.05)
        gr = jax.grad(loss_ref)(params + 0.05)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-3, atol=1e-5)


class TestFusedForward:
    def test_matches_jnp_reference(self):
        maps, te, _, _ = _setup()
        fused = np.asarray(kops.synthesize_fused(jnp.asarray(maps), te))
        ref = np.asarray(ph.synthesize(jnp.asarray(maps), te))
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_gradient_matches_reference(self):
        maps, te, _, _ = _setup(nb=1, h=8, w=128)
        maps = jnp.asarray(maps)
        target = ph.synthesize(maps, te)

        def loss_fused(m):
            return jnp.mean(jnp.square(kops.synthesize_fused(m, te) - target))

        def loss_ref(m):
            return jnp.mean(jnp.square(ph.synthesize(m, te) - target))

        gf = jax.grad(loss_fused)(maps + 0.02)
        gr = jax.grad(loss_ref)(maps + 0.02)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-3, atol=1e-5)


class TestCycleFull:
    def test_matches_jnp_reference(self):
        import ideal_gan_tpu.physics as ph2
        _, te, acqs, params = _setup()
        rho_f, recon_f = kops.cycle_full_fused(acqs, params, te)
        rho_r, recon_r = ph2.cycle_full(acqs, params, te)
        np.testing.assert_allclose(np.asarray(rho_f), np.asarray(rho_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(recon_f), np.asarray(recon_r),
                                   rtol=1e-4, atol=1e-5)

    def test_rho_matches_fit(self):
        _, te, acqs, params = _setup()
        rho_f, _ = kops.cycle_full_fused(acqs, params, te)
        fit = kops.fit_rho_fused(acqs, params, te)
        np.testing.assert_allclose(np.asarray(rho_f), np.asarray(fit),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients(self):
        _, te, acqs, params = _setup(nb=1, h=8, w=128)

        def loss_fused(p):
            rho, recon = kops.cycle_full_fused(acqs, p, te)
            return jnp.mean(jnp.square(recon - acqs)) + jnp.mean(rho)

        def loss_ref(p):
            import ideal_gan_tpu.physics as ph2
            rho, recon = ph2.cycle_full(acqs, p, te)
            return jnp.mean(jnp.square(recon - acqs)) + jnp.mean(rho)

        gf = jax.grad(loss_fused)(params + 0.05)
        gr = jax.grad(loss_ref)(params + 0.05)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-5)


class TestPhasorRecurrence:
    def test_nonuniform_te_falls_back_and_matches(self):
        """Jittered TE trains must take the per-echo path and stay exact."""
        maps, te, acqs, params = None, None, None, None
        key = jax.random.PRNGKey(5)
        te = ph.sample_te_train(key, 6, bs=2)  # non-uniform spacing
        maps_np = make_maps()
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        fused = np.asarray(kops.fit_rho_fused(acqs, params, te))
        ref = np.asarray(ph.fit_rho(acqs, params, te))
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_forced_uniform_matches_reference_12_echoes(self):
        """Recurrence chain over 12 echoes stays within f32 tolerance."""
        maps_np = make_maps()
        te = ph.te_train(12, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        fused = np.asarray(kops.fit_rho_fused(acqs, params, te,
                                              uniform_te=True))
        ref = np.asarray(ph.fit_rho(acqs, params, te))
        np.testing.assert_allclose(fused, ref, rtol=5e-4, atol=5e-5)

    def test_cycle_recurrence_matches(self):
        import ideal_gan_tpu.physics as ph2
        maps_np = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        rho_f, recon_f = kops.cycle_full_fused(acqs, params, te,
                                               uniform_te=True)
        rho_r, recon_r = ph2.cycle_full(acqs, params, te)
        np.testing.assert_allclose(np.asarray(rho_f), np.asarray(rho_r),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(recon_f), np.asarray(recon_r),
                                   rtol=2e-4, atol=2e-5)

    def test_forward_recurrence_matches(self):
        maps_np = jnp.asarray(make_maps())
        te = ph.te_train(6, bs=2)
        fused = np.asarray(kops.synthesize_fused(maps_np, te,
                                                 uniform_te=True))
        ref = np.asarray(ph.synthesize(maps_np, te))
        np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-5)


class TestPlanarFit:
    @pytest.mark.smoke
    def test_matches_mebcrn_path(self):
        maps_np = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        ref = np.asarray(kops.fit_rho_fused(acqs, params, te))
        rre, rim = kops.fit_rho_planar(
            acqs[..., 0], acqs[..., 1],
            params[:, 0, ..., 0], params[:, 0, ..., 1], te)
        np.testing.assert_allclose(np.asarray(rre), ref[..., 0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rim), ref[..., 1],
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_echo_inputs_track_f32(self):
        # bandwidth-saving serving mode: bf16 echo buffers, f32 math —
        # ρ must track the f32 path within bf16 input quantization
        maps_np = make_maps(h=64, w=128)
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        ref = kops.fit_rho_planar(
            acqs[..., 0], acqs[..., 1],
            params[:, 0, ..., 0], params[:, 0, ..., 1], te)
        out = kops.fit_rho_planar(
            acqs[..., 0].astype(jnp.bfloat16),
            acqs[..., 1].astype(jnp.bfloat16),
            params[:, 0, ..., 0], params[:, 0, ..., 1], te)
        for o, r in zip(out, ref):
            assert o.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=5e-3)

    def test_bf16_unalignable_shape_falls_back(self, caplog):
        # H not a multiple of the bf16 (16, 128) tile → f32 upcast with a
        # LOGGED warning (the caller asked for the bandwidth-saving mode
        # and must be told it isn't getting it)
        import logging
        maps_np = make_maps(h=40, w=128)
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        with caplog.at_level(logging.WARNING,
                             logger="ideal_gan_tpu.ops.pallas_ideal"):
            out = kops.fit_rho_planar(
                acqs[..., 0].astype(jnp.bfloat16),
                acqs[..., 1].astype(jnp.bfloat16),
                params[:, 0, ..., 0], params[:, 0, ..., 1], te)
        assert np.isfinite(np.asarray(out[0])).all()
        assert any("bf16" in r.message and "upcast" in r.message
                   for r in caplog.records)

    def test_bf16_output_tracks_f32(self):
        # bf16-ρ-output serving mode: accumulation stays f32, only the
        # final store narrows — values must match the f32 path within
        # bf16 output quantization, and the dtype must actually be bf16
        maps_np = make_maps(h=64, w=128)
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        ref = kops.fit_rho_planar(
            acqs[..., 0], acqs[..., 1],
            params[:, 0, ..., 0], params[:, 0, ..., 1], te)
        out = kops.fit_rho_planar(
            acqs[..., 0].astype(jnp.bfloat16),
            acqs[..., 1].astype(jnp.bfloat16),
            params[:, 0, ..., 0], params[:, 0, ..., 1], te,
            out_dtype=jnp.bfloat16)
        for o, r in zip(out, ref):
            assert o.dtype == jnp.bfloat16
            np.testing.assert_allclose(np.asarray(o, np.float32),
                                       np.asarray(r), atol=1e-2)

    def test_tile_rows_selection(self):
        # the H-tile must be a whole multiple of the dtype tile (8 f32 /
        # 16 bf16) AND divide H — a 24-row bf16 block is 1.5 physical
        # tiles and does not lower on TPU (round-3 review finding)
        from ideal_gan_tpu.ops.pallas_ideal import _tile_rows
        assert _tile_rows(1152, 384, 8) == 32   # 384² serving default
        assert _tile_rows(96, 640, 16) == 16    # budget tile 19 → 16
        assert _tile_rows(48, 512, 16) == 16    # budget tile 24 → 16
        assert _tile_rows(12, 128, 8) == 0      # no divisor ≥ 8 → fallback
        assert _tile_rows(40, 128, 16) == 0     # no 16-multiple divisor
        assert _tile_rows(40, 128, 8) == 8

    def test_bf16_output_offbudget_shapes_keep_dtype(self):
        # H/W where the VMEM-budget tile is not a 16-multiple: the tile
        # chooser must land on a 16-multiple divisor and keep the bf16
        # output (previously these silently fell back to f32 or emitted
        # fractional-tile blocks)
        te = ph.te_train(6, bs=2)
        for h, w in ((96, 640), (48, 512)):
            maps_np = make_maps(h=h, w=w)
            acqs = ph.synthesize(jnp.asarray(maps_np), te)
            params = jnp.asarray(maps_np[:, 2:3])
            ref = kops.fit_rho_planar(
                acqs[..., 0], acqs[..., 1],
                params[:, 0, ..., 0], params[:, 0, ..., 1], te)
            out = kops.fit_rho_planar(
                acqs[..., 0].astype(jnp.bfloat16),
                acqs[..., 1].astype(jnp.bfloat16),
                params[:, 0, ..., 0], params[:, 0, ..., 1], te,
                out_dtype=jnp.bfloat16)
            for o, r in zip(out, ref):
                assert o.dtype == jnp.bfloat16, (h, w)
                np.testing.assert_allclose(np.asarray(o, np.float32),
                                           np.asarray(r), atol=1e-2)

    def test_bf16_output_unalignable_shape_falls_back(self, caplog):
        # H % 16 != 0 → bf16 stores can't tile; must fall back to f32
        # output with a LOGGED warning, never a silent slow/wrong path
        import logging
        maps_np = make_maps(h=40, w=128)
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        with caplog.at_level(logging.WARNING,
                             logger="ideal_gan_tpu.ops.pallas_ideal"):
            out = kops.fit_rho_planar(
                acqs[..., 0], acqs[..., 1],
                params[:, 0, ..., 0], params[:, 0, ..., 1], te,
                out_dtype=jnp.bfloat16)
        assert out[0].dtype == jnp.float32
        assert np.isfinite(np.asarray(out[0])).all()
        assert any("bf16 output" in r.message for r in caplog.records)

    def test_f32_unalignable_height_full_coverage(self):
        # H with no divisor ≥ 8 (here 12 = 4·3) while W % 128 == 0: the
        # native-(H, W) path can't tile it; must route through the
        # lane-flattening fallback and still write EVERY row (the round-2
        # fallback under-covered the last rows).
        maps_np = make_maps(h=12, w=128)
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps_np), te)
        params = jnp.asarray(maps_np[:, 2:3])
        ref = np.asarray(kops.fit_rho_fused(acqs, params, te))
        rre, rim = kops.fit_rho_planar(
            acqs[..., 0], acqs[..., 1],
            params[:, 0, ..., 0], params[:, 0, ..., 1], te)
        np.testing.assert_allclose(np.asarray(rre), ref[..., 0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rim), ref[..., 1],
                                   rtol=1e-5, atol=1e-6)


class TestMagFitFused:
    def test_matches_jnp_reference(self):
        rng = np.random.default_rng(5)
        nb, ne, h, w = 2, 6, 24, 128
        te = ph.te_train(ne, bs=nb)
        acqs = jnp.asarray(np.abs(rng.normal(
            size=(nb, ne, h, w, 1))).astype(np.float32))
        out_maps = jnp.asarray(rng.uniform(
            0, 0.4, (nb, 1, h, w, 1)).astype(np.float32))
        ref = ph.cse_mag_fit(acqs, out_maps, te)
        rho, rec, ls, unc = kops.cse_mag_fused(acqs, out_maps, te)
        # f32 accumulation-order noise flips a handful of voxels sitting
        # exactly on the sqrt/eigen thresholds → atol dominates there
        np.testing.assert_allclose(np.asarray(rho), np.asarray(ref.rho),
                                   rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(ref.recon),
                                   rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(ref.ls_coeffs),
                                   rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(unc),
                                   np.asarray(ref.uncertainty),
                                   rtol=1e-3, atol=5e-4)

    def test_nonuniform_te(self):
        rng = np.random.default_rng(6)
        nb, ne, h, w = 1, 6, 16, 128
        te = ph.sample_te_train(jax.random.PRNGKey(1), ne, bs=nb)
        acqs = jnp.asarray(np.abs(rng.normal(
            size=(nb, ne, h, w, 1))).astype(np.float32))
        out_maps = jnp.asarray(rng.uniform(
            0, 0.4, (nb, 1, h, w, 1)).astype(np.float32))
        ref = ph.cse_mag_fit(acqs, out_maps, te)
        rho, rec, ls, unc = kops.cse_mag_fused(acqs, out_maps, te)
        np.testing.assert_allclose(np.asarray(rho), np.asarray(ref.rho),
                                   rtol=1e-3, atol=5e-4)


class TestConvLSTMFused:
    """Fused ME-ConvLSTM recurrence kernel (ops/pallas_convlstm.py) vs the
    unrolled XLA recurrence in models/convlstm.py (interpret mode on CPU;
    compiles natively on TPU)."""

    @staticmethod
    def _inputs(nb=2, ne=3, h=16, w=16, cin=2, f=8, seed=21):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(nb, ne, h, w, cin)).astype(np.float32) * 0.5
        k = (rng.normal(size=(3, 3, cin + f, 4 * f)) * 0.2).astype(
            np.float32)
        b = (rng.normal(size=(4 * f,)) * 0.1).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(k), jnp.asarray(b)

    def test_forward_matches_unrolled(self):
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        x, k, b = self._inputs(f=8)
        out = pc.convlstm_pallas(x, k, b, interpret=True)
        ref_out, _ = pc._jnp_reference(x, k, b, "leaky_relu", "sigmoid")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-5, atol=1e-6)

    def test_forward_matches_unrolled_offgranule_width(self):
        # f=6 is not a multiple of the f32 sublane granule — gate slices
        # land on unaligned sublane offsets
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        x, k, b = self._inputs(f=6, seed=22)
        out = pc.convlstm_pallas(x, k, b, interpret=True)
        ref_out, _ = pc._jnp_reference(x, k, b, "leaky_relu", "sigmoid")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-5, atol=1e-6)

    def test_multi_block_grid_halo_independence(self, monkeypatch):
        # Force the tiling to split both dims (nh=2, nw=2): cross-block
        # conv influence must ride the halo, blocks stay independent.
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        monkeypatch.setattr(pc, "_block_shape", lambda *a: (8, 8))
        x, k, b = self._inputs(h=16, seed=23)
        out = pc.convlstm_pallas(x, k, b, interpret=True)
        ref_out, _ = pc._jnp_reference(x, k, b, "leaky_relu", "sigmoid")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-5, atol=1e-6)

    def test_matches_convlstm_module(self):
        # End-to-end against the Flax module (merged-kernel XLA path).
        from ideal_gan_tpu.models.convlstm import ConvLSTM
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        x, _, _ = self._inputs(f=8, seed=24)
        m = ConvLSTM(filters=8)
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
        kx = params["params"]["input_conv"]["kernel"]
        kh = params["params"]["recurrent_conv"]["kernel"]
        b = params["params"]["input_conv"]["bias"]
        k = jnp.concatenate([kx, kh], axis=2)
        out = pc.convlstm_pallas(x, k, b, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_custom_vjp_matches_autodiff(self):
        # The hand-written reverse sweep (state-checkpointed) vs plain
        # autodiff through the unrolled recurrence.
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        x, k, b = self._inputs(nb=1, ne=3, h=8, w=8, f=8, seed=25)

        def loss_fused(x, k, b):
            return jnp.sum(jnp.square(pc.convlstm_fused(x, k, b)))

        def loss_ref(x, k, b):
            out, _ = pc._jnp_reference(x, k, b, "leaky_relu", "sigmoid")
            return jnp.sum(jnp.square(out))

        gx, gk, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k, b)
        rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   rtol=1e-4, atol=1e-5)


class TestConvLSTMFusedBackward:
    """Fused Pallas backward (in-VMEM state recompute + reverse sweep,
    ops/pallas_convlstm.py::convlstm_bwd_pallas) vs autodiff through the
    unrolled recurrence."""

    @staticmethod
    def _setup(nb=2, ne=3, h=16, w=16, cin=2, f=8, seed=31):
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(nb, ne, h, w, cin)) * 0.5,
                        jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, cin + f, 4 * f)) * 0.2,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(4 * f,)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.normal(size=(nb, h, w, f)), jnp.float32)

        def loss(x, k, b):
            out, _ = pc._jnp_reference(x, k, b, "leaky_relu", "sigmoid")
            return jnp.sum(out * g)

        ref = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
        return pc, x, k, b, g, ref

    def _check(self, got, ref):
        for a, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=2e-5)

    def test_single_block_matches_autodiff(self):
        pc, x, k, b, g, ref = self._setup()
        self._check(pc.convlstm_bwd_pallas(x, k, b, g, interpret=True),
                    ref)

    def test_multi_block_overlap_add_and_taint_fronts(self, monkeypatch):
        # nh=3, nw=3: dx must overlap-add across block windows; the
        # per-step legit-gradient/taint fronts must not leak garbage
        # into dk/db/dx
        pc, x, k, b, g, ref = self._setup(h=24, w=24, seed=32)
        monkeypatch.setattr(pc, "_block_shape_bwd", lambda *a: (8, 8))
        self._check(pc.convlstm_bwd_pallas(x, k, b, g, interpret=True),
                    ref)

    def test_full_echo_count(self, monkeypatch):
        # ne=6 (the production echo count): taint front travels the full
        # halo depth
        pc, x, k, b, g, ref = self._setup(nb=1, ne=6, h=24, w=24, seed=33)
        monkeypatch.setattr(pc, "_block_shape_bwd", lambda *a: (12, 12))
        self._check(pc.convlstm_bwd_pallas(x, k, b, g, interpret=True),
                    ref)

    def test_image_border_blocks(self, monkeypatch):
        # blocks whose halo crosses the image boundary (SAME padding)
        pc, x, k, b, g, ref = self._setup(nb=1, ne=4, h=16, w=16, seed=34)
        monkeypatch.setattr(pc, "_block_shape_bwd", lambda *a: (8, 16))
        self._check(pc.convlstm_bwd_pallas(x, k, b, g, interpret=True),
                    ref)
