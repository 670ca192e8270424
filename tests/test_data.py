"""Data layer tests: layout converters, HDF5 loading semantics, augments,
replay pool, phase unwrap."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import data as dlib

h5py = pytest.importorskip("h5py")


def make_legacy_dataset(n=12, h=16, w=16, ne=6, seed=0):
    rng = np.random.default_rng(seed)
    acqs = rng.normal(size=(n, h, w, 2 * ne)).astype(np.float32)
    maps = rng.normal(size=(n, h, w, 6)).astype(np.float32)
    tes = (0.0013 + 0.0021 * np.arange(ne, dtype=np.float32))[None].repeat(n, 0)
    return acqs, maps, tes


@pytest.fixture()
def h5file(tmp_path):
    acqs, maps, tes = make_legacy_dataset()
    maps[3] = 0.0  # a zero slice to be filtered
    path = str(tmp_path / "cohort.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("Acquisitions", data=acqs)
        f.create_dataset("OutMaps", data=maps)
        f.create_dataset("TEs", data=tes)
    return path, acqs, maps, tes


class TestLayouts:
    def test_acqs_roundtrip(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(2, 6, 8, 8, 2)).astype(np.float32))
        legacy = dlib.acqs_from_mebcrn(a)
        assert legacy.shape == (2, 8, 8, 12)
        # interleaving: ch0=re(e0), ch1=im(e0), ch2=re(e1)...
        np.testing.assert_allclose(np.asarray(legacy)[..., 0],
                                   np.asarray(a)[:, 0, :, :, 0])
        np.testing.assert_allclose(np.asarray(legacy)[..., 3],
                                   np.asarray(a)[:, 1, :, :, 1])
        back = dlib.acqs_to_mebcrn(legacy)
        np.testing.assert_allclose(np.asarray(back), np.asarray(a))

    def test_maps_roundtrip_all(self):
        rng = np.random.default_rng(2)
        legacy = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
        meb = dlib.maps_to_mebcrn(legacy, mode="All")
        assert meb.shape == (2, 3, 8, 8, 2)
        back = dlib.maps_from_mebcrn(meb)
        np.testing.assert_allclose(np.asarray(back), np.asarray(legacy))

    def test_maps_wf_pm_modes(self):
        rng = np.random.default_rng(3)
        wf = jnp.asarray(rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
        out = dlib.maps_to_mebcrn(wf, mode="WF")
        assert out.shape == (2, 2, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(out)[:, 0, :, :, 0],
                                   np.asarray(wf)[..., 0])
        assert np.all(np.asarray(out)[..., 1] == 0)
        pm = dlib.maps_to_mebcrn(wf, mode="PM")
        assert pm.shape == (2, 1, 8, 8, 2)
        # PM mode: input [R2*, FM] → output (FM, R2*)
        np.testing.assert_allclose(np.asarray(pm)[:, 0, :, :, 0],
                                   np.asarray(wf)[..., 1])
        wfpm = dlib.maps_to_mebcrn(
            jnp.asarray(np.random.default_rng(4).normal(
                size=(2, 8, 8, 4)).astype(np.float32)), mode="WF-PM")
        assert wfpm.shape == (2, 3, 8, 8, 2)


class TestHdf5:
    def test_load_range_and_zero_filter(self, h5file):
        path, acqs, maps, _ = h5file
        d = dlib.load_hdf5(path, ech_idx=12, start=0, end=100)
        assert len(d.maps) == 11  # one zero slice dropped
        assert d.acqs.shape == (11, 16, 16, 12)

    @pytest.mark.smoke
    def test_load_mebcrn(self, h5file):
        path, acqs, maps, _ = h5file
        d = dlib.load_hdf5(path, ech_idx=12, mebcrn=True)
        assert d.acqs.shape == (11, 6, 16, 16, 2)
        assert d.maps.shape == (11, 3, 16, 16, 2)
        # MEBCRN maps: row0=water(re,im), row2=(FM, R2*)
        keep = [i for i in range(12) if i != 3]
        np.testing.assert_allclose(d.maps[:, 0], maps[keep][..., :2])
        np.testing.assert_allclose(d.maps[:, 2, ..., 0], maps[keep][..., 5])
        np.testing.assert_allclose(d.maps[:, 2, ..., 1], maps[keep][..., 4])
        np.testing.assert_allclose(d.acqs[:, 2, :, :, 0], acqs[keep][..., 4])

    def test_load_mag_phase(self, h5file):
        path, _, maps, _ = h5file
        d = dlib.load_hdf5(path, ech_idx=12, mebcrn=True, mag_and_phase=True,
                           remove_zeros=False)
        assert d.maps.shape == (12, 3, 16, 16, 2)
        w_mag = np.hypot(maps[..., 0], maps[..., 1])
        f_mag = np.hypot(maps[..., 2], maps[..., 3])
        np.testing.assert_allclose(d.maps[:, 1, ..., 0], w_mag + f_mag,
                                   rtol=1e-5, atol=1e-6)
        tot = w_mag + f_mag
        ff = np.divide(f_mag, tot, out=np.zeros_like(tot), where=tot != 0)
        np.testing.assert_allclose(d.maps[:, 0, ..., 0], ff, rtol=1e-5, atol=1e-6)

    def test_custom_list_and_te(self, h5file):
        path, acqs, maps, tes = h5file
        d = dlib.load_hdf5(path, ech_idx=12, custom_list=[0, 1, 2],
                           te_data=True, remove_zeros=False)
        assert len(d.maps) == 3
        assert d.tes.shape == (3, 6, 1)

    def test_num_slice_list(self, h5file):
        """Reference semantics (data.py:63-78): the scan starts at the end
        of the first block and keeps indices strictly more than 4 away from
        the running patient boundary — for [0, 12] on a 12-slice file that
        keeps the central slices 5, 6, 7."""
        path, *_ = h5file
        d = dlib.load_hdf5(path, ech_idx=12, num_slice_list=[0, 12],
                           remove_zeros=False)
        assert len(d.maps) == 3

    def test_iterate_hdf5_streams_and_wraps(self, h5file, tmp_path):
        """Streaming generator (reference gen_hdf5, data.py:156-176):
        forward ranges stream [lo, hi); wrap-around ranges (hi < lo)
        stream [0, hi) then [lo, n); zero OutMaps slices are skipped."""
        path, acqs, maps, tes = h5file  # slice 3 is all-zero
        items = list(dlib.iterate_hdf5([path], ech_idx=12,
                                       lims_list=[(0, 5)]))
        assert len(items) == 4  # 0,1,2,4 (3 filtered)
        im, out = items[0]
        assert im.shape == (16, 16, 12)
        np.testing.assert_allclose(out, maps[0])
        np.testing.assert_allclose(items[3][1], maps[4])

        # keep zeros
        items = list(dlib.iterate_hdf5([path], ech_idx=12,
                                       lims_list=[(0, 5)],
                                       remove_zeros=False))
        assert len(items) == 5

        # wrap-around: (10, 2) → indices 0,1 then 10,11
        items = list(dlib.iterate_hdf5([path], ech_idx=12,
                                       lims_list=[(10, 2)],
                                       remove_zeros=False))
        assert len(items) == 4
        np.testing.assert_allclose(items[0][1], maps[0])
        np.testing.assert_allclose(items[2][1], maps[10])

        # multi-file streaming with echo truncation
        items = list(dlib.iterate_hdf5([path, path], ech_idx=8,
                                       lims_list=[(0, 2), (2, 4)],
                                       remove_zeros=False))
        assert len(items) == 4
        assert items[0][0].shape == (16, 16, 8)

    def test_group_tes(self):
        ne = 6
        tes = np.zeros((8, ne, 1), np.float32)
        # patient 1: slices 0-1 orig, 2-3 at target; patient 2: 4-5 orig only
        orig = 0.0013 + 0.0021 * np.arange(ne)
        target = 0.0011 + 0.0019 * np.arange(ne)
        other = 0.0017 + 0.0025 * np.arange(ne)
        tes[0, :, 0] = orig; tes[1, :, 0] = orig
        tes[2, :, 0] = target; tes[3, :, 0] = target
        tes[4, :, 0] = orig; tes[5, :, 0] = orig
        # trailing non-orig run so the sentinel flushes patient 2 as null
        tes[6, :, 0] = other; tes[7, :, 0] = other
        acqs = np.arange(8, dtype=np.float32)[:, None, None, None, None] * np.ones(
            (8, ne, 4, 4, 2), np.float32)
        maps = acqs[:, :3].copy()
        a, b, t = dlib.group_tes(acqs.copy(), maps.copy(), tes, 0.0011, 0.0019)
        # patient 1 contributes its target slices (2,3); patient 2 has no
        # target → contributes zeroed orig slices (4,5)
        assert a.shape[0] == 4
        np.testing.assert_allclose(a[0, 0, 0, 0, 0], 2.0)
        np.testing.assert_allclose(a[1, 0, 0, 0, 0], 3.0)
        np.testing.assert_allclose(a[2:], 0.0)


class TestAugment:
    def test_geometric_preserves_content_set(self):
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 3, 8, 8, 2)).astype(np.float32))
        y = dlib.random_geometric(key, x)
        assert y.shape == x.shape
        np.testing.assert_allclose(np.sort(np.asarray(y).ravel()),
                                   np.sort(np.asarray(x).ravel()), rtol=1e-6)

    def test_fm_scale_only_touches_fm(self):
        key = jax.random.PRNGKey(1)
        maps = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 3, 8, 8, 2)).astype(np.float32))
        out = dlib.random_fm_scale(key, maps)
        np.testing.assert_allclose(np.asarray(out)[:, :2], np.asarray(maps)[:, :2])
        np.testing.assert_allclose(np.asarray(out)[:, 2, ..., 1],
                                   np.asarray(maps)[:, 2, ..., 1])
        ratio = np.asarray(out)[:, 2, ..., 0] / np.asarray(maps)[:, 2, ..., 0]
        assert np.allclose(ratio, ratio.ravel()[0], rtol=1e-4)

    def test_bipolar_row_appended(self):
        key = jax.random.PRNGKey(2)
        maps = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 3, 8, 8, 2)).astype(np.float32))
        out = dlib.bipolar_phase_row(key, maps)
        assert out.shape == (2, 4, 8, 8, 2)
        assert np.all(np.asarray(out)[:, 3, ..., 1] == 0)

    def test_phase_offset_preserves_magnitude(self):
        key = jax.random.PRNGKey(3)
        rng = np.random.default_rng(3)
        acqs = jnp.asarray(rng.normal(size=(2, 6, 8, 8, 2)).astype(np.float32))
        maps = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 3)).astype(np.float32))
        a2, m2 = dlib.random_phase_offset(key, acqs, maps)
        mag1 = np.hypot(np.asarray(acqs)[..., 0], np.asarray(acqs)[..., 1])
        mag2 = np.hypot(np.asarray(a2)[..., 0], np.asarray(a2)[..., 1])
        np.testing.assert_allclose(mag2, mag1, rtol=1e-4, atol=1e-5)


class TestPool:
    def test_passthrough_until_full(self):
        pool = dlib.ItemPool(pool_size=4, seed=0)
        x = np.arange(4, dtype=np.float32).reshape(4, 1)
        out = pool(x)
        np.testing.assert_allclose(out, x)
        assert len(pool.items) == 4

    def test_zero_size_pool(self):
        pool = dlib.ItemPool(pool_size=0)
        x = np.ones((2, 3))
        np.testing.assert_allclose(pool(x), x)

    def test_swapping_after_full(self):
        pool = dlib.ItemPool(pool_size=2, seed=42)
        pool(np.zeros((2, 1)))
        outs = [pool(np.full((1, 1), float(i))) for i in range(1, 50)]
        vals = np.concatenate(outs).ravel()
        assert np.any(vals != np.arange(1, 50))  # some swaps happened


class TestUnwrap:
    def test_unwrap_recovers_smooth_ramp(self):
        h, w = 32, 32
        yy, xx = np.meshgrid(np.linspace(0, 4 * np.pi, h),
                             np.linspace(0, 3 * np.pi, w), indexing="ij")
        truth = 0.7 * xx + 0.5 * yy
        wrapped = np.angle(np.exp(1j * truth))
        rec = dlib.unwrap_phase_2d(wrapped)
        # Equal up to a global 2πk offset.
        diff = rec - truth
        diff -= np.round(np.mean(diff) / (2 * np.pi)) * 2 * np.pi
        assert np.abs(diff).max() < 0.3
