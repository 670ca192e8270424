"""Tests for the in-framework ROI statistics (eval/stats.py — the
rebuild of the reference's offline R suite, statistics/*.R)."""

import math

import numpy as np
import pytest
from scipy import stats as sps

from ideal_gan_tpu.eval import stats as st


class TestAgreement:
    def test_summary_stats_matches_scipy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(3.0, 2.0, size=41)
        s = st.summary_stats(x)
        assert s["n"] == 41
        assert s["mean"] == pytest.approx(np.mean(x))
        assert s["sd"] == pytest.approx(np.std(x, ddof=1))
        assert s["median"] == pytest.approx(np.median(x))
        se = np.std(x, ddof=1) / math.sqrt(41)
        assert s["ci"] == pytest.approx(sps.t.ppf(0.975, 40) * se)

    def test_bias_loa(self):
        refs = np.array([0.0, 10.0, 20.0, 30.0])
        meas = refs + np.array([1.0, 2.0, 1.0, 2.0])
        b = st.bias_loa(refs, meas)
        d = meas - refs
        assert b["mean_bias"] == pytest.approx(1.5)
        assert b["loa"] == pytest.approx(1.96 * np.std(d, ddof=1))
        assert b["upper"] - b["lower"] == pytest.approx(2 * b["loa"])

    def test_group_bias_loa_splits_by_factor(self):
        refs = np.zeros(6)
        meas = np.array([1.0, 1.0, 1.0, -2.0, -2.0, -2.0])
        g = np.array(["a", "a", "a", "b", "b", "b"])
        out = st.group_bias_loa(refs, meas, g)
        assert out["a"]["mean_bias"] == pytest.approx(1.0)
        assert out["b"]["mean_bias"] == pytest.approx(-2.0)

    def test_bland_altman_axes(self):
        refs = np.array([0.0, 2.0])
        meas = np.array([1.0, 3.0])
        ba = st.bland_altman(refs, meas)
        np.testing.assert_allclose(ba["x"], [0.5, 2.5])
        np.testing.assert_allclose(ba["diff"], [1.0, 1.0])
        ba_r = st.bland_altman(refs, meas, against_mean=False)
        np.testing.assert_allclose(ba_r["x"], refs)

    def test_bland_altman_plot_writes_png(self, tmp_path):
        p = tmp_path / "ba.png"
        st.plot_bland_altman([0, 1, 2.0], [0.1, 1.2, 1.9], str(p))
        assert p.exists() and p.stat().st_size > 500


class TestRegressionTests:
    def test_regression_recovers_line(self):
        rng = np.random.default_rng(1)
        x = np.linspace(0, 50, 60)
        y = 0.9 * x + 2.0 + rng.normal(0, 1e-6, size=60)
        r = st.regression(x, y)
        assert r["slope"] == pytest.approx(0.9, abs=1e-4)
        assert r["intercept"] == pytest.approx(2.0, abs=1e-3)
        assert r["r2"] == pytest.approx(1.0, abs=1e-6)
        assert "R²" in r["equation"]

    def test_regression_plot(self, tmp_path):
        p = tmp_path / "reg.png"
        r = st.plot_regression([0, 1, 2, 3.0], [0.1, 1.1, 2.0, 3.2], str(p))
        assert p.exists() and r["slope"] > 0.9

    def test_wilcoxon_matches_scipy(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=25)
        y = x + rng.normal(0.3, 0.2, size=25)
        out = st.wilcoxon_paired(x, y)
        ref = sps.wilcoxon(x, y)
        assert out["p"] == pytest.approx(ref.pvalue)
        assert out["statistic"] == pytest.approx(ref.statistic)

    @pytest.mark.smoke
    def test_pairwise_wilcoxon_holm(self):
        rng = np.random.default_rng(3)
        base = rng.normal(size=20)
        values = np.concatenate([base, base + 1.0, base + rng.normal(
            0, 0.01, size=20)])
        groups = np.array(["p1"] * 20 + ["p2"] * 20 + ["p3"] * 20)
        rows = st.pairwise_wilcoxon(values, groups)
        assert len(rows) == 3
        # holm-adjusted ps are monotone vs raw order and ≥ raw p
        for r in rows:
            assert r["p_adj"] >= r["p"] - 1e-15
            assert r["p_adj"] <= 1.0
        big = [r for r in rows if {r["group1"], r["group2"]} ==
               {"p1", "p2"}][0]
        assert big["p"] < 0.01

    def test_pairwise_wilcoxon_unequal_sizes_warn(self):
        rng = np.random.default_rng(4)
        values = np.concatenate([rng.normal(size=20),
                                 rng.normal(size=15) + 1.0])
        groups = np.array(["a"] * 20 + ["b"] * 15)
        with pytest.warns(UserWarning, match="drops 5 rows"):
            rows = st.pairwise_wilcoxon(values, groups)
        assert rows[0]["n"] == 15

    def test_pairwise_wilcoxon_pair_ids(self):
        # key-matched pairing must be order-independent: shuffle group b's
        # rows and pair on the slice id, not the row order
        rng = np.random.default_rng(5)
        base = rng.normal(size=20)
        ids = np.arange(20)
        perm = rng.permutation(20)
        values = np.concatenate([base, (base + 1.0)[perm]])
        groups = np.array(["a"] * 20 + ["b"] * 20)
        pair_ids = np.concatenate([ids, ids[perm]])
        rows = st.pairwise_wilcoxon(values, groups, pair_ids=pair_ids)
        # every matched pair differs by exactly +1 → the test is maximally
        # one-sided; order-pairing of the shuffled rows would not be
        assert rows[0]["n"] == 20
        assert rows[0]["p"] < 1e-4

    def test_pairwise_wilcoxon_duplicate_pair_ids_warn(self):
        # a repeated id within a group must not silently pair the same
        # row twice — first occurrence wins, with a warning
        values = np.array([1.0, 2.0, 3.0, 1.5, 2.5, 3.5])
        groups = np.array(["a"] * 3 + ["b"] * 3)
        pair_ids = np.array([0, 0, 1, 0, 1, 2])  # id 0 duplicated in a
        with pytest.warns(UserWarning, match="duplicate pair_ids"):
            rows = st.pairwise_wilcoxon(values, groups, pair_ids=pair_ids)
        assert rows[0]["n"] == 2  # ids {0, 1} once each

    def test_extreme_outliers_rule(self):
        x = np.array([1.0, 2, 3, 4, 5, 100.0])
        mask = st.extreme_outliers(x)
        assert mask[-1] and not mask[:-1].any()


class TestLMM:
    def test_balanced_one_way_matches_anova_closed_form(self):
        # For a balanced one-way random-intercept design REML equals the
        # ANOVA (method-of-moments) estimator: σ̂_a²=(MSA−MSE)/n_per,
        # σ̂²=MSE — the oracle lme4 itself reproduces.
        rng = np.random.default_rng(4)
        a, n_per = 8, 12
        sa, se_ = 2.0, 1.0
        effects = rng.normal(0, sa, size=a)
        y = np.concatenate([5.0 + eff + rng.normal(0, se_, size=n_per)
                            for eff in effects])
        groups = np.repeat(np.arange(a), n_per)
        X = np.ones((y.size, 1))
        fit = st.fit_lmm(y, X, {"group": groups}, reml=True)
        gm = y.reshape(a, n_per).mean(axis=1)
        msa = n_per * np.var(gm, ddof=1)
        mse = np.mean([np.var(y.reshape(a, n_per)[i], ddof=1)
                       for i in range(a)])
        assert fit.sigma2 == pytest.approx(mse, rel=2e-2)
        assert fit.var_components["group"] == pytest.approx(
            (msa - mse) / n_per, rel=5e-2)
        assert fit.beta[0] == pytest.approx(np.mean(gm), rel=1e-3)

    def test_zero_variance_factor_collapses_to_ols(self):
        rng = np.random.default_rng(5)
        x = np.linspace(0, 1, 60)
        y = 2.0 + 3.0 * x + rng.normal(0, 0.1, size=60)
        X = np.stack([np.ones_like(x), x], axis=1)
        groups = rng.integers(0, 5, size=60)  # no true group effect
        fit = st.fit_lmm(y, X, {"g": groups}, reml=True,
                         fixed_names=["intercept", "slope"])
        ols = np.linalg.lstsq(X, y, rcond=None)[0]
        np.testing.assert_allclose(fit.beta, ols, atol=0.05)
        assert fit.var_components["g"] < 0.05
        assert "slope" in fit.summary()

    def test_crossed_intercepts_and_lrt(self):
        rng = np.random.default_rng(6)
        n_site, n_meth, n_rep = 6, 4, 5
        site_eff = rng.normal(0, 1.5, size=n_site)
        meth_eff = rng.normal(0, 1.0, size=n_meth)
        rows_y, rows_s, rows_m = [], [], []
        for s in range(n_site):
            for m in range(n_meth):
                for _ in range(n_rep):
                    rows_y.append(1.0 + site_eff[s] + meth_eff[m] +
                                  rng.normal(0, 0.5))
                    rows_s.append(s)
                    rows_m.append(m)
        y = np.array(rows_y)
        X = np.ones((y.size, 1))
        full = st.fit_lmm(y, X, {"site": rows_s, "method": rows_m},
                          reml=False)
        reduced = st.fit_lmm(y, X, {"site": rows_s}, reml=False)
        assert full.var_components["site"] > 0.3
        assert full.var_components["method"] > 0.1
        out = st.lrt_anova(reduced, full)
        assert out["chisq"] > 0 and out["df"] == 1
        assert out["p"] < 0.05  # the method effect is real

    def test_rank_deficient_design_raises(self):
        y = np.arange(12.0)
        X = np.stack([np.ones(12), np.full(12, 3.0)], axis=1)  # collinear
        with pytest.raises(ValueError, match="rank-deficient"):
            st.fit_lmm(y, X, {"g": np.repeat([0, 1], 6)})

    def test_stats_cli_single_vial_lmm_falls_back(self, tmp_path,
                                                  monkeypatch):
        # single-vial workbooks make `refs` constant; the CLI must drop
        # the collinear column instead of crashing (found driving the
        # CLI on a 1-vial crops file)
        from ideal_gan_tpu.cli import stats_analysis
        from ideal_gan_tpu.eval import roi as roi_mod
        monkeypatch.chdir(tmp_path)
        per_slice = {k: [(0.0, 0.01 * (k + 1))] for k in range(4)}
        paths = {}
        for name in ("A", "B"):
            p = tmp_path / f"{name}.xlsx"
            roi_mod.export_phantom_xlsx(str(p), {0.0: [0.01]}, {0.0: 0.01},
                                        per_slice=per_slice)
            paths[name] = str(p)
        res = stats_analysis.main([
            "--dataset", "sv", "--mode", "phantom",
            "--xlsx", ",".join(f"{n}={p}" for n, p in paths.items())])
        assert res["lmm"].p == 1  # intercept-only fixed effects

    def test_lrt_requires_ml(self):
        y = np.arange(10.0)
        X = np.ones((10, 1))
        f = st.fit_lmm(y, X, {"g": np.repeat([0, 1], 5)}, reml=True)
        with pytest.raises(ValueError):
            st.lrt_anova(f, f)


class TestLoaders:
    def test_load_roi_table_roundtrip(self, tmp_path):
        from ideal_gan_tpu.eval import roi as roi_mod
        res_m = roi_mod.ROIResult(values_1=[0.11, 0.22],
                                  values_2=[0.30], slices=[3, 4])
        res_r = roi_mod.ROIResult(values_1=[0.10, 0.20],
                                  values_2=[0.33], slices=[3, 4])
        path = tmp_path / "rois.xlsx"
        roi_mod.export_roi_xlsx(str(path), res_m, res_r)
        tab = st.load_roi_table(str(path))
        np.testing.assert_allclose(sorted(tab["refs"]), [0.10, 0.20, 0.33])
        np.testing.assert_allclose(
            tab["bias"], tab["meas"] - tab["refs"])
        assert set(tab["roi"]) == {"RHL", "LHL"}

    def test_stats_cli_both_modes(self, tmp_path, monkeypatch):
        from ideal_gan_tpu.cli import stats_analysis
        from ideal_gan_tpu.eval import roi as roi_mod
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(7)
        gts = [0.0, 0.1, 0.3, 0.5]
        per_slice = {k: [(g, g + rng.normal(0.0, 0.01)) for g in gts]
                     for k in range(3)}
        per_vial = {g: [v for sl in per_slice.values()
                        for gg, v in sl if gg == g] for g in gts}
        bias = {g: float(np.mean(per_vial[g])) - g for g in gts}
        paths = {}
        for name in ("GraphCuts", "VET-Net"):
            p = tmp_path / f"{name}.xlsx"
            roi_mod.export_phantom_xlsx(str(p), per_vial, bias,
                                        per_slice=per_slice)
            paths[name] = str(p)
        res = stats_analysis.main([
            "--dataset", "st", "--mode", "phantom",
            "--xlsx", ",".join(f"{n}={p}" for n, p in paths.items())])
        assert "lmm" in res and "by_method" in res
        assert (tmp_path / "output" / "st" /
                "PDFF-VET-Net-Bias-BlandAltman.png").exists()

        res_m = roi_mod.ROIResult(values_1=list(rng.uniform(0, .4, 8)),
                                  values_2=list(rng.uniform(0, .4, 8)),
                                  slices=list(range(8)))
        res_r = roi_mod.ROIResult(
            values_1=[v + 0.01 for v in res_m.values_1],
            values_2=[v + 0.01 for v in res_m.values_2],
            slices=list(range(8)))
        iv = tmp_path / "rois.xlsx"
        roi_mod.export_roi_xlsx(str(iv), res_m, res_r)
        res = stats_analysis.main([
            "--dataset", "st", "--mode", "invivo", "--xlsx", str(iv)])
        assert "rois" in res and "regression" in res["rois"]
        assert (tmp_path / "output" / "st" / "LS-corr-rois.png").exists()

    def test_load_phantom_tables(self, tmp_path):
        from ideal_gan_tpu.eval import roi as roi_mod
        per_vial = {0.0: [0.01], 0.5: [0.52, 0.49]}
        bias = {0.0: 0.01, 0.5: 0.005}
        per_slice = {0: [(0.0, 0.01), (0.5, 0.52)], 1: [(0.5, 0.49)]}
        paths = {}
        for name in ("GraphCuts", "VET-Net"):
            p = tmp_path / f"{name}.xlsx"
            roi_mod.export_phantom_xlsx(str(p), per_vial, bias,
                                        per_slice=per_slice)
            paths[name] = str(p)
        tab = st.load_phantom_tables(paths)
        assert tab["refs"].size == 6  # 3 rows per workbook × 2 methods
        assert set(tab["method"]) == {"GraphCuts", "VET-Net"}
        np.testing.assert_allclose(tab["bias"],
                                   tab["meas"] - tab["refs"])
