"""Batched LM fitter: recover known parameters, stderr sanity, scipy parity."""
import numpy as np
import pytest
from scipy.optimize import curve_fit

from forest_benchmarking_tpu.analysis.fitting import (
    base_param_decay, fit_base_param_decay,
    decay_time_param_decay, fit_decay_time_param_decay,
    decaying_cosine, fit_decaying_cosine,
    shifted_cosine, fit_shifted_cosine,
    fit_model_batched, _base_param_decay_p, fit_result_to_json)


def test_fit_base_param_decay_recovers_params():
    rng = np.random.RandomState(0)
    x = np.arange(1, 30)
    true = dict(amplitude=0.6, decay=0.93, baseline=0.4)
    y = base_param_decay(x, **true) + rng.normal(0, 0.003, len(x))
    fit = fit_base_param_decay(x, y)
    assert abs(fit.params["decay"].value - true["decay"]) < 0.01
    assert abs(fit.params["amplitude"].value - true["amplitude"]) < 0.05
    assert fit.params["decay"].stderr < 0.02
    assert fit.success


def test_fit_matches_scipy_curve_fit():
    rng = np.random.RandomState(1)
    x = np.arange(1, 25).astype(float)
    y = base_param_decay(x, 0.5, 0.9, 0.45) + rng.normal(0, 0.01, len(x))
    ours = fit_base_param_decay(x, y)
    popt, pcov = curve_fit(lambda x, a, d, b: b + a * d ** x, x, y,
                           p0=[1.0, 0.9, 0.0])
    assert np.allclose([ours.params["amplitude"].value,
                        ours.params["decay"].value,
                        ours.params["baseline"].value], popt, atol=1e-5)
    # stderr parity with scipy's (same covariance convention as lmfit)
    perr = np.sqrt(np.diag(pcov))
    ours_err = [ours.params[k].stderr for k in ("amplitude", "decay", "baseline")]
    assert np.allclose(ours_err, perr, rtol=1e-3)


def test_fit_decay_time():
    rng = np.random.RandomState(2)
    x = np.linspace(0, 60, 30)
    y = decay_time_param_decay(x, 1.0, 15.0) + rng.normal(0, 0.005, len(x))
    fit = fit_decay_time_param_decay(x, y)
    assert abs(fit.params["decay_time"].value - 15.0) < 0.5


def test_fit_decaying_cosine():
    rng = np.random.RandomState(3)
    x = np.linspace(0, 4, 60)
    true = dict(amplitude=0.5, decay_time=8.0, offset=0.3, baseline=0.5,
                frequency=4.8)
    y = decaying_cosine(x, **true) + rng.normal(0, 0.01, len(x))
    fit = fit_decaying_cosine(x, y, param_guesses=(0.5, 10, 0.0, 0.5, 5))
    assert abs(fit.params["frequency"].value - true["frequency"]) < 0.05
    assert abs(fit.params["decay_time"].value - true["decay_time"]) < 1.5


def test_fit_shifted_cosine():
    rng = np.random.RandomState(4)
    x = np.linspace(0, 2 * np.pi, 40)
    y = shifted_cosine(x, 0.5, 0.2, 0.5, 1.0) + rng.normal(0, 0.01, len(x))
    fit = fit_shifted_cosine(x, y)
    assert abs(fit.params["amplitude"].value - 0.5) < 0.02
    assert abs(fit.params["frequency"].value - 1.0) < 0.02


def test_weights_affect_fit():
    x = np.arange(1, 20).astype(float)
    y = base_param_decay(x, 0.5, 0.9, 0.5)
    y_corrupt = y.copy()
    y_corrupt[-1] += 0.5
    w = np.ones_like(x)
    w[-1] = 1e-6  # effectively ignore the corrupted point
    fit = fit_base_param_decay(x, y_corrupt, weights=w)
    assert abs(fit.params["decay"].value - 0.9) < 0.005


def test_batched_fits_match_singles():
    rng = np.random.RandomState(5)
    x = np.arange(1, 25).astype(float)
    batch = 16
    decays = rng.uniform(0.85, 0.98, batch)
    ys = np.stack([base_param_decay(x, 0.5, d, 0.5)
                   + rng.normal(0, 0.005, len(x)) for d in decays])
    params, chis, covs = fit_model_batched(_base_param_decay_p, x, ys, None,
                                           np.array([1.0, 0.9, 0.0]))
    params = np.asarray(params)
    for i in range(batch):
        single = fit_base_param_decay(x, ys[i])
        assert abs(params[i, 1] - single.params["decay"].value) < 1e-8
        assert abs(params[i, 1] - decays[i]) < 0.01


def test_fit_result_to_json():
    x = np.arange(1, 15)
    y = base_param_decay(x, 0.5, 0.9, 0.5)
    fit = fit_base_param_decay(x, y)
    d = fit_result_to_json(fit)
    import json
    s = json.dumps(d)
    assert "chisqr" in s and "decay" in s


def test_mismatched_lengths_raise():
    with pytest.raises(ValueError):
        fit_base_param_decay(np.arange(5), np.arange(6))
    with pytest.raises(ValueError):
        fit_base_param_decay(np.arange(5), np.arange(5), weights=np.arange(4))
