"""Curve-fit models and a batched Levenberg-Marquardt fitter (replaces lmfit).

Reference parity: forest/benchmarking/analysis/fitting.py — the four models
(base_param_decay:16, decay_time_param_decay:48, decaying_cosine:81,
shifted_cosine:118), their fit_* wrappers, fit_result_to_json:152, and
plot_figure_for_fit:200.

TPU-first design: the fitter is a fixed-iteration Levenberg-Marquardt loop in
JAX (jacfwd Jacobians, damped normal equations) that vmaps over thousands of
independent fits in one dispatch — the reference runs one scipy/lmfit
Levenberg-Marquardt per curve. Parameter std errors follow lmfit's convention:
covar = (J^T W^2 J)^-1 scaled by the reduced chi-square.

``FitResult.params`` mimics lmfit's interface (``params['decay'].value`` /
``.stderr``) so protocol code reads like the reference.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np
from numpy import pi
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "base_param_decay", "fit_base_param_decay",
    "decay_time_param_decay", "fit_decay_time_param_decay",
    "decaying_cosine", "fit_decaying_cosine",
    "shifted_cosine", "fit_shifted_cosine",
    "FitResult", "Param", "fit_model", "fit_model_batched",
    "fit_result_to_json", "plot_figure_for_fit", "errs_to_weights",
    "FIT_PLOT_KWS",
]


def errs_to_weights(errs: Sequence[float]) -> Optional[np.ndarray]:
    """1/err fit weights with zero errors replaced by the smallest non-zero
    one; None when every error is zero (unweighted fit). Shared by the RB and
    qubit-spectroscopy fitters."""
    non_zero = [v for v in errs if v > 0]
    if len(non_zero) == 0:
        return None
    min_non_zero = min(non_zero)
    return 1 / np.asarray([v if v > 0 else min_non_zero for v in errs])


# ------------------------------- models ------------------------------------
# Each model has a params-vector form (for the fitter) and a named form
# matching the reference signature.

def base_param_decay(x, amplitude, decay, baseline):
    """baseline + amplitude * decay**x (RB survival decay)."""
    return np.asarray(baseline + amplitude * decay ** x)


def _base_param_decay_p(x, p):
    amplitude, decay, baseline = p
    return baseline + amplitude * decay ** x


def decay_time_param_decay(x, amplitude, decay_time, offset=0.0):
    """amplitude * exp(-(x - offset)/decay_time) (T1 decay)."""
    return np.asarray(amplitude * np.exp(-1 * (x - offset) / decay_time))


def _decay_time_param_decay_p(x, p):
    amplitude, decay_time, offset = p
    return amplitude * jnp.exp(-1 * (x - offset) / decay_time)


def decaying_cosine(x, amplitude, decay_time, offset, baseline, frequency):
    """amplitude * exp(-x/T) cos(2 pi f x + offset) + baseline (T2 fringes)."""
    return (amplitude * np.exp(-1 * x / decay_time)
            * np.cos(2 * pi * frequency * x + offset) + baseline)


def _decaying_cosine_p(x, p):
    amplitude, decay_time, offset, baseline, frequency = p
    return (amplitude * jnp.exp(-1 * x / decay_time)
            * jnp.cos(2 * pi * frequency * x + offset) + baseline)


def shifted_cosine(x, amplitude, offset, baseline, frequency):
    """amplitude * cos(f x + offset) + baseline (Rabi / CZ Ramsey)."""
    return np.asarray(amplitude * np.cos(frequency * x + offset) + baseline)


def _shifted_cosine_p(x, p):
    amplitude, offset, baseline, frequency = p
    return amplitude * jnp.cos(frequency * x + offset) + baseline


# ------------------------------- fitter -------------------------------------

def _chol_solve_unrolled(a, b):
    """Solve ``a x = b`` for a small static-P SPD matrix via fully unrolled
    Cholesky (Python loops over P at trace time -> pure scalar arithmetic).

    The damped normal-equations matrix (JtJ + lam I + jitter I) is SPD by
    construction, so no pivoting is needed. Unlike ``jnp.linalg.solve`` (an LU
    custom call that breaks XLA fusion and forces an HBM round trip per LM
    iteration), this inlines into the surrounding loop body — the reason the
    batched fitter runs at fused-elementwise speed rather than
    dispatch-per-op speed.
    """
    p = a.shape[0]
    tiny = jnp.finfo(a.dtype).tiny
    l = [[None] * p for _ in range(p)]
    for i in range(p):
        s = a[i, i]
        for k in range(i):
            s = s - l[i][k] * l[i][k]
        l[i][i] = jnp.sqrt(jnp.maximum(s, tiny))
        for j in range(i + 1, p):
            s = a[j, i]
            for k in range(i):
                s = s - l[j][k] * l[i][k]
            l[j][i] = s / l[i][i]
    y = [None] * p
    for i in range(p):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * p
    for i in reversed(range(p)):
        s = y[i]
        for k in range(i + 1, p):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x)


def lm_flops_per_fit(n_points: int, n_params: int, num_iters: int,
                     model_flops: int = 8) -> int:
    """Approximate real-arithmetic FLOPs per curve of :func:`_lm_kernel`
    (for roofline accounting in benches; counts mul/add/div/exp as one each).

    Per iteration: model+Jacobian evaluation ``model_flops * N * (P + 1)``
    (jacfwd pushes P forward tangents through the model), JtJ ``2 N P^2``,
    gradient ``2 N P``, unrolled Cholesky solve ``~P^3/3 + 4 P^2``, trial cost
    ``3 N``, and ~``12 P`` bookkeeping. Plus one extra Jacobian pass +
    inverse for the final covariance.
    """
    n, p = n_points, n_params
    per_iter = (model_flops * n * (p + 1) + 2 * n * p * p + 2 * n * p
                + p ** 3 // 3 + 4 * p * p + 3 * n + 12 * p)
    final = model_flops * n * (p + 1) + 2 * n * p * p + p ** 3
    return per_iter * (num_iters + 1) + final


@dataclass
class Param:
    value: float
    stderr: Optional[float]


@dataclass
class FitResult:
    """Subset of lmfit.ModelResult that the reference protocols consume."""
    param_names: Tuple[str, ...]
    best_values: Dict[str, float]
    params: Dict[str, Param]
    chisqr: float
    redchi: float
    covar: Optional[np.ndarray]
    best_fit: np.ndarray
    residual: np.ndarray
    success: bool
    x: np.ndarray = field(default=None, repr=False)
    y: np.ndarray = field(default=None, repr=False)
    model_p: Callable = field(default=None, repr=False)

    def eval(self, x):
        p = np.array([self.best_values[k] for k in self.param_names])
        return np.asarray(self.model_p(jnp.asarray(np.asarray(x, float)), p))


def _lm_kernel(model_p, x, y, w, p0, num_iters: int):
    """Single-curve Levenberg-Marquardt, Madsen-Nielsen-Tingleff damping.

    Gain-ratio-controlled lambda updates (the scheme scipy/MINPACK family
    solvers use in spirit): accept when the actual cost reduction is positive,
    shrink lambda by max(1/3, 1 - (2 rho - 1)^3), otherwise grow by nu (doubling
    nu each rejection). Robust on oscillatory models (decaying cosines).
    """
    n_params = p0.shape[0]
    eye = jnp.eye(n_params, dtype=p0.dtype)

    def residual(p):
        return w * (model_p(x, p) - y)

    def cost(p):
        r = residual(p)
        return jnp.sum(r * r)

    jac = jax.jacfwd(residual)

    jtj0 = jac(p0).T @ jac(p0)
    lam0 = 1e-3 * jnp.max(jnp.diag(jtj0))

    def body(i, carry):
        p, lam, nu, c = carry
        j = jac(p)
        r = residual(p)
        jtj = j.T @ j
        g = j.T @ r
        # dtype-aware relative jitter: a fixed 1e-300 underflows to exactly
        # 0 in f32, leaving the solve singular whenever the Jacobian (and
        # hence lam) vanishes at p0
        jit_eps = jnp.finfo(p.dtype).eps ** 2 * (
            1.0 + jnp.max(jnp.abs(jnp.diag(jtj))))
        a = jtj + lam * eye + jit_eps * eye
        # unrolled Cholesky: SPD by construction; inlines into the loop body
        # (jnp.linalg.solve is an LU custom call that would fence fusion)
        delta = _chol_solve_unrolled(a, -g)
        p_new = p + delta
        c_new = cost(p_new)
        # predicted reduction: 0.5 delta^T (lam delta - g)
        pred = 0.5 * jnp.dot(delta, lam * delta - g)
        rho = (c - c_new) / jnp.maximum(pred, jnp.finfo(p.dtype).tiny)
        accept = jnp.logical_and(c_new < c, jnp.all(jnp.isfinite(p_new)))
        p = jnp.where(accept, p_new, p)
        c = jnp.where(accept, c_new, c)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, jnp.maximum(lam * shrink, 1e-14), lam * nu)
        nu = jnp.where(accept, 2.0, jnp.minimum(nu * 2.0, 1e8))
        return p, lam, nu, c

    p, _, _, c = lax.fori_loop(0, num_iters, body,
                               (p0, lam0, jnp.asarray(2.0, p0.dtype), cost(p0)))
    # covariance at the solution: (J^T J)^-1 (weights already inside J)
    j = jac(p)
    jtj = j.T @ j
    cov = jnp.linalg.pinv(jtj)
    return p, c, cov


@functools.partial(jax.jit, static_argnames=("model_p", "num_iters"))
def _lm_batched(model_p, x, y, w, p0, num_iters=100):
    # vmap over the batch as the TRAILING axis: the per-fit intermediates are
    # tiny ((N, P) Jacobians, (P, P) normal equations), so a leading batch
    # axis tiles TPU vregs at 3/128-lane occupancy; batch-minor layouts keep
    # every elementwise op full-width. Inputs/outputs stay batch-leading.
    kern = lambda xx, yy, ww, pp: _lm_kernel(model_p, xx, yy, ww, pp,  # noqa: E731
                                             num_iters)
    p, c, cov = jax.vmap(kern, in_axes=-1, out_axes=-1)(
        jnp.moveaxis(x, 0, -1), jnp.moveaxis(y, 0, -1),
        jnp.moveaxis(w, 0, -1), jnp.moveaxis(p0, 0, -1))
    return jnp.moveaxis(p, -1, 0), jnp.moveaxis(c, -1, 0), \
        jnp.moveaxis(cov, -1, 0)


def fit_model_batched(model_p: Callable, x: np.ndarray, y: np.ndarray,
                      weights: Optional[np.ndarray], p0: np.ndarray,
                      num_iters: int = 100):
    """Batched LM fit: x,y,(weights) of shape (B, N); p0 (B, P) or (P,).

    :return: (params (B, P), chisqr (B,), covar (B, P, P)) — covar unscaled;
        callers apply the redchi scaling per lmfit convention.
    """
    x = jnp.atleast_2d(jnp.asarray(x, float))
    y = jnp.atleast_2d(jnp.asarray(y, float))
    b, n = y.shape
    if x.shape[0] == 1:
        x = jnp.broadcast_to(x, (b, n))
    w = (jnp.ones_like(y) if weights is None
         else jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(weights, float)), y.shape))
    p0 = jnp.asarray(p0, float)
    if p0.ndim == 1:
        p0 = jnp.broadcast_to(p0, (b, p0.shape[0]))
    return _lm_batched(model_p, x, y, w, p0, num_iters=num_iters)


def fit_model(model_p: Callable, param_names: Sequence[str], x, y,
              weights=None, param_guesses: Sequence[float] = None,
              num_iters: int = 100) -> FitResult:
    """Fit one curve; returns a FitResult with lmfit-convention std errors."""
    if param_guesses is None:
        raise ValueError("param_guesses is required (one initial value per "
                         "model parameter); the fit_* wrappers supply "
                         "model-specific defaults.")
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if len(x) != len(y):
        raise ValueError("Lengths of x and y arrays must be equal.")
    if weights is not None and len(x) != len(weights):
        raise ValueError("Lengths of x and weights arrays must be equal if "
                         "weights is not None.")
    params, chisqr, cov = fit_model_batched(model_p, x[None], y[None],
                                            None if weights is None
                                            else np.asarray(weights)[None],
                                            np.asarray(param_guesses, float),
                                            num_iters=num_iters)
    p = np.asarray(params[0])
    chisqr = float(chisqr[0])
    cov = np.asarray(cov[0])
    nfree = len(y) - len(p)
    redchi = chisqr / max(nfree, 1)
    covar = cov * redchi  # lmfit scale_covar=True convention
    stderr = np.sqrt(np.clip(np.diag(covar), 0, None))
    best_fit = np.asarray(model_p(jnp.asarray(x), jnp.asarray(p)))
    success = bool(np.all(np.isfinite(p)))
    best_values = {k: float(v) for k, v in zip(param_names, p)}
    return FitResult(
        param_names=tuple(param_names),
        best_values=best_values,
        params={k: Param(float(v), float(s))
                for k, v, s in zip(param_names, p, stderr)},
        chisqr=chisqr, redchi=redchi, covar=covar, best_fit=best_fit,
        # lmfit convention: the residual is weight-multiplied (model-data)*w,
        # so the residual panel of plot_figure_for_fit shows error-normalized
        # deviations like the reference's
        residual=((best_fit - y) if weights is None
                  else (best_fit - y) * np.asarray(weights, dtype=float)),
        success=success, x=x, y=y, model_p=model_p)


# ------------------------- reference-shaped wrappers -------------------------

def fit_base_param_decay(x, y, weights=None,
                         param_guesses: tuple = (1., .9, 0.)) -> FitResult:
    """Fit y = baseline + amplitude * decay**x."""
    return fit_model(_base_param_decay_p, ("amplitude", "decay", "baseline"),
                     x, y, weights, param_guesses)


def fit_decay_time_param_decay(x, y, weights=None,
                               param_guesses: tuple = (1., 10, 0)) -> FitResult:
    """Fit y = amplitude * exp(-(x - offset)/decay_time)."""
    return fit_model(_decay_time_param_decay_p,
                     ("amplitude", "decay_time", "offset"),
                     x, y, weights, param_guesses)


def fit_decaying_cosine(x, y, weights=None,
                        param_guesses: tuple = (.5, 10, 0.0, 0.5, 5)) -> FitResult:
    """Fit y = A exp(-x/T) cos(2 pi f x + offset) + baseline."""
    return fit_model(_decaying_cosine_p,
                     ("amplitude", "decay_time", "offset", "baseline",
                      "frequency"), x, y, weights, param_guesses)


def fit_shifted_cosine(x, y, weights=None,
                       param_guesses: tuple = (.5, 0, .5, 1.)) -> FitResult:
    """Fit y = A cos(f x + offset) + baseline."""
    return fit_model(_shifted_cosine_p,
                     ("amplitude", "offset", "baseline", "frequency"),
                     x, y, weights, param_guesses)


def fit_result_to_json(fit_result: FitResult) -> dict:
    """JSON-serializable summary of a fit (reference fitting.py:152)."""
    return {
        "chisqr": fit_result.chisqr,
        "redchi": fit_result.redchi,
        "best_fit": np.asarray(fit_result.best_fit).tolist(),
        "best_values": fit_result.best_values,
        "covar": (np.asarray(fit_result.covar).tolist()
                  if fit_result.covar is not None else None),
        "params": {k: {"value": p.value, "stderr": p.stderr}
                   for k, p in fit_result.params.items()},
    }


# ------------------------------- plotting -----------------------------------

TEAL = "#6CAFB7"
DARK_TEAL = "#48737F"
FUSCHIA = "#D6619E"
BEIGE = "#EAE8C6"
GRAY = "#494949"

# plot keyword defaults (reference analysis/fitting.py:188): kept for name
# parity and for callers styling their own fit plots; plot_figure_for_fit
# below draws with matplotlib directly (no lmfit plot_fit), applying the
# same data/fit styling inline.
FIT_PLOT_KWS = {
    "data_kws": {"color": "black", "markersize": 4.0},
    "init_kws": {"color": TEAL, "alpha": 0.4, "linestyle": "--"},
    "fit_kws": {"alpha": 1.0, "linewidth": 2.0},
    "numpoints": 1000,
}

DEFAULT_FIG_SIZE = (7, 10)
DEFAULT_AXIS_FONT_SIZE = 14
DEFAULT_REPORT_FONT_SIZE = 11


def plot_figure_for_fit(fit_result: FitResult, xlabel: str = "x",
                        ylabel: str = "y", xscale: float = 1.0,
                        yscale: float = 1.0, title: str = "",
                        figsize=DEFAULT_FIG_SIZE,
                        axis_fontsize=DEFAULT_AXIS_FONT_SIZE,
                        report_fontsize=DEFAULT_REPORT_FONT_SIZE):
    """Fit + residuals plot with a parameter report (reference fitting.py:200)."""
    import matplotlib.pyplot as plt
    import matplotlib.ticker as ticker

    fig, axs = plt.subplots(nrows=2, ncols=1, sharex=True,
                            gridspec_kw={"height_ratios": (3, 1)},
                            figsize=figsize)
    plt.subplots_adjust(hspace=0, top=0.9, bottom=0.3)

    x, y = fit_result.x, fit_result.y
    xs = np.linspace(np.min(x), np.max(x), 1000)
    axs[0].plot(x, y, "o", color="black", markersize=4.0, label="data")
    axs[0].plot(xs, fit_result.eval(xs), color=FUSCHIA, linewidth=2.0,
                label="best fit")
    axs[0].legend()
    axs[1].axhline(0, color=GRAY, linewidth=1)
    axs[1].plot(x, fit_result.residual, "o", color="black", markersize=4.0)

    axs[1].set_ylabel("residuals", fontsize=axis_fontsize)
    axs[1].set_xlabel(xlabel, fontsize=axis_fontsize)
    axs[0].set_ylabel(ylabel, fontsize=axis_fontsize)
    axs[0].set_title(title, fontsize=axis_fontsize)

    xticks = ticker.FuncFormatter(lambda v, pos: "{0:g}".format(v / xscale))
    axs[1].xaxis.set_major_formatter(xticks)
    yticks = ticker.FuncFormatter(lambda v, pos: "{0:g}".format(v / yscale))
    for ax in axs:
        ax.yaxis.set_major_formatter(yticks)

    report_lines = [f"{k:12s} {p.value:+.5g} +/- "
                    f"{p.stderr if p.stderr is not None else float('nan'):.3g}"
                    for k, p in fit_result.params.items()]
    report = "\n".join([f"chi-square     {fit_result.chisqr:.5g}",
                        f"reduced chi-sq {fit_result.redchi:.5g}"] + report_lines)
    fig.suptitle(report, fontsize=report_fontsize, family="monospace",
                 horizontalalignment="left", x=0.1, y=0.25)
    return fig, axs
