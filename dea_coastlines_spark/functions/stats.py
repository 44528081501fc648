"""Statistical kernels: linear regression with p-value/stderr, MAD
outlier rejection, circular stats — pure numpy (no scipy in this env).

Parity targets:
  * linregress     — scipy.stats.linregress as used by change_regress
                     (coastlines/vector.py:1040-1046); p-value is the
                     two-sided t-test via the regularized incomplete
                     beta function (continued-fraction evaluation).
  * outlier_mad    — coastlines/vector.py:892-929 exactly (note: the
                     reference computes the modified z-score on the 2-D
                     euclidean distance from the (median_x, median_y)
                     point, not per-axis).
  * change_regress — coastlines/vector.py:967-1055: NaN drop, MAD
                     rejection, regression, outlier list as a sorted
                     space-separated string, all outputs rounded 3 dp.
  * circmean/circstd — scipy.stats.circmean/circstd with high=180
                     (coastlines/vector.py:869-881).
  * all_time_stats — coastlines/vector.py:1115-1183.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------- incomplete beta / t

def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-12) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    import math

    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided p-value of a t statistic: I_{df/(df+t^2)}(df/2, 1/2)."""
    if not np.isfinite(t) or df <= 0:
        return float("nan")
    x = df / (df + t * t)
    return betainc_reg(df / 2.0, 0.5, x)


# ------------------------------------------------------------------ regression

def linregress_np(x: np.ndarray, y: np.ndarray):
    """slope, intercept, rvalue, pvalue, stderr — scipy.linregress parity."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.size
    xm, ym = x.mean(), y.mean()
    ssxm = ((x - xm) ** 2).mean()
    ssym = ((y - ym) ** 2).mean()
    ssxym = ((x - xm) * (y - ym)).mean()
    if ssxm == 0.0:
        return np.nan, np.nan, np.nan, np.nan, np.nan
    slope = ssxym / ssxm
    intercept = ym - slope * xm
    if ssym == 0.0:
        r = 0.0 if ssxym == 0 else np.nan
    else:
        r = ssxym / np.sqrt(ssxm * ssym)
        r = max(min(r, 1.0), -1.0)
    if n <= 2:
        return slope, intercept, r, 1.0, 0.0
    df = n - 2
    tiny = 1e-20
    t = r * np.sqrt(df / ((1.0 - r + tiny) * (1.0 + r + tiny)))
    p = t_sf_two_sided(float(t), df)
    stderr = np.sqrt((1.0 - r * r) * ssym / ssxm / df)
    return slope, intercept, r, p, stderr


def outlier_mad(points: np.ndarray, thresh: float = 3.5) -> np.ndarray:
    """Reference MAD outlier test (vector.py:892-929): modified z-score
    of the euclidean distance from the coordinate-wise median."""
    pts = np.asarray(points, np.float64)
    if pts.ndim == 1:
        pts = pts[:, None]
    median = np.median(pts, axis=0)
    diff = np.sqrt(np.sum((pts - median) ** 2, axis=-1))
    mad = np.median(diff)
    with np.errstate(divide="ignore", invalid="ignore"):
        mz = 0.6745 * diff / mad
    return mz > thresh


def change_regress(
    y_vals: np.ndarray, x_vals: np.ndarray, x_labels: np.ndarray, threshold: float = 3.5
) -> dict:
    """Reference change_regress (vector.py:967-1055): NaN drop -> MAD
    reject -> linregress; outputs rounded to 3 dp; outliers recorded as a
    sorted space-separated string (NaN years count as outliers)."""
    x = np.asarray(x_vals, np.float64)
    y = np.asarray(y_vals, np.float64)
    labels = np.asarray(x_labels)
    xy = np.stack([x, y], axis=1)
    valid = ~np.isnan(xy).any(axis=1)
    xy = xy[valid]
    valid_labels = labels[valid]
    if len(xy) > 0:
        out_mask = outlier_mad(xy, thresh=threshold)
        xy = xy[~out_mask]
        valid_labels = valid_labels[~out_mask]
    outlier_set = set(labels.tolist()) - set(valid_labels.tolist())
    outlier_str = " ".join(map(str, sorted(outlier_set)))
    if len(xy) < 2:
        return {
            "slope": np.nan, "intercept": np.nan, "pvalue": np.nan,
            "stderr": np.nan, "outliers": outlier_str,
        }
    slope, intercept, _r, p, se = linregress_np(xy[:, 0], xy[:, 1])
    return {
        "slope": float(np.round(slope, 3)),
        "intercept": float(np.round(intercept, 3)),
        "pvalue": float(np.round(p, 3)),
        "stderr": float(np.round(se, 3)),
        "outliers": outlier_str,
    }


# ------------------------------------------------------------- circular stats

def circmean_deg(x: np.ndarray, high: float = 180.0) -> float:
    """scipy.stats.circmean parity (NaN-free input expected)."""
    ang = np.asarray(x, np.float64) * 2.0 * np.pi / high
    s, c = np.sin(ang).mean(), np.cos(ang).mean()
    res = np.arctan2(s, c)
    return float(np.mod(res * high / (2.0 * np.pi), high))


def circstd_deg(x: np.ndarray, high: float = 180.0) -> float:
    ang = np.asarray(x, np.float64) * 2.0 * np.pi / high
    s, c = np.sin(ang).mean(), np.cos(ang).mean()
    r = min(1.0, np.hypot(s, c))
    return float(np.sqrt(-2.0 * np.log(r + 1e-300)) * high / (2.0 * np.pi))


# ------------------------------------------------------------- all-time stats

def all_time_stats(
    years: np.ndarray, dists: np.ndarray, outl_str: str, initial_year: int
) -> dict:
    """Reference all_time_stats (vector.py:1115-1183) on long-form data."""
    years = np.asarray(years, np.int64)
    dists = np.asarray(dists, np.float64)
    keep = years >= initial_year
    years, dists = years[keep], dists[keep]
    to_drop = {int(i) for i in outl_str.split(" ") if len(i) > 0}
    keep = np.array([y not in to_drop for y in years], bool) & ~np.isnan(dists)
    ys, ds = years[keep], dists[keep]
    if ys.size == 0:
        return {
            "valid_obs": 0, "valid_span": 0, "sce": np.nan, "nsm": np.nan,
            "max_year": None, "min_year": None,
        }
    order = np.argsort(ys)
    ys, ds = ys[order], ds[order]
    return {
        "valid_obs": int(ys.size),
        "valid_span": int(ys[-1] - ys[0] + 1),
        "sce": float(ds.max() - ds.min()),
        "nsm": float(-ds[ys == initial_year][0]) if initial_year in ys else float("nan"),
        "max_year": int(ys[ds.argmax()]),
        "min_year": int(ys[ds.argmin()]),
    }
