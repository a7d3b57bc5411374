"""Derivation of ops/layers.py::gelu_erf_fast coefficients (round 3).

Exact GELU is gelu(x) = x * Phi(x) (Phi = standard normal CDF). XLA lowers
bf16 `jax.nn.gelu(approximate=False)` through a two-branch fp32 erf
polynomial that measures ~5.5x the cost of one hardware exp on the v5e VPU
(docs/PERFORMANCE.md). This script fits the cheap reparameterization

    gelu(x) ~= x * sigmoid(t(x)),   t(x) = logit(Phi(x))

t is odd, smooth, and monotone, so a low-degree odd polynomial in u = x/9
(clamped) reaches |t_hat - t| <= 1.7e-3 over |x| <= 9 — below the bf16
half-ulp 2^-9 = 1.95e-3, which is the accuracy at which two implementations
become indistinguishable after bf16 rounding almost everywhere. The script
prints the coefficients and the exhaustive bf16 enumeration evidence quoted
in the gelu_erf_fast docstring.

Unlike the x*(1+erf(x/sqrt(2)))/2 form, sigmoid(t) computes Phi directly:
there is NO catastrophic cancellation for negative x, so the fast form is
*more* accurate than fp32 erf-GELU in the x < -4 tail.

Run: python vla_scripts/fit_fast_gelu.py   (CPU, needs scipy)
"""

import numpy as np
from scipy import special

S = 9.0          # clamp / fit half-range
N_COEF = 8       # odd degrees 1..15 in u = x/S


def phi64(x):
    return 0.5 * (1.0 + special.erf(np.asarray(x, np.float64) / np.sqrt(2.0)))


def logit_phi(x):
    # stable: log Phi(x) - log Phi(-x)
    return special.log_ndtr(x) - special.log_ndtr(-x)


def to_bf16_bits(a):
    """fp32 -> bf16 bit pattern with round-to-nearest-even."""
    u = np.asarray(a, np.float32).view(np.uint32)
    return ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)


def fit():
    xs = np.linspace(1e-4, S, 60001)
    us = xs / S
    t = logit_phi(xs)
    A = np.stack([us ** (2 * i + 1) for i in range(N_COEF)], axis=1)
    # iteratively reweighted least squares -> approximate minimax on |dt|
    w = np.ones_like(xs)
    c = None
    for _ in range(120):
        c, *_ = np.linalg.lstsq(A * w[:, None], t * w, rcond=None)
        err = np.abs(A @ c - t)
        w = np.sqrt(err + 1e-12) * w
        w /= w.max()
    print(f"max |t_hat - t| over [0, {S}]: {np.abs(A @ c - t).max():.3e} "
          f"(bf16 half-ulp: {2**-9:.3e})")
    return c


def enumerate_bf16(c):
    u = np.arange(0x10000, dtype=np.uint32)
    f = (u << 16).view(np.float32)
    x = f[np.isfinite(f)].astype(np.float64)
    golden = to_bf16_bits(x * phi64(x)).astype(np.int32)

    x32 = x.astype(np.float32)
    xc = np.clip(x32, np.float32(-S), np.float32(S))
    uu = xc * np.float32(1.0 / S)
    v = uu * uu
    acc = np.full_like(uu, np.float32(c[-1]))
    for cc in c[-2::-1]:
        acc = acc * v + np.float32(cc)
    t32 = acc * uu
    sig = np.float32(1.0) / (np.float32(1.0) + np.exp(-t32, dtype=np.float32))
    fast = to_bf16_bits(x32 * sig).astype(np.int32)

    diff = np.abs(golden - fast)
    for lo, hi in [(0, 5), (5, 9), (9, np.inf)]:
        m = (np.abs(x) > lo) & (np.abs(x) <= hi) & (diff > 0)
        gmax = np.abs(x[m] * phi64(x[m])).max() if m.any() else 0.0
        print(f"{lo} < |x| <= {hi}: {m.sum()} bf16 mismatches, "
              f"max ulp {diff[m].max() if m.any() else 0}, "
              f"largest |gelu| among them {gmax:.2e}")


if __name__ == "__main__":
    c = fit()
    print("coefficients (odd degrees 1,3,..,15 in u=x/9):")
    print("(" + ",\n ".join(repr(float(v)) for v in c) + ")")
    enumerate_bf16(c)
