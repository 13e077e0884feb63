"""FEDformer multiwavelet attention (Legendre/Chebyshev filter banks).

Parity target (dormant in the reference): `layers/MultiWaveletCorrelation.py`
— `get_phi_psi`/`get_filter` (multiwavelet filter construction),
`sparseKernelFT1d`, `MWT_CZ1d`, `MultiWaveletTransform` (self-attention
drop-in) and `MultiWaveletCross` (cross attention in wavelet space, using
the weightless `FourierCrossAttentionW` from `fourier.py`).

TPU re-design notes:
- Filter construction is pure host-side numpy/scipy (no sympy): shifted
  Legendre/Chebyshev polynomials come from `numpy.polynomial` composition
  with (2x-1)/(4x-1), and the reference's quadrature
  `wm = 1/k/P'_k(y)/P_{k-1}(y)` is exactly the [0,1]-mapped Gauss-Legendre
  rule, so we take nodes/weights from `scipy.special.roots_legendre`.
  Results are cached per (base, k) and baked into the jit as constants.
- The decompose/reconstruct ladders run a static number of levels
  (floor(log2 N)) as a Python loop at trace time — each level halves the
  length, all shapes static. The even/odd reassembly is a stack+reshape
  interleave, not the reference's zeros-scatter.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
from scipy.special import roots_legendre

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.models.extra.fourier import FourierCrossAttentionW

_Poly = np.polynomial.Polynomial


def _legendre_shift(k: int, stretch: int) -> list:
    """Polynomials P_ki(stretch*x - 1) in power basis, ki = 0..k-1."""
    out = []
    for ki in range(k):
        coefs = np.polynomial.legendre.leg2poly(
            np.eye(k + 1)[ki][: ki + 1] if ki else np.array([1.0]))
        p = _Poly(coefs)(_Poly([-1.0, float(stretch)]))
        out.append(p)
    return out


def _chebyshev_shift(k: int, stretch: int) -> list:
    out = []
    for ki in range(k):
        coefs = np.polynomial.chebyshev.cheb2poly(
            np.eye(k + 1)[ki][: ki + 1] if ki else np.array([1.0]))
        p = _Poly(coefs)(_Poly([-1.0, float(stretch)]))
        out.append(p)
    return out


def _integral_01(prod: np.ndarray, upper_half: bool) -> float:
    """Exact integral of a power-basis polynomial over [0, 1/2] (or the
    complement [1/2, 1]) — the reference's projection rule
    (MultiWaveletCorrelation.py:48-72)."""
    j = np.arange(len(prod), dtype=np.float64)
    half = np.power(0.5, j + 1) / (j + 1)
    full = 1.0 / (j + 1)
    seg = (full - half) if upper_half else half
    return float((prod * seg).sum())


@lru_cache(maxsize=None)
def get_phi_psi(k: int, base: str = "legendre"):
    """Scaling (phi) and two-half wavelet (psi1 on [0,1/2], psi2 on [1/2,1])
    polynomial coefficient rows (ascending powers), orthonormalized by
    Gram-Schmidt exactly as reference MultiWaveletCorrelation.py:31-142."""
    if base == "legendre":
        shifted = _legendre_shift(k, 2)
        shifted2x = _legendre_shift(k, 4)
        phi = np.zeros((k, k))
        phi2x = np.zeros((k, k))
        for ki in range(k):
            c = shifted[ki].coef
            phi[ki, : len(c)] = np.sqrt(2 * ki + 1) * c
            c = shifted2x[ki].coef
            phi2x[ki, : len(c)] = np.sqrt(2.0) * np.sqrt(2 * ki + 1) * c

        psi1 = np.zeros((k, k))
        psi2 = np.zeros((k, k))
        for ki in range(k):
            # candidate wavelet = sqrt2*phi_ki(2x) (supported on [0,1/2]
            # only — hence psi2 starts at zero) minus projections onto phi
            # and previous psi, subtracted on both halves
            psi1[ki] = phi2x[ki].copy()
            for i in range(k):
                prod = np.convolve(phi2x[ki], phi[i])
                prod[np.abs(prod) < 1e-8] = 0.0
                proj = _integral_01(prod, upper_half=False)
                psi1[ki] -= proj * phi[i]
                psi2[ki] -= proj * phi[i]
            for j in range(ki):
                prod = np.convolve(phi2x[ki], psi1[j])
                prod[np.abs(prod) < 1e-8] = 0.0
                proj = _integral_01(prod, upper_half=False)
                psi1[ki] -= proj * psi1[j]
                psi2[ki] -= proj * psi2[j]
            p1 = np.convolve(psi1[ki], psi1[ki])
            p1[np.abs(p1) < 1e-8] = 0.0
            p2 = np.convolve(psi2[ki], psi2[ki])
            p2[np.abs(p2) < 1e-8] = 0.0
            norm = math.sqrt(_integral_01(p1, False) + _integral_01(p2, True))
            psi1[ki] /= norm
            psi2[ki] /= norm
            psi1[ki][np.abs(psi1[ki]) < 1e-8] = 0.0
            psi2[ki][np.abs(psi2[ki]) < 1e-8] = 0.0
        return phi, psi1, psi2

    if base == "chebyshev":
        shifted = _chebyshev_shift(k, 2)
        shifted2x = _chebyshev_shift(k, 4)
        phi = np.zeros((k, k))
        phi2x = np.zeros((k, k))
        for ki in range(k):
            unit = math.sqrt(2.0 / math.pi) if ki == 0 else 2.0 / math.sqrt(
                math.pi)
            c = shifted[ki].coef
            phi[ki, : len(c)] = unit * c
            c = shifted2x[ki].coef
            phi2x[ki, : len(c)] = math.sqrt(2.0) * unit * c

        # Chebyshev-Gauss quadrature on [0,1] with 2k nodes
        kuse = 2 * k
        i = np.arange(kuse)
        x_m = (np.cos((2 * i + 1) * math.pi / (2 * kuse)) + 1.0) / 2.0
        wm = math.pi / kuse / 2.0
        ev = lambda row, x: np.polynomial.polynomial.polyval(x, row)
        supp = lambda row, x, lb, ub: ev(row, x) * (
            1.0 - (np.logical_or(x < lb, x > ub)).astype(np.float64))

        psi1 = np.zeros((k, k))
        psi2 = np.zeros((k, k))
        for ki in range(k):
            psi1[ki] = phi2x[ki].copy()   # psi2 starts at zero: phi(2x)
            # lives on [0,1/2] only, projections hit both halves
            # sqrt(2)*phi_ki(2x) with phi's [0,1] support mask, as in the
            # reference's partial(phi_, ...) evaluation
            phi_ki_2x = np.sqrt(2.0) * supp(phi[ki], 2 * x_m, 0.0, 1.0)
            for i2 in range(k):
                proj = (wm * supp(phi[i2], x_m, 0.0, 1.0) * phi_ki_2x).sum()
                psi1[ki] -= proj * phi[i2]
                psi2[ki] -= proj * phi[i2]
            for j in range(ki):
                proj = (wm * supp(psi1[j], x_m, 0.0, 0.5) * phi_ki_2x).sum()
                psi1[ki] -= proj * psi1[j]
                psi2[ki] -= proj * psi2[j]
            n1 = (wm * supp(psi1[ki], x_m, 0.0, 0.5) ** 2).sum()
            n2 = (wm * supp(psi2[ki], x_m, 0.5, 1.0) ** 2).sum()
            norm = math.sqrt(n1 + n2)
            psi1[ki] /= norm
            psi2[ki] /= norm
            psi1[ki][np.abs(psi1[ki]) < 1e-8] = 0.0
            psi2[ki][np.abs(psi2[ki]) < 1e-8] = 0.0
        return phi, psi1, psi2

    raise ValueError(f"base {base!r} not supported")


@lru_cache(maxsize=None)
def get_filter(base: str, k: int):
    """Two-scale filter matrices H0/H1/G0/G1 (+ PHI0/PHI1) of the k-term
    multiwavelet basis (reference MultiWaveletCorrelation.py:145-198)."""
    phi, psi1, psi2 = get_phi_psi(k, base)
    ev = lambda rows, x: np.polynomial.polynomial.polyval(
        x, rows.T)                                          # (k, len(x))
    H0 = np.zeros((k, k))
    H1 = np.zeros((k, k))
    G0 = np.zeros((k, k))
    G1 = np.zeros((k, k))

    def psi_eval(x):
        lower = ev(psi1, x) * (x <= 0.5)
        upper = ev(psi2, x) * (x > 0.5)
        return lower + upper

    if base == "legendre":
        y, w = roots_legendre(k)
        x_m = (y + 1.0) / 2.0
        wm = w / 2.0
    elif base == "chebyshev":
        kuse = 2 * k
        i = np.arange(kuse)
        x_m = (np.cos((2 * i + 1) * math.pi / (2 * kuse)) + 1.0) / 2.0
        wm = np.full(kuse, math.pi / kuse / 2.0)
    else:
        raise ValueError(f"base {base!r} not supported")

    phi_at = lambda x: ev(phi, x)
    rt2 = math.sqrt(2.0)
    for ki in range(k):
        for kpi in range(k):
            H0[ki, kpi] = (wm * phi_at(x_m / 2)[ki]
                           * phi_at(x_m)[kpi]).sum() / rt2
            G0[ki, kpi] = (wm * psi_eval(x_m / 2)[ki]
                           * phi_at(x_m)[kpi]).sum() / rt2
            H1[ki, kpi] = (wm * phi_at((x_m + 1) / 2)[ki]
                           * phi_at(x_m)[kpi]).sum() / rt2
            G1[ki, kpi] = (wm * psi_eval((x_m + 1) / 2)[ki]
                           * phi_at(x_m)[kpi]).sum() / rt2
    if base == "legendre":
        PHI0 = np.eye(k)
        PHI1 = np.eye(k)
    else:
        PHI0 = np.zeros((k, k))
        PHI1 = np.zeros((k, k))
        for ki in range(k):
            for kpi in range(k):
                PHI0[ki, kpi] = 2 * (wm * phi_at(2 * x_m)[ki]
                                     * phi_at(2 * x_m)[kpi]).sum()
                PHI1[ki, kpi] = 2 * (wm * phi_at(2 * x_m - 1)[ki]
                                     * phi_at(2 * x_m - 1)[kpi]).sum()
        PHI0[np.abs(PHI0) < 1e-8] = 0.0
        PHI1[np.abs(PHI1) < 1e-8] = 0.0
    for m in (H0, H1, G0, G1):
        m[np.abs(m) < 1e-8] = 0.0
    return H0, H1, G0, G1, PHI0, PHI1


@lru_cache(maxsize=None)
def _bank(base: str, k: int):
    """(ec_s, ec_d, rc_e, rc_o) jnp constants for the transform ladders."""
    H0, H1, G0, G1, PHI0, PHI1 = get_filter(base, k)
    ec_s = np.concatenate((H0.T, H1.T), axis=0)
    ec_d = np.concatenate((G0.T, G1.T), axis=0)
    H0r, G0r = H0 @ PHI0, G0 @ PHI0
    H1r, G1r = H1 @ PHI1, G1 @ PHI1
    for m in (H0r, G0r, H1r, G1r):
        m[np.abs(m) < 1e-8] = 0.0
    rc_e = np.concatenate((H0r, G0r), axis=0)
    rc_o = np.concatenate((H1r, G1r), axis=0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return f32(ec_s), f32(ec_d), f32(rc_e), f32(rc_o)


def wavelet_transform(x: jax.Array, ec_s, ec_d):
    """One decomposition level: (B, N, c, k) -> detail d, smooth s at N/2
    (reference MultiWaveletCorrelation.py:375-381)."""
    xa = jnp.concatenate([x[:, ::2], x[:, 1::2]], axis=-1)  # (B, N/2, c, 2k)
    return xa @ ec_d, xa @ ec_s


def even_odd(x: jax.Array, rc_e, rc_o, k: int):
    """One reconstruction level: (B, N, c, 2k) -> (B, 2N, c, k), interleaving
    even/odd outputs (reference MultiWaveletCorrelation.py:383-394)."""
    x_e = x @ rc_e
    x_o = x @ rc_o
    b, n, c, _ = x_e.shape
    return jnp.stack([x_e, x_o], axis=2).reshape(b, 2 * n, c, k)


class SparseKernelFT1d(nn.Module):
    """Frequency-domain linear operator on the lowest `alpha` modes
    (reference MultiWaveletCorrelation.py:458-500)."""

    k: int
    alpha: int
    c: int = 1

    @nn.compact
    def __call__(self, x):                                  # (B, N, c, k)
        b, n, c, k = x.shape
        ck = c * k
        scale = 1.0 / (ck * ck)
        init = lambda key, shp: scale * jax.random.uniform(key, shp,
                                                           jnp.float32)
        wr = self.param("weights_real", init, (ck, ck, self.alpha))
        wi = self.param("weights_imag", init, (ck, ck, self.alpha))
        w = jax.lax.complex(wr, wi)

        xf = jnp.fft.rfft(x.reshape(b, n, ck).transpose(0, 2, 1)
                          .astype(jnp.float32))             # (B, ck, F)
        l = min(self.alpha, n // 2 + 1)
        out = jnp.einsum("bix,iox->box", xf[:, :, :l], w[:, :, :l])
        out_ft = jnp.zeros((b, ck, n // 2 + 1), jnp.complex64
                           ).at[:, :, :l].set(out)
        y = jnp.fft.irfft(out_ft, n=n)
        return y.transpose(0, 2, 1).reshape(b, n, c, k).astype(x.dtype)


class MWT_CZ1d(nn.Module):
    """One multiwavelet transform block: decompose ns levels, apply sparse
    frequency kernels A/B/C per level and T0 at the coarsest scale, then
    reconstruct (reference MultiWaveletCorrelation.py:507-572)."""

    k: int = 3
    alpha: int = 64
    L: int = 0
    c: int = 1
    base: str = "legendre"

    @nn.compact
    def __call__(self, x):                                  # (B, N, c, k)
        ec_s, ec_d, rc_e, rc_o = _bank(self.base, self.k)
        b, n, c, k = x.shape
        ns = int(math.floor(math.log2(n)))
        nl = 2 ** int(math.ceil(math.log2(n)))
        if nl > n:
            x = jnp.concatenate([x, x[:, : nl - n]], axis=1)
        A = SparseKernelFT1d(self.k, self.alpha, self.c, name="A")
        B = SparseKernelFT1d(self.k, self.alpha, self.c, name="B")
        C = SparseKernelFT1d(self.k, self.alpha, self.c, name="C")
        ud, us = [], []
        for _ in range(ns - self.L):
            d, x = wavelet_transform(x, ec_s, ec_d)
            ud.append(A(d) + B(x))
            us.append(C(d))
        x = nn.Dense(self.k, name="T0")(x)                  # coarsest scale
        for i in range(ns - 1 - self.L, -1, -1):
            x = x + us[i]
            x = jnp.concatenate([x, ud[i]], axis=-1)
            x = even_odd(x, rc_e, rc_o, self.k)
        return x[:, :n]


class MultiWaveletTransform(nn.Module):
    """Self-attention drop-in: values -> c*k channels -> nCZ MWT blocks ->
    back (reference MultiWaveletCorrelation.py:200-238). (B,L,H,E) in/out."""

    ich: int = 1
    k: int = 8
    alpha: int = 16
    c: int = 128
    nCZ: int = 1
    L: int = 0
    base: str = "legendre"

    @nn.compact
    def __call__(self, q, k_in, v, *, train: bool = False):
        b, l, h, e = q.shape
        s = v.shape[1]
        if l > s:
            zeros = jnp.zeros((b, l - s, h, e), v.dtype)
            v = jnp.concatenate([v, zeros], axis=1)
        else:
            v = v[:, :l]
        vv = nn.Dense(self.c * self.k, name="Lk0")(v.reshape(b, l, -1))
        vv = vv.reshape(b, l, self.c, self.k)
        for i in range(self.nCZ):
            vv = MWT_CZ1d(self.k, self.alpha, self.L, self.c, self.base,
                          name=f"MWT_CZ_{i}")(vv)
            if i < self.nCZ - 1:
                vv = jax.nn.relu(vv)
        out = nn.Dense(self.ich, name="Lk1")(vv.reshape(b, l, -1))
        return out.reshape(b, l, -1, e), None


class MultiWaveletCross(nn.Module):
    """Cross attention in multiwavelet space: decompose q/k/v, run the
    weightless Fourier cross attention per level on detail+smooth parts,
    reconstruct (reference MultiWaveletCorrelation.py:241-394)."""

    in_channels: int
    out_channels: int
    modes: int
    c: int = 64
    k: int = 8
    ich: int = 512
    L: int = 0
    base: str = "legendre"
    activation: str = "tanh"

    @nn.compact
    def __call__(self, q, k_in, v, *, train: bool = False):
        ec_s, ec_d, rc_e, rc_o = _bank(self.base, self.k)
        b, n, h, e = q.shape
        s = k_in.shape[1]
        proj = lambda name, z: nn.Dense(self.c * self.k, name=name)(
            z.reshape(z.shape[0], z.shape[1], -1)).reshape(
                z.shape[0], z.shape[1], self.c, self.k)
        qq, kk, vv = proj("Lq", q), proj("Lk", k_in), proj("Lv", v)
        if n > s:
            zeros = jnp.zeros((b, n - s, self.c, self.k), vv.dtype)
            vv = jnp.concatenate([vv, zeros], axis=1)
            kk = jnp.concatenate([kk, zeros], axis=1)
        else:
            vv, kk = vv[:, :n], kk[:, :n]

        ns = int(math.floor(math.log2(n)))
        nl = 2 ** int(math.ceil(math.log2(n)))
        if nl > n:
            ext = lambda z: jnp.concatenate([z, z[:, : nl - n]], axis=1)
            qq, kk, vv = ext(qq), ext(kk), ext(vv)

        attn = lambda name: FourierCrossAttentionW(
            self.in_channels, self.out_channels, self.modes,
            self.activation, name=name)
        a1, a2, a3, a4 = (attn(f"attn{i}") for i in (1, 2, 3, 4))

        ud_q, ud_k, ud_v = [], [], []
        us_q, us_k, us_v = [], [], []
        for _ in range(ns - self.L):
            d, qq = wavelet_transform(qq, ec_s, ec_d)
            ud_q.append((d, qq))
            us_q.append(d)
        for _ in range(ns - self.L):
            d, kk = wavelet_transform(kk, ec_s, ec_d)
            ud_k.append((d, kk))
            us_k.append(d)
        for _ in range(ns - self.L):
            d, vv = wavelet_transform(vv, ec_s, ec_d)
            ud_v.append((d, vv))
            us_v.append(d)
        ud, us = [], []
        for i in range(ns - self.L):
            ud.append(a1(ud_q[i][0], ud_k[i][0], ud_v[i][0])[0]
                      + a2(ud_q[i][1], ud_k[i][1], ud_v[i][1])[0])
            us.append(a3(us_q[i], us_k[i], us_v[i])[0])
        vv = a4(qq, kk, vv)[0]

        for i in range(ns - 1 - self.L, -1, -1):
            vv = vv + us[i]
            vv = jnp.concatenate([vv, ud[i]], axis=-1)
            vv = even_odd(vv, rc_e, rc_o, self.k)
        out = nn.Dense(self.ich, name="out")(
            vv[:, :n].reshape(b, n, -1))
        return out, None
