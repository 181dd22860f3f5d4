"""Two-limb wide-decimal arithmetic (precision 19..38).

Role analog: the reference's ``Decimal128``/``Decimal256`` mantissas
(``/root/reference/dbms/src/DataTypes/DataTypeDecimal.h:194``,
``Common/Decimal.h``) — re-designed for TPU: no int128 exists on the VPU,
so a wide mantissa is a PAIR of int64 limbs in base 10^18,

    value = hi * 10**18 + lo,   hi signed,  lo in [0, 10**18)

stored as a trailing-dim-2 array ``(..., 2)`` (the same 2-D column layout
the group_concat matrix already rides through take/concat/shuffle).
Physically exact for |value| < 2**63 * 10**18 ~ 9.2e36, i.e. every
mantissa of <= 36 full decimal digits; TiDB-typed results up to
precision 38 are CARRIED as this representation with an overflow flag for
the (astronomically rare) |value| >= 9.2e36 case.

All internal arithmetic decomposes limbs into base-10^9 digits so every
intermediate product/sum fits int64 — no float detours, bit-exact.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp

W9 = 10 ** 9
W18 = 10 ** 18
MAX_WIDE_PRECISION = 38


def wide_hi(w: jnp.ndarray) -> jnp.ndarray:
    return w[..., 0]


def wide_lo(w: jnp.ndarray) -> jnp.ndarray:
    return w[..., 1]


def make_wide(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([hi.astype(jnp.int64), lo.astype(jnp.int64)], axis=-1)


def widen_i64(x: jnp.ndarray) -> jnp.ndarray:
    """int64 mantissa -> two-limb.  jnp floor-div keeps lo in [0, W18)."""
    hi = x // W18
    return make_wide(hi, x - hi * W18)


def narrow_i64(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """two-limb -> (int64 value, fits_flag).  Value is garbage where the
    flag is False (|value| >= 2**63).  The product wraps (two's
    complement) but is exact whenever the flag is True."""
    hi, lo = wide_hi(w), wide_lo(w)
    val = hi * W18 + lo
    max_lo_at_9 = 2 ** 63 - 1 - 9 * W18    # hi == 9 ceiling
    min_lo_at_m10 = 10 * W18 - 2 ** 63     # hi == -10 floor
    fits = ((hi < 9) | ((hi == 9) & (lo <= max_lo_at_9))) & (
        (hi > -10) | ((hi == -10) & (lo >= min_lo_at_m10))
    )
    return val, fits


def digits_of_wide(w: jnp.ndarray) -> List[jnp.ndarray]:
    """Base-10^9 digit decomposition [d0, d1, d2, d3] (d0 least
    significant).  d0, d1 in [0, W9); d2 in [0, W9); d3 signed."""
    hi, lo = wide_hi(w), wide_lo(w)
    d3 = hi // W9
    d2 = hi - d3 * W9
    d1 = lo // W9
    d0 = lo - d1 * W9
    return [d0, d1, d2, d3]


def digits_of_i64(x: jnp.ndarray) -> List[jnp.ndarray]:
    """int64 -> [d0, d1] base-10^9 digits (d0 in [0, W9), d1 signed)."""
    d1 = x // W9
    return [x - d1 * W9, d1]


# largest t with |out2 + t*W9| < 2^63 for any out2 in [0, W9)
_MAX_TOP = (2 ** 63 - 1 - (W9 - 1)) // W9


def renorm_digits(digits: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Carry-normalize base-10^9 digit values (each |digit| <= ~2^62/10 —
    all in-repo callers sum at most ~1e9 bounded digits) into a two-limb
    value + overflow flag (value outside the representable ~9.2e36 range).

    Returns (wide (..., 2), overflowed bool (...))."""
    ds = list(digits) + [jnp.zeros_like(digits[0])] * (4 - len(digits))
    out = []
    carry = jnp.zeros_like(ds[0])
    for i in range(4):
        cur = ds[i] + carry
        carry = cur // W9          # floor: out digits stay in [0, W9)
        out.append(cur - carry * W9)
    # value = out0 + out1*W9 + out2*W18 + (out3 + carry*W9)*W27;
    # hi limb = out2 + top*W9 with top = out3 + carry*W9 — representable
    # only while |top| <= _MAX_TOP
    top = out[3] + carry * W9
    overflow = jnp.abs(top) > _MAX_TOP
    top = jnp.clip(top, -_MAX_TOP, _MAX_TOP)
    hi = out[2] + top * W9
    lo = out[0] + out[1] * W9
    return make_wide(hi, lo), overflow


def wide_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lo = wide_lo(a) + wide_lo(b)
    carry = lo // W18
    return make_wide(wide_hi(a) + wide_hi(b) + carry, lo - carry * W18)


def wide_neg(a: jnp.ndarray) -> jnp.ndarray:
    hi, lo = wide_hi(a), wide_lo(a)
    nz = lo > 0
    return make_wide(jnp.where(nz, -hi - 1, -hi), jnp.where(nz, W18 - lo, 0))


def wide_mul_pow10(w: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """value * 10**k exactly (0 <= k <= 9).  Returns (wide, overflow)."""
    assert 0 <= k <= 9
    if k == 0:
        return w, jnp.zeros(w.shape[:-1], dtype=jnp.bool_)
    m = 10 ** k
    digits = [d * m for d in digits_of_wide(w)]  # each < 1e9*1e9 = 1e18
    return renorm_digits(digits)


def wide_mul_pow2(w: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """value * 2**k exactly (k >= 0).  Returns (wide, overflow).  Steps of
    2^20 keep every scaled base-10^9 digit below renorm's ~4.6e17 input
    bound for ANY representable wide (|d3| <= 9.3e9)."""
    ov = jnp.zeros(w.shape[:-1], dtype=jnp.bool_)
    while k > 0:
        m = min(k, 20)
        digits = [d * jnp.int64(1 << m) for d in digits_of_wide(w)]
        w, o = renorm_digits(digits)
        ov = ov | o
        k -= m
    return w, ov


def wide_cmp_lt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a < b lexicographically on (hi, lo) — valid because lo >= 0."""
    return (wide_hi(a) < wide_hi(b)) | (
        (wide_hi(a) == wide_hi(b)) & (wide_lo(a) < wide_lo(b))
    )


def wide_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (wide_hi(a) == wide_hi(b)) & (wide_lo(a) == wide_lo(b))


def wide_div_round_half_up(w: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """value / c with TiDB ROUND_HALF_UP (away from zero), c positive
    int64 <= ~9e9 (row counts).  Base-10^9 long division."""
    neg = wide_hi(w) < 0
    mag = jnp.where(neg[..., None], wide_neg(w), w)
    d0, d1, d2, d3 = digits_of_wide(mag)
    c = c.astype(jnp.int64)
    q = []
    rem = jnp.zeros_like(d0)
    for d in (d3, d2, d1, d0):       # most-significant first
        cur = rem * W9 + d           # rem < c <= 9.2e9 -> cur < 9.2e18: ok
        qi = cur // c
        rem = cur - qi * c
        q.append(qi)
    # half-up on the remainder
    bump = (rem * 2 >= c).astype(jnp.int64)
    digits = [q[3] + bump, q[2], q[1], q[0]]
    out, _ = renorm_digits(digits)
    return jnp.where(neg[..., None], wide_neg(out), out)


def wide_sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return wide_add(a, wide_neg(b))


def wide_to_f64(w: jnp.ndarray) -> jnp.ndarray:
    """Approximate float64 value (relative error ~2^-52) — estimation only."""
    return wide_hi(w).astype(jnp.float64) * float(W18) + wide_lo(w).astype(
        jnp.float64
    )


def _div_small_floor(w: jnp.ndarray, c) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """floor(w / c) and remainder for NON-NEGATIVE w and small positive
    int c <= ~9.2e9 (so rem * W9 + digit fits int64)."""
    c = jnp.asarray(c, dtype=jnp.int64)
    d0, d1, d2, d3 = digits_of_wide(w)
    q = []
    rem = jnp.zeros_like(d0)
    for d in (d3, d2, d1, d0):
        cur = rem * W9 + d
        qi = cur // c
        rem = cur - qi * c
        q.append(qi)
    out, _ = renorm_digits([q[3], q[2], q[1], q[0]])
    return out, rem


# exact-division envelope: values below this renormalize without
# saturation at every internal step (the representable ceiling is ~9.22e36)
_DIV_FIT = 9.15e36
_DIV_CAP = 9.18e36


def _shifted_scaled(
    dd: Sequence[jnp.ndarray], k: int, c: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """den * c * W9**k as a two-limb value (c=None means c==1), assuming
    the caller guarantees the product fits the representable range.
    Digits landing at positions >= 3 fold into the top base-10^9
    coefficient (renorm_digits accepts a large signed top digit)."""
    zero = jnp.zeros_like(dd[0])
    pos = [zero, zero, zero]
    top = zero
    for j, d in enumerate(dd):
        p = j + k
        if p < 3:
            pos[p] = d
        else:
            f = W9 ** (p - 3)
            if f < 2 ** 62:  # higher folds require d == 0 to fit anyway
                top = top + d * f
    if c is not None:
        pos = [x * c for x in pos]
        top = top * c
    w, _ = renorm_digits([pos[0], pos[1], pos[2], top])
    return w


def wide_divmod(w: jnp.ndarray, den: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """floor(|w| / |den|) and remainder, sign applied to the quotient
    (truncating division); ``den`` must be nonzero.  Exact for
    |w| <= 9.0e36 (i.e. anything up to 36 full decimal digits).

    Restoring base-10^9 long division over quotient digit positions
    W9^4..W9^0.  Each digit is SEEDED from a float64 ratio (relative
    error ~2^-52, so off by at most ~2 given the previous step was
    exact) and CORRECTED with exact two-limb arithmetic — two
    conditional restore steps in each direction.  Every intermediate
    product is capped (``_DIV_CAP``) below the representable ceiling so
    renormalization never saturates.  Role analog: Int256 decimal
    division (``Common/Decimal.h`` DivDecimalInferer consumers) — no
    int128/256 exists on the VPU, so division decomposes into digit
    estimates the VPU can verify exactly."""
    neg = (wide_hi(w) < 0) ^ (wide_hi(den) < 0)
    r = jnp.where((wide_hi(w) < 0)[..., None], wide_neg(w), w)
    dmag = jnp.where((wide_hi(den) < 0)[..., None], wide_neg(den), den)
    dd = digits_of_wide(dmag)
    denf = wide_to_f64(dmag)
    qdigits: List[jnp.ndarray] = []
    for k in range(4, -1, -1):
        denkf = denf * float(W9) ** k
        fits = denkf < _DIV_FIT
        if k == 0:
            fits = fits | jnp.ones_like(fits)  # den itself always fits
        denk = _shifted_scaled(dd, k, None)
        # cap keeps c*denk below the saturation ceiling while never
        # capping below the true digit (floor(CAP/denk)*denk >= CAP-denk)
        cap = jnp.floor(_DIV_CAP / denkf)
        est = jnp.floor(wide_to_f64(r) / denkf)
        c = jnp.minimum(jnp.clip(est, 0.0, float(W9 + 2)), cap).astype(jnp.int64)
        c = jnp.where(fits, c, 0)
        r = wide_sub(r, _shifted_scaled(dd, k, c))
        for _ in range(2):  # float undershoot: r still >= den*W9^k
            over = fits & ~wide_cmp_lt(r, denk) & (wide_hi(r) >= 0)
            c = c + over.astype(jnp.int64)
            r = jnp.where(over[..., None], wide_sub(r, denk), r)
        for _ in range(2):  # float overshoot: r went negative
            under = fits & (wide_hi(r) < 0)
            c = c - under.astype(jnp.int64)
            r = jnp.where(under[..., None], wide_add(r, denk), r)
        qdigits.append(c)
    c4, c3, c2, c1, c0 = qdigits
    q, _ = renorm_digits([c0, c1, c2, c3 + c4 * W9])
    q = jnp.where(neg[..., None], wide_neg(q), q)
    return q, r


def wide_div_wide_round_half_up(w: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """w / den with TiDB ROUND_HALF_UP (away from zero), den nonzero wide."""
    q, r = wide_divmod(w, den)
    dmag = jnp.where((wide_hi(den) < 0)[..., None], wide_neg(den), den)
    # bump iff 2r >= |den|  <=>  r >= ceil(|den| / 2); 2r itself may exceed
    # the representable range, so compare against the halved divisor
    half_ceil, _ = _div_small_floor(wide_add(dmag, widen_i64(jnp.ones_like(wide_hi(den)))), 2)
    bump = ~wide_cmp_lt(r, half_ceil)
    neg = (wide_hi(w) < 0) ^ (wide_hi(den) < 0)
    one = widen_i64(jnp.ones_like(wide_hi(w)))
    q = jnp.where(
        bump[..., None],
        jnp.where(neg[..., None], wide_sub(q, one), wide_add(q, one)),
        q,
    )
    return q


def wide_mul(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a * b exactly, with an overflow flag for |product| beyond ~9.05e36.

    Base-10^9 schoolbook product on magnitudes; digit positions >= 3 fold
    into the (large, signed-tolerant) top renorm digit.  Per-term wraps
    can only occur for products the float overflow check already flags."""
    neg = (wide_hi(a) < 0) ^ (wide_hi(b) < 0)
    ma = jnp.where((wide_hi(a) < 0)[..., None], wide_neg(a), a)
    mb = jnp.where((wide_hi(b) < 0)[..., None], wide_neg(b), b)
    da, db = digits_of_wide(ma), digits_of_wide(mb)
    zero = jnp.zeros_like(da[0])
    pos = [zero, zero, zero]
    top = zero
    for i in range(4):
        for j in range(4):
            p = i + j
            if p < 3:
                pos[p] = pos[p] + da[i] * db[j]
            else:
                f = W9 ** (p - 3)
                if f < 2 ** 62:
                    top = top + da[i] * db[j] * f
    w, ovf = renorm_digits([pos[0], pos[1], pos[2], top])
    ovf = ovf | (wide_to_f64(ma) * wide_to_f64(mb) > 9.05e36)
    return jnp.where(neg[..., None], wide_neg(w), w), ovf


def wide_scale_up(w: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """value * 10**k for any k >= 0 (chunked through wide_mul_pow10)."""
    ovf = jnp.zeros(w.shape[:-1], dtype=jnp.bool_)
    while k > 0:
        w, o = wide_mul_pow10(w, min(k, 9))
        ovf = ovf | o
        k -= 9
    return w, ovf


def wide_sum_digits(
    digit_cols: Sequence[jnp.ndarray],
    reduce_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overflow-free wide summation: reduce each base-10^9 digit column
    independently with ``reduce_fn`` (any int64-exact segmented/total sum),
    then carry-normalize.  Exact for up to ~9e9 rows per digit."""
    sums = [reduce_fn(d) for d in digit_cols]
    return renorm_digits(sums)


def wide_to_host_ints(arr, validity=None) -> List:
    """(n, 2) host array -> python bigint mantissas (None where invalid)."""
    import numpy as np

    a = np.asarray(arr)
    out = []
    for i in range(a.shape[0]):
        if validity is not None and not validity[i]:
            out.append(None)
        else:
            out.append(int(a[i, 0]) * W18 + int(a[i, 1]))
    return out


__all__ = [
    "W9", "W18", "MAX_WIDE_PRECISION",
    "make_wide", "wide_hi", "wide_lo", "widen_i64", "narrow_i64",
    "digits_of_wide", "digits_of_i64", "renorm_digits",
    "wide_add", "wide_neg", "wide_mul_pow10", "wide_mul_pow2",
    "wide_cmp_lt", "wide_eq", "wide_div_round_half_up",
    "wide_sum_digits", "wide_to_host_ints",
]
