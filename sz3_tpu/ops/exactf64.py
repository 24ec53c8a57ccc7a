"""Exactly-rounded IEEE-754 double arithmetic on TPU, built from integer ops.

Why: the quantizer's contract is double-precision verify-and-fallback
(reference quantizer/LinearQuantizer.hpp:43-86). TPUs have no f64 hardware;
XLA emulates f64 as float-float (2x f32 = 48 mantissa bits), which misrounds
ulp-borderline cases, so TPU-produced archives were valid but not
sha-identical to the host engine. Integer arithmetic on TPU is EXACT (int64
emulates as 2x int32 without rounding), so this module implements the few
f64 operations the codec needs as softfloat over int64 lanes:

  * round53(|diff_f32| * recip_f64)  -> floor to int, clamp   (quantize)
  * round53(q_int * eb_f64)                                    (reconstruct)
  * round24(round53(pred_f32 + V))   -> f32 (double rounding, like the
    reference's f64 add then f32 cast)
  * round53(dec_f32 - data_f32)      <= eb_f64  (verify compare)
  * f32(-0.5*a + 1.5*b) promoted through f64    (linear1 predictor)

Cost: round 3 specialized the hot paths to their static value ranges (f32
mantissas and quantizer integers < 2^24, normalized operands in [2^52,2^53))
so the generic 64-bit floor-log2/normalize machinery reduces to one-compare
or exponent-extract forms at every hot call site; and power-of-two bounds
bypass the softfloat entirely with parity PROVEN (quantize.pow2_sha_safe,
ARCHITECTURE.md). Enabled on TPU backends (SZT_EXACT_F64=auto|1|0).
Numerical equivalence with IEEE doubles is property-tested against numpy
float64 in tests/test_exactf64.py, including directed ulp-tie cases.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

I32 = jnp.int32
I64 = jnp.int64


# ---- host-side f64 decomposition ----------------------------------------------

def f64_parts(x: float):
    """(sign, M in [2^52, 2^53), E) with x = sign * M * 2^E, for host-known
    scalars (eb, 1/eb). Raises for zero/subnormal/non-finite."""
    b = np.float64(x).view(np.uint64)
    sign = -1 if (b >> 63) else 1
    expf = int((b >> 52) & 0x7FF)
    frac = int(b & ((1 << 52) - 1))
    if expf == 0 or expf == 0x7FF:
        raise ValueError("zero/subnormal/non-finite f64 not supported here")
    M = frac | (1 << 52)
    E = expf - 1023 - 52
    return sign, M, E


# ---- device-side helpers -------------------------------------------------------

def _flog2_i64(v):
    """floor(log2(v)) for v >= 1 (int64), exact. Uses the f32 exponent field
    with an off-by-one guard (f32 conversion may round up to a power of 2)."""
    hi = (v >> I64(32)).astype(jnp.int32)
    lo = (v & I64(0xFFFFFFFF)).astype(jnp.uint32)
    use_hi = hi > 0
    word = jnp.where(use_hi, hi.astype(jnp.uint32), lo)
    f = word.astype(jnp.float32)
    fb = jax.lax.bitcast_convert_type(f, jnp.int32)
    e = ((fb >> I32(23)) & I32(255)) - I32(127)
    # if 2^e > word the conversion rounded up across a power of two; e >= 32
    # always means rounded up, since word < 2^32 by construction (values in
    # [2^32-128, 2^32) convert to the f32 2^32 -> e == 32)
    too_big = (e > 0) & (
        (e >= 32)
        | ((jnp.uint32(1) << jnp.clip(e, 0, 31).astype(jnp.uint32)) > word))
    e = jnp.where(too_big, e - 1, e)
    return jnp.where(use_hi, e + I32(32), e)


def _flog2_i32(v):
    """floor(log2(v)) for v in [1, 2^30) (int64 input, value fits int32).
    One f32 exponent extract + one round-up guard — no 64-bit word split, no
    clip: much cheaper than _flog2_i64 on int32-pair TPU lanes."""
    w = v.astype(jnp.int32)
    f = w.astype(jnp.float32)
    fb = jax.lax.bitcast_convert_type(f, jnp.int32)
    e = ((fb >> I32(23)) & I32(255)) - I32(127)
    # f32 conversion may round up across a power of two (e <= 30 here)
    return e - ((I32(1) << e) > w)


def _norm53_small(m, e):
    """Normalize m*2^e with m in [0, 2^30) to (M53 in [2^52,2^53), E) by an
    EXACT left shift (no rounding, no sticky): the cheap _norm53 for f32
    mantissas (<= 2^24) and small integer products. M53 == 0 for m == 0."""
    lg = _flog2_i32(jnp.maximum(m, I64(1)))
    sh = (I32(52) - lg).astype(I64)
    return jnp.where(m == 0, I64(0), m << sh), e - I32(52) + lg


def _f32_decompose(x):
    """x (f32 array) -> (neg bool, m int64, e int32, finite bool) with
    |x| = m * 2^e exactly (m == 0 for zeros; subnormals handled)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    neg = b < 0
    expf = (b >> I32(23)) & I32(255)
    frac = (b & I32((1 << 23) - 1)).astype(I64)
    normal = expf > 0
    m = jnp.where(normal, frac | I64(1 << 23), frac)
    e = jnp.where(normal, expf - I32(127) - I32(23), I32(-126 - 23))
    finite = expf < I32(255)
    return neg, m, e, finite


def _shr_sticky(M, k):
    """(M >> k, any dropped bit) with k clamped to [0, 63]."""
    kc = jnp.clip(k, 0, 63).astype(I64)
    shifted = jnp.where(k >= I32(64), I64(0), M >> kc)
    dropped = jnp.where(k >= I32(64), M != 0,
                        (M & ((I64(1) << kc) - I64(1))) != 0)
    return shifted, dropped


def _round_half_even(M, G, S):
    """Round mantissa M given guard bit G (int64 0/1) and sticky S (bool)."""
    return M + (G & (S.astype(I64) | (M & I64(1))))


def _norm53(M, E, sticky):
    """Normalize a positive M (1..2^55) to [2^52, 2^53) with half-even
    rounding of dropped bits; returns (M53, E'). sticky folds into rounding
    when shifting right. M == 0 stays 0."""
    lg = _flog2_i64(jnp.maximum(M, I64(1)))
    sh = lg - I32(52)
    # right shift (sh > 0): round; left shift (sh < 0): exact
    r_sh = jnp.maximum(sh, I32(0))
    g_pos = jnp.maximum(r_sh - I32(1), I32(0)).astype(I64)
    Mr = jnp.where(r_sh > 0, M >> r_sh.astype(I64), M << jnp.clip(-sh, 0, 63).astype(I64))
    G = jnp.where(r_sh > 0, (M >> g_pos) & I64(1), I64(0))
    low_mask = (I64(1) << g_pos) - I64(1)
    S = jnp.where(r_sh > 1, (M & low_mask) != 0, jnp.zeros_like(sticky)) | \
        (sticky & (r_sh > 0))
    # sticky also participates when r_sh == 0? no: no bits dropped; but an
    # incoming sticky with no shift means the TRUE value had lower bits ->
    # G=0 keeps M (round-to-even would only bump at >= half ulp) -- callers
    # must not pass sticky without shift unless value < 1/2 ulp. They don't.
    Mr = jnp.where(r_sh > 0, _round_half_even(Mr, G, S), Mr)
    E2 = E + sh
    # rounding may carry to 2^53
    ovf = Mr == I64(1) << I64(53)
    Mr = jnp.where(ovf, I64(1) << I64(52), Mr)
    E2 = jnp.where(ovf, E2 + 1, E2)
    return jnp.where(M == 0, I64(0), Mr), E2


def _mul_m24_m53(m, e, M53: int, E53: int):
    """Exactly-rounded f64 product of m*2^e (m int64 in [0, 2^24], variable)
    and a HOST-CONSTANT M53*2^E53 (M53 in [2^52,2^53)). Returns (P53, E) with
    value = P53 * 2^E, P53 in [2^52, 2^53) (or 0). Callers pass f32 mantissas
    (<= 2^24) or quantizer integers (<= quantbinCnt; guarded at the entry
    points)."""
    r_hi = I64(M53 >> 26)            # <= 2^27
    r_lo = I64(M53 & ((1 << 26) - 1))
    # normalize m to 24 bits so the product width is static-ish
    lg = _flog2_i32(jnp.maximum(m, I64(1)))
    up = (I32(23) - lg).astype(I64)   # >= 0 for m <= 2^24 (lg(2^24) = 24 only
    # at m == 2^24 exactly, where up == -1 shifts right losing nothing: the
    # low bit is 0) — jnp shift by -1 is undefined, so clamp and drop a
    # trailing zero explicitly
    mn = jnp.where(lg > I32(23), m >> I64(1), m << jnp.maximum(up, I64(0)))
    en = jnp.where(lg > I32(23), e + I32(1), e - jnp.maximum(up, I64(0)).astype(I32))
    p1 = mn * r_hi                    # <= 2^51
    p2 = mn * r_lo                    # <= 2^50
    P_hi = p1 + (p2 >> I64(26))       # <= 2^51 + 2^25
    P_lo = p2 & I64((1 << 26) - 1)
    # P = P_hi*2^26 + P_lo, in [2^75, 2^77) for mn in [2^23,2^24):
    # P_hi in [2^49, 2^51 + 2^25) -> its floor(log2) is 49 or 50 (one compare)
    lgP = I32(49) + (P_hi >= (I64(1) << I64(50))) + I32(26)
    drop = lgP - I32(52)              # 23 or 24
    dl = drop.astype(I64)
    R = (P_hi << (I64(26) - dl)) | (P_lo >> dl)
    G = (P_lo >> (dl - I64(1))) & I64(1)
    S = (P_lo & ((I64(1) << (dl - I64(1))) - I64(1))) != 0
    R = _round_half_even(R, G, S)
    E = en + I32(E53) + drop
    ovf = R == I64(1) << I64(53)
    R = jnp.where(ovf, I64(1) << I64(52), R)
    E = jnp.where(ovf, E + 1, E)
    return jnp.where(m == 0, I64(0), R), E


def _mul_m31_m53(m, e, M53: int, E53: int):
    """Exactly-rounded f64 product of m*2^e (m int64 in [0, 2^31), variable —
    the wide variant for XTC's 2^27 radius, where quantizer integers exceed
    2^24) and a HOST-CONSTANT M53*2^E53. Returns (P53, E), P53 in
    [2^52, 2^53) or 0. No input normalization: the 84-bit product rides two
    limbs (P_hi <= 2^58, P_lo < 2^26) and rounds at a data-dependent
    position in [0, 31]."""
    r_hi = I64(M53 >> 26)             # <= 2^27
    r_lo = I64(M53 & ((1 << 26) - 1))
    a = m * r_hi                       # <= 2^58
    bl = m * r_lo                      # <= 2^57
    P_hi = a + (bl >> I64(26))         # value = P_hi*2^26 + P_lo
    P_lo = bl & I64((1 << 26) - 1)
    lgP = _flog2_i64(jnp.maximum(P_hi, I64(1))) + I32(26)
    drop = jnp.maximum(lgP - I32(52), I32(0))   # 0..31 (m>=1)
    dl = drop.astype(I64)
    lo_case = drop <= I32(26)
    # drop <= 26: R takes all of P_hi plus the top bits of P_lo
    sh_hi = jnp.clip(I64(26) - dl, 0, 63)
    R_lo = (P_hi << sh_hi) | (P_lo >> jnp.clip(dl, 0, 63))
    g_lo = jnp.clip(dl - I64(1), 0, 63)
    G_lo = jnp.where(dl > 0, (P_lo >> g_lo) & I64(1), I64(0))
    S_lo = jnp.where(dl > 1, (P_lo & ((I64(1) << g_lo) - I64(1))) != 0,
                     jnp.zeros_like(lo_case))
    # drop > 26: R is a shifted P_hi; G/S straddle P_hi's low bits and P_lo
    dh = jnp.clip(dl - I64(26), 0, 63)
    R_hi = P_hi >> dh
    g_hi = jnp.clip(dh - I64(1), 0, 63)
    G_hi = (P_hi >> g_hi) & I64(1)
    S_hi = ((P_hi & ((I64(1) << g_hi) - I64(1))) != 0) | (P_lo != 0)
    R = jnp.where(lo_case, R_lo, R_hi)
    G = jnp.where(lo_case, G_lo, G_hi)
    S = jnp.where(lo_case, S_lo, S_hi)
    R = _round_half_even(R, G, S)
    E = e + I32(E53) + drop
    ovf = R == I64(1) << I64(53)
    R = jnp.where(ovf, I64(1) << I64(52), R)
    E = jnp.where(ovf, E + 1, E)
    return jnp.where(m == 0, I64(0), R), E


def _add_signed(negA, MA, EA, negB, MB, EB):
    """Exactly-rounded f64 sum of two magnitudes MA*2^EA, MB*2^EB with signs.
    PRECONDITION: each M is normalized to [2^52, 2^53) or zero (every caller
    passes _norm53/_norm53_small/_mul_m24_m53 outputs), so the magnitude
    order is the lexicographic (E, M) compare — no per-lane log2/shifts.
    Returns (neg, M53, E)."""
    mag_ge = (EA > EB) | ((EA == EB) & (MA >= MB))
    a_big = (MB == 0) | ((MA != 0) & mag_ge)
    M1 = jnp.where(a_big, MA, MB)
    E1 = jnp.where(a_big, EA, EB)
    n1 = jnp.where(a_big, negA, negB)
    M2 = jnp.where(a_big, MB, MA)
    E2 = jnp.where(a_big, EB, EA)
    n2 = jnp.where(a_big, negB, negA)

    same = n1 == n2
    dE = E1 - E2
    # give 3 guard bits to the small operand
    M1g = M1 << I64(3)
    M2s, St = _shr_sticky(M2 << I64(3), dE)
    Madd = M1g + M2s
    Msub = M1g - M2s - St.astype(I64)   # borrow when dropped bits exist
    sub_sticky = St
    M = jnp.where(same, Madd, Msub)
    sticky = jnp.where(same, St, sub_sticky)
    # normalize (M has 3 guard bits -> value = M * 2^(E1-3))
    R, E = _norm53(M, E1 - I32(3), sticky)
    neg = jnp.where(R == 0, jnp.zeros_like(n1), n1)
    return neg, R, E


def _narrow_f32(neg, M53, E):
    """f64 (sign, M53 in [2^52,2^53) or 0, E) -> nearest f32, single rounding
    (round half even), with gradual underflow and overflow -> inf."""
    biased = E + I32(52) + I32(127)        # f32 biased exponent if normal
    drop = jnp.where(biased >= 1, I32(29), I32(29) + (I32(1) - biased))
    dl = jnp.clip(drop, 0, 62).astype(I64)
    m = M53 >> dl
    G = (M53 >> (dl - I64(1))) & I64(1)
    S = (M53 & ((I64(1) << (dl - I64(1))) - I64(1))) != 0
    S = S | (drop > I32(62))
    m = jnp.where(drop > I32(62), I64(0), _round_half_even(m, G, S))
    # normal: m in [2^23, 2^24), may carry to 2^24
    carry = m == I64(1) << I64(24)
    m = jnp.where(carry, I64(1) << I64(23), m)
    bexp = jnp.where(carry, biased + 1, biased)
    bits_norm = ((bexp << I32(23)) | (m.astype(I32) & I32((1 << 23) - 1)))
    # subnormal path: bits are just m (a carry into bit 23 IS the smallest
    # normal encoding)
    bits = jnp.where(biased >= 1, bits_norm, m.astype(I32))
    bits = jnp.where(bexp >= I32(255), I32(0x7F800000), bits)
    bits = jnp.where(M53 == 0, I32(0), bits)
    bits = bits | jnp.where(neg, I32(-0x80000000), I32(0))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _le_const(M53, E, Mc: int, Ec: int):
    """value (M53*2^E, normalized or 0) <= host-constant Mc*2^Ec, exact."""
    key = E + I32(53)                      # both M in [2^52, 2^53)
    kc = Ec + 53
    lt = key < kc
    eq = key == kc
    return (M53 == 0) | lt | (eq & (M53 <= I64(Mc)))


# ---- codec primitives ----------------------------------------------------------

def quantize_exact(data, pred, eb: float, radius: int):
    """Bit-exact replica of LinearQuantizer::quantize_and_overwrite for f32
    data with IEEE-double internals (reference LinearQuantizer.hpp:43-71),
    built on integer ops only. Returns (bins int32, recon f32)."""
    if 2 * radius > (1 << 24):  # _mul_m24_m53 precondition (q <= 2^24)
        raise NotImplementedError("exact-f64 path requires quantbinCnt <= 2^24")
    recip = float(np.float64(1.0) / np.float64(eb))
    _, Mr, Er = f64_parts(recip)
    _, Me, Ee = f64_parts(eb)
    clampv = 2 * radius

    diff = data - pred                     # T precision, IEEE f32 on TPU
    dneg, dm, de, dfin = _f32_decompose(diff)

    # scaled = round53(|diff| * recip); q0 = floor(min(scaled, clamp))
    Ps, Es = _mul_m24_m53(dm, de, Mr, Er)
    sh = Es                               # value = Ps * 2^Es
    # floor: Ps >> (-sh) when sh < 0; overflow -> clamp
    q_shift = jnp.clip(-sh, 0, 63).astype(I64)
    q0 = jnp.where(sh >= 0, I64(clampv), Ps >> q_shift)
    q0 = jnp.where(sh < I32(-53), I64(0), q0)
    q0 = jnp.minimum(q0, I64(clampv))
    q0 = jnp.where(dfin, q0, I64(clampv))
    qi = q0.astype(jnp.int32) + I32(1)

    half = qi >> 1
    qe = half << 1
    # dec = f32(round53(pred + round53(q * eb))), q = +-qe
    Pv, Ev = _mul_m24_m53(qe.astype(I64), I32(0), Me, Ee)
    pneg, pm, pe, pfin = _f32_decompose(pred)
    pm53, pe53 = _norm53_small(pm, pe)
    sneg, Ms, Es2 = _add_signed(pneg, pm53, pe53, dneg, Pv, Ev)
    dec = _narrow_f32(sneg, Ms, Es2)

    # err = fabs(double(dec - data)): the subtraction is T-typed (f32) in the
    # reference, hence exact on TPU f32 hardware; comparing the exact f32
    # value against the f64 eb reduces to comparing against the largest f32
    # <= eb (host-precomputed)
    t32 = np.float32(eb)
    if np.float64(t32) > np.float64(eb):
        t32 = np.nextafter(t32, np.float32(0))
    err = jnp.abs(dec - data)
    ok = (qi < I32(clampv)) & (err <= t32) & dfin & pfin

    shifted = jnp.where(dneg, I32(radius) - half, I32(radius) + half)
    bins = jnp.where(ok, shifted, I32(0))
    recon = jnp.where(ok, dec, data)
    return bins, recon


def recover_exact(pred, bins, literal, eb: float, radius: int):
    """Bit-exact recover: pred + 2*(bin-radius)*eb through f64
    (LinearQuantizer.hpp:74-86)."""
    if 2 * radius > (1 << 24):  # _mul_m24_m53 precondition (|q| <= 2^24)
        raise NotImplementedError("exact-f64 path requires quantbinCnt <= 2^24")
    _, Me, Ee = f64_parts(eb)
    q = 2 * (bins - I32(radius))
    qneg = q < 0
    Pv, Ev = _mul_m24_m53(jnp.abs(q).astype(I64), I32(0), Me, Ee)
    pneg, pm, pe, _ = _f32_decompose(pred)
    pm53, pe53 = _norm53_small(pm, pe)
    sneg, Ms, Es2 = _add_signed(pneg, pm53, pe53, qneg, Pv, Ev)
    dec = _narrow_f32(sneg, Ms, Es2)
    return jnp.where(bins != 0, dec, literal)


def linear1_exact(a, b):
    """f32(-0.5*a + 1.5*b) with f64 intermediate (Interpolators.hpp linear1).
    -0.5*a and 1.5*b are exact in f64 (<= 26-bit mantissas); only the final
    add rounds, then the narrow."""
    aneg, am, ae, _ = _f32_decompose(a)
    bneg, bm, be, _ = _f32_decompose(b)
    # -0.5*a: magnitude am * 2^(ae-1), flipped sign. 1.5*b: 3*bm * 2^(be-1).
    am53, ae53 = _norm53_small(am, ae - I32(1))
    bm3 = bm * I64(3)
    bm53, be53 = _norm53_small(bm3, be - I32(1))  # bm3 < 2^26
    sneg, Ms, Es = _add_signed(~aneg & (am != 0), am53, ae53, bneg, bm53, be53)
    # sign of -0.5a: flip unless a == 0
    return _narrow_f32(sneg, Ms, Es)
