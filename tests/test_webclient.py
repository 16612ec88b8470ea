"""Validation of the browser client (webclient/snark.js).

No JS runtime exists in this image (no node/browser), so the client is
validated two ways:

1. its numeric constants are extracted from the source and checked against
   :mod:`go_snark_study_tpu.bn128.constants` (a drifted constant is the most
   likely way the file silently rots);
2. the distinctive algorithm of the file — the AFFINE-Miller optimal-ate
   pairing with sparse line values built directly in the Fq12 tower basis,
   naive full-exponent final exp — is mirrored here line-for-line in Python
   and asserted BYTE-IDENTICAL against the production pairing
   (:mod:`go_snark_study_tpu.bn128.pairing`) on random points.  The reduced
   ate pairing value is canonical, so equality proves the JS math (untwist
   direction, line construction, Frobenius-twist gammas, loop structure) is
   exactly the tested pairing.

The group-law/MSM/witness parts of snark.js are transcriptions of the same
formulas the host groups implement (tested in test_bn128/test_protocols).
"""

import random
import re
from pathlib import Path

from go_snark_study_tpu.bn128 import constants as C, default_bn128

JS = Path(__file__).parent.parent / "go_snark_study_tpu" / "webclient" / "snark.js"

Q = C.Q
R = C.R


def _src():
    return JS.read_text()


def test_js_constants_match_bn128():
    src = _src()

    def grab(name):
        m = re.search(rf"const {name} = ([0-9]+)n", src)
        assert m, f"constant {name} not found in snark.js"
        return int(m.group(1))

    assert grab("Q") == C.Q
    assert grab("R") == C.R
    assert grab("ATE_LOOP") == C.LOOP_COUNT
    # G2 generator coordinates (affine, z = one)
    nums = [int(x) for x in re.findall(r"\n    ([0-9]{40,})n,", src)]
    gx, gy = C.G2_GENERATOR[0], C.G2_GENERATOR[1]
    assert nums[:4] == [gx[0], gx[1], gy[0], gy[1]]


# ---------------------------------------------------------------------------
# python mirror of snark.js's pairing (same structure, BigInt -> int)
# ---------------------------------------------------------------------------

XI = (9, 1)


def f2add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2neg(a):
    return (-a[0] % Q, -a[1] % Q)


def f2conj(a):
    return (a[0], -a[1] % Q)


def f2scale(a, k):
    return (a[0] * k % Q, a[1] * k % Q)


def f2mul(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % Q,
        (a[0] * b[1] + a[1] * b[0]) % Q,
    )


def f2sq(a):
    return f2mul(a, a)


def f2inv(a):
    n = pow(a[0] * a[0] + a[1] * a[1], Q - 2, Q)
    return (a[0] * n % Q, -a[1] * n % Q)


def f2exp(a, e):
    r = (1, 0)
    while e:
        if e & 1:
            r = f2mul(r, a)
        a = f2sq(a)
        e >>= 1
    return r


def f6zero():
    return ((0, 0), (0, 0), (0, 0))


def f6one():
    return ((1, 0), (0, 0), (0, 0))


def f6add(a, b):
    return tuple(f2add(x, y) for x, y in zip(a, b))


def f6mul_by_v(a):
    return (f2mul(a[2], XI), a[0], a[1])


def f6mul(a, b):
    acc = [(0, 0)] * 5
    for i in range(3):
        for j in range(3):
            acc[i + j] = f2add(acc[i + j], f2mul(a[i], b[j]))
    return (
        f2add(acc[0], f2mul(acc[3], XI)),
        f2add(acc[1], f2mul(acc[4], XI)),
        acc[2],
    )


def f12one():
    return (f6one(), f6zero())


def f12mul(x, y):
    ac = f6mul(x[0], y[0])
    bd = f6mul(x[1], y[1])
    ad = f6mul(x[0], y[1])
    bc = f6mul(x[1], y[0])
    return (f6add(ac, f6mul_by_v(bd)), f6add(ad, bc))


def f12sq(x):
    return f12mul(x, x)


def f12exp(x, e):
    r = f12one()
    while e:
        if e & 1:
            r = f12mul(r, x)
        x = f12sq(x)
        e >>= 1
    return r


G1F = f2exp(XI, (Q - 1) // 6)
GAMMA12 = f2sq(G1F)
GAMMA13 = f2mul(GAMMA12, G1F)
GAMMA22 = f2mul(GAMMA12, f2conj(GAMMA12))
GAMMA23 = f2mul(GAMMA13, f2conj(GAMMA13))


def line_value(lam, x, y, xp, yp):
    a = ((yp, 0), (0, 0), (0, 0))
    b = (f2scale(f2neg(lam), xp), f2sub(f2mul(lam, x), y), (0, 0))
    return (a, b)


def add_step(x1, y1, x2, y2, xp, yp):
    if x1 == x2 and y1 == y2:
        lam = f2mul(f2scale(f2sq(x1), 3), f2inv(f2scale(y1, 2)))
        x3 = f2sub(f2sq(lam), f2scale(x1, 2))
    else:
        lam = f2mul(f2sub(y2, y1), f2inv(f2sub(x2, x1)))
        x3 = f2sub(f2sub(f2sq(lam), x1), x2)
    return (
        line_value(lam, x1, y1, xp, yp),
        x3,
        f2sub(f2mul(lam, f2sub(x1, x3)), y1),
    )


def mirror_pairing(p_aff, q_aff):
    """(xp, yp) in G1 affine, ((x0,x1),(y0,y1)) in G2 affine -> Fq12 in the
    (a + b w) tower basis — the same element layout as fields.Fq12."""
    xp, yp = p_aff
    qx, qy = q_aff
    tx, ty = qx, qy
    f = f12one()
    bits = bin(C.LOOP_COUNT)[3:]  # MSB-1 downwards
    for bit in bits:
        lam = f2mul(f2scale(f2sq(tx), 3), f2inv(f2scale(ty, 2)))
        f = f12mul(f12sq(f), line_value(lam, tx, ty, xp, yp))
        x3 = f2sub(f2sq(lam), f2scale(tx, 2))
        ty = f2sub(f2mul(lam, f2sub(tx, x3)), ty)
        tx = x3
        if bit == "1":
            l, tx, ty = add_step(tx, ty, qx, qy, xp, yp)
            f = f12mul(f, l)
    q1 = (f2mul(f2conj(qx), GAMMA12), f2mul(f2conj(qy), GAMMA13))
    q2neg = (f2mul(qx, GAMMA22), f2neg(f2mul(qy, GAMMA23)))
    l, tx, ty = add_step(tx, ty, q1[0], q1[1], xp, yp)
    f = f12mul(f, l)
    l, tx, ty = add_step(tx, ty, q2neg[0], q2neg[1], xp, yp)
    f = f12mul(f, l)
    exponent = (Q**12 - 1) // R
    return f12exp(f, exponent)


def _to_tower(e12):
    """Mirror layout ((c0,c1,c2),(c3,c4,c5)) with Fq2 tuples -> the host
    Fq12 element layout [2][3][2]."""
    return tuple(tuple(tuple(c) for c in half) for half in e12)


def test_mirror_pairing_matches_production():
    bn = default_bn128()
    rng = random.Random(31)
    for _ in range(2):
        a = rng.randrange(1, 1 << 60)
        b = rng.randrange(1, 1 << 60)
        pj = bn.g1.mul_scalar(bn.g1.g, a)
        qj = bn.g2.mul_scalar(bn.g2.g, b)
        want = bn.pairing(pj, qj)
        p = bn.g1.affine(pj)
        q = bn.g2.affine(qj)
        got = _to_tower(mirror_pairing((p[0], p[1]), (q[0], q[1])))
        assert got == tuple(tuple(tuple(x) for x in half) for half in want), (
            "affine-Miller mirror pairing diverged from production pairing"
        )


def test_mirror_pairing_bilinear():
    bn = default_bn128()
    p = bn.g1.affine(bn.g1.mul_scalar(bn.g1.g, 40))
    q = bn.g2.affine(bn.g2.mul_scalar(bn.g2.g, 75))
    p2 = bn.g1.affine(bn.g1.mul_scalar(bn.g1.g, 75 * 40))
    # affine() returns (x, y) for G1 and (x, y, 1) for G2
    e1 = mirror_pairing((p[0], p[1]), (q[0], q[1]))
    g2g = bn.g2.affine(bn.g2.g)
    e2 = mirror_pairing((p2[0], p2[1]), (g2g[0], g2g[1]))
    assert e1 == e2


# --- mirror of makeGroup's Jacobian formulas (JS add-2007-bl / dbl-2009-l) ---


def _js_double(p):
    X, Y, Z = p
    if Z == 0:
        return p
    A = X * X % Q
    B = Y * Y % Q
    Cc = B * B % Q
    D = 2 * (((X + B) ** 2 - A - Cc) % Q) % Q
    E = 3 * A % Q
    F = E * E % Q
    X3 = (F - 2 * D) % Q
    Y3 = (E * (D - X3) - 8 * Cc) % Q
    Z3 = 2 * Y * Z % Q
    return (X3, Y3, Z3)


def _js_add(p, q):
    if p[2] == 0:
        return q
    if q[2] == 0:
        return p
    Z1Z1 = p[2] * p[2] % Q
    Z2Z2 = q[2] * q[2] % Q
    U1 = p[0] * Z2Z2 % Q
    U2 = q[0] * Z1Z1 % Q
    S1 = p[1] * q[2] * Z2Z2 % Q
    S2 = q[1] * p[2] * Z1Z1 % Q
    if U1 == U2:
        if S1 == S2:
            return _js_double(p)
        return (0, 1, 0)
    H = (U2 - U1) % Q
    I = (2 * H) ** 2 % Q
    J = H * I % Q
    rr = 2 * (S2 - S1) % Q
    V = U1 * I % Q
    X3 = (rr * rr - J - 2 * V) % Q
    Y3 = (rr * (V - X3) - 2 * S1 * J) % Q
    Z3 = H * (((p[2] + q[2]) ** 2 - Z1Z1 - Z2Z2) % Q) % Q
    return (X3, Y3, Z3)


def test_js_group_law_mirror_matches_host():
    bn = default_bn128()
    rng = random.Random(33)
    for _ in range(4):
        a, b = rng.randrange(1, C.R), rng.randrange(1, C.R)
        pa = bn.g1.mul_scalar(bn.g1.g, a)
        pb = bn.g1.mul_scalar(bn.g1.g, b)
        s = _js_add(pa, pb)
        assert bn.g1.equal(s, bn.g1.add(pa, pb))
        d = _js_double(pa)
        assert bn.g1.equal(d, bn.g1.double(pa))
    # equal-point add falls through to double; opposite points -> identity
    assert bn.g1.equal(_js_add(pa, pa), bn.g1.double(pa))
    neg = (pa[0], -pa[1] % Q, pa[2])
    assert _js_add(pa, neg)[2] == 0 or bn.g1.is_zero(_js_add(pa, neg))
