"""PRN code generator properties (IS-GPS-200 / GLONASS ICD oracles)."""
import numpy as np
import jax.numpy as jnp

from gps_jamming_tpu.ops import codes

# IS-GPS-200 table: first 10 chips of each C/A code, octal, PRN 1..32.
FIRST_10_CHIPS_OCTAL = {
    1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133, 6: 0o1455,
    7: 0o1131, 8: 0o1454, 9: 0o1626, 10: 0o1504, 11: 0o1642, 12: 0o1750,
    13: 0o1764, 14: 0o1772, 15: 0o1775, 16: 0o1776, 17: 0o1156, 18: 0o1467,
    19: 0o1633, 20: 0o1715, 21: 0o1746, 22: 0o1763, 23: 0o1063, 24: 0o1706,
    25: 0o1743, 26: 0o1761, 27: 0o1770, 28: 0o1774, 29: 0o1127, 30: 0o1453,
    31: 0o1625, 32: 0o1712,
}


def _first10_octal(code):
    bits = (1 - code[:10]) // 2        # +1 -> 0, -1 -> 1
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def test_ca_first_10_chips_match_icd():
    for prn, want in FIRST_10_CHIPS_OCTAL.items():
        code = codes.gps_ca_code(prn)
        assert _first10_octal(code) == want, f"PRN {prn}"


def test_ca_balance_and_autocorrelation():
    for prn in (1, 7, 22):
        c = codes.gps_ca_code(prn).astype(np.int32)
        assert c.shape == (1023,)
        assert np.sum(c) == -1                  # Gold code balance
        ac = np.array([np.dot(c, np.roll(c, k)) for k in range(1, 1023)])
        assert np.max(np.abs(ac)) <= 65         # Gold three-valued bound


def test_ca_cross_correlation_bounded():
    c1 = codes.gps_ca_code(1).astype(np.int32)
    c2 = codes.gps_ca_code(2).astype(np.int32)
    cc = np.array([np.dot(c1, np.roll(c2, k)) for k in range(1023)])
    assert np.max(np.abs(cc)) <= 65


def test_glonass_code_properties():
    c = codes.glonass_code().astype(np.int32)
    assert c.shape == (511,)
    assert abs(np.sum(c)) == 1                 # m-sequence balance
    ac = np.array([np.dot(c, np.roll(c, k)) for k in range(1, 511)])
    assert np.all(ac == -1)                    # ideal m-sequence sidelobes


def test_boc11():
    c = np.array([1, -1], dtype=np.int8)
    np.testing.assert_array_equal(codes.boc11(c), [1, -1, -1, 1])


def test_resample_code_nearest():
    code = jnp.asarray(np.array([1., -1., 1., -1.]))
    out = np.asarray(codes.resample_code(code, 2.0, 4.0, 8))
    # phase = i * 0.5 -> chip idx floor: 0,0,1,1,2,2,3,3
    np.testing.assert_array_equal(out, [1, 1, -1, -1, 1, 1, -1, -1])
    # fractional remainder shifts the pattern
    out2 = np.asarray(codes.resample_code(code, 2.0, 4.0, 8, rem_chips=0.5))
    np.testing.assert_array_equal(out2, [1, -1, -1, 1, 1, -1, -1, 1])


def test_replica_fft_conj_shape():
    tbl = codes.gps_ca_table()
    rep = codes.sampled_code_fft_conj(tbl, 1.023e6, 2.048e6, 2048)
    assert rep.shape == (32, 2048)
    assert rep.dtype == jnp.complex64


def test_legendre_properties():
    L = codes.legendre_10223()
    assert L.size == 10223 and L[0] == 0
    # exactly (p-1)/2 quadratic residues
    assert int(L.sum()) == (10223 - 1) // 2
    # multiplicativity spot check: QR*QR=QR, QR*NQR=NQR
    qr = np.where(L == 1)[0][1:50]
    nqr = np.where(L == 0)[0][1:50]
    assert L[(qr[0] * qr[1]) % 10223] == 1
    assert L[(qr[0] * nqr[1]) % 10223] == 0


def test_l1c_weil_codes():
    for gen in (codes.gps_l1cp_code, codes.gps_l1cd_code):
        c1 = gen(1)
        c2 = gen(2)
        assert c1.size == 10230
        assert set(np.unique(c1)) <= {-1, 1}
        # near-balanced, distinct PRNs nearly orthogonal
        assert abs(int(c1.sum())) < 300
        assert abs(int((c1 * c2).sum())) < 600
        # sharp autocorrelation: off-peak < 10% of peak
        f = np.fft.fft(c1)
        ac = np.real(np.fft.ifft(f * np.conj(f)))
        assert np.isclose(ac[0], 10230)
        assert np.abs(ac[1:]).max() < 1023
    # pilot and data codes of the same PRN differ
    assert not np.array_equal(codes.gps_l1cp_code(3), codes.gps_l1cd_code(3))


def test_nh_overlays():
    assert np.array_equal(codes.nh10()[:4], [1, 1, 1, 1])
    assert codes.nh10().size == 10 and codes.nh20().size == 20
    assert int(codes.nh20().sum()) == 20 - 2 * 8   # eight 1-bits
