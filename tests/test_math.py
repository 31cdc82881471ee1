"""Math substrate tests.

Oracle values mirror the reference unit tests
(/root/reference/src/tests/fragment_length_dist_test.cpp:29-132), which
were externally validated against scipy."""

import math

import numpy as np
import pytest

from rpvg_tpu import mathutils as mu
from rpvg_tpu.constants import double_compare


def test_log_phi_matches_phi():
    for i in range(-10, 31):
        assert abs(mu.log_std_normal_cdf(float(i)) - math.log(mu.std_normal_cdf(float(i)))) < 1e-5


def test_log_phi_deep_tail_finite():
    for z in [-25.0, -50.0, -100.0, -500.0]:
        v = mu.log_std_normal_cdf(z)
        assert np.isfinite(v)
        # Compare against scipy's log_ndtr.
        from scipy.special import log_ndtr

        assert abs(v - log_ndtr(z)) < 1e-6 * abs(log_ndtr(z))


def test_log_skew_normal_pdf_finite():
    for sk in range(-10, 11, 2):
        s = 2.0**sk
        for ak in range(-10, 11, 2):
            for asign in (-1, 1):
                a = (2.0**ak) * asign
                for xk in range(-10, 11, 2):
                    for xsign in (-1, 1):
                        x = (2.0**xk) * xsign
                        ll = mu.log_skew_normal_pdf(x, 0.0, s, a)
                        assert not math.isnan(ll)
                        assert not math.isinf(ll)


SKEW_CDF_CASES = [
    (-1.377795671730496, -5.735988598231357, 6.587971754854138, 0.6242981711089186, 0.6067478509468889),
    (8.453381421131361, -6.737025018438891, 1.4128537861467216, -4.714759782925793, 0.9999999999999998),
    (-4.284513142216991, 0.8224611090246263, 4.868647362416242, 5.3775135785150034, 1.175664910419217e-10),
    (2.16127255846893, 3.2203575525564876, 7.543478189625029, -5.754430631695544, 0.8723557627210784),
    (-5.053036192675702, 5.874484839242527, 3.087679949836093, 4.419799676586766, 3.913067350708402e-60),
    (-3.631256826447924, 5.747026610035844, 9.44738425166303, 8.44831439784933, 1.654214272212821e-19),
    (1.8905313320417108, -1.927426833597579, 5.426906826220844, -1.322299136270484, 0.9666362215848003),
    (3.958586584693551, 1.453790486627451, 2.099665856851638, 2.513179002770114, 0.7671637348910078),
    (-7.97460050170157, -6.41790664548763, 2.8240014248393672, -0.040594102097193385, 0.30182880496547393),
    (9.540970160583104, -0.5606080847259811, 3.173017874188342, 4.057194595502764, 0.9985453757376268),
]


@pytest.mark.parametrize("x,m,s,a,expected", SKEW_CDF_CASES)
def test_skew_normal_cdf(x, m, s, a, expected):
    assert abs(mu.skew_normal_cdf(x, m, s, a) - expected) < 1e-6


TRUNC_EXPECT_CASES = [
    (8.787459714627083, 6.868385554340576, -6.94929706130925, -0.37768056364280866, 31.723919183225018, 4.906268559966877),
    (-8.113569780964331, 5.839950201823468, 9.760396217870774, -7.89737335945399, 4.022749040637173, -3.6139469797079213),
    (7.141245637134961, 4.559985715921152, -4.823210556537941, 7.1865576184156446, 13.477227885455914, 7.758960573009493),
    (-7.6539988922504065, 1.7245352631865019, -8.919526791950119, -13.427923801308836, -13.056269996875283, -13.220675399104401),
    (-6.503575582874122, 2.4834075337660866, 8.665672873756801, -3.2347381900362233, 2.9721020130760643, -2.077522240946859),
    (-8.028800089506266, 3.7263335366543138, 3.576676117054836, -11.709946267256408, -5.8524562530204705, -7.215706684550359),
    (5.761132893708735, 9.955360196746412, -7.666141221239958, 3.9372946379953646, 39.03638724596176, 5.264304349707415),
    (-1.7809221540831732, 4.009154518247604, -7.6115564591837215, -10.289600103156221, -8.956624105150768, -9.551633998098026),
    (4.314469611446182, 3.4274638460977336, 2.2210239246182173, -9.192544467474805, 16.537245753118285, 6.804259667846736),
    (-9.841876537956933, 5.863996182747239, -7.284944646833256, -22.473871311547153, 6.850952329036673, -14.152091163539863),
]


@pytest.mark.parametrize("m,s,a,c,d,expected", TRUNC_EXPECT_CASES)
def test_truncated_skew_normal_expected_value(m, s, a, c, d, expected):
    assert abs(mu.truncated_skew_normal_expected_value(m, s, a, c, d) - expected) < 1e-6


def test_add_log():
    assert abs(mu.add_log(math.log(0.25), math.log(0.5)) - math.log(0.75)) < 1e-14
    assert abs(mu.add_log(-1000.0, -1000.0) - (-1000.0 + math.log(2))) < 1e-12


def test_num_permutations():
    assert mu.num_permutations([3]) == 1
    assert mu.num_permutations([2, 2]) == 1
    assert mu.num_permutations([1, 2]) == 2
    assert mu.num_permutations([1, 1, 2]) == 3
    assert mu.num_permutations([1, 2, 3]) == 6


def test_golden_section_search_finds_max():
    f = lambda x: -((x - 1.7) ** 2)  # noqa: E731
    assert abs(mu.golden_section_search(f, -10.0, 10.0, 1e-6) - 1.7) < 1e-5


def test_double_compare():
    assert double_compare(1.0, 1.0)
    assert double_compare(1.0, 1.0 + 1e-15)
    assert not double_compare(1.0, 1.0001)


def test_qual_adjusted_score_tables_pinned():
    """Hard-pinned values of the GSSW-style quality-adjusted score
    matrix and full-length bonuses (reference utils.hpp:514-597,
    precomputed at static init from the GC=0.5 HMM emission model).
    Values below were derived with an independent scalar
    reimplementation of the reference formulas (method-of-score
    log-odds, score_log_base 1.383325268738, match/mismatch/bonus
    1/4/5) — the vectorised production tables must reproduce them
    exactly, including the transition quals and the
    lowest-meaningful-qual clamps (matrix from q>=2, bonuses from
    q>=3)."""
    from rpvg_tpu.scoring import QUAL_FULL_LENGTH_BONUSES, QUAL_SCORE_TENSOR

    # (qual, match score [A->A], mismatch score [A->C], full-length bonus).
    expected = [
        (0, 0, 0, 0),
        (1, 0, 0, 0),
        (2, 0, 0, 0),  # matrix clamp boundary: q < ceil(-10*log10(0.75)) zeroed
        (3, 0, 0, 4),  # first nonzero bonus (clamp is matrix clamp + 1)
        (4, 1, 0, 4),  # first nonzero match score
        (5, 1, -1, 5),  # bonus saturates at the plain +5
        (10, 1, -1, 5),
        (11, 1, -2, 5),  # mismatch transitions: -1/-2/-3/-4 at q=5/11/17/26
        (16, 1, -2, 5),
        (17, 1, -3, 5),
        (25, 1, -3, 5),
        (26, 1, -4, 5),
        (40, 1, -4, 5),
        (255, 1, -4, 5),  # saturated: equals the plain 1/-4/+5 contract
    ]
    for q, match, mismatch, bonus in expected:
        assert QUAL_SCORE_TENSOR[q, 0, 0] == match, q
        assert QUAL_SCORE_TENSOR[q, 0, 1] == mismatch, q
        assert QUAL_FULL_LENGTH_BONUSES[q] == bonus, q
        # Any pairing with N (index 4) scores 0 at every quality.
        assert QUAL_SCORE_TENSOR[q, 4, 0] == 0
        assert QUAL_SCORE_TENSOR[q, 0, 4] == 0
        assert QUAL_SCORE_TENSOR[q, 4, 4] == 0

    # Symmetry of the 4x4 base block (uniform GC=0.5 base frequencies)
    # and diagonal/off-diagonal structure at a saturated quality.
    block = np.asarray(QUAL_SCORE_TENSOR[40, :4, :4])
    assert (block == block.T).all()
    assert (np.diag(block) == 1).all()
    assert (block[~np.eye(4, dtype=bool)] == -4).all()
