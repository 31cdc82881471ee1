"""FragmentLengthDist tests; oracle values from the reference unit tests
(/root/reference/src/tests/fragment_length_dist_test.cpp)."""

import numpy as np
import pytest

from rpvg_tpu.constants import double_compare
from rpvg_tpu.fragments import FragmentLengthDist


def test_normal_dist_basics():
    dist = FragmentLengthDist.from_normal(10, 2, 10)
    assert dist.is_valid()
    assert dist.max_length == 30
    assert double_compare(dist.log_prob(9), -1.737085713764618)
    assert double_compare(dist.log_prob(15), -4.737085713764618)
    assert double_compare(dist.log_prob(9), dist.log_prob(11))
    assert double_compare(dist.log_prob(10000), -12475014.11208571307361)

    dist = FragmentLengthDist.from_normal(10, 2, 5)
    assert dist.max_length == 20


def test_skew_normal_consistency():
    for loc in range(0, 4):
        for scale in range(1, 4):
            alpha = -3.0
            dist = FragmentLengthDist.from_params(loc, scale, alpha, 10)
            for x in range(0, 4):
                other = FragmentLengthDist.from_params(x, scale, -alpha, 10)
                assert double_compare(dist.log_prob(x), other.log_prob(loc))
                reflected = 2 * loc - x
                if reflected >= 0:
                    other = FragmentLengthDist.from_params(loc, scale, -alpha, 10)
                    assert double_compare(dist.log_prob(x), other.log_prob(reflected))


def test_skew_normal_mle_fit():
    # Histogram generated from scipy.stats.skewnorm.rvs(a=10, loc=50, scale=10);
    # expected MLE values externally validated (reference test :134-147).
    length_counts = [0] * 45 + [
        2, 4, 22, 53, 144, 256, 394, 522, 647, 700, 744, 693, 673, 667, 573,
        502, 454, 417, 380, 330, 299, 274, 225, 185, 181, 153, 115, 78, 77,
        54, 43, 33, 27, 22, 17, 9, 7, 7, 4, 1, 6, 1, 2, 0, 1, 1, 1,
    ]
    dist = FragmentLengthDist.from_counts(length_counts, skew_normal=True)
    assert abs(dist.loc - 50.996133408667475) < 1e-3
    assert abs(dist.scale - 10.035973814767827) < 1e-3
    assert abs(dist.shape - 4.7885824148015015) < 1e-3


def test_normal_fit():
    rng = np.random.default_rng(7)
    samples = np.clip(rng.normal(200, 25, size=20000).round().astype(int), 1, None)
    counts = np.bincount(samples)
    dist = FragmentLengthDist.from_counts(counts, skew_normal=False)
    assert abs(dist.loc - 200) < 1.0
    assert abs(dist.scale - 25) < 1.0
    assert dist.shape == 0.0


def test_too_few_counts_invalid():
    dist = FragmentLengthDist.from_counts([0, 1], skew_normal=True)
    assert not dist.is_valid()


def test_parse_alignment_forms():
    assert FragmentLengthDist.parse_alignment({"sequence": "ACGT"}) is None
    assert FragmentLengthDist.parse_alignment({"fragment_length_distribution": "0:0:0:0:1"}) is None
    assert FragmentLengthDist.parse_alignment(
        {"fragment_length_distribution": "100:10:2:0:1"}
    ) == (10.0, 2.0)
    assert FragmentLengthDist.parse_alignment(
        {"annotation": {"fragment_length_distribution": "-I 10 -D 2"}}
    ) == (10.0, 2.0)


@pytest.mark.slow
def test_skew_normal_fit_real_data_histogram_terminates():
    # Regression input from the reference (:149-154): must not loop forever.
    length_counts = [0] * 88 + [1, 0, 0, 0, 0, 1, 0, 1, 2, 1, 0, 0, 0, 23, 14, 25, 18, 32, 41,
        30, 31, 27, 36, 33, 37, 36, 59, 46, 68, 59, 55, 70, 70, 65, 63, 85, 70, 86, 81, 83, 84,
        103, 84, 92, 81, 100, 101, 118, 107, 104, 116, 110, 129, 103, 125, 115, 104, 95, 117,
        141, 103, 109, 109, 100, 107, 122, 104, 102, 100, 100, 104, 103, 100, 111, 91, 94, 116,
        94, 102, 88, 103, 93, 96, 87, 113, 96, 88, 116, 82, 95, 60, 76, 96, 78, 79, 85, 76, 85,
        74, 67, 77, 82, 76, 71, 64, 83, 75, 66, 68, 61, 63, 65, 78, 50, 95, 75, 66, 71, 78, 61,
        76, 60, 75, 81, 75, 58, 66, 75, 68, 65, 73, 70, 82, 75, 80, 76, 69, 64, 72, 72, 74, 80,
        93, 77, 92, 85, 87, 108, 88, 92, 87, 112, 110, 97, 128, 115, 148, 138, 156, 159, 130,
        162, 162, 186, 191, 217, 218, 218, 236, 277, 257, 307, 337, 359, 402, 481, 511, 555,
        632, 732, 805, 858, 946, 1001, 1108, 1158, 1248, 1410, 1456, 1553, 1602, 1691, 1731,
        1871, 1977, 1965, 2070, 2071, 2152, 2326, 2200, 2377, 2237, 2258, 2257, 2222, 2227,
        2191, 2131, 2050, 2060, 1964, 1793, 1768, 1738, 1646, 1574, 1456, 1331, 1245, 1169,
        1126, 1067, 947, 915, 757, 712, 616, 532, 528, 420, 392, 337, 271, 226, 186, 157, 138,
        133, 104, 92, 75, 57, 51, 37, 24, 30, 21, 18, 8, 19, 15, 8, 15, 5, 4, 6, 8, 4, 3, 6, 2,
        2, 7, 2, 2, 2, 1, 2, 2, 5, 6, 1, 3, 2, 3, 2, 5, 3, 4, 0, 4, 4, 1, 2, 0, 3, 1, 0, 2, 3,
        2, 1, 0, 1, 2, 1, 2, 3, 4, 1, 1, 1, 0, 2, 1, 0, 3, 2, 1, 4, 3, 2, 1, 0, 1] + [0] * 40
    dist = FragmentLengthDist.from_counts(length_counts, skew_normal=True)
    assert dist.is_valid()


def test_skew_normal_mle_native_matches_python():
    # The C++ fit (native.fit_skew_normal_mle) must agree with the Python
    # spec implementation to float tolerance on a realistic histogram.
    from rpvg_tpu.native import fit_skew_normal_mle

    rng = np.random.default_rng(11)
    # Skewed mixture histogram, including empty leading/trailing bins.
    core = np.clip(rng.normal(180, 40, 50000) + np.abs(rng.normal(0, 55, 50000)), 0, 799)
    counts = np.bincount(core.round().astype(int), minlength=800).astype(float)
    native = fit_skew_normal_mle(counts)
    if native is None:
        pytest.skip("native library unavailable")
    lengths = np.arange(counts.size, dtype=float)
    from rpvg_tpu.fragments import _fit_skew_normal_mle

    py = _fit_skew_normal_mle(counts, lengths)
    # Both fits terminate at the same golden-section tolerance (1e-4), so
    # agreement is bounded by that tolerance, not machine epsilon.
    assert np.allclose(native, py, rtol=0, atol=1e-3)
