"""Read-path probability tests; oracle values from the reference
(/root/reference/src/tests/read_path_probabilities_test.cpp)."""

import math

from rpvg_tpu.constants import INT32_MIN, NOISE_SCORE_LOG_BASE, double_compare
from rpvg_tpu.fragments import FragmentLengthDist
from rpvg_tpu.pathindex import SearchState
from rpvg_tpu.probabilities import PathInfo, ReadPathProbs
from rpvg_tpu.projection import AlignmentPath


def ap(score_sum, align_length, frag_length, mapq=10):
    return AlignmentPath(SearchState(), True, mapq, score_sum, align_length, frag_length)


def noise_ap(score_sum=INT32_MIN, mapq=10):
    return AlignmentPath(SearchState(), True, mapq, score_sum, 0, 0)


def make_base():
    clustered_path_index = {100: 0, 200: 1}
    dist = FragmentLengthDist.from_normal(10, 2, 10)
    align_paths = [ap(3, 5, 10), noise_ap()]
    align_path_ids = [[100, 200], []]
    paths = [PathInfo(effective_length=3), PathInfo(effective_length=3)]
    return clustered_path_index, dist, align_paths, align_path_ids, paths


def test_basic_probabilities():
    cpi, dist, align_paths, ids, paths = make_base()
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)

    assert probs.read_count == 1
    assert double_compare(probs.noise_prob, 0.1)
    assert len(probs.path_probs) == 1
    assert double_compare(probs.path_probs[0][0], 0.45)
    assert probs.path_probs[0][1] == [0, 1]


def test_improbable_path_finite():
    cpi, dist, align_paths, ids, paths = make_base()
    align_paths[0].frag_length = 10000
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert double_compare(probs.noise_prob, 0.1)
    assert len(probs.path_probs) == 1
    assert abs(probs.path_probs[0][0] - 0.45) < 1e-8
    assert probs.path_probs[0][1] == [0, 1]


def extend_multi():
    cpi, dist, align_paths, ids, paths = make_base()
    align_paths[1] = ap(5, 8, 15)
    align_paths.append(noise_ap())
    ids[1] = [50]
    ids.append([])
    cpi[10] = 2
    cpi[50] = 3
    paths += [PathInfo(effective_length=3), PathInfo(effective_length=3)]
    return cpi, dist, align_paths, ids, paths


def test_multiple_alignment_paths():
    cpi, dist, align_paths, ids, paths = extend_multi()
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)

    assert double_compare(probs.noise_prob, 0.1)
    assert len(probs.path_probs) == 2
    assert double_compare(probs.path_probs[0][0], 0.233044027062125)
    assert probs.path_probs[0][1] == [3]
    assert double_compare(probs.path_probs[1][0], 0.333477986468937)
    assert probs.path_probs[1][1] == [0, 1]


def test_precision_collapse():
    cpi, dist, align_paths, ids, paths = extend_multi()
    paths[-1].effective_length = 2
    probs = ReadPathProbs(1, 0.1)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert len(probs.path_probs) == 1
    assert double_compare(probs.path_probs[0][0], 0.3)
    assert probs.path_probs[0][1] == [0, 1, 3]


def test_longest_alignment_chosen():
    cpi, dist, align_paths, ids, paths = extend_multi()
    align_paths[2] = ap(3, 10, 10)
    align_paths.append(noise_ap())
    ids[2] = [50]
    ids.append([])
    probs = ReadPathProbs(1, 0.1)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert len(probs.path_probs) == 1
    assert double_compare(probs.path_probs[0][0], 0.3)
    assert probs.path_probs[0][1] == [0, 1, 3]


def test_highest_score_chosen_when_same_length():
    cpi, dist, align_paths, ids, paths = extend_multi()
    base = ReadPathProbs(1, 1e-8)
    base.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)

    cpi2, dist2, align_paths2, ids2, paths2 = extend_multi()
    align_paths2[2] = ap(3, 8, 15)
    align_paths2.append(noise_ap())
    ids2[2] = [50]
    ids2.append([])
    probs = ReadPathProbs(1, 0.1)
    probs.add_path_probs(align_paths2, ids2, cpi2, paths2, dist2, False, 0)
    assert len(probs.path_probs) == 2
    assert abs(probs.path_probs[0][0] - base.path_probs[0][0]) < 1e-8
    assert probs.path_probs[0][1] == base.path_probs[0][1]
    assert abs(probs.path_probs[1][0] - base.path_probs[1][0]) < 1e-8
    assert probs.path_probs[1][1] == base.path_probs[1][1]


def test_noise_alignment_path_mass():
    cpi, dist, align_paths, ids, paths = make_base()
    align_paths[-1].score_sum = int(-2.302585 / NOISE_SCORE_LOG_BASE)
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert double_compare(probs.noise_prob, 0.190000008369464)
    assert len(probs.path_probs) == 1
    assert double_compare(probs.path_probs[0][0], 0.404999995815267)
    assert probs.path_probs[0][1] == [0, 1]

    align_paths[-1].score_sum = 0
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert double_compare(probs.noise_prob, 1.0)
    assert probs.path_probs == []


def test_effective_lengths_affect_probs():
    cpi, dist, align_paths, ids, paths = make_base()
    paths[-1].effective_length = 2
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert double_compare(probs.noise_prob, 0.1)
    assert len(probs.path_probs) == 2
    assert double_compare(probs.path_probs[0][0], 0.36)
    assert probs.path_probs[0][1] == [0]
    assert double_compare(probs.path_probs[1][0], 0.54)
    assert probs.path_probs[1][1] == [1]


def test_min_noise_prob():
    cpi, dist, align_paths, ids, paths = make_base()
    align_paths[-1].score_sum = int(-5.0 / NOISE_SCORE_LOG_BASE)
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0.3)
    assert double_compare(probs.noise_prob, 0.304716562899359)
    assert len(probs.path_probs) == 1
    assert double_compare(probs.path_probs[0][0], 0.347641718550320)
    assert probs.path_probs[0][1] == [0, 1]


def test_quick_merge_identical():
    cpi, dist, align_paths, ids, paths = make_base()
    probs = ReadPathProbs(1, 1e-8)
    probs.add_path_probs(align_paths, ids, cpi, paths, dist, False, 0)
    assert probs.quick_merge_identical(probs)
    assert probs.read_count == 2
    assert double_compare(probs.noise_prob, 0.1)
    assert len(probs.path_probs) == 1
    assert double_compare(probs.path_probs[0][0], 0.45)
