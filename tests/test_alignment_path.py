"""Search-path arithmetic tests, ported from the reference
(/root/reference/src/tests/alignment_path_test.cpp)."""

from rpvg_tpu.projection import AlignmentPath, AlignmentStats, SearchPath


def make_search_path():
    sp = SearchPath()
    sp.insert_length = 100

    stats = AlignmentStats()
    stats.score = 50
    stats.length = 100
    stats.left_softclip = 10
    stats.right_softclip = 30
    stats.internal_start.is_internal = True
    stats.internal_start.penalty = 10
    stats.internal_start.offset = 10
    stats.internal_end.is_internal = True
    stats.internal_end.penalty = 15
    stats.internal_end.offset = 20
    sp.read_stats.append(stats)
    return sp


def test_search_path_arithmetic():
    sp = make_search_path()
    stats = sp.read_stats[-1]
    assert stats.clipped_left() == 20
    assert stats.clipped_right() == 50
    assert stats.adjusted_score() == 25
    assert stats.clipped_total() == 70

    stats_2 = AlignmentStats()
    stats_2.score = 7
    stats_2.length = 10
    stats_2.left_softclip = 2
    sp.read_stats.append(stats_2)

    assert stats_2.clipped_left() == 2
    assert stats_2.clipped_right() == 0
    assert stats_2.adjusted_score() == 7
    assert stats_2.clipped_total() == 2

    assert sp.fragment_length() == 158
    assert sp.score_sum() == 32
    assert sp.min_optimal_score_fraction([100, 10]) == 0.25

    ap = AlignmentPath.from_search_path(sp, False, 10)
    assert ap.search.empty()
    assert not ap.is_simple
    assert ap.min_mapq == 10
    assert ap.score_sum == 32
    assert ap.align_length == 38
    assert ap.frag_length == 158


def test_negative_insert_length():
    sp = make_search_path()
    stats_2 = AlignmentStats()
    stats_2.score = 7
    stats_2.length = 10
    stats_2.left_softclip = 2
    sp.read_stats.append(stats_2)

    sp.insert_length = -8
    ap = AlignmentPath.from_search_path(sp, False, 10)
    assert ap.frag_length == 50
    assert ap.align_length == 38
    assert ap.score_sum == 32


def test_clear():
    sp = make_search_path()
    sp.path = [2, 4]
    sp.clear()
    assert sp.path == []
    assert sp.search.empty()
