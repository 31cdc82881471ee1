"""Partial/internal-match projection tests, ported from the reference
scenario matrix over --max-par-offset
(/root/reference/src/tests/alignment_path_finder_test.cpp:2113-3009).

Every scenario runs against BOTH projection engines: the Python
specification and the native C++ finder (parametrized `engine`)."""

import pytest
from helpers import INT32_LOWEST, aln, build_index, locate_ids, mp_aln

from rpvg_tpu.graph import Graph
from rpvg_tpu.projection import AlignmentPathFinder


def _native_finder_cls():
    try:
        from rpvg_tpu import native

        if native.native_available():
            return native.NativeFinder
    except Exception:
        pass
    return None


ENGINES = ["python", "native"]


@pytest.fixture(params=ENGINES)
def engine(request):
    if request.param == "native" and _native_finder_cls() is None:
        pytest.skip("native toolchain unavailable")
    return request.param

PARTIAL_GRAPH = {1: 2, 2: 1, 3: 1, 4: 1, 5: 3, 6: 3, 7: 3, 8: 2, 9: 3, 10: 1}

P_THREAD_1 = [(1, False), (2, False), (5, False), (6, False), (7, False), (8, False), (9, False), (10, False)]
P_THREAD_2 = [(1, False), (3, False), (5, False), (6, False), (7, False), (9, False)]
P_THREAD_3 = [(1, False), (4, False), (5, False), (6, False), (7, False), (9, False), (10, False)]

P_ALIGNMENT_1 = {
    "start": [0],
    "subpath": [
        {
            "path": {"mapping": [{"position": {"node_id": 1, "offset": 1}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "next": [1, 2],
            "score": 1,
        },
        {
            "path": {"mapping": [{"position": {"node_id": 2}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "next": [3],
            "score": 1,
        },
        {
            "path": {"mapping": [{"position": {"node_id": 3}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "next": [3],
            "score": 1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 5}, "edit": [{"from_length": 3, "to_length": 3}]},
                    {"position": {"node_id": 6}, "edit": [{"from_length": 1, "to_length": 1}]},
                ]
            },
            "score": 4,
        },
    ],
    "sequence": "AAAAAA",
    "mapping_quality": 10,
}

P_ALIGNMENT_2 = {
    "start": [0],
    "subpath": [
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 10, "is_reverse": True},
                        "edit": [{"to_length": 2, "sequence": "AA"}, {"from_length": 1, "to_length": 1}],
                    },
                    {"position": {"node_id": 9, "is_reverse": True}, "edit": [{"from_length": 3, "to_length": 3}]},
                    {
                        "position": {"node_id": 7, "is_reverse": True},
                        "edit": [{"from_length": 3, "to_length": 3}, {"to_length": 1, "sequence": "A"}],
                    },
                ]
            },
            "score": 7,
        }
    ],
    "sequence": "AAAAAAAAAA",
    "mapping_quality": 20,
}


def make_partial_index():
    return build_index(
        [P_THREAD_1, P_THREAD_2, P_THREAD_3], Graph(PARTIAL_GRAPH), bidirectional=False
    )


def make_finder(index, max_partial_offset=4, engine="python", **kwargs):
    defaults = dict(
        library_type="unstranded",
        score_not_qual=True,
        use_allelic_mapq=False,
        max_pair_frag_length=1000,
        max_partial_offset=max_partial_offset,
        est_missing_noise_prob=True,
        max_score_diff=20,
        min_best_score_filter=0.0,
    )
    defaults.update(kwargs)
    if engine == "native":
        return _native_finder_cls()(index, **defaults)
    return AlignmentPathFinder(index, **defaults)


def test_paired_multipath_partial_paths(engine):
    index = make_partial_index()
    assert index.number_of_paths() == 3
    finder = make_finder(index, max_partial_offset=4, engine=engine)

    paths = finder.find_paired_alignment_paths(mp_aln(P_ALIGNMENT_1), mp_aln(P_ALIGNMENT_2))
    assert len(paths) == 10

    # Collect (located-ids, frag, align, score) multiset; ordering of
    # equal-node entries is framework-specific.
    rows = {
        (tuple(locate_ids(index, p)), p.frag_length, p.align_length, p.score_sum)
        for p in paths
    }
    assert rows == {
        ((0,), 19, 10, 10),
        ((0,), 19, 8, 8),
        ((2,), 17, 11, 11),
        ((2,), 17, 8, 8),
        ((1, 2), 17, 10, 10),
        ((1,), 17, 12, 12),
        ((1,), 17, 9, 9),
        ((0, 1, 2), 17, 7, 7),
        ((0,), 17, 9, 9),
        ((), 0, 0, INT32_LOWEST),
    }
    for p in paths:
        assert p.min_mapq == 10
        assert not p.is_simple


def test_paired_multipath_partial_offset_filtering(engine):
    index = make_partial_index()

    def rows_for(k):
        paths = make_finder(
            index, max_partial_offset=k, engine=engine
        ).find_paired_alignment_paths(mp_aln(P_ALIGNMENT_1), mp_aln(P_ALIGNMENT_2))
        # Reference asserts filtered rows equal the unfiltered entries
        # wholesale — mapq/simple flags included (ref :2585-2637).
        for p in paths:
            assert p.min_mapq == 10
            assert not p.is_simple
        return {
            (tuple(locate_ids(index, p)), p.frag_length, p.align_length, p.score_sum)
            for p in paths
        }

    assert rows_for(3) == {
        ((0,), 19, 10, 10),
        ((0,), 19, 8, 8),
        ((2,), 17, 11, 11),
        ((2,), 17, 8, 8),
        ((1, 2), 17, 10, 10),
        ((1,), 17, 12, 12),
        ((), 0, 0, INT32_LOWEST),
    }

    assert rows_for(2) == {
        ((2,), 17, 11, 11),
        ((1, 2), 17, 10, 10),
        ((1,), 17, 12, 12),
        ((), 0, 0, INT32_LOWEST),
    }

    assert rows_for(1) == {
        ((1,), 17, 12, 12),
        ((), 0, 0, INT32_LOWEST),
    }

    assert rows_for(0) == set()


# ------------------------------------------------- single-path partials

LADDER_GRAPH = {1: 2, 2: 1, 3: 1, 4: 1, 5: 3, 6: 3, 7: 3, 8: 2, 9: 3, 10: 3, 11: 1}

L_THREAD_START2_END4 = [(1, False), (2, False), (5, False), (6, False), (7, False), (8, False), (9, False), (11, False)]
L_THREAD_START2 = [(1, False), (2, False), (5, False), (6, False), (7, False), (8, False), (10, False), (11, False)]
L_THREAD_END4 = [(1, False), (3, False), (5, False), (6, False), (7, False), (8, False), (9, False), (11, False)]
L_THREAD_FULL = [(1, False), (3, False), (5, False), (6, False), (7, False), (8, False), (10, False), (11, False)]

L_ALIGNMENT = {
    "path": {
        "mapping": [
            {"position": {"node_id": 1, "offset": 1}, "edit": [{"from_length": 1, "to_length": 1}]},
            {"position": {"node_id": 3}, "edit": [{"from_length": 1, "to_length": 1}]},
            {"position": {"node_id": 5}, "edit": [{"from_length": 3, "to_length": 3}]},
            {"position": {"node_id": 6}, "edit": [{"from_length": 3, "to_length": 3}]},
            {"position": {"node_id": 7}, "edit": [{"from_length": 3, "to_length": 3}]},
            {"position": {"node_id": 8}, "edit": [{"from_length": 3, "to_length": 3}]},
            {"position": {"node_id": 10}, "edit": [{"from_length": 3, "to_length": 3}]},
            {"position": {"node_id": 11}, "edit": [{"from_length": 1, "to_length": 1}]},
        ]
    },
    "sequence": "AAAAAAAAAAAAAAAAAA",
    "mapping_quality": 10,
}


def test_partial_end_beyond_only_hit(engine):
    # Read extends beyond the single-node panel path: a huge partial
    # offset still yields the real hit plus noise (reference :2430-2501).
    graph = Graph({1: 2, 2: 1})
    index = build_index([[(1, False)]], graph, bidirectional=False)
    alignment = {
        "path": {
            "mapping": [
                {"position": {"node_id": 1}, "edit": [{"from_length": 2, "to_length": 2}]},
                {"position": {"node_id": 2}, "edit": [{"from_length": 1, "to_length": 1}]},
            ]
        },
        "sequence": "AAA",
        "mapping_quality": 10,
    }
    finder = make_finder(index, max_partial_offset=1000, engine=engine)
    assert len(finder.find_alignment_paths(aln(alignment))) == 2


def _single_rows(index, k, engine, with_flags=True):
    paths = make_finder(
        index, max_partial_offset=k, engine=engine
    ).find_alignment_paths(aln(L_ALIGNMENT))
    if with_flags:
        return {
            (
                tuple(int(i) for i in locate_ids(index, p)),
                p.frag_length, p.align_length, p.score_sum,
                p.min_mapq, p.is_simple,
            )
            for p in paths
        }
    return {
        (
            tuple(int(i) for i in locate_ids(index, p)),
            p.frag_length, p.align_length, p.score_sum,
        )
        for p in paths
    }


def test_partial_with_full_length_match(engine):
    # Full oracle rows per --max-par-offset (reference section
    # :2503-2696 asserts sizes; the rows below additionally pin the
    # located path ids, partial score penalties (-1/bp), clipped align
    # lengths, mapq and simple flags from the spec engine — both
    # engines must agree exactly).
    graph = Graph(LADDER_GRAPH)
    index = build_index(
        [L_THREAD_START2_END4, L_THREAD_START2, L_THREAD_END4, L_THREAD_FULL],
        graph,
        bidirectional=False,
    )
    assert index.number_of_paths() == 4

    noise = ((), 0, 0, INT32_LOWEST)
    full = ((3,), 18, 18, 0)
    start2 = ((1, 3), 18, 16, -2)  # thread 2 differs by 2 bp at the start
    end4 = ((2, 3), 18, 14, -4)  # thread 3 differs by 4 bp at the end

    assert _single_rows(index, 0, engine) == {
        noise + (10, True), full + (10, True),
    }
    # Any partial candidate in range clears the simple flag everywhere.
    assert _single_rows(index, 2, engine) == {
        noise + (10, False), full + (10, False), start2 + (10, False),
    }
    assert _single_rows(index, 3, engine) == {
        noise + (10, False), full + (10, False), start2 + (10, False),
    }
    # 4 bp admits the end-partial path but never the one differing at
    # BOTH ends (2+4 bp > limit).
    assert _single_rows(index, 4, engine) == {
        noise + (10, False), full + (10, False),
        start2 + (10, False), end4 + (10, False),
    }


def test_partial_end_only_no_longer_match(engine):
    graph = Graph(LADDER_GRAPH)
    index = build_index([L_THREAD_END4], graph, bidirectional=False)

    assert make_finder(index, max_partial_offset=0, engine=engine).find_alignment_paths(aln(L_ALIGNMENT)) == []
    assert make_finder(index, max_partial_offset=3, engine=engine).find_alignment_paths(aln(L_ALIGNMENT)) == []
    # Sole-candidate partials keep the noise row's zero score (no real
    # full-length competitor to diff against).
    assert _single_rows(index, 8, engine, with_flags=False) == {
        ((), 0, 0, 0),
        ((0,), 18, 14, -4),
    }


def test_partial_start_and_end_no_longer_match(engine):
    graph = Graph(LADDER_GRAPH)
    index = build_index([L_THREAD_START2_END4], graph, bidirectional=False)

    assert make_finder(index, max_partial_offset=0, engine=engine).find_alignment_paths(aln(L_ALIGNMENT)) == []
    assert make_finder(index, max_partial_offset=3, engine=engine).find_alignment_paths(aln(L_ALIGNMENT)) == []
    expected = {
        ((), 0, 0, 0),
        ((0,), 18, 12, -6),  # 2 bp start + 4 bp end partial penalties
    }
    assert _single_rows(index, 4, engine, with_flags=False) == expected
    assert _single_rows(index, 8, engine, with_flags=False) == expected
