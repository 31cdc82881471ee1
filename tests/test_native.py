"""Differential tests: the C++ projection kernels must produce the same
finalized alignment paths as the (oracle-tested) Python engine."""

import numpy as np
import pytest

from helpers import aln, build_index, mp_aln, reverse_thread

import test_projection_multipath as mp
import test_projection_paired as pe
import test_projection_partial as pp
import test_projection_single as se

from rpvg_tpu import sim
from rpvg_tpu.projection import AlignmentPathFinder

native = pytest.importorskip("rpvg_tpu.native")
if not native.native_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def path_set(paths):
    return sorted(p.key() for p in paths)


def check_single(index, finder_kwargs, alignment):
    py = AlignmentPathFinder(index, **finder_kwargs).find_alignment_paths(alignment)
    cc = native.NativeFinder(index, **finder_kwargs).find_alignment_paths(alignment)
    assert path_set(cc) == path_set(py)


def check_paired(index, finder_kwargs, aln_1, aln_2):
    py = AlignmentPathFinder(index, **finder_kwargs).find_paired_alignment_paths(aln_1, aln_2)
    cc = native.NativeFinder(index, **finder_kwargs).find_paired_alignment_paths(aln_1, aln_2)
    assert path_set(cc) == path_set(py)


DEFAULTS = dict(
    library_type="unstranded",
    score_not_qual=True,
    max_pair_frag_length=1000,
    max_partial_offset=0,
    est_missing_noise_prob=True,
    max_score_diff=20,
    min_best_score_filter=0.0,
)


def test_single_end_scenarios():
    index = se.make_unidirectional_index()
    check_single(index, DEFAULTS, aln(se.ALIGNMENT_1))

    index_bd = build_index(
        [se.THREAD_1, se.THREAD_2], se.make_graph(), bidirectional=True
    )
    check_single(index_bd, DEFAULTS, aln(se.ALIGNMENT_1))


def test_paired_end_scenarios():
    index = pe.make_index()
    check_paired(index, DEFAULTS, aln(pe.ALIGNMENT_1), aln(pe.ALIGNMENT_2))

    a2_rc = aln(pe.ALIGNMENT_2).reverse_complement(index.node_length)
    a2_rc.sequence = "AAAA"
    check_paired(index, DEFAULTS, aln(pe.ALIGNMENT_1), a2_rc)

    circ = pe.make_circular_index()
    check_paired(circ, DEFAULTS, aln(pe.CIRC_ALIGNMENT_1), aln(pe.CIRC_ALIGNMENT_2))


def test_multipath_scenarios():
    index = mp.make_se_index()
    check_single(index, DEFAULTS, mp_aln(mp.SE_ALIGNMENT))

    index_pe = mp.make_pe_index()
    check_paired(index_pe, DEFAULTS, mp_aln(mp.PE_ALIGNMENT_1), mp_aln(mp.PE_ALIGNMENT_2))
    for lib in ("fr", "rf"):
        kwargs = dict(DEFAULTS, library_type=lib)
        check_paired(index_pe, kwargs, mp_aln(mp.PE_ALIGNMENT_1), mp_aln(mp.PE_ALIGNMENT_2))
    for msd in (1, 2, 6, 7):
        kwargs = dict(DEFAULTS, max_score_diff=msd)
        check_paired(index_pe, kwargs, mp_aln(mp.PE_ALIGNMENT_1), mp_aln(mp.PE_ALIGNMENT_2))


def test_partial_match_scenarios():
    index = pp.make_partial_index()
    for k in (0, 1, 2, 3, 4, 8):
        kwargs = dict(DEFAULTS, max_partial_offset=k)
        check_paired(index, kwargs, mp_aln(pp.P_ALIGNMENT_1), mp_aln(pp.P_ALIGNMENT_2))


def test_quality_adjusted_differential():
    # Exercises the quality-adjusted scoring tables in both engines.
    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=60, variant_sites=1, seed=51,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 60, read_length=50, frag_mean=130, frag_sd=10, seed=53,
        with_qualities=True,
    )
    from rpvg_tpu.alignments import parse_multipath_alignment

    alns = [parse_multipath_alignment(r) for r in records]
    assert alns[0].quality  # qualities survive parsing
    pairs = list(zip(alns[0::2], alns[1::2]))

    kwargs = dict(
        library_type="unstranded",
        score_not_qual=False,  # quality-adjusted scoring active
        max_pair_frag_length=250,
        max_partial_offset=4,
        est_missing_noise_prob=False,
        max_score_diff=20,
        min_best_score_filter=0.5,
    )
    py_finder = AlignmentPathFinder(panel.paths_index, **kwargs)
    cc_finder = native.NativeFinder(panel.paths_index, **kwargs)
    cc_results = cc_finder.project_batch(pairs)
    for (a1, a2), cc in zip(pairs, cc_results):
        py = py_finder.find_paired_alignment_paths(a1, a2)
        assert path_set(cc) == path_set(py)


def test_single_end_differential():
    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=60, variant_sites=1, seed=61,
    )
    records, _ = sim.simulate_single_reads(panel, 80, read_length=50, seed=63)
    from rpvg_tpu.alignments import parse_multipath_alignment

    alns = [parse_multipath_alignment(r) for r in records]
    kwargs = dict(
        library_type="unstranded",
        score_not_qual=True,
        max_pair_frag_length=250,
        max_partial_offset=4,
        est_missing_noise_prob=False,
        max_score_diff=20,
        min_best_score_filter=0.9,
    )
    py_finder = AlignmentPathFinder(panel.paths_index, **kwargs)
    cc_finder = native.NativeFinder(panel.paths_index, **kwargs)
    cc_results = cc_finder.project_batch(alns)
    for aln_obj, cc in zip(alns, cc_results):
        py = py_finder.find_alignment_paths(aln_obj)
        assert path_set(cc) == path_set(py)


def test_randomized_differential():
    panel = sim.build_panel(
        num_transcripts=6, num_haplotypes=2, exons_per_transcript=4,
        exon_length=60, variant_sites=2, seed=23,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 150, read_length=50, frag_mean=140, frag_sd=15, seed=29
    )
    from rpvg_tpu.alignments import parse_multipath_alignment

    alns = [parse_multipath_alignment(r) for r in records]
    pairs = list(zip(alns[0::2], alns[1::2]))

    kwargs = dict(
        library_type="unstranded",
        score_not_qual=True,
        max_pair_frag_length=300,
        max_partial_offset=4,
        est_missing_noise_prob=False,
        max_score_diff=20,
        min_best_score_filter=0.9,
    )
    py_finder = AlignmentPathFinder(panel.paths_index, **kwargs)
    cc_finder = native.NativeFinder(panel.paths_index, **kwargs)

    cc_results = cc_finder.project_batch(pairs)
    for (a1, a2), cc in zip(pairs, cc_results):
        py = py_finder.find_paired_alignment_paths(a1, a2)
        assert path_set(cc) == path_set(py)


def test_native_read_collapse_matches_python():
    # The C++ collapse kernel and the numpy fallback must agree bitwise
    # (including near-identical rows that chain-merge within precision).
    import numpy as np

    from rpvg_tpu.infer import matrices as M

    if M._native_read_collapse() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(123)
    for trial in range(100):
        R = int(rng.integers(1, 50))
        C = int(rng.integers(1, 9))
        base = rng.random((max(1, R // 3), C))
        rows = base[rng.integers(0, base.shape[0], size=R)]
        rows = rows + rng.choice([0.0, 1e-12, 1e-7], size=(R, 1))
        counts = rng.integers(1, 10, size=R).astype(float)

        native_probs, native_counts = M.read_collapse(rows, counts, 1e-8)
        saved = M._native_collapse
        M._native_collapse = False
        try:
            py_probs, py_counts = M.read_collapse(rows, counts, 1e-8)
        finally:
            M._native_collapse = saved

        assert np.array_equal(native_probs, py_probs), trial
        assert np.array_equal(native_counts, py_counts), trial


def test_thread_budget_respects_configured_threads():
    """Native kernels size their pools from the run's -t budget (the
    reference caps its OpenMP pool the same way, reference
    src/main.cpp:476); unset, the historical all-cores default applies."""
    import os

    from rpvg_tpu import native

    prev = native._THREAD_BUDGET
    try:
        native.set_thread_budget(2)
        assert native.thread_budget() == 2
        native.set_thread_budget(64)
        assert native.thread_budget() == 16  # capped like the old default
        native.set_thread_budget(None)
        assert native.thread_budget() == min(16, os.cpu_count() or 1)
    finally:
        native._THREAD_BUDGET = prev
