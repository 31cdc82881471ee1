"""Shared fixture helpers for projection tests.

Mirrors the reference test fixtures
(/root/reference/src/tests/alignment_path_finder_test.cpp:13-93): tiny
graphs as JSON-ish dicts, haplotype panels as node-tuple threads, and
alignments as protobuf-JSON dicts.
"""

from rpvg_tpu.alignments import parse_alignment, parse_multipath_alignment
from rpvg_tpu.constants import encode_node, flip_node
from rpvg_tpu.graph import Graph
from rpvg_tpu.pathindex import PathIndex

INT32_LOWEST = -(2**31)


def reverse_thread(thread):
    """A thread's reverse orientation: reversed order, flipped nodes."""
    return [(nid, not rev) for nid, rev in reversed(thread)]


def build_index(threads, graph, bidirectional=False, names=None):
    """Build a PathIndex from threads given as [(node_id, is_reverse), ...].

    With bidirectional=False, threads are inserted exactly as given (to
    emulate mixed-orientation unidirectional GBWTs, pass reversed copies
    explicitly).  With bidirectional=True both orientations of every
    thread are indexed and path ids collapse orientation."""
    return PathIndex.from_node_tuples(threads, graph, names=names, bidirectional=bidirectional)


def aln(obj):
    return parse_alignment(obj)


def mp_aln(obj):
    return parse_multipath_alignment(obj)


def locate_ids(index, align_path):
    return list(index.locate(align_path.search))


def run_tiny_pipeline(prefix, seed=7, **config_kwargs):
    """Build a tiny simulated dataset and run the full pipeline on it —
    shared by output-format tests that only need real files on disk."""
    from rpvg_tpu import sim
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    panel = sim.build_panel(
        num_transcripts=3, num_haplotypes=2, exons_per_transcript=3,
        exon_length=100, variant_sites=1, seed=3,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=75, frag_mean=200, frag_sd=15, seed=seed,
    )
    config = PipelineConfig(
        graph=panel.graph,
        paths=panel.paths_index,
        alignments=[
            (parse_multipath_alignment(a), parse_multipath_alignment(b))
            for a, b in zip(records[0::2], records[1::2])
        ],
        output_prefix=prefix,
        inference_model="transcripts",
        rng_seed=42,
        score_not_qual=True,
        frag_mean=200.0,
        frag_sd=15.0,
        **config_kwargs,
    )
    return run_pipeline(config)
