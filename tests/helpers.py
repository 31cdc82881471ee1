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
