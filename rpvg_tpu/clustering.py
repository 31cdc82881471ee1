"""Path clustering: connected components over the haplotype panel.

Paths are connected when one fragment's alignment-path list touches both
(read-sharing edges); optionally also when they share a graph node
(node-sharing merge, used by --path-node-cluster and the transcript
collapse mode).  Re-designed around a union-find instead of the
reference's striped-mutex adjacency sets + BFS
(/root/reference/src/path_clusters.cpp); the emitted clustering is
identical: clusters ordered by their smallest member path id, members
sorted ascending.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .constants import encode_node
from .pathindex import PathIndex


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        parent = self.parent
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


class PathClusters:
    """Connected components over path ids.

    Attributes
    ----------
    path_to_cluster: np.ndarray  (num_paths,)
    cluster_to_paths: List[np.ndarray]  sorted member ids per cluster
    """

    def __init__(self, paths_index: PathIndex, align_path_lists: Sequence) -> None:
        self.index = paths_index
        self.num_paths = paths_index.number_of_paths()
        self._uf = _UnionFind(self.num_paths)

        locate = getattr(paths_index, "locate_cached", paths_index.locate)
        for align_paths in align_path_lists:
            anchor = None
            for ap in align_paths:
                if ap.search.empty():
                    continue
                ids = locate(ap.search)
                if anchor is None:
                    anchor = int(ids[0])
                for pid in ids:
                    self._uf.union(anchor, int(pid))

        self._rebuild()

    def add_node_clusters(self, paths_index: PathIndex) -> None:
        """Merge clusters whose paths share a graph node (reference
        path_clusters.cpp:85-161)."""
        for node_id in range(1, paths_index.number_of_nodes() + 1):
            orientations = [False] if paths_index.is_bidirectional else [False, True]
            for rev in orientations:
                state = paths_index.find(encode_node(node_id, rev))
                if state.empty():
                    continue
                ids = paths_index.locate(state)
                if ids.size == 0:
                    continue
                anchor = int(ids[0])
                for pid in ids[1:]:
                    self._uf.union(anchor, int(pid))
        self._rebuild()

    def _rebuild(self) -> None:
        roots = np.array([self._uf.find(i) for i in range(self.num_paths)], dtype=np.int64)
        # Cluster ids ordered by smallest member path id == first
        # appearance order of each root when scanning path ids upward.
        order: Dict[int, int] = {}
        for pid in range(self.num_paths):
            root = int(roots[pid])
            if root not in order:
                order[root] = len(order)

        self.path_to_cluster = np.array([order[int(r)] for r in roots], dtype=np.int64)
        members: List[List[int]] = [[] for _ in range(len(order))]
        for pid in range(self.num_paths):
            members[self.path_to_cluster[pid]].append(pid)
        self.cluster_to_paths = [np.array(m, dtype=np.int64) for m in members]

    def num_clusters(self) -> int:
        return len(self.cluster_to_paths)
