"""Result containers for per-cluster inference (reference
/root/reference/src/path_cluster_estimates.hpp)."""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations_with_replacement
from typing import List


from ..probabilities import PathInfo


@dataclass
class CountSamples:
    """Gibbs read-count samples for a path subset."""

    path_ids: List[int] = field(default_factory=list)
    noise_samples: List[float] = field(default_factory=list)
    # Flattened (sample, path) major order: sample k, path j at k*P+j.
    abundance_samples: List[float] = field(default_factory=list)


@dataclass
class PathClusterEstimates:
    paths: List[PathInfo] = field(default_factory=list)
    path_group_sets: List[List[int]] = field(default_factory=list)
    posteriors: List[float] = field(default_factory=list)
    abundances: List[float] = field(default_factory=list)
    noise_count: float = 0.0
    total_count: float = 0.0
    gibbs_read_count_samples: List[CountSamples] = field(default_factory=list)

    def reset(self, num_components: int, group_size: int) -> None:
        """Enumerate all multisets of `group_size` path indices in
        lexicographic order and zero the estimate arrays (reference
        resetEstimates/generateGroupsRecursive)."""
        self.path_group_sets = []
        self.posteriors = []
        self.abundances = []
        self.noise_count = 0.0
        self.total_count = 0.0
        self.gibbs_read_count_samples = []
        if group_size > 0:
            self.path_group_sets = [
                list(combo)
                for combo in combinations_with_replacement(range(num_components), group_size)
            ]
            self.posteriors = [0.0] * len(self.path_group_sets)
            self.abundances = [0.0] * (len(self.path_group_sets) * group_size)
