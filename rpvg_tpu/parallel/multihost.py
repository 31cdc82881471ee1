"""Multi-host execution: data-parallel fragment sharding.

Scaling layout (BASELINE.json / SURVEY §2.3): the path index is
replicated per host, the alignment stream shards data-parallel across
hosts, each host runs its own fragment pass, and exactly two small
reductions cross hosts — the deduplicated fragment-list counts and the
fragment-length histogram (the reference's single-process
producer-consumer indexing thread, src/main.cpp:200-237, reborn as an
all-reduce).  Inference then proceeds on the merged index; clusters are
independent so per-cluster work needs no further communication beyond
the TPM normaliser sum.

Two drivers:

* :func:`run_pipeline_sharded` — in-process shard loop (deterministic,
  used by CI to prove shard-invariance byte-for-byte);
* :func:`run_pipeline_multiprocess` — one worker process per shard
  (one-host many-process stand-in for multi-host; workers return pickled
  shard indexes to rank 0).
"""

from __future__ import annotations

import sys
from typing import Dict

from ..pipeline import (
    FragmentIndex,
    PipelineConfig,
    build_finder,
    collect_fragments,
    load_inputs,
    resolve_pre_fragment_dist,
    run_inference_phases,
)


def _merge_shard_indexes(shards) -> FragmentIndex:
    merged = shards[0]
    for shard in shards[1:]:
        merged.merge_from(shard)
    return merged


def run_pipeline_sharded(config: PipelineConfig, num_shards: int) -> Dict:
    """Run the fragment pass as `num_shards` data-parallel shards (in
    process), merge, then run inference once.  Output is identical to
    the unsharded pipeline."""
    log = lambda msg: print(msg, file=sys.stderr)  # noqa: E731

    graph, paths_index = load_inputs(config)
    pre_dist = resolve_pre_fragment_dist(config)
    finder = build_finder(config, paths_index, pre_dist)

    shards = [
        collect_fragments(config, finder, pre_dist, shard=s, num_shards=num_shards)
        for s in range(num_shards)
    ]
    fragment_index = _merge_shard_indexes(shards)
    log(
        f"Merged {num_shards} fragment shards: "
        f"{len(fragment_index.entries)} distinct alignment path lists, "
        f"{fragment_index.unaligned_count} unaligned"
    )

    return run_inference_phases(
        config, paths_index, fragment_index, pre_dist, log, finder=finder
    )


def _shard_worker(args):
    config, shard, num_shards = args
    graph, paths_index = load_inputs(config)
    pre_dist = resolve_pre_fragment_dist(config)
    finder = build_finder(config, paths_index, pre_dist)
    index = collect_fragments(config, finder, pre_dist, shard=shard, num_shards=num_shards)
    # Ship only picklable state.
    return (
        list(index.entries.values()),
        index.frag_length_counts,
        index.unaligned_count,
    )


def run_pipeline_multiprocess(config: PipelineConfig, num_workers: int) -> Dict:
    """Fragment pass across worker processes (multi-host stand-in)."""
    import multiprocessing as mp

    log = lambda msg: print(msg, file=sys.stderr)  # noqa: E731

    graph, paths_index = load_inputs(config)
    pre_dist = resolve_pre_fragment_dist(config)

    ctx = mp.get_context("spawn")
    with ctx.Pool(num_workers) as pool:
        shard_payloads = pool.map(
            _shard_worker, [(config, s, num_workers) for s in range(num_workers)]
        )

    fragment_index = FragmentIndex(pre_dist, config.is_single_end())
    for entries, frag_counts, unaligned in shard_payloads:
        shard_index = FragmentIndex(pre_dist, config.is_single_end())
        shard_index.entries = {
            (
                entry[2][8:]  # native canonical key (raw minus count)
                if entry[2] is not None
                else tuple(ap.key() for ap in entry[0])
            ): entry
            for entry in entries
        }
        shard_index.frag_length_counts = frag_counts
        shard_index.unaligned_count = unaligned
        fragment_index.merge_from(shard_index)

    log(
        f"Merged {num_workers} worker shards: "
        f"{len(fragment_index.entries)} distinct alignment path lists"
    )
    # The parent needs its own finder: native-engine shards ship
    # pre-located entries whose probabilities are built from the raw
    # bytes by the native builder.
    finder = build_finder(config, paths_index, pre_dist)
    return run_inference_phases(
        config, paths_index, fragment_index, pre_dist, log, finder=finder
    )
