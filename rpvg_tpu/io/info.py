"""Haplotype/transcript info file parser (`vg rna --write-info` TSV),
plain or gzip/bgzip compressed.

Behavioural contract: reference parseHaplotypeTranscriptInfo
(/root/reference/src/main.cpp:239-353).  Columns (new format):
Name, Length, Transcript, Haplotypes (comma-separated); the old format
carries an extra Reference column before Haplotypes, detected from the
header line.
"""

from __future__ import annotations

import gzip
from typing import Dict

from ..probabilities import PathInfo


def parse_haplotype_transcript_info(
    filename: str, parse_haplotype_ids: bool, use_transcript_names: bool
) -> Dict[str, PathInfo]:
    opener = gzip.open if filename.endswith(".gz") else open
    info: Dict[str, PathInfo] = {}
    transcript_id_index: Dict[str, int] = {}
    haplotype_id_index: Dict[str, int] = {}

    with opener(filename, "rt") as handle:
        header = handle.readline()
        cols = header.rstrip("\n").split("\t")
        assert cols[0] == "Name", f"unexpected info header: {header!r}"
        is_old_format = "Reference" in header

        for line in handle:
            if not line.strip():
                continue
            fields = line.rstrip("\n").split("\t")
            name = fields[0]
            transcript = fields[2]
            haplotypes = fields[4] if is_old_format else fields[3]

            assert name not in info, f"duplicate path name {name}"
            path_info = PathInfo(name=name)
            if use_transcript_names:
                path_info.name = transcript
            path_info.group_id = transcript_id_index.setdefault(
                transcript, len(transcript_id_index)
            )

            if parse_haplotype_ids:
                source_ids = set()
                for hap in haplotypes.split(","):
                    source_ids.add(haplotype_id_index.setdefault(hap, len(haplotype_id_index)))
                path_info.source_ids = frozenset(source_ids)
                path_info.source_count = len(source_ids)
            else:
                path_info.source_count = haplotypes.count(",") + 1

            info[name] = path_info

    return info
