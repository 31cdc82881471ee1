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

        # Haplotype strings repeat heavily across paths (the panel has
        # far fewer distinct haplotype sets than paths), so the
        # id-set/count for each distinct string is computed once.
        hap_field = 4 if is_old_format else 3
        hap_cache: Dict[str, tuple] = {}
        tid_setdefault = transcript_id_index.setdefault
        hid_setdefault = haplotype_id_index.setdefault

        for line in handle:
            fields = line.split("\t")
            if len(fields) <= hap_field:
                assert not line.strip(), f"malformed info line: {line!r}"
                continue
            name = fields[0]
            transcript = fields[2]
            haplotypes = fields[hap_field].rstrip()

            assert name not in info, f"duplicate path name {name}"
            cached = hap_cache.get(haplotypes)
            if cached is None:
                if parse_haplotype_ids:
                    source_ids = frozenset(
                        hid_setdefault(hap, len(haplotype_id_index))
                        for hap in haplotypes.split(",")
                    )
                    cached = (source_ids, len(source_ids))
                else:
                    cached = (frozenset(), haplotypes.count(",") + 1)
                hap_cache[haplotypes] = cached

            info[name] = PathInfo(
                transcript if use_transcript_names else name,
                tid_setdefault(transcript, len(transcript_id_index)),
                cached[1],
                cached[0],
            )

    return info
