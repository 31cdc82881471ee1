"""Info-TSV parser: strided fast path vs per-line fallback equivalence
and the parser's failure contracts (reference parseHaplotypeTranscriptInfo,
/root/reference/src/main.cpp:239-353)."""

import gzip

import pytest

from rpvg_tpu.io import info as info_mod
from rpvg_tpu.io.info import parse_haplotype_transcript_info

NEW_FORMAT = (
    "Name\tLength\tTranscript\tHaplotypes\n"
    "t1_h0\t100\tt1\thap0\n"
    "t1_h1\t101\tt1\thap1,hap2\n"
    "t2_h0\t200\tt2\thap0\n"
    "t2_h12\t201\tt2\thap1,hap2\n"
)

OLD_FORMAT = (
    "Name\tLength\tTranscript\tReference\tHaplotypes\n"
    "t1_h0\t100\tt1\tchr1\thap0\n"
    "t1_h1\t101\tt1\tchr1\thap1,hap2\n"
)


def _expected_new(parse_ids, use_transcript_names):
    by_name = {
        "t1_h0": ("t1", 0, 1, frozenset({0}) if parse_ids else frozenset()),
        "t1_h1": ("t1", 0, 2, frozenset({1, 2}) if parse_ids else frozenset()),
        "t2_h0": ("t2", 1, 1, frozenset({0}) if parse_ids else frozenset()),
        "t2_h12": ("t2", 1, 2, frozenset({1, 2}) if parse_ids else frozenset()),
    }
    out = {}
    for name, (transcript, gid, count, ids) in by_name.items():
        out[name] = (
            transcript if use_transcript_names else name, gid, count, ids
        )
    return out


@pytest.mark.parametrize("parse_ids", [True, False])
@pytest.mark.parametrize("use_transcript_names", [True, False])
@pytest.mark.parametrize("gz", [False, True])
def test_new_format(tmp_path, parse_ids, use_transcript_names, gz):
    path = str(tmp_path / ("info.tsv.gz" if gz else "info.tsv"))
    if gz:
        with gzip.open(path, "wt") as handle:
            handle.write(NEW_FORMAT)
    else:
        with open(path, "w") as handle:
            handle.write(NEW_FORMAT)
    parsed = parse_haplotype_transcript_info(path, parse_ids, use_transcript_names)
    got = {
        k: (v.name, v.group_id, v.source_count, v.source_ids)
        for k, v in parsed.items()
    }
    assert got == _expected_new(parse_ids, use_transcript_names)


def test_fast_path_taken_and_equivalent(tmp_path, monkeypatch):
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write(NEW_FORMAT)
    calls = []
    orig = info_mod._fast_columns

    def spy(body, num_cols):
        res = orig(body, num_cols)
        calls.append(res is not None)
        return res

    monkeypatch.setattr(info_mod, "_fast_columns", spy)
    fast = parse_haplotype_transcript_info(path, True, False)
    assert calls == [True]

    monkeypatch.setattr(info_mod, "_fast_columns", lambda body, n: None)
    slow = parse_haplotype_transcript_info(path, True, False)
    assert list(fast) == list(slow)
    for k in fast:
        a, b = fast[k], slow[k]
        assert (a.name, a.group_id, a.source_count, a.source_ids) == (
            b.name, b.group_id, b.source_count, b.source_ids
        )


@pytest.mark.parametrize(
    "body_tail",
    [
        "t3_h0\t5\tt3\thap0",  # no trailing newline
        "t3_h0\t5\tt3\thap0\n\n",  # trailing blank line
        "\nt3_h0\t5\tt3\thap0\n",  # interior blank line
    ],
)
def test_irregular_layouts(tmp_path, body_tail):
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write("Name\tLength\tTranscript\tHaplotypes\n" + body_tail)
    parsed = parse_haplotype_transcript_info(path, True, False)
    assert parsed["t3_h0"].group_id == 0
    assert parsed["t3_h0"].source_count == 1


def test_balanced_ragged_rows_rejected_by_fast_path(tmp_path):
    # One 3-field row plus one 5-field row: the flattened field count
    # balances (2 rows x 4 cols), but the layout is ragged — the fast
    # path must refuse it so the per-line loop can fail loudly instead
    # of silently column-shifting (ADVICE round 3).
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write(
            "Name\tLength\tTranscript\tHaplotypes\n"
            "a\tb\tc\n"
            "d\te\tf\tg\th\n"
        )
    assert info_mod._fast_columns("a\tb\tc\nd\te\tf\tg\th\n", 4) is None
    with pytest.raises(AssertionError, match="malformed info line"):
        parse_haplotype_transcript_info(path, True, False)


def test_trailing_whitespace_haplotypes_match_fallback(tmp_path, monkeypatch):
    # Trailing spaces on the haplotypes column must strip identically on
    # the fast and fallback paths (same haplotype id either way).
    body = (
        "Name\tLength\tTranscript\tHaplotypes\n"
        "t1_h0\t100\tt1\thap0 \n"
        "t1_h1\t101\tt1\thap0\n"
    )
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write(body)
    fast = parse_haplotype_transcript_info(path, True, False)
    monkeypatch.setattr(info_mod, "_fast_columns", lambda body, n: None)
    slow = parse_haplotype_transcript_info(path, True, False)
    for parsed in (fast, slow):
        assert parsed["t1_h0"].source_ids == parsed["t1_h1"].source_ids


def test_old_format(tmp_path):
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write(OLD_FORMAT)
    parsed = parse_haplotype_transcript_info(path, True, True)
    assert parsed["t1_h0"].name == "t1"
    assert parsed["t1_h1"].source_ids == frozenset({1, 2})


def test_duplicate_name_fails_loudly(tmp_path):
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write(
            "Name\tLength\tTranscript\tHaplotypes\n"
            "t1_h0\t100\tt1\thap0\n"
            "t1_h0\t100\tt1\thap1\n"
        )
    with pytest.raises(AssertionError, match="duplicate path name t1_h0"):
        parse_haplotype_transcript_info(path, True, False)


def test_bad_header_fails_loudly(tmp_path):
    path = str(tmp_path / "info.tsv")
    with open(path, "w") as handle:
        handle.write("Foo\tBar\nx\ty\n")
    with pytest.raises(AssertionError, match="unexpected info header"):
        parse_haplotype_transcript_info(path, True, False)
