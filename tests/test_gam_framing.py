"""vg framed-stream layer tests (round trip; message decoding needs a
user-supplied vg.proto and is exercised via a synthetic schema)."""

import os
import shutil
import subprocess

import pytest

from rpvg_tpu.io.gam import (
    compile_vg_proto,
    read_framed_messages,
    write_framed_messages,
)


def test_framed_round_trip(tmp_path):
    messages = [f"message-{i}".encode() for i in range(2500)]
    path = str(tmp_path / "stream.gam")
    write_framed_messages(path, messages, tag=b"GAM", group_size=1000)

    decoded = list(read_framed_messages(path))
    assert [payload for _, payload in decoded] == messages
    assert all(tag == b"GAM" for tag, _ in decoded)


def test_framed_uncompressed(tmp_path):
    messages = [b"\x00\x01binary", b"x" * 300]
    path = str(tmp_path / "stream.raw")
    write_framed_messages(path, messages, tag=b"MPA", compress=False)
    decoded = list(read_framed_messages(path))
    assert [payload for _, payload in decoded] == messages


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc unavailable")
def test_proto_schema_compile_and_decode(tmp_path):
    proto = tmp_path / "mini.proto"
    proto.write_text(
        'syntax = "proto3";\n'
        "message Alignment { string sequence = 1; int32 score = 2; }\n"
        "message MultipathAlignment { string sequence = 1; }\n"
    )
    module = compile_vg_proto(str(proto))

    message = module.Alignment(sequence="ACGT", score=7)
    path = str(tmp_path / "mini.gam")
    write_framed_messages(path, [message.SerializeToString()], tag=b"GAM")

    from rpvg_tpu.io.gam import stream_gam_dicts

    records = list(stream_gam_dicts(path, str(proto), is_multipath=False))
    assert records == [{"sequence": "ACGT", "score": 7}]


def test_truncated_rpa_fails_loudly(tmp_path):
    # A truncated .rpa container must raise, not silently drop
    # fragments (the reference's protobuf stream errors out likewise).
    import pytest

    from rpvg_tpu.io import rpa

    path = str(tmp_path / "t.rpa")
    with open(path, "wb") as handle:
        handle.write(b"RPA1")  # magic only, no header/blocks
    with pytest.raises(Exception):
        reader = rpa.RpaReader(path)
        list(reader.blocks())


def test_non_rpa_file_rejected(tmp_path):
    import pytest

    from rpvg_tpu.io import rpa

    path = str(tmp_path / "t.rpa")
    with open(path, "wb") as handle:
        handle.write(b"\x1f\x8b garbage that is not an rpa container")
    with pytest.raises(Exception):
        rpa.RpaReader(path)


def test_truncated_gbwt_fails_loudly(tmp_path):
    import pytest

    from rpvg_tpu.io.gbwt_file import GBWTFile, build_gbwt

    gbwt = build_gbwt([[2, 4, 6], [2, 6], [4, 6, 8]])
    path = str(tmp_path / "p.gbwt")
    gbwt.write(path)
    data = open(path, "rb").read()
    with open(path, "wb") as handle:
        handle.write(data[: len(data) // 2])
    with pytest.raises(Exception):
        GBWTFile.read(path)
