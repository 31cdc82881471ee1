"""Vendored vg protobuf wire codec: self round-trips, cross-validation
against google.protobuf over a protoc-compiled copy of the same schema,
and direct binary .gam/.gamp pipeline ingestion (reference input path:
/root/reference/src/main.cpp:111,157)."""

import base64
import os
import tempfile

import pytest

from rpvg_tpu.io import vgproto
from rpvg_tpu.io.gam import (
    compile_vg_proto,
    is_gam_path,
    read_framed_messages,
    stream_gam_alignments,
    stream_gam_dicts,
    write_gam_dicts,
)

ALN = {
    "sequence": "ACGTACGT",
    "name": "frag_1",
    "quality": bytes([30, 31, 32, 33, 34, 35, 36, 37]),
    "mapping_quality": 60,
    "score": -7,
    "path": {
        "mapping": [
            {
                "position": {"node_id": 5, "offset": 2, "is_reverse": True},
                "edit": [
                    {"from_length": 4, "to_length": 4},
                    {"from_length": 1, "to_length": 1, "sequence": "G"},
                ],
                "rank": 1,
            },
            {
                "position": {"node_id": 7},
                "edit": [{"from_length": 3, "to_length": 3}],
                "rank": 2,
            },
        ]
    },
    "fragment_length_distribution": "0:250:25:0:1",
    "annotation": {"allelic_mapq": 42.0, "proper_pair": True},
}

MP_ALN = {
    "sequence": "ACGTACGTAA",
    "name": "frag_2",
    "quality": bytes(range(10)),
    "mapping_quality": 50,
    "start": [0, 1],
    "subpath": [
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 3},
                        "edit": [{"from_length": 10, "to_length": 10}],
                    }
                ]
            },
            "next": [1, 2],
            "score": 16,
        },
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 4, "offset": 1},
                        "edit": [{"from_length": 5, "to_length": 5}],
                    }
                ]
            },
            "score": 4,
            "connection": [{"next": 2, "score": -1}],
        },
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 9},
                        "edit": [{"from_length": 2, "to_length": 2}],
                    }
                ]
            },
            "score": 2,
        },
    ],
    "annotation": {"fragment_length_distribution": "-I 200 -D 20"},
}


def test_alignment_roundtrip():
    out = vgproto.decode_alignment(vgproto.encode_alignment(ALN))
    assert out == ALN


def test_multipath_roundtrip():
    out = vgproto.decode_multipath_alignment(
        vgproto.encode_multipath_alignment(MP_ALN)
    )
    assert out == MP_ALN


def test_unknown_fields_skipped():
    # Append an unknown varint field (200) and length-delimited field
    # (201): decoder must skip both by wire type.
    payload = bytearray(vgproto.encode_alignment(ALN))
    vgproto._write_key(payload, 200, 0)
    vgproto._write_varint(payload, 12345)
    vgproto._write_len_field(payload, 201, b"future stuff")
    assert vgproto.decode_alignment(bytes(payload)) == ALN


def test_unpacked_repeated_uint_accepted():
    # proto2-style unpacked encoding of MultipathAlignment.start.
    buf = bytearray()
    vgproto._write_key(buf, 8, 0)
    vgproto._write_varint(buf, 3)
    vgproto._write_key(buf, 8, 0)
    vgproto._write_varint(buf, 7)
    out = vgproto.decode_multipath_alignment(bytes(buf))
    assert out["start"] == [3, 7]


# ------------------------------------------------ protobuf cross-check


@pytest.fixture(scope="module")
def vg_pb2():
    with tempfile.TemporaryDirectory() as tmp:
        proto = os.path.join(tmp, "vg.proto")
        with open(proto, "w") as handle:
            handle.write(vgproto.VG_PROTO_MINIMAL)
        yield compile_vg_proto(proto)


def _fill(message, obj):
    from google.protobuf.json_format import ParseDict

    jsonable = _jsonable(obj)
    ParseDict(jsonable, message)
    return message


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, bytes):
        return base64.b64encode(obj).decode()
    return obj


def test_decoder_matches_protobuf_serialization(vg_pb2):
    """google.protobuf-serialized messages decode identically through
    the hand-rolled wire parser."""
    from google.protobuf.json_format import MessageToDict

    for message_name, obj in (("Alignment", ALN), ("MultipathAlignment", MP_ALN)):
        msg = _fill(getattr(vg_pb2, message_name)(), obj)
        wire = msg.SerializeToString()
        mine = vgproto.decode_message(wire, message_name)
        theirs = MessageToDict(msg, preserving_proto_field_name=True)
        # Normalise protobuf-JSON artifacts: base64 bytes, stringly ints.
        assert _jsonable(mine) == _canon(theirs, mine)


def _canon(theirs, mine):
    """MessageToDict stringifies int64 and renders annotation Structs
    as plain dicts; align representations field by field."""
    if isinstance(mine, dict):
        return {k: _canon(theirs.get(k), mine[k]) for k in mine}
    if isinstance(mine, list):
        return [_canon(t, m) for t, m in zip(theirs, mine)]
    if isinstance(mine, bool):
        return bool(theirs)
    if isinstance(mine, int):
        return int(theirs)
    return theirs


def test_encoder_parses_with_protobuf(vg_pb2):
    """Hand-rolled encodings parse cleanly through google.protobuf and
    survive a full protobuf -> wire -> vgproto round trip."""
    wire = vgproto.encode_multipath_alignment(MP_ALN)
    msg = vg_pb2.MultipathAlignment()
    msg.ParseFromString(wire)
    assert msg.sequence == MP_ALN["sequence"]
    assert list(msg.start) == MP_ALN["start"]
    assert msg.subpath[0].next == [1, 2]
    assert msg.subpath[1].connection[0].score == -1
    assert (
        msg.annotation.fields["fragment_length_distribution"].string_value
        == "-I 200 -D 20"
    )
    assert vgproto.decode_multipath_alignment(msg.SerializeToString()) == MP_ALN


# ----------------------------------------------------- stream + pipeline


def test_gam_stream_roundtrip(tmp_path):
    path = str(tmp_path / "two.gamp")
    write_gam_dicts(path, [MP_ALN, MP_ALN], is_multipath=True)
    tags_payloads = list(read_framed_messages(path))
    assert [t for t, _ in tags_payloads] == [b"MPA", b"MPA"]
    decoded = list(stream_gam_dicts(path, None, is_multipath=True))
    assert decoded == [MP_ALN, MP_ALN]
    alns = list(stream_gam_alignments(path, is_multipath=True))
    assert alns[0].sequence == MP_ALN["sequence"]
    assert len(alns[0].subpaths) == 3


def test_is_gam_path():
    assert is_gam_path("x.gam") and is_gam_path("x.gamp")
    assert is_gam_path("x.gam.gz") and is_gam_path("x.gamp.gz")
    assert not is_gam_path("x.json") and not is_gam_path("x.rpa")


def test_pipeline_from_binary_gamp_matches_json(tmp_path):
    """Full pipeline from binary .gamp + .gbwt inputs is byte-identical
    to the JSON-driven run — the reference's exact input surface
    (rpvg -g graph -p panel.gbwt -a aln.gamp)."""
    from rpvg_tpu import sim
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    panel = sim.build_panel(
        num_transcripts=4, num_haplotypes=2, exons_per_transcript=3,
        exon_length=60, variant_sites=1, seed=5,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 200, read_length=50, frag_mean=140, frag_sd=12, seed=21,
        with_qualities=True,
    )
    graph_path = str(tmp_path / "graph.json")
    gbwt_panel = str(tmp_path / "panel.gbwt")
    json_aln = str(tmp_path / "aln.json")
    gamp_aln = str(tmp_path / "aln.gamp")
    panel.write_graph_json(graph_path)
    panel.write_panel_json(str(tmp_path / "panel.json"))
    panel.paths_index.to_gbwt_file(gbwt_panel)
    sim.write_alignment_json(records, json_aln)
    write_gam_dicts(gamp_aln, records, is_multipath=True)

    outputs = {}
    for label, paths, alns in (
        ("json", str(tmp_path / "panel.json"), json_aln),
        ("binary", gbwt_panel, gamp_aln),
    ):
        prefix = str(tmp_path / f"out_{label}")
        run_pipeline(
            PipelineConfig(
                graph=graph_path, paths=paths, alignments=alns,
                output_prefix=prefix, inference_model="transcripts",
                threads=2, rng_seed=42,
            )
        )
        with open(prefix + ".txt", "rb") as handle:
            outputs[label] = handle.read()
    assert outputs["binary"] == outputs["json"]


def test_multipath_dag_roundtrip_and_binary_pipeline(tmp_path):
    """mpmap-shaped subpath DAGs (multi-subpath, next connections,
    scored allele alternatives) survive the binary .gamp wire codec and
    drive the pipeline byte-identically to the JSON route."""
    from rpvg_tpu import sim
    from rpvg_tpu.pipeline import PipelineConfig, run_pipeline

    panel = sim.build_gene_panel(
        num_genes=10, isoforms_per_gene=4, num_haplotypes=4,
        exons_per_gene=6, exon_length=60, variant_sites=2, seed=5,
    )
    records, _ = sim.simulate_read_pairs(
        panel, 300, read_length=60, frag_mean=150, frag_sd=12, seed=21,
        multipath_dag=True, with_errors=True,
    )
    dag_records = [r for r in records if len(r.get("subpath", [])) > 1]
    assert dag_records, "no DAG records simulated"
    import base64

    for rec in dag_records[:5]:
        wire = dict(rec)
        if isinstance(wire.get("quality"), str):
            wire["quality"] = base64.b64decode(wire["quality"])
        out = vgproto.decode_multipath_alignment(
            vgproto.encode_multipath_alignment(wire)
        )
        # The decoder normalises absent defaults; compare the DAG shape.
        assert len(out["subpath"]) == len(rec["subpath"])
        assert out["start"] == rec["start"]
        for a, b in zip(out["subpath"], rec["subpath"]):
            assert a.get("next", []) == b.get("next", [])
            assert a.get("score", 0) == b.get("score", 0)

    json_aln = str(tmp_path / "aln.json")
    gamp_aln = str(tmp_path / "aln.gamp")
    info = str(tmp_path / "info.tsv")
    sim.write_alignment_json(records, json_aln)
    write_gam_dicts(gamp_aln, records, is_multipath=True)
    panel.write_info_tsv(info)
    outputs = {}
    for label, alns in (("json", json_aln), ("binary", gamp_aln)):
        prefix = str(tmp_path / f"dag_{label}")
        run_pipeline(
            PipelineConfig(
                graph=panel.graph, paths=panel.paths_index, alignments=alns,
                output_prefix=prefix, inference_model="haplotype-transcripts",
                path_info=info, threads=2, rng_seed=42,
                frag_mean=150.0, frag_sd=12.0,
            )
        )
        outputs[label] = open(prefix + ".txt", "rb").read()
    assert outputs["json"] == outputs["binary"]
