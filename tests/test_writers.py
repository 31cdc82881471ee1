"""Output-writer formatting parity: fmt() must reproduce C++
`ostream << setprecision(8)` (the reference's writer formatting,
/root/reference/src/threaded_output_writer.cpp:6)."""

import shutil
import subprocess

import pytest

from rpvg_tpu.io.writers import fmt

VALUES = [
    0.0, 1.0, 0.5, 1.0 / 3.0, 123456789.0, 99999999.0, 1e8, 1234.5678901,
    0.000012345678, 1e-9, 42.0, 17156.447308879, 2.4592743581826583,
    158551.54, 0.30000000000000004, 1e6, 12345678.5, 0.1, 3254.1, 0.001,
    1e-300, 7.0 / 11.0, 250000.25,
]

# Captured from g++ -O2 with std::setprecision(8) (see test body for the
# live check when a compiler is present).
EXPECTED = [
    "0", "1", "0.5", "0.33333333", "1.2345679e+08", "99999999", "1e+08",
    "1234.5679", "1.2345678e-05", "1e-09", "42", "17156.447", "2.4592744",
    "158551.54", "0.3", "1000000", "12345678", "0.1", "3254.1", "0.001",
    "1e-300", "0.63636364", "250000.25",
]


def test_fmt_matches_recorded_cpp_output():
    assert [fmt(v) for v in VALUES] == EXPECTED


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_fmt_matches_live_cpp_output(tmp_path):
    source = tmp_path / "fmt_check.cpp"
    lines = ",".join(repr(v) for v in VALUES)
    source.write_text(
        "#include <iostream>\n#include <iomanip>\n"
        "int main(){ double vals[] = {" + lines + "};\n"
        "std::cout << std::setprecision(8);\n"
        "for (double v : vals) std::cout << v << '\\n'; }\n"
    )
    binary = tmp_path / "fmt_check"
    subprocess.run(["g++", "-O2", "-o", str(binary), str(source)], check=True)
    cpp_output = subprocess.run(
        [str(binary)], capture_output=True, text=True, check=True
    ).stdout.split()
    assert [fmt(v) for v in VALUES] == cpp_output


def test_format_rows_matches_fmt_special_values():
    # The native row formatter must normalise signed nan like fmt/numpy
    # (glibc snprintf would print "-nan") and agree on inf/exponents.
    import numpy as np

    from rpvg_tpu.io.writers import fmt, format_rows

    neg_nan = np.frombuffer(
        np.uint64(0xFFF8000000000000).tobytes(), dtype=np.float64
    )[0]
    vals = np.array([neg_nan, float("nan"), float("inf"), -float("inf"),
                     0.0, 1.2345678e-12, 9.87654321e11])
    text = format_rows(["p"] * vals.size, [vals])
    if text is None:
        import pytest

        pytest.skip("native library unavailable")
    got = [line.split("\t")[1] for line in text.strip().split("\n")]
    assert got == [fmt(float(v)) for v in vals]


def test_async_gz_writers_match_sync(tmp_path, monkeypatch):
    # The dedicated writer thread (AsyncTextHandle — the reference's
    # ThreadedOutputWriter design, src/threaded_output_writer.cpp:8-37)
    # must produce decompressed text identical to the synchronous path.
    import gzip

    import numpy as np

    from rpvg_tpu.infer.estimates import CountSamples, PathClusterEstimates
    from rpvg_tpu.io.writers import (
        AsyncTextHandle,
        ProbabilityClusterWriter,
        ReadCountGibbsSamplesWriter,
    )
    from rpvg_tpu.probabilities import PathInfo

    paths = []
    for i in range(3):
        info = PathInfo(f"path_{i}")
        info.length = 100 + i
        info.effective_length = 90.5 + i
        paths.append(info)

    def gibbs_estimates():
        est = PathClusterEstimates()
        est.paths = paths
        samples = CountSamples()
        samples.path_ids = [0, 2]
        samples.noise_samples = [1.0, 2.0]
        samples.abundance_samples = [3.0, 4.0, 5.0, 6.0]
        est.gibbs_read_count_samples = [samples]
        est.total_count = 7.0
        return est

    outputs = {}
    for mode in ("async", "sync"):
        monkeypatch.setenv("RPVG_TPU_SYNC_WRITERS", "1" if mode == "sync" else "0")
        prefix = str(tmp_path / mode)
        pw = ProbabilityClusterWriter(prefix + "_probs", 1e-8)
        assert isinstance(pw.handle, AsyncTextHandle) == (mode == "async")
        for k in range(50):
            pw.add_block(f"#\nblock {k}\n" * 20)
        pw.close_async()
        pw.join()
        gw = ReadCountGibbsSamplesWriter(prefix + "_gibbs", 2)
        gw.add_samples(1, gibbs_estimates())
        gw.finish_async(unaligned_read_count=3)
        gw.join()
        with gzip.open(prefix + "_probs.txt.gz", "rt") as handle:
            probs_text = handle.read()
        with gzip.open(prefix + "_gibbs.txt.gz", "rt") as handle:
            gibbs_text = handle.read()
        outputs[mode] = (probs_text, gibbs_text)

    assert outputs["async"] == outputs["sync"]
    assert "Unknown" in outputs["async"][1]


def test_async_handle_propagates_write_errors(tmp_path):
    from rpvg_tpu.io.writers import AsyncTextHandle

    class Boom:
        def write(self, text):
            raise OSError("disk full")

        def close(self):
            pass

    handle = AsyncTextHandle(Boom())
    with pytest.raises(OSError):
        # The failure surfaces on a subsequent write or at join().
        for _ in range(200):
            handle.write("x")
        handle.close()


def test_pipeline_shuts_writer_threads_down_on_failure(tmp_path, monkeypatch):
    # A failing device half must not leak the gzip writer thread or its
    # handle (run_inference_phases' finally joins them).
    import threading

    import jax

    jax.config.update("jax_platforms", "cpu")
    from rpvg_tpu import sim
    from rpvg_tpu import pipeline as P

    panel = sim.build_panel(num_transcripts=10, num_haplotypes=2,
                            exons_per_transcript=2, exon_length=50,
                            variant_sites=1, seed=4)
    records, _ = sim.simulate_read_pairs(panel, 200, read_length=50,
                                         frag_mean=120, frag_sd=12, seed=5)
    aln = str(tmp_path / "aln.json")
    sim.write_alignment_json(records, aln)

    def boom(*args, **kwargs):
        raise RuntimeError("injected device-half failure")

    from rpvg_tpu.infer import batched_models

    monkeypatch.setattr(batched_models, "batched_transcripts", boom)
    config = P.PipelineConfig(
        graph=panel.graph, paths=panel.paths_index, alignments=aln,
        output_prefix=str(tmp_path / "out"), inference_model="transcripts",
        rng_seed=1, score_not_qual=True, write_probs=True,
        num_gibbs_samples=2,
    )
    before = {t.ident for t in threading.enumerate()}
    with pytest.raises(RuntimeError, match="injected"):
        P.run_pipeline(config)
    leaked = [
        t for t in threading.enumerate()
        if t.ident not in before and t.name == "rpvg-writer" and t.is_alive()
    ]
    assert not leaked, leaked


def test_deferred_publish_discard_after_close_async(tmp_path):
    """A writer whose close was already enqueued must still be
    un-publishable on a later pipeline failure (deferred-publish mode):
    close_async + drain used to rename the tmp immediately, so a
    subsequent discard() could no longer take the file back and a
    failed run left an inconsistent partial output set."""
    import os
    import time

    from rpvg_tpu.io import writers

    prefix = str(tmp_path / "out_probs")
    final = prefix + ".txt.gz"

    # Failure path: close enqueued, then discard -> nothing published.
    w = writers.ProbabilityClusterWriter(prefix, 1e-8, defer_publish=True)
    w.handle.write("#\nx 1 0.5:0\n")
    w.close_async()
    for _ in range(100):  # let the drain thread finish the close
        if not getattr(w.handle, "_thread", None) or not w.handle._thread.is_alive():
            break
        time.sleep(0.01)
    w.discard()
    assert not os.path.exists(final), "discard after close_async still published"
    assert not os.path.exists(final + ".tmp")

    # Success path: close enqueued, join, publish -> file appears.
    w2 = writers.ProbabilityClusterWriter(prefix, 1e-8, defer_publish=True)
    w2.handle.write("#\nx 1 0.5:0\n")
    w2.close_async()
    w2.join()
    assert not os.path.exists(final), "published before publish()"
    w2.publish()
    assert os.path.exists(final)
    assert not os.path.exists(final + ".tmp")
