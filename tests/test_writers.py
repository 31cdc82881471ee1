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
