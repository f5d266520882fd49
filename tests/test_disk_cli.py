"""Zero-load disk open (reference TestReadOnlyFromDisk, qf_test.go:512-566)
and CLI (reference cmd/main.go compile/lookup/describe)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from qfspark import QF, QFConfig
from qfspark.disk import open_readonly, read_header_from_path, save
from qfspark.hashing import murmur64a

from .corpus import TEST_STRINGS


@pytest.mark.parametrize("bit_packed", [False, True])
@pytest.mark.parametrize("counter_bits", [0, 15])
def test_open_readonly_same_lookups(tmp_path, bit_packed, counter_bits):
    cfg = QFConfig(counter_bits=counter_bits, bit_packed=bit_packed,
                   expected_entries=300)
    qf = QF.from_keys(TEST_STRINGS, config=cfg)
    path = str(tmp_path / "f.qf")
    save(qf, path)

    ro = open_readonly(path)
    assert ro.entries == qf.entries
    assert ro.config.hash_name == qf.config.hash_name
    hashes = murmur64a(TEST_STRINGS)
    f_mem, c_mem = qf.lookup_hashes(hashes, mode="walk")
    f_ro, c_ro = ro.lookup_hashes(hashes, mode="walk")
    assert np.array_equal(f_mem, f_ro)
    assert np.array_equal(c_mem, c_ro)
    assert bool(f_ro.all())
    # absent keys miss through the memmap too
    fa, _ = ro.lookup_hashes(murmur64a([f"zzz-{i}" for i in range(100)]), mode="walk")
    assert int(fa.sum()) == 0


def test_header_peek(tmp_path):
    qf = QF.from_keys(["a", "b"], config=QFConfig(counter_bits=9, hash_name="xxhash64"))
    path = str(tmp_path / "h.qf")
    save(qf, path)
    h = read_header_from_path(path)
    assert h["entries"] == 2 and h["counter_bits"] == 9
    assert h["hash_name"] == "xxhash64"


def _cli(*argv):
    return subprocess.run(
        [sys.executable, "-m", "qfspark.cli", *argv],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_cli_build_lookup_describe(tmp_path):
    lines = tmp_path / "keys.txt"
    lines.write_text("alpha\nbeta\ngamma\nalpha\n")
    out = str(tmp_path / "f.qf")

    r = _cli("build", out, "--input", str(lines), "--counter-bits", "8")
    assert r.returncode == 0, r.stderr
    assert "3 entries" in r.stdout

    r = _cli("lookup", out, "alpha", "beta")
    assert r.returncode == 0, r.stderr
    assert "alpha: present (count=2)" in r.stdout
    assert "beta: present (count=1)" in r.stdout

    r = _cli("lookup", out, "missing")
    assert r.returncode == 1
    assert "missing: not present" in r.stdout

    r = _cli("describe", out)
    assert r.returncode == 0, r.stderr
    assert "entries" in r.stdout and "bits configured for quotient" in r.stdout
