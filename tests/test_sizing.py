"""Sizing goldens from the reference: TestExpectedLoading (128 entries ->
50.0%, qf_test.go:433-436), TestSizeEstimate (5,500,000 entries + 4 storage
bits -> 98,566,144 bytes, qf_test.go:438-441), and the README's 10^9-entry
worked example (README.md:99-107)."""

from qfspark.sizing import QFConfig, human_bytes, q_bits_for


def test_expected_loading_golden():
    c = QFConfig(expected_entries=128)
    assert c.expected_loading() == 50.0


def test_size_estimate_golden():
    c = QFConfig(expected_entries=5_500_000, counter_bits=4)
    assert c.bytes_required() == 98_566_144


def test_billion_entry_worked_example():
    c = QFConfig(expected_entries=1_000_000_000, bit_packed=True)
    assert c.derived_q_bits() == 31
    assert c.bucket_count() == 2_147_483_648
    # 9.00 GB (README.md:99-107)
    gb = c.bytes_required() / (1024**3)
    assert abs(gb - 9.00) < 0.01
    assert abs(c.expected_loading() - 46.57) < 0.01


def test_min_q_bits():
    assert q_bits_for(0) == 4
    assert q_bits_for(1) == 4
    assert q_bits_for(10) == 4
    assert q_bits_for(11) == 5  # 16*0.65 = 10.4 < 11


def test_max_entries_threshold():
    c = QFConfig(q_bits=10)
    assert c.max_entries() == 666  # ceil(1024 * 0.65)


def test_human_bytes():
    assert human_bytes(512) == "512 bytes"
    assert human_bytes(9 * 1024**3 + 1) == "9.00 GB"


def test_explain_mentions_geometry():
    text = QFConfig(expected_entries=1000, counter_bits=8).explain()
    assert "bits configured for quotient" in text
    assert "external storage" in text
