#!/usr/bin/env python3
"""Regenerate the frozen wire-format goldens under tests/golden/.

Run ONLY when a deliberate format change is made; commit the new files
with the change that explains them."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qfspark.serde import qf_from_bytes, qf_to_bytes, qf_to_gqf_bytes  # noqa: E402
from tests.test_golden import GOLDEN_DIR, _VARIANTS, _golden_qf  # noqa: E402


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, cfg in _VARIANTS:
        qf = _golden_qf(cfg)
        for fmt, blob in (("gqf", qf_to_gqf_bytes(qf)),
                          ("native", qf_to_bytes(qf))):
            path = os.path.join(GOLDEN_DIR, f"{name}.{fmt}.qf")
            with open(path, "wb") as f:
                f.write(blob)
            print(f"wrote {path} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
