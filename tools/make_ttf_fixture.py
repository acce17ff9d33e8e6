"""Regenerate tests/fixtures/mini.ttf from its definition in
tests/util_ttf.py (deterministic; run from the repo root)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from util_ttf import FIXTURE_ADVANCES, FIXTURE_KERNING, FIXTURE_UPEM, encode_ttf  # noqa: E402

out = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "mini.ttf"
)
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "wb") as fh:
    fh.write(encode_ttf(FIXTURE_ADVANCES, FIXTURE_KERNING, units_per_em=FIXTURE_UPEM))
print(out, os.path.getsize(out), "bytes")
