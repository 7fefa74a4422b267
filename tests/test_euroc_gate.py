"""EuRoC accuracy regression gate (VERDICT r3 item 4 follow-through).

Runs the full-system EuRoC protocol (`tools/euroc_suite.py`: GT spline
from the reference's shipped ground-truth trajectories -> synthetic stereo
tracks at the reference sensor envelope -> full estimator -> evo-protocol
APE) on a 25 s prefix of two sequences and gates the result.  The
full-length per-sequence table lives in BASELINE.md (measured on the chip);
this gate keeps the pipeline honest between those runs.

Skips when the reference dataset ground truth is not available (the gate
is dataset-dependent by nature; reference analogue: `evaluation/run.py`
requires the rosbags on disk).
"""

import json
import os
import sys

import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(_TOOLS))

import euroc_suite  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(euroc_suite.GT_DIR),
    reason="reference EuRoC ground-truth files not available")

# loose vs the full-length BASELINE.md numbers (MH_02: 0.023 m / 0.118 deg,
# V2_01: 0.023 m / 0.348 deg) — a regression gate, not a record
_GATES = {
    "MH_02_easy": (0.10, 1.0),
    "V2_01_easy": (0.10, 1.5),
}


def test_euroc_prefix_ape_gate(tmp_path):
    out = str(tmp_path / "euroc_gate")
    euroc_suite.main([
        "--cpu", "--duration", "25",
        "--sequences", ",".join(_GATES),
        "--out", out,
    ])
    with open(os.path.join(out, "results.json")) as f:
        rows = {r["sequence"]: r for r in json.load(f)}
    assert set(rows) == set(_GATES)
    for name, (t_max, r_max) in _GATES.items():
        row = rows[name]
        assert row["ape_trans_rmse_m"] < t_max, (name, row)
        assert row["ape_rot_rmse_deg"] < r_max, (name, row)
