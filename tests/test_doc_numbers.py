"""README measured-numbers block must agree with the committed artifacts
(VERDICT r4 item 8: no doc headline number may disagree with an artifact).

The block between the MEASURED markers is rendered by
``tools/docs/render_measured.py`` from the newest ``BENCH_r*.json`` and
``docs/parity/measured.json``; this test re-renders and asserts the
committed README matches, so any hand-edit or stale artifact fails fast.
"""

import importlib.util
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_renderer():
    spec = importlib.util.spec_from_file_location(
        "render_measured", ROOT / "tools/docs/render_measured.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["render_measured"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_readme_measured_block_is_current():
    rm = _load_renderer()
    text = (ROOT / "README.md").read_text()
    pattern = re.compile(
        re.escape(rm.BEGIN) + r".*?" + re.escape(rm.END), re.DOTALL
    )
    m = pattern.search(text)
    assert m, "README.md lost its MEASURED:BEGIN/END markers"
    assert m.group(0) == rm.render(), (
        "README measured block is stale — run "
        "python tools/docs/render_measured.py"
    )


def test_parity_artifact_values_above_floor():
    """The parity artifact itself must stay above the asserted floors the
    tests enforce (≥40 dB PSNR; LPIPS rel err ~0) — catches a regression
    that slipped through a refresh."""
    import json

    parity = json.loads((ROOT / "docs/parity/measured.json").read_text())
    for name, rec in parity.items():
        if rec["unit"] == "dB":
            assert rec["value"] >= 40.0, (name, rec)
        elif rec["unit"] == "rel":
            assert rec["value"] < 1e-5, (name, rec)
