"""Render the measured-numbers block in README.md from the committed
artifacts — the single source of truth for every headline claim
(VERDICT r4 item 8: no doc number may disagree with an artifact).

Sources:
- newest ``BENCH_r*.json`` at the repo root (driver-recorded; the last
  complete JSON line is the official record of that round)
- ``docs/parity/measured.json`` (refreshed by the parity tests themselves)

Usage:
    python tools/docs/render_measured.py          # rewrite README block
    python tools/docs/render_measured.py --check  # exit 1 if block is stale

The block lives between the MEASURED:BEGIN/END markers; everything outside
is hand-written prose (which must annotate any number it quotes with its
run file — the fast-tier test tests/test_doc_numbers.py enforces the
rendered block, and the prose convention is reviewed, not parsed).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
BEGIN = "<!-- MEASURED:BEGIN (rendered by tools/docs/render_measured.py — do not hand-edit) -->"
END = "<!-- MEASURED:END -->"


def list_benches() -> list[Path]:
    return sorted(ROOT.glob("BENCH_r*.json"))


def load_bench(path: Path) -> dict:
    last = None
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "value" in cand:
                last = cand
    if last is None:
        # driver artifacts may wrap the record: take the whole file's
        # "parsed" object if present
        doc = json.loads(path.read_text())
        last = doc.get("parsed", doc)
    return last


def newest_bench() -> tuple[str, dict]:
    benches = list_benches()
    if not benches:
        raise SystemExit("no BENCH_r*.json artifact found")
    return benches[-1].name, load_bench(benches[-1])


def fmt_extra(name: str, sec: dict) -> str | None:
    if not isinstance(sec, dict):
        return None
    if "error" in sec:
        return f"| `{name}` | ERROR | {sec['error'][:60]} |"
    if "skipped" in sec:
        return f"| `{name}` | skipped | {sec['skipped'][:60]} |"
    if "value" not in sec:
        return None
    return f"| `{name}` | {sec['value']} | {sec.get('unit', '')} |"


def render_bench_lines(bench_path: Path | None = None) -> list[str]:
    if bench_path is None:
        bench_name, bench = newest_bench()
    else:
        bench_name, bench = bench_path.name, load_bench(bench_path)
    lines = [
        f"**Official driver record — `{bench_name}` (last complete line):**",
        "",
        f"- **{bench['value']} {bench['unit']}** "
        f"(vs_baseline {bench.get('vs_baseline', '—')}, "
        f"MFU {bench.get('mfu', '—')}, chip {bench.get('chip', '—')})",
        "",
        "| section | value | unit |",
        "|---|---|---|",
    ]
    for name, sec in bench.get("extra", {}).items():
        row = fmt_extra(name, sec)
        if row:
            lines.append(row)
    return lines


def render_parity_lines() -> list[str]:
    parity = json.loads((ROOT / "docs/parity/measured.json").read_text())
    lines = [
        "**Parity vs the PyTorch reference — `docs/parity/measured.json`",
        "(refreshed by the parity tests on every run; values drift ~1-2 dB",
        "run-to-run, so the drift test checks these within tolerance):**",
        "",
        "| metric | value | unit | measured |",
        "|---|---|---|---|",
    ]
    for name, rec in sorted(parity.items()):
        lines.append(
            f"| `{name}` | {rec['value']} | {rec['unit']} | {rec['at']} |"
        )
    return lines


def render() -> str:
    return "\n".join(
        [BEGIN, ""] + render_bench_lines() + [""]
        + render_parity_lines() + ["", END]
    )


def main() -> int:
    check = "--check" in sys.argv
    readme = ROOT / "README.md"
    text = readme.read_text()
    pattern = re.compile(
        re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL
    )
    block = render()
    if not pattern.search(text):
        raise SystemExit(
            f"README.md has no {BEGIN.split(' ')[0]}…END markers"
        )
    new_text = pattern.sub(lambda _: block, text)
    if check:
        if new_text != text:
            print("README measured block is STALE — run "
                  "python tools/docs/render_measured.py", file=sys.stderr)
            return 1
        print("README measured block is current")
        return 0
    if new_text != text:
        readme.write_text(new_text)
        print("README measured block rewritten")
    else:
        print("README measured block already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
