"""Golden e2e conformance: all 17 reference scenarios, byte-identical output.

Fixture data (args.json/input/output per scenario) is ported verbatim from
the reference's test corpus (reference: tests/scenarios/, harness contract
tests/e2e.rs:15-74). Our engine must reproduce `output` exactly given
`args.json` + `input`.
"""

import json
from pathlib import Path

import pytest

from pq_spark import run_cli

GOLDEN_DIR = Path(__file__).parent / "golden"
SCENARIOS = sorted(p.name for p in GOLDEN_DIR.iterdir() if (p / "args.json").exists())


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_golden(spark, scenario):
    d = GOLDEN_DIR / scenario
    argv = json.loads((d / "args.json").read_text())
    input_lines = (d / "input").read_bytes().decode().splitlines()
    expected = (d / "output").read_bytes()

    actual = run_cli(spark, argv, input_lines)
    assert actual == expected, (
        f"{scenario}: output mismatch\n--- expected ---\n"
        f"{expected.decode()}\n--- actual ---\n{actual.decode()}"
    )
