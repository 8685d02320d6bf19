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


def _check_scenario(spark, scenario):
    d = GOLDEN_DIR / scenario
    argv = json.loads((d / "args.json").read_text())
    input_lines = (d / "input").read_bytes().decode().splitlines()
    expected = (d / "output").read_bytes()

    actual = run_cli(spark, argv, input_lines)
    assert actual == expected, (
        f"{scenario}: output mismatch\n--- expected ---\n"
        f"{expected.decode()}\n--- actual ---\n{actual.decode()}"
    )


# chunked + thread-pooled: each scenario is an independent program whose
# wall time is job latency; a failing chunk names every failing scenario
_CHUNK = 7
_CHUNKS = [SCENARIOS[i:i + _CHUNK] for i in range(0, len(SCENARIOS), _CHUNK)]


@pytest.mark.parametrize(
    "chunk", range(len(_CHUNKS)),
    ids=[f"{i}-{c[0]}..{c[-1]}" for i, c in enumerate(_CHUNKS)])
def test_golden(spark, chunk):
    import traceback
    from concurrent.futures import ThreadPoolExecutor

    def run(scenario):
        try:
            _check_scenario(spark, scenario)
            return None
        except Exception:
            return f"--- {scenario} ---\n{traceback.format_exc(limit=4)}"

    with ThreadPoolExecutor(max_workers=7) as ex:
        failures = [f for f in ex.map(run, _CHUNKS[chunk]) if f]
    assert not failures, "\n".join(failures)
