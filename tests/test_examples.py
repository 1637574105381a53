"""Smoke-run every example script end-to-end (reference parity:
forest/benchmarking/tests/test_example_notebooks.py runs each notebook).

Each script is executed in-process on the cpu backend (conftest configures
cpu + x64) with stdout captured; a script raising is a failure.
"""
import contextlib
import io
import pathlib

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).parent.parent / "examples"
SCRIPTS = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))


def test_examples_inventory():
    # all reference example-notebook topics have a runnable script
    assert len(SCRIPTS) >= 13, SCRIPTS


@pytest.mark.slow
@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    src = (EXAMPLES_DIR / script).read_text()
    buf = io.StringIO()
    ns = {"__name__": "__main__", "__file__": str(EXAMPLES_DIR / script)}
    with contextlib.redirect_stdout(buf):
        exec(compile(src, script, "exec"), ns)  # noqa: S102 - our own scripts
    assert buf.getvalue().strip(), f"{script} produced no output"
