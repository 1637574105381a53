"""Execute the narrative example notebooks end-to-end (reference analog:
test_example_notebooks.py running docs/examples/*.ipynb via nbval)."""
import pathlib

import pytest

NB_DIR = pathlib.Path(__file__).parent.parent / "examples" / "notebooks"
NOTEBOOKS = sorted(NB_DIR.glob("*.ipynb"))


def test_notebooks_exist():
    assert len(NOTEBOOKS) >= 3


@pytest.mark.slow
@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(path):
    nbformat = pytest.importorskip("nbformat")
    nbclient = pytest.importorskip("nbclient")
    nb = nbformat.read(path, as_version=4)
    client = nbclient.NotebookClient(nb, timeout=900,
                                     kernel_name="python3",
                                     resources={"metadata": {
                                         "path": str(NB_DIR)}})
    client.execute()  # raises CellExecutionError on any failing cell
