"""Execute every ```python block in docs/superoperator_representations.md.

The document states ~60 assertions (derivation checks, worked examples,
round trips); all blocks run top-to-bottom in one shared namespace, so the
doc IS a test: any identity that stops holding fails here.
"""
import pathlib
import re

DOC = pathlib.Path(__file__).parent.parent / "docs" / \
    "superoperator_representations.md"


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_doc_exists_and_has_snippets():
    blocks = _python_blocks(DOC.read_text())
    assert len(blocks) >= 10
    assert sum(b.count("assert") for b in blocks) >= 40


def test_all_doc_snippets_execute():
    blocks = _python_blocks(DOC.read_text())
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{DOC.name}[block {i}]", "exec"), ns)
        except Exception as e:  # noqa: BLE001 - show which block failed
            raise AssertionError(
                f"doc snippet {i} failed: {e}\n--- block ---\n{block}") from e
