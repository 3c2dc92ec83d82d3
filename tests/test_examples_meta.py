"""Static checks of the example surface: scripts and the demo notebook
parse, and the notebook's code cells reference only real APIs. (The
scripts/notebook are executed end-to-end by the verify recipe; CI keeps
to syntax + import-surface checks for speed.)"""

import ast
import json
import pathlib

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def test_example_scripts_parse():
    scripts = sorted(EXAMPLES.glob("*.py"))
    assert len(scripts) >= 5
    for path in scripts:
        ast.parse(path.read_text(), filename=str(path))


def test_main_demo_notebook_valid():
    nb = json.loads((EXAMPLES / "0_main_demo.ipynb").read_text())
    assert nb["nbformat"] == 4
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 8
    for i, cell in enumerate(code_cells):
        src = "".join(cell["source"])
        compile(src, f"0_main_demo cell {i}", "exec")


def test_main_demo_notebook_imports_resolve():
    """Every `from autompc_tpu... import X` in the notebook resolves."""
    import importlib

    nb = json.loads((EXAMPLES / "0_main_demo.ipynb").read_text())
    src = "\n".join(
        "".join(c["source"]) for c in nb["cells"]
        if c["cell_type"] == "code"
    )
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith("autompc_tpu")
        ):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                assert hasattr(mod, alias.name), (
                    f"{node.module}.{alias.name} missing"
                )
