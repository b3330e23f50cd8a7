"""Static checks, self-contained.

The reference treats flake8 + mypy as part of its test strategy
(reference setup.cfg:30-60); neither tool ships in this image, so this
test enforces the highest-value subset with the stdlib: every file must
parse, no unused imports, no wildcard imports, max line length 120
(the reference's flake8 limit), no tabs in indentation.  pyproject.toml
carries matching [tool.ruff]/[tool.mypy] sections for environments that
have the real tools.
"""
import ast
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
MAX_LINE = 120

FILES = sorted(
    p for d in ("deepclr_tpu", "scripts", "tests")
    for p in (REPO / d).rglob("*.py")
)
FILES += [REPO / "bench.py", REPO / "__graft_entry__.py"]


def _imported_names(node):
    if isinstance(node, ast.Import):
        for a in node.names:
            yield (a.asname or a.name.split(".")[0]), a
    elif isinstance(node, ast.ImportFrom) and node.module != "__future__":
        for a in node.names:
            if a.name != "*":
                yield (a.asname or a.name), a


@pytest.mark.parametrize("path", FILES, ids=lambda p: str(p.relative_to(REPO)))
def test_static(path):
    src = path.read_text()
    tree = ast.parse(src, filename=str(path))  # must parse

    problems = []

    for lineno, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE:
            problems.append(f"{lineno}: line too long ({len(line)} > {MAX_LINE})")
        if line[:1] == "\t" or line.lstrip(" ")[:1] == "\t":
            problems.append(f"{lineno}: tab in indentation")

    # collect names used anywhere (incl. attribute roots and string
    # annotations are ignored — conservative: only flag imports whose name
    # never appears as a load anywhere in the module source)
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # roots are Names, already collected

    module_body_imports = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and any(
            a.name == "*" for a in node.names
        ):
            problems.append(f"{node.lineno}: wildcard import")
        module_body_imports.extend(
            (name, node.lineno) for name, _ in _imported_names(node)
            if isinstance(node, (ast.Import, ast.ImportFrom))
        )

    # names exported via __all__ or re-exported in package __init__ count
    exported = set()
    for node in tree.body:
        if (isinstance(node, ast.Assign)
                and any(getattr(t, "id", None) == "__all__"
                        for t in node.targets)
                and isinstance(node.value, (ast.List, ast.Tuple))):
            exported |= {
                e.value for e in node.value.elts
                if isinstance(e, ast.Constant) and isinstance(e.value, str)
            }
    is_init = path.name == "__init__.py"

    for name, lineno in module_body_imports:
        if name in used or name in exported or is_init:
            continue
        problems.append(f"{lineno}: unused import '{name}'")

    if problems:
        listing = "\n".join(problems)
        pytest.fail(f"{path.relative_to(REPO)}:\n{listing}", pytrace=False)


def test_all_modules_compile():
    for path in FILES:
        compile(path.read_text(), str(path), "exec")


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
