#!/usr/bin/env python
"""Repo-local lint + format gate, runnable offline (no ruff/black needed).

The reference CI enforces ``black --check`` + full ruff
(``/root/reference/.github/workflows/python.yaml:20-23``).  This repo's
equivalent is a deterministic, self-contained gate that runs identically in
CI and on dev boxes with no tool downloads:

- line length <= 88 (black's width, the reference's gate; URLs exempt),
- no tabs, no trailing whitespace, newline at EOF,
- unused imports (AST-based, pyflakes-F401-style; ``__init__.py``
  re-exports and ``__future__`` imports exempt).

Exit code 0 iff clean.  Usage: ``python scripts/lint.py [paths...]``.
"""

import ast
import sys
from pathlib import Path

MAX_LEN = 88
DEFAULT_PATHS = ["scamlgp_tpu", "tests", "scripts", "bench.py",
                 "__graft_entry__.py"]


def iter_py_files(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the root of dotted access: np.foo -> np
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    # names referenced in string annotations / __all__
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)
                and isinstance(node.value, (ast.List, ast.Tuple))):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value,
                                                                str):
                    used.add(elt.value)
    return used


def check_unused_imports(path, tree, noqa_lines):
    if path.name == "__init__.py":
        return []
    used = _used_names(tree)
    problems = []
    for node in ast.walk(tree):
        if getattr(node, "lineno", None) in noqa_lines:
            continue
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = alias.asname or alias.name.split(".")[0]
                if name not in used:
                    problems.append((node.lineno,
                                     f"unused import '{alias.name}'"))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = alias.asname or alias.name
                if name not in used:
                    problems.append((node.lineno,
                                     f"unused import '{alias.name}'"))
    return problems


def check_file(path):
    problems = []
    text = path.read_text(encoding="utf-8")
    if text and not text.endswith("\n"):
        problems.append((len(text.splitlines()), "no newline at EOF"))
    noqa_lines = {i for i, line in enumerate(text.splitlines(), 1)
                  if "# noqa" in line}
    for i, line in enumerate(text.splitlines(), 1):
        if i in noqa_lines:
            continue
        if "\t" in line:
            problems.append((i, "tab character"))
        if line != line.rstrip():
            problems.append((i, "trailing whitespace"))
        if len(line) > MAX_LEN and "://" not in line:
            problems.append((i, f"line too long ({len(line)} > {MAX_LEN})"))
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as exc:
        problems.append((exc.lineno or 0, f"syntax error: {exc.msg}"))
        return problems
    problems.extend(check_unused_imports(path, tree, noqa_lines))
    return problems


def main(argv):
    paths = argv[1:] or DEFAULT_PATHS
    n = 0
    for f in iter_py_files(paths):
        for lineno, msg in sorted(check_file(f)):
            print(f"{f}:{lineno}: {msg}")
            n += 1
    if n:
        print(f"\n{n} problem(s)")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
