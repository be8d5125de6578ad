#!/usr/bin/env python
"""Minimal import linter (no flake8 in the environment): reports
unused imports across the package via AST analysis."""

import ast
import os
import sys


def check(path: str) -> int:
    issues = 0
    source = open(path).read()
    lines = source.split("\n")
    tree = ast.parse(source)
    imported = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name != "*":
                    imported[alias.asname or alias.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    for name, line in sorted(imported.items(), key=lambda kv: kv[1]):
        if name not in used and "noqa" not in lines[line - 1]:
            print(f"{path}:{line}: unused import '{name}'")
            issues += 1
    return issues


def main(roots):
    total = 0
    for root_dir in roots:
        for root, dirs, files in os.walk(root_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if name.endswith(".py") and name != "__init__.py":
                    total += check(os.path.join(root, name))
    print(f"{total} issue(s)")
    return 1 if total else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:] or
                          ["fourier_feature_nets_tpu", "tests"]))
