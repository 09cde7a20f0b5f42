"""Name-level API parity check against the reference surface.

Walks every reference module's top-level public function definitions
(AST — the reference is never imported or executed) and asserts each
name resolves on the corresponding ``aws_data_wrangler_spark`` module.
Zero missing names = a user of the reference can call the same
functions here.

Usage: python tools/parity_check.py [reference_root]
Exit code 0 iff nothing is missing.
"""

from __future__ import annotations

import ast
import glob
import os
import sys

sys.path.insert(0, ".")

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/awswrangler"
MODULES = ["s3", "catalog", "athena", "db", "cloudwatch", "emr", "sts", "quicksight"]


def public_names(module_name: str) -> set:
    if os.path.isdir(os.path.join(REF, module_name)):
        files = glob.glob(os.path.join(REF, module_name, "*.py"))
    elif os.path.exists(os.path.join(REF, module_name + ".py")):
        files = [os.path.join(REF, module_name + ".py")]
    else:
        return set()
    names = set()
    for path in files:
        with open(path) as fh:
            tree = ast.parse(fh.read())
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if not node.name.startswith("_"):
                    names.add(node.name)
    return names


def main() -> int:
    import aws_data_wrangler_spark as sg

    total = 0
    missing = []
    for module_name in MODULES:
        names = public_names(module_name)
        total += len(names)
        ours = getattr(sg, module_name)
        missing += [
            f"{module_name}.{n}" for n in sorted(names) if not hasattr(ours, n)
        ]
        print(f"{module_name}: {len(names)} public names")
    print(f"total {total}; missing: {missing or 'NONE'}")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
