#!/usr/bin/env python
"""Call-graph crossing-set analyzer for the driver-window rotation.

The rotation rule (CLAUDE.md; the r10 lesson): changing ANY code a
frozen registry entry crosses makes that entry next-round changed-code
— and the crossing set must be computed from the CALL GRAPH, not from
the rows named in the diff (r10: a cache fix to ngram_jaccard_pairs
silently made dedup_clusters a 51st changed-code row and had to be
reverted). This tool automates that derivation:

    python tools/crossing_set.py --funcs temperature_sample,_bcol
    python tools/crossing_set.py HEAD~3..HEAD
    python tools/crossing_set.py            # working tree vs HEAD

It builds a NAME-LEVEL reference graph over the package by AST walk —
every function/method and module-level constant is a node; a function
references a node if its body mentions the node's name (bare ``Name``
or ``Attribute`` tail) — then maps each registry row (the QUERIES and
ORACLES dict entries, span-attributed per KEY so an edit to one
oracle's SQL literal maps to that row only) to its transitive
reference closure, and reports every row whose closure intersects the
changed-name set.

Design bias: OVER-approximate, never miss. Same-named definitions in
different modules merge into one node (a false crossing costs a window
slot; a missed crossing costs a revert). Known blind spots, reviewed
manually when they apply: string-based dispatch (getattr/importlib),
SQL fragments assembled outside the two registry dicts, and
deleted-only hunks (attributed to the enclosing post-image span via
the hunk's new-file position).
"""

from __future__ import annotations

import ast
import subprocess
import sys
from pathlib import Path
from typing import Dict, List, Set, Tuple

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "aws_data_wrangler_spark"
EXTRA = [REPO / "__spark_entry__.py"]
REGISTRY_DICTS = {
    # file -> dict names whose entries get per-KEY spans (so an edit
    # inside one row's value literal maps to that row alone).
    # ANALYTICS_SQL is spliced into ORACLES via ** and referenced by
    # the analytics query builders — its keys are row names too.
    str(PKG / "plans" / "queries.py"): ("QUERIES", "ANALYTICS_SQL"),
    str(PKG / "plans" / "oracles.py"): ("ORACLES",),
}


def _sources() -> List[Path]:
    return sorted(PKG.rglob("*.py")) + [p for p in EXTRA if p.exists()]


def _refs_of(node: ast.AST) -> Set[str]:
    """External names referenced under ``node``: bare ``Name`` loads and
    attribute tails, MINUS names the node binds locally (parameters,
    assignment/for/with/except/comprehension targets, import aliases).
    Without the local-binding exclusion a local variable named like an
    unrelated global (observed: an athena cache variable ``entry``
    colliding with ``__spark_entry__.entry``, which references the
    whole registry) welds the graph into one hub and every row crosses
    everything. Names of NESTED function/class defs stay included —
    the parent genuinely references them."""
    out: Set[str] = set()
    bound: Set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            if isinstance(sub.ctx, (ast.Store, ast.Del)):
                bound.add(sub.id)
            else:
                out.add(sub.id)
        elif isinstance(sub, ast.Attribute):
            out.add(sub.attr)
        elif isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if sub is not node:
                out.add(sub.name)
            a = sub.args
            for arg in (
                a.posonlyargs + a.args + a.kwonlyargs
                + ([a.vararg] if a.vararg else [])
                + ([a.kwarg] if a.kwarg else [])
            ):
                bound.add(arg.arg)
        elif isinstance(sub, ast.Lambda):
            a = sub.args
            for arg in (
                a.posonlyargs + a.args + a.kwonlyargs
                + ([a.vararg] if a.vararg else [])
                + ([a.kwarg] if a.kwarg else [])
            ):
                bound.add(arg.arg)
        elif isinstance(sub, ast.ExceptHandler) and sub.name:
            bound.add(sub.name)
        elif isinstance(sub, ast.ImportFrom):
            # `from mod import f` REFERENCES definition f (the edge
            # cross-module calls ride on); the local alias must NOT be
            # excluded or every from-import edge disappears
            for alias in sub.names:
                out.add(alias.name)
        elif isinstance(sub, (ast.Global, ast.Nonlocal)):
            # a `global X` declaration makes every X in this function a
            # MODULE-level reference — including a store-only X, whose
            # ast.Name nodes all carry Store ctx and would otherwise
            # land only in `bound` (ADVICE r12: the edge to the module
            # constant must exist, or an edit to it reads as
            # window-free — an under-approximation)
            out.update(sub.names)
    return out - (bound - out_protect(node))


def out_protect(node: ast.AST) -> Set[str]:
    """Names that must survive the local-binding exclusion: imported
    names, nested def names (collected again here because ``bound``
    may also contain them via unrelated Store contexts), and
    ``global``/``nonlocal``-declared names (ADVICE r12: an assignment
    under a ``global`` declaration is a Store on a MODULE-level name —
    subtracting it would drop the function's edge to that module
    constant, an under-approximation violating the tool's
    over-approximate-never-miss bias)."""
    keep: Set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.ImportFrom):
            for alias in sub.names:
                keep.add(alias.name)
        elif isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if sub is not node:
                keep.add(sub.name)
        elif isinstance(sub, (ast.Global, ast.Nonlocal)):
            keep.update(sub.names)
    return keep


class _Index:
    """name -> referenced names; file spans -> node names; registry rows."""

    def __init__(self) -> None:
        self.graph: Dict[str, Set[str]] = {}
        self.defined: Set[str] = set()
        # per file: sorted (start, end, node_name); innermost span wins
        self.spans: Dict[str, List[Tuple[int, int, str]]] = {}
        # row name -> root reference names (query + oracle value exprs)
        self.rows: Dict[str, Set[str]] = {}
        # keys of the QUERIES dict — the registry's row universe
        # (ANALYTICS_SQL also carries keys for RETIRED rows whose SQL
        # is kept for bench shims; they get diff-attribution spans but
        # must not count as registry rows)
        self.query_rows: Set[str] = set()

    def add_edge(self, name: str, refs: Set[str]) -> None:
        self.graph.setdefault(name, set()).update(refs - {name})
        self.defined.add(name)

    def add_span(self, path: str, node: ast.AST, name: str) -> None:
        end = getattr(node, "end_lineno", node.lineno)
        self.spans.setdefault(path, []).append((node.lineno, end, name))

    def node_at(self, path: str, line: int) -> str | None:
        best = None
        for start, end, name in self.spans.get(path, []):
            if start <= line <= end:
                if best is None or (end - start) < (best[1] - best[0]):
                    best = (start, end, name)
        return best[2] if best else None


def build_index() -> _Index:
    idx = _Index()
    for path in _sources():
        tree = ast.parse(path.read_text())
        spath = str(path)
        # every def (incl. methods and nested defs) is a node; but only
        # MODULE/CLASS-level assignments are constant nodes — walking
        # function-local assigns registered tiny common names (`a`,
        # `col`, `entry`, `queries`) as global nodes and welded the
        # graph into one hub through name collisions (observed r12)
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                idx.add_edge(node.name, _refs_of(node))
                idx.add_span(spath, node, node.name)
        top_level = list(tree.body) + [
            stmt
            for node in tree.body
            if isinstance(node, ast.ClassDef)
            for stmt in node.body
        ]
        for node in top_level:
            if isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        idx.add_edge(tgt.id, _refs_of(node.value))
                        idx.add_span(spath, node, tgt.id)
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                if node.value is not None:
                    idx.add_edge(node.target.id, _refs_of(node.value))
                idx.add_span(spath, node, node.target.id)
        # registry dicts: re-span each entry per KEY so a one-row edit
        # (e.g. one oracle's SQL literal) maps to that row, not to the
        # whole dict constant
        dict_names = REGISTRY_DICTS.get(spath, ())
        if dict_names:
            for node in tree.body:
                tgt = None
                if isinstance(node, ast.Assign) and isinstance(
                    node.targets[0], ast.Name
                ):
                    tgt = node.targets[0].id
                elif isinstance(node, ast.AnnAssign) and isinstance(
                    node.target, ast.Name
                ):
                    tgt = node.target.id
                if tgt not in dict_names or not isinstance(
                    getattr(node, "value", None), ast.Dict
                ):
                    continue
                for key, value in zip(node.value.keys, node.value.values):
                    if not (isinstance(key, ast.Constant) and isinstance(key.value, str)):
                        continue
                    row = key.value
                    if tgt == "QUERIES":
                        idx.query_rows.add(row)
                    roots = idx.rows.setdefault(row, set())
                    roots.update(_refs_of(value))
                    # the row's own dict-entry span (key line .. value end)
                    class _Span:
                        lineno = key.lineno
                        end_lineno = getattr(value, "end_lineno", value.lineno)
                    idx.add_span(spath, _Span, f"row:{row}")
                    roots.add(f"row:{row}")
    # registry rows are exactly the QUERIES keys; ANALYTICS_SQL-only
    # keys (retired rows' kept SQL) keep their spans for diff
    # attribution but are not rows
    idx.rows = {k: v for k, v in idx.rows.items() if k in idx.query_rows}
    return idx


def closure(idx: _Index, roots: Set[str]) -> Set[str]:
    seen: Set[str] = set()
    frontier = [r for r in roots if r in idx.graph or r.startswith("row:")]
    while frontier:
        name = frontier.pop()
        if name in seen:
            continue
        seen.add(name)
        for ref in idx.graph.get(name, ()):  # only names we define
            if ref in idx.graph and ref not in seen:
                frontier.append(ref)
    return seen


def crossing_rows(idx: _Index, changed: Set[str]) -> Dict[str, Set[str]]:
    """row -> the changed names that pull it in (empty result = free)."""
    out: Dict[str, Set[str]] = {}
    for row, roots in idx.rows.items():
        hit = closure(idx, roots) & changed
        if hit:
            out[row] = hit
    return out


def changed_names_from_git(range_: str | None) -> Set[str]:
    idx = build_index()
    args = ["git", "-C", str(REPO), "diff", "--unified=0"]
    if range_:
        args.append(range_)
    args += ["--", "*.py"]
    diff = subprocess.run(args, capture_output=True, text=True, check=True).stdout
    changed: Set[str] = set()
    path = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            path = str(REPO / line[6:])
        elif line.startswith("@@") and path is not None:
            # @@ -a,b +c,d @@ — new-file lines c..c+max(d,1)-1
            new = line.split("+")[1].split(" ")[0]
            start, _, count = new.partition(",")
            start_i = int(start)
            count_i = int(count) if count else 1
            for ln in range(start_i, start_i + max(count_i, 1)):
                name = idx.node_at(path, ln)
                if name:
                    changed.add(name)
    return changed


def main(argv: List[str]) -> int:
    funcs: Set[str] = set()
    range_ = None
    args = argv[1:]
    while args:
        a = args.pop(0)
        if a == "--funcs":
            funcs.update(x for x in args.pop(0).split(",") if x)
        else:
            range_ = a
    idx = build_index()
    if not funcs:
        funcs = changed_names_from_git(range_)
        print(f"# changed nodes ({'working tree vs HEAD' if not range_ else range_}):")
        for name in sorted(funcs):
            print(f"#   {name}")
    unknown = {f for f in funcs if f not in idx.graph and not f.startswith("row:")}
    for name in sorted(unknown):
        print(f"# WARNING: {name!r} is not a known definition — ignored")
    hits = crossing_rows(idx, funcs)
    if not hits:
        print("crossing rows: NONE (window-free change)")
        return 0
    # a row pulled in ONLY by its own registry-dict span (row:<name>)
    # had its query/oracle text touched but no shared code — report the
    # two classes separately (a registry reorder touches every span)
    code = {r: h - {f"row:{r}"} for r, h in hits.items() if h - {f"row:{r}"}}
    text_only = sorted(set(hits) - set(code))
    print(f"code-crossing rows ({len(code)}):")
    for row in sorted(code):
        print(f"  {row}  <- {', '.join(sorted(code[row]))}")
    if text_only:
        print(f"registry-text-only rows ({len(text_only)}):")
        for row in text_only:
            print(f"  {row}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
