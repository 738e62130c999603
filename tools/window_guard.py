"""Machine check for the SCALE.md §21 shared-component rule.

The rule (born from the r8→r9 pushFilters incident): when a round
changes a component with multiple dependent queries, EVERY dependent
must ride that same round's 50-query driver window — a dependent's
old green row says nothing about the changed code. Until round 12 this
was a workflow checklist applied by hand (and by-hand is how the r11
ledger miscount happened); this tool makes it a gate:

    python tools/window_guard.py          # exit 0 clean / 1 violation
                                          #      2 setup (stale depmap)

1. BASE = the driver's last round-close commit (subject ``round N: …``).
2. Diff BASE → worktree, restricted to package modules +
   ``__spark_entry__.py`` (tests/tools/docs never change query results).
3. Classify each changed module per TOP-LEVEL symbol on
   docstring-stripped ASTs (comments and docstrings are invisible —
   a prose-only edit is NOT a change):
   - changed/added/removed functions & classes → changed symbols;
   - changed/added/removed assignments & imports → attributed to the
     top-level functions whose AST (body or decorators — oracle-SQL
     constants live in decorators) references the bound name — closed
     transitively over derived module-level binds (``Y = X + 1``
     implicates referencers of Y when X changed; r12 advice) — in the
     same module AND in any package module importing that name;
   - any other module-level statement diff → the whole module is
     conservatively "changed" (every query touching any of its
     symbols is implicated).
4. Map changed symbols → queries through DEPMAP.json (the dynamic
   per-query trace from tools/depmap.py; fails closed if its key set
   no longer matches the registry).
5. Every implicated query must be in the current window (the 50-query
   prefix of ``__spark_entry__.queries()`` the driver verifies).

``__spark_entry__.py`` is special-cased: it is the export shim that
runs OUTSIDE the per-query trace, so a material change to it
implicates every query (conservative; it is three re-export
functions, material changes there are governance-level and rare).
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50  # the driver verifies a 50-query prefix per round
PKG = "etl_geotab_spark"
ENTRY = "__spark_entry__.py"
DEPMAP_PATH = os.path.join(REPO, "DEPMAP.json")  # patchable in tests


# ---------------------------------------------------------------- AST


def _strip_docstrings(node: ast.AST) -> None:
    for n in ast.walk(node):
        if isinstance(
            n, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ) and n.body:
            first = n.body[0]
            if (
                isinstance(first, ast.Expr)
                and isinstance(first.value, ast.Constant)
                and isinstance(first.value.value, str)
            ):
                n.body = n.body[1:] or [ast.Pass()]


def _dump(node: ast.AST) -> str:
    return ast.dump(node, include_attributes=False)


_DEFS = (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)


def _assign_names(stmt: ast.stmt) -> list[str]:
    """Top-level names a statement binds (assignments + imports)."""
    names: list[str] = []
    if isinstance(stmt, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
        targets = stmt.targets if isinstance(stmt, ast.Assign) else [stmt.target]
        for t in targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    names.append(n.id)
    elif isinstance(stmt, ast.Import):
        names.extend((a.asname or a.name.split(".")[0]) for a in stmt.names)
    elif isinstance(stmt, ast.ImportFrom):
        names.extend((a.asname or a.name) for a in stmt.names)
    return names


def _toplevel(src: str) -> tuple[dict[str, str], dict[str, list[str]], Counter]:
    """(defs: name→dump, binds: name→[dumps], other: Counter of dumps),
    all on the docstring-stripped tree."""
    tree = ast.parse(src)
    _strip_docstrings(tree)
    defs: dict[str, str] = {}
    binds: dict[str, list[str]] = {}
    other: Counter = Counter()
    for stmt in tree.body:
        if isinstance(stmt, _DEFS):
            defs[stmt.name] = _dump(stmt)
        else:
            names = _assign_names(stmt)
            if names:
                d = _dump(stmt)
                for n in names:
                    binds.setdefault(n, []).append(d)
            else:
                other[_dump(stmt)] += 1
    return defs, binds, other


def classify_module_change(
    base_src: str | None, cur_src: str | None
) -> tuple[set[str], set[str], bool]:
    """→ (changed top-level def names, changed bound names,
    other-module-level-statements-changed)."""
    b_defs, b_binds, b_other = _toplevel(base_src) if base_src else ({}, {}, Counter())
    c_defs, c_binds, c_other = _toplevel(cur_src) if cur_src else ({}, {}, Counter())
    changed_defs = {
        n
        for n in set(b_defs) | set(c_defs)
        if b_defs.get(n) != c_defs.get(n)
    }
    changed_binds = {
        n
        for n in set(b_binds) | set(c_binds)
        if b_binds.get(n) != c_binds.get(n)
    }
    return changed_defs, changed_binds, b_other != c_other


def _propagate_binds(src: str, names: set[str]) -> set[str]:
    """Close ``names`` over module-level assignments that reference
    them: if X changed and the module has ``Y = X + 1``, then Y is
    changed too, and so is anything derived from Y (fixed point).
    Without this, a def referencing only the DERIVED constant would
    escape implication — the r12 advice's silent under-implication
    class in a fail-closed gate. Defs and imports are not re-bound
    here: changed defs are attributed directly by the classifier, and
    an import's dump can't change when only another module changed
    (cross-module flow is handled by the importer scan)."""
    tree = ast.parse(src)
    out = set(names)
    changed = True
    while changed:
        changed = False
        for stmt in tree.body:
            if not isinstance(stmt, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
                continue
            bound = set(_assign_names(stmt))
            if bound <= out:
                continue
            value = stmt.value
            if value is None:  # annotation-only AnnAssign
                continue
            refs = {
                n.id for n in ast.walk(value) if isinstance(n, ast.Name)
            }
            if isinstance(stmt, ast.AugAssign):
                refs |= bound  # Y += ... reads Y itself
            if refs & out:
                out |= bound
                changed = True
    return out


def _referencing_defs(src: str, names: set[str]) -> set[str]:
    """Top-level defs whose subtree (incl. decorators) references any
    of ``names``."""
    if not names:
        return set()
    tree = ast.parse(src)
    out: set[str] = set()
    for stmt in tree.body:
        if isinstance(stmt, _DEFS):
            for n in ast.walk(stmt):
                if isinstance(n, ast.Name) and n.id in names:
                    out.add(stmt.name)
                    break
    return out


def _modname(relpath: str) -> str:
    p = relpath[: -len(".py")]
    if p.endswith("/__init__"):
        p = p[: -len("/__init__")]
    return p.replace("/", ".")


def _imported_bindings(src: str, importer_mod: str) -> list[tuple[str, str, str]]:
    """(local name, source module name, original name) for every
    from-import in the module; relative imports resolved against the
    importer's package."""
    tree = ast.parse(src)
    pkg_parts = importer_mod.split(".")[:-1]
    out: list[tuple[str, str, str]] = []
    for stmt in ast.walk(tree):
        if isinstance(stmt, ast.ImportFrom):
            if stmt.level:
                base = pkg_parts[: len(pkg_parts) - (stmt.level - 1)]
                src_mod = ".".join(base + ([stmt.module] if stmt.module else []))
            else:
                src_mod = stmt.module or ""
            for a in stmt.names:
                out.append((a.asname or a.name, src_mod, a.name))
    return out


# --------------------------------------------------------------- git


def _git(*args: str) -> str:
    r = subprocess.run(
        ["git", *args], capture_output=True, text=True, cwd=REPO
    )
    if r.returncode != 0:
        raise RuntimeError(f"git {' '.join(args)}: {r.stderr.strip()}")
    return r.stdout


def round_base_commit() -> str:
    out = _git(
        "log", "-1", "--format=%H", "--extended-regexp",
        "--grep", r"^round [0-9]+:",
    ).strip()
    if not out:
        raise RuntimeError("no driver round-close commit found")
    return out


def changed_package_files(base: str) -> list[str]:
    diff = _git("diff", "--name-only", base).splitlines()
    untracked = _git(
        "ls-files", "--others", "--exclude-standard"
    ).splitlines()
    return sorted(
        p
        for p in set(diff) | set(untracked)
        if p.endswith(".py") and (p.startswith(PKG + "/") or p == ENTRY)
    )


def _src_at(base: str, path: str) -> str | None:
    try:
        return _git("show", f"{base}:{path}")
    except RuntimeError:
        return None


def _src_now(path: str) -> str | None:
    full = os.path.join(REPO, path)
    if not os.path.exists(full):
        return None
    with open(full) as f:
        return f.read()


# -------------------------------------------------------------- main


class StaleDepmap(RuntimeError):
    pass


def compute_implicated(
    base: str | None = None, say=lambda *a: None
) -> tuple[str, dict[str, str], list[str]]:
    """→ (base commit, {implicated query: reason}, registry order).

    The §21 computation without the window comparison — importable by
    tools/freshness.py so the window PROPOSER front-loads mandatory
    pulls instead of only the guard rejecting their absence after the
    fact. Raises StaleDepmap when DEPMAP.json no longer matches the
    registry."""
    base = base or round_base_commit()
    say(f"base: {base[:12]} ({_git('log', '-1', '--format=%s', base).strip()})")

    with open(DEPMAP_PATH) as f:
        depmap_doc = json.load(f)
    depmap: dict[str, list[str]] = depmap_doc["queries"]

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    registry_names = list(entrymod.queries())
    if set(registry_names) != set(depmap):
        raise StaleDepmap(
            "DEPMAP.json is stale: registry/depmap key mismatch "
            f"(+{sorted(set(registry_names) - set(depmap))[:5]} "
            f"-{sorted(set(depmap) - set(registry_names))[:5]}). "
            "Regenerate: python tools/depmap.py"
        )
    # the map must postdate the base: the guard is sound under a
    # same-keys stale map only for edges that existed at generation
    # time — a dependency edge added BEFORE base (thus outside the
    # examined diff) by a depmap generated even earlier would be
    # invisible. Regeneration is ~3 min; fail closed.
    # Soundness: with base an ancestor of gen, every package change the
    # map missed is inside the examined diff (only over-implication is
    # possible). Otherwise the map is still sound iff package content
    # is IDENTICAL at gen and base (no edge could differ) — this is
    # the common round-boundary case, where the driver's round-close
    # commit moves the base past gen while touching only result JSONs.
    dirty = depmap_doc.get("_meta", {}).get("dirty_package_files", [])
    if dirty:
        raise StaleDepmap(
            "DEPMAP.json was generated from a dirty package tree "
            f"({dirty[:5]}) — its generation commit does not reflect "
            "the traced code, so the soundness checks below cannot "
            "reason from it. Commit first, then regenerate: "
            "python tools/depmap.py"
        )
    gen = depmap_doc.get("_meta", {}).get("generated_at_commit", "")
    if gen:
        anc = subprocess.run(
            ["git", "merge-base", "--is-ancestor", base, gen], cwd=REPO
        )
        if anc.returncode != 0:
            try:
                pkg_delta = [
                    p
                    for p in _git(
                        "diff", "--name-only", gen, base
                    ).splitlines()
                    if p.endswith(".py")
                    and (p.startswith(PKG + "/") or p == ENTRY)
                ]
            except RuntimeError:
                pkg_delta = ["<gen commit unknown to this clone>"]
            if pkg_delta:
                raise StaleDepmap(
                    f"DEPMAP.json was generated at {gen[:12]}, which "
                    f"does not descend from the diff base {base[:12]} "
                    f"and package files differ between them "
                    f"({pkg_delta[:5]}) — dependency edges added "
                    "before the base may be missing. Regenerate: "
                    "python tools/depmap.py"
                )

    changed_files = changed_package_files(base)
    say(f"changed package files since base: {changed_files or 'none'}")

    # (path, toplevel symbol) pairs considered changed
    changed_syms: set[tuple[str, str]] = set()
    conservative_files: set[str] = set()
    entry_material = False

    all_pkg_files = [
        os.path.join(dp, fn)[len(REPO) + 1:]
        for dp, _, fns in os.walk(os.path.join(REPO, PKG))
        for fn in fns
        if fn.endswith(".py")
    ]

    for path in changed_files:
        b_src, c_src = _src_at(base, path), _src_now(path)
        defs, binds, other = classify_module_change(b_src, c_src)
        if path == ENTRY:
            if defs or binds or other:
                entry_material = True
                say(f"  {path}: MATERIAL (export shim) → all queries")
            else:
                say(f"  {path}: docstring/comment-only")
            continue
        if other:
            conservative_files.add(path)
            say(f"  {path}: module-level statement diff → whole module")
        # attribute changed bound names to referencing defs, here and
        # in any package module importing them; close over derived
        # module-level binds first (Y = X + 1 patterns) on both sides
        if binds and c_src:
            binds = _propagate_binds(c_src, binds)
            defs |= _referencing_defs(c_src, binds)
            mod = _modname(path)
            for other_path in all_pkg_files:
                if other_path == path:
                    continue
                o_src = _src_now(other_path)
                if o_src is None:
                    continue
                local = {
                    loc
                    for loc, src_mod, orig in _imported_bindings(
                        o_src, _modname(other_path)
                    )
                    if src_mod == mod and orig in binds
                }
                if local:
                    local = _propagate_binds(o_src, local)
                for d in _referencing_defs(o_src, local):
                    changed_syms.add((other_path, d))
        for d in defs:
            changed_syms.add((path, d))
        if not (defs or binds or other):
            say(f"  {path}: docstring/comment-only")
        elif defs or binds:
            say(
                f"  {path}: changed symbols "
                f"{sorted(d for p, d in changed_syms if p == path)}"
            )

    implicated: dict[str, str] = {}
    if entry_material:
        for q in registry_names:
            implicated[q] = f"{ENTRY} changed (export shim)"
    for q, deps in depmap.items():
        for dep in deps:
            path, _, sym = dep.partition("::")
            if (path, sym) in changed_syms:
                implicated.setdefault(q, f"depends on changed {dep}")
            elif path in conservative_files:
                implicated.setdefault(
                    q, f"touches {path} (module-level statement diff)"
                )
    return base, implicated, registry_names


def run_guard(base: str | None = None, verbose: bool = True) -> int:
    def say(*a):
        if verbose:
            print(*a)

    try:
        base, implicated, registry_names = compute_implicated(base, say)
    except StaleDepmap as ex:
        say(str(ex))
        return 2
    window = set(registry_names[:WINDOW_SIZE])
    violations = sorted(set(implicated) - window)
    say(
        f"implicated queries: {len(implicated)}; "
        f"window covers {len(set(implicated) & window)}"
    )
    if violations:
        say("§21 VIOLATION — implicated queries NOT in this round's window:")
        for q in violations:
            say(f"  {q}: {implicated[q]}")
        return 1
    say("window guard: clean")
    return 0


if __name__ == "__main__":
    sys.exit(run_guard(base=sys.argv[1] if len(sys.argv) > 1 else None))
