"""§16 bounding-rule lint (SCALE.md): find literal modulo-stride
sampling in the engine source.

The scale-bug class that recurred FOUR times across rounds 4-7
(semdedup fixed 16-cell bucketing, contrastive_pairs proportional
anchor stride, contamination_overlap corpus-proportional bench grams,
lsh/ivf probe sides — each cost a 10× stress failure): a filter like
``col % <literal> == 0`` selects n/<literal> rows, i.e. a sample
PROPORTIONAL to the corpus. Feed that sample into any pairwise stage
(broadcast scoring, self-join, bucketed candidate join) and total
work is n²/<literal> — quadratic, invisible at fixture scale. The
§16 rule: every sample/cap/bucket-count must be ABSOLUTE or an
explicit function of n that holds per-bucket mass constant (the
blessed pattern: ``stride = max(<abs>, n // <k>)`` via the memoized
size probe, clamped to the fixture value at driver-checked scales so
fixed oracle SQL still matches).

This lint makes the fifth recurrence impossible: it AST-scans the
package for ``<expr> % <int literal> == 0`` comparisons and reports
(function, literal, line). ``tests/test_scale_lint.py`` fails on any
hit not in its justified allowlist — a new literal stride must either
be rewritten onto the blessed pattern or argued (in code review, via
the allowlist's justification string) to feed only linear consumers.

Run standalone: ``python tools/scale_lint.py`` prints all hits.
"""

from __future__ import annotations

import ast
import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = os.path.join(REPO, "etl_geotab_spark")


# engine-side string-expression entry points: a SQL-string stride
# inside these runs ON SPARK and is the same quadratic class as the
# Python-AST shape (round-8 review: the AST-only lint was blind to
# F.expr("vec_id % 100 = 0")). DuckDB ORACLE strings are NOT flagged:
# they are passed to `register(...)`, run only in DuckDB at sf0.01,
# and legitimately mirror the engine's (justified) strides.
_STR_EXPR_CALLS = {"expr", "selectExpr", "sql", "where", "filter"}
# Flagged string shapes (round-9 advice widened the scan):
#   k % 100 = 0 | == 0        (the four historical regressions)
#   (k % 100) = 0             (parenthesized comparison operand)
#   pmod(k, 100) = 0 / MOD(k, 100) == 0   (function-form modulo; first
#       argument may carry one nesting level of parens, e.g. hash(x))
# NECESSARY-NOT-SUFFICIENT — known residual gaps, by design (each
# would flag key-derivation far more often than sampling, destroying
# the precision that keeps the allowlist honest; reviewers must still
# read new sampling code):
#   * strides assembled via f-strings/format/concat at runtime;
#   * complement shapes (`% k != 0`, `% k <> 0`) and bucket selections
#     (`% k < j`, `pmod(k, m) IN (...)`) — same class, not matched on
#     either the AST or the string side;
#   * modulo spelled via floor-division identities.
_STR_STRIDE_RE = re.compile(
    r"%\s*(\d+)\s*\)?\s*==?\s*0"
    r"|\b(?:pmod|mod)\s*\((?:[^()]|\([^()]*\))*?,\s*(\d+)\s*\)\s*==?\s*0",
    re.IGNORECASE,
)


def find_literal_strides(
    source: str, filename: str = "<string>"
) -> list[tuple[str, int, int]]:
    """All ``<expr> % <int literal> == 0`` comparisons in ``source`` —
    both as Python AST and inside string arguments of engine-side
    expression calls (``F.expr``/``selectExpr``/``spark.sql``/string
    ``where``/``filter``) — as (enclosing_function, literal, lineno).
    Module-level hits report function ``<module>``. Only the ``== 0``
    shape is flagged — that is the sampling idiom; key-derivation uses
    of ``%`` (shard ids, synthetic coordinates, hash mixing) don't
    compare to zero."""
    tree = ast.parse(source, filename=filename)
    hits: list[tuple[str, int, int]] = []

    class V(ast.NodeVisitor):
        def __init__(self) -> None:
            self.stack = ["<module>"]

        def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
            self.stack.append(node.name)
            self.generic_visit(node)
            self.stack.pop()

        visit_AsyncFunctionDef = visit_FunctionDef  # type: ignore[assignment]

        def visit_Compare(self, node: ast.Compare) -> None:
            if (
                isinstance(node.left, ast.BinOp)
                and isinstance(node.left.op, ast.Mod)
                and isinstance(node.left.right, ast.Constant)
                and isinstance(node.left.right.value, int)
                and len(node.ops) == 1
                and isinstance(node.ops[0], ast.Eq)
                and isinstance(node.comparators[0], ast.Constant)
                and node.comparators[0].value == 0
            ):
                hits.append(
                    (self.stack[-1], node.left.right.value, node.lineno)
                )
            self.generic_visit(node)

        def visit_Call(self, node: ast.Call) -> None:
            name = None
            if isinstance(node.func, ast.Attribute):
                name = node.func.attr
            elif isinstance(node.func, ast.Name):
                name = node.func.id
            if name in _STR_EXPR_CALLS:
                for arg in list(node.args) + [kw.value for kw in node.keywords]:
                    for const in ast.walk(arg):
                        if isinstance(const, ast.Constant) and isinstance(
                            const.value, str
                        ):
                            for m in _STR_STRIDE_RE.finditer(const.value):
                                hits.append(
                                    (
                                        self.stack[-1],
                                        int(m.group(1) or m.group(2)),
                                        const.lineno,
                                    )
                                )
            self.generic_visit(node)

    V().visit(tree)
    return hits


def scan_package() -> dict[str, list[tuple[str, int, int]]]:
    """Scan every .py under etl_geotab_spark/; path → hits."""
    out: dict[str, list[tuple[str, int, int]]] = {}
    for path in sorted(glob.glob(os.path.join(PACKAGE, "**", "*.py"), recursive=True)):
        with open(path) as f:
            hits = find_literal_strides(f.read(), path)
        if hits:
            out[os.path.relpath(path, REPO)] = hits
    return out


if __name__ == "__main__":
    for path, hits in scan_package().items():
        print(path)
        for fn, lit, ln in hits:
            print(f"  {fn}: % {lit} == 0  (line {ln})")
