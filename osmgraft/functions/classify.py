"""C1: level-tree classification compiled to a single Catalyst expression.

The reference classifies per-row by recursive tree walk
(LevelTree::computeLevel, /root/reference/src/mapping/mappinghelper.cpp:421-445):

- a node matches iff it has no constraints OR ANY of its constraints holds
  (OR semantics, mappinghelper.cpp:426-430);
- a non-matching node yields the default level (id 0);
- a matching leaf yields its level;
- a matching inner node yields the first child (document order) whose
  subtree yields non-default, else default (mappinghelper.cpp:436-443).

We compile the whole tree ONCE on the driver into nested
``WHEN/COALESCE`` column expressions over a ``map<string,string>`` tags
column — pure whole-stage-codegen JVM execution, no Python on the hot path.
``NULL`` encodes "default" internally; the top level coalesces to 0.

Constraint semantics (checkConstraint, mappinghelper.cpp:377-407) —
missing tag => false for every type; GREATER is ``atoi(v) >= comp``;
LESS is ``atoi(v) < comp``; EQUALS is string equality; TAG is existence.
``atoi`` semantics (leading whitespace + optional sign + digits, else 0)
are reproduced exactly because they affect level assignment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osmgraft.sources.config import EQUALS, GREATER, LESS, TAG, Constraint, FilterNode, LabelConfig, LevelNode

# C atoi: optional leading whitespace, optional sign, leading digit run.
_ATOI_RE = r"^[\t\n\x0b\x0c\r ]*([+-]?[0-9]+)"


def atoi_expr(value: Column) -> Column:
    """C ``atoi`` over a string column: non-numeric -> 0, NULL -> NULL."""
    num = F.regexp_extract(value, _ATOI_RE, 1).try_cast("long")
    return F.when(value.isNull(), F.lit(None).cast("long")).otherwise(F.coalesce(num, F.lit(0)))


def constraint_expr(c: Constraint, tags: Column) -> Column:
    v = F.element_at(tags, F.lit(c.tag))
    if c.ctype == EQUALS:
        return v.isNotNull() & (v == F.lit(c.comp))
    if c.ctype == GREATER:
        return v.isNotNull() & (atoi_expr(v) >= F.lit(int(c.comp)))
    if c.ctype == LESS:
        return v.isNotNull() & (atoi_expr(v) < F.lit(int(c.comp)))
    if c.ctype == TAG:
        return v.isNotNull()
    raise ValueError(f"unknown constraint type {c.ctype}")


def _node_match(n: LevelNode, tags: Column) -> Column:
    if not n.constraints:
        return F.lit(True)
    expr = constraint_expr(n.constraints[0], tags)
    for c in n.constraints[1:]:
        expr = expr | constraint_expr(c, tags)
    return expr


def _node_expr(n: LevelNode, tags: Column) -> Column:
    """Level id as a column; NULL means 'default' (no match in subtree)."""
    if n.is_leaf:
        result: Column = F.lit(n.level_id).cast("long")
    else:
        result = F.coalesce(*[_node_expr(c, tags) for c in n.children])
    return F.when(_node_match(n, tags), result)  # otherwise NULL


def level_expr(cfg: LabelConfig, tags: Column) -> Column:
    """tags map -> level_id (0 = undefined), single codegen expression."""
    return F.coalesce(_node_expr(cfg.mapping_root, tags), F.lit(0).cast("long"))


def filter_expr(node: FilterNode | None, tags: Column) -> Column:
    """P1: tag-key filter tree -> boolean column (filterhelper.cpp:29-53)."""
    if node is None:
        return F.lit(True)
    if node.ftype == "value":
        return F.element_at(tags, F.lit(node.value)).isNotNull()
    sub = [filter_expr(o, tags) for o in node.operands]
    expr = sub[0]
    for s in sub[1:]:
        expr = (expr & s) if node.ftype == "and" else (expr | s)
    return expr


def levels_rows(cfg: LabelConfig) -> list[tuple[int, str, int, str]]:
    """The tiny levels dimension (broadcast side of A4/L6 joins)."""
    return [(lf.level_id, lf.name, lf.factor, lf.icon) for lf in cfg.leaves()]


# ---------------------------------------------------------------------------
# Pure-Python oracle (used by unit tests to pin semantics independently of
# the Catalyst compilation; mirrors checkConstraint/computeLevel verbatim).
# ---------------------------------------------------------------------------


def _py_atoi(s: str) -> int:
    import re

    m = re.match(_ATOI_RE, s)
    return int(m.group(1)) if m else 0


def _py_constraint(c: Constraint, tags: dict[str, str]) -> bool:
    v = tags.get(c.tag)
    if v is None:
        return False
    if c.ctype == EQUALS:
        return v == c.comp
    if c.ctype == GREATER:
        return _py_atoi(v) >= int(c.comp)
    if c.ctype == LESS:
        return _py_atoi(v) < int(c.comp)
    return True  # TAG: exists


def py_level(cfg: LabelConfig, tags: dict[str, str]) -> int:
    def walk(n: LevelNode) -> int:
        matches = not n.constraints or any(_py_constraint(c, tags) for c in n.constraints)
        if not matches:
            return 0
        if n.is_leaf:
            return n.level_id
        for child in n.children:
            lid = walk(child)
            if lid != 0:
                return lid
        return 0

    return walk(cfg.mapping_root)


def py_filter(node: FilterNode | None, tags: dict[str, str]) -> bool:
    if node is None:
        return True
    if node.ftype == "value":
        return node.value in tags
    results = (py_filter(o, tags) for o in node.operands)
    return all(results) if node.ftype == "and" else any(results)
