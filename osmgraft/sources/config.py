"""Labeling-config source (S5): JSON -> driver-side dataclasses.

Same grammar as the reference config
(/root/reference/src/config/confighelper.cpp:31-68 and
config/example.conf): ``labeling_name``, ``label_split.split_bound``,
``label_split.split_chars`` (single-codepoint strings; longer entries are
warned about and ignored, confighelper.cpp:51-61), a ``filter`` tree of
``value``/``and``/``or`` nodes (filterhelper.cpp:29-53) and a ``mapping``
level tree (mappinghelper.cpp:193-236).

The config is compiled ONCE on the driver; nothing here ships to executors
except the resulting Catalyst expressions and a tiny levels dimension.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from importlib import resources
from typing import Any

# --- constraint / level tree -------------------------------------------------

EQUALS, GREATER, LESS, TAG = "equals", "greater", "less", "tag"


@dataclass(frozen=True)
class Constraint:
    """One classification constraint (mappinghelper.cpp:31-47).

    Precedence of type detection matches the C++ ctor: equals > greater >
    less > tag. ``comp`` is the string comparand for EQUALS, the int32
    comparand for GREATER/LESS, None for TAG.
    """

    ctype: str
    tag: str
    comp: Any = None

    @staticmethod
    def from_json(j: dict) -> "Constraint":
        if "equals" in j:
            return Constraint(EQUALS, j.get("tag", ""), str(j["equals"]))
        if "greater" in j:
            return Constraint(GREATER, j.get("tag", ""), int(j["greater"]))
        if "less" in j:
            return Constraint(LESS, j.get("tag", ""), int(j["less"]))
        return Constraint(TAG, j.get("tag", ""))


@dataclass
class LevelNode:
    """Mapping-tree node (mappinghelper.cpp:193-236).

    Leaf ids replicate the reference exactly: children are CONSTRUCTED in
    reverse document order with a shared counter starting at 1
    (``mNodeId = aNodeId++`` at leaf creation, mappinghelper.cpp:233), then
    the child list is reversed back so that match priority is document
    order. Net effect: the LAST leaf in document order gets id 1.
    """

    name: str
    constraints: list[Constraint] = field(default_factory=list)
    children: list["LevelNode"] = field(default_factory=list)
    is_leaf: bool = False
    level_id: int = 0  # UNDEFINED_ID = 0 (mappinghelper.h:61)
    factor: int = 0
    icon: str = ""


def _build_tree(j: dict, counter: list[int]) -> LevelNode:
    node = LevelNode(name=j.get("level", ""))
    for c in j.get("constraints", []):
        node.constraints.append(Constraint.from_json(c))
    subs = j.get("sublevels")
    if subs:
        # reverse-order construction, then reverse back (mappinghelper.cpp:219-229)
        for sub in reversed(subs):
            node.children.append(_build_tree(sub, counter))
        node.children.reverse()
    else:
        node.is_leaf = True
        node.level_id = counter[0]
        counter[0] += 1
        node.factor = int(j.get("factor", 0))
        node.icon = str(j.get("icon", ""))
    return node


# --- filter tree --------------------------------------------------------------


@dataclass(frozen=True)
class FilterNode:
    """Tag-key filter node (filterhelper.cpp:29-53): 'value' leaf = key
    exists; 'and'/'or' composites."""

    ftype: str  # 'value' | 'and' | 'or'
    value: str = ""
    operands: tuple["FilterNode", ...] = ()

    @staticmethod
    def from_json(j: dict) -> "FilterNode":
        t = j["type"]
        if t == "value":
            return FilterNode("value", value=str(j["value"]))
        if t not in ("and", "or"):
            raise ValueError(f"unknown filter type {t!r}")
        return FilterNode(t, operands=tuple(FilterNode.from_json(o) for o in j.get("operands", [])))


# --- top-level config ----------------------------------------------------------


@dataclass
class LabelConfig:
    labeling_name: str
    split_bound: int
    split_chars: frozenset[str]
    filter_tree: FilterNode | None
    mapping_root: LevelNode
    n_levels: int

    def leaves(self) -> list[LevelNode]:
        """All leaf levels in document (priority) order."""
        out: list[LevelNode] = []

        def walk(n: LevelNode) -> None:
            if n.is_leaf:
                out.append(n)
            else:
                for c in n.children:
                    walk(c)

        walk(self.mapping_root)
        return out


def load_config(obj_or_path: str | dict) -> LabelConfig:
    if isinstance(obj_or_path, str):
        with open(obj_or_path) as fh:
            j = json.load(fh)
    else:
        j = obj_or_path

    split = j.get("label_split", {})
    split_bound = int(split.get("split_bound", 15))
    chars = set()
    for ch in split.get("split_chars", []):
        # single-codepoint entries only (confighelper.cpp:51-61)
        if len(ch) == 1:
            chars.add(ch)
        else:
            print(f"[osmgraft] ignoring multi-char split entry {ch!r}", file=sys.stderr)

    counter = [1]
    root = _build_tree(j["mapping"], counter)
    filt = FilterNode.from_json(j["filter"]) if "filter" in j else None

    return LabelConfig(
        labeling_name=str(j.get("labeling_name", "labeling")),
        split_bound=split_bound,
        split_chars=frozenset(chars),
        filter_tree=filt,
        mapping_root=root,
        n_levels=counter[0] - 1,
    )


def default_config() -> LabelConfig:
    """The in-repo trimmed config (osmgraft/configs/default.json)."""
    with resources.files("osmgraft.configs").joinpath("default.json").open() as fh:
        return load_config(json.load(fh))
