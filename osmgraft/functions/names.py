"""P3/P4: name resolution from the tags map.

Two variants exist in the reference:

- import variant (``get_name``, /root/reference/src/input/osminputhelper.cpp:478-513):
  intended priority ``name`` > ``official_name`` > ``int_name`` > ``name:en``;
  default ``""``. The C++ has a dominance bug: the ``official_name`` branch
  sets the running max to the ``name`` priority (line 504), so an
  ``official_name`` tag encountered before ``name`` suppresses the later
  ``name``. We implement the INTENDED fixed priority (tag-vector order
  independence) and record the delta here: rows whose tag order puts
  ``official_name`` before ``name`` differ from the reference binary.

- label variant (``OsmPoi::getName``, /root/reference/src/primitives/osmpoi.cpp:246-274):
  intended priority ``name`` > ``name:de`` > ``name:en``; default
  ``"<undefined>"``. The C++ dominance comparison is inverted (``d < NAME_DE``
  admits an override of an already-seen ``name``), making ``name:en`` win in
  practice. We implement the INTENDED priority, consistent with the import
  variant; the delta only affects rows carrying multiple name tags.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNDEFINED = "<undefined>"


def import_name_expr(tags: Column) -> Column:
    """P3 — name used for the admission filter; '' if none."""
    return F.coalesce(
        F.element_at(tags, F.lit("name")),
        F.element_at(tags, F.lit("official_name")),
        F.element_at(tags, F.lit("int_name")),
        F.element_at(tags, F.lit("name:en")),
        F.lit(""),
    )


def label_name_expr(tags: Column) -> Column:
    """P4 — name used as label text; '<undefined>' if none."""
    return F.coalesce(
        F.element_at(tags, F.lit("name")),
        F.element_at(tags, F.lit("name:de")),
        F.element_at(tags, F.lit("name:en")),
        F.lit(UNDEFINED),
    )


def import_name_literal_expr(entries: Column) -> Column:
    """P3 LITERAL mode — reproduces the reference binary's get_name
    (osminputhelper.cpp:478-513) including its bug: the official_name
    branch sets the running max level to `name`'s 100 (line :504), so an
    official_name encountered BEFORE a name suppresses the later name.
    Order-dependent, so it folds over the ORDERED tag entries
    (decode.tag_entries_expr), not the map."""
    init = F.struct(F.lit("").alias("res"), F.lit(0).alias("lvl"))

    def step(acc: Column, e: Column) -> Column:
        k, v = e["key"], e["value"]
        is_en = (k == F.lit("name:en")) & (acc["lvl"] < 50)
        is_int = (k == F.lit("int_name")) & (acc["lvl"] < 70)
        is_off = (k == F.lit("official_name")) & (acc["lvl"] < 80)
        is_name = (k == F.lit("name")) & (acc["lvl"] < 100)
        hit = is_en | is_int | is_off | is_name
        res = F.when(hit, v).otherwise(acc["res"])
        # the bug: official_name advances the level to 100, not 80; name's
        # `break` is equivalent to its level-100 guard blocking everything
        lvl = (
            F.when(is_name | is_off, F.lit(100))
            .when(is_int, F.lit(70))
            .when(is_en, F.lit(50))
            .otherwise(acc["lvl"])
        )
        return F.struct(res.alias("res"), lvl.alias("lvl"))

    return F.aggregate(entries, init, step, lambda acc: acc["res"])


def label_name_literal_expr(tags: Column) -> Column:
    """P4 LITERAL mode — reproduces OsmPoi::getName (osmpoi.cpp:246-274),
    whose Dom guards are inverted: a later name:de overrides an earlier
    name and name:en overrides both, so the effective priority is
    name:en > name:de > name — the reverse of the intended order. (Keys
    are unique in a tag set, so this quirk is order-independent and the
    map form suffices.)"""
    return F.coalesce(
        F.element_at(tags, F.lit("name:en")),
        F.element_at(tags, F.lit("name:de")),
        F.element_at(tags, F.lit("name")),
        F.lit(UNDEFINED),
    )


def population_expr(tags: Column) -> Column:
    """O1 sort key: atoi(tags['population']) else 0 (osmpoi.cpp:67-75)."""
    from osmgraft.functions.classify import atoi_expr

    return F.coalesce(atoi_expr(F.element_at(tags, F.lit("population"))), F.lit(0))
