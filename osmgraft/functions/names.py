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


def population_expr(tags: Column) -> Column:
    """O1 sort key: atoi(tags['population']) else 0 (osmpoi.cpp:67-75)."""
    from osmgraft.functions.classify import atoi_expr

    return F.coalesce(atoi_expr(F.element_at(tags, F.lit("population"))), F.lit(0))
