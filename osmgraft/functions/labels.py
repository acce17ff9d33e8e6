"""L2-L6: label normalization, two-line split, and label-ball radius.

Faithful re-implementation of the reference label kernel
(/root/reference/src/label/labelhelper.cpp) over Python codepoint strings
(the reference round-trips UTF-8 <-> UTF-32, utf8helper.cpp:57-121; Python
strings are already codepoint sequences).

Executed as an Arrow-vectorized pandas UDF: batches arrive as Arrow
buffers; the per-string control flow is irregular (median scan, delimiter
search) exactly as in the reference, but strings are short (labels), so the
per-batch Python cost is bounded and there is NO per-row serialization.

Semantics notes (all pinned by tests):
- ``replaceAllOf`` replaces only the FIRST occurrence of each form
  (labelhelper.cpp:33-43) — reproduced literally.
- The C++ iterates ``std::unordered_set`` (nondeterministic order); we fix
  the declaration order of utf8helper.cpp:23-55, a deterministic choice.
- ``radius = max(w1, w2) / 2`` is C++ *integer* division
  (labelhelper.cpp:113-121) — reproduced.
- trailing-newline strip looks at the 2-char suffix then the 1-char suffix
  (labelhelper.cpp:172-181).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from osmgraft.functions.fontmetrics import DEFAULT_METRICS, FontMetrics

# utf8helper.cpp:23-36 — newline forms, declaration order.
NEWLINE_FORMS: tuple[str, ...] = (
    "\r\n",      # CR+LF
    "\n",        # LF
    "\u000b",    # vertical tab
    "\u000c",    # form feed
    "\r",        # CR
    "\u0085",    # next line
    "\u2028",    # line separator
    "\u2029",    # paragraph separator
    "^M",        # literal two-char marker (utf8helper.cpp:34)
)
# utf8helper.cpp:38-55 — blank forms.
BLANK_FORMS: tuple[str, ...] = (
    "\u0009", "\u0020", "\u00a0", "\u1680",
    "\u2000", "\u2001", "\u2002", "\u2003", "\u2004", "\u2005",
    "\u2006", "\u2007", "\u2008", "\u2009", "\u200a",
    "\u202f", "\u205f", "\u3000",
)
_NEWLINE_SET = frozenset(NEWLINE_FORMS)


def _replace_first_of(forms: Iterable[str], by: str, s: str) -> str:
    """replaceAllOf (labelhelper.cpp:33-43): first occurrence per form."""
    for form in forms:
        if form in s:
            s = s.replace(form, by, 1)
    return s


def _trim(s: str, ch: str = " ") -> str:
    """trim (labelhelper.cpp:45-60): strip exact char both ends."""
    return s.strip(ch)


def _to_label_split(label: str, split_pos: int) -> tuple[str, str]:
    """toLabelSplit (labelhelper.cpp:63-82)."""
    l1, l2 = label[: split_pos + 1], label[split_pos + 1 :]
    l1 = _replace_first_of(NEWLINE_FORMS, " ", l1)
    l2 = _replace_first_of(NEWLINE_FORMS, " ", l2)
    l1 = _replace_first_of(BLANK_FORMS, " ", l1)
    l2 = _replace_first_of(BLANK_FORMS, " ", l2)
    return _trim(l1), _trim(l2)


def compute_label_split(
    label: str,
    delims: frozenset[str],
    metrics: FontMetrics = DEFAULT_METRICS,
) -> str:
    """computeLabelSplit (labelhelper.cpp:160-269)."""
    # strip trailing newline info (:172-181)
    if len(label) >= 2 and label[-2:] in _NEWLINE_SET:
        label = label[:-1]
    if len(label) >= 1 and label[-1:] in _NEWLINE_SET:
        label = label[:-1]
    if len(label) <= 1:
        return label

    # normalize all non-'\n' newline forms to '\n' (:189-210)
    newline_info = False
    for form in NEWLINE_FORMS:
        if form[0] in delims:
            continue
        if form == "\n":
            if form in label:
                newline_info = True
            continue
        while form in label:
            newline_info = True
            label = label.replace(form, "\n", 1)
    if newline_info:
        return compute_label_split(label, frozenset("\n"), metrics)

    # median position by rendered width (:222-227)
    length = metrics.text_width(label)
    index = 0
    while index < len(label) and metrics.text_width(label[:index]) < length // 2:
        index += 1

    if index < len(label) and label[index] in delims:
        l1, l2 = _to_label_split(label, index)
        return l1 + "\n" + l2

    # nearest delimiter left of median (exclusive of position 0, :230-239)
    best_first: tuple[str, str] | None = None
    size_first = None
    for i in range(index - 1, 0, -1):
        if label[i] in delims:
            best_first = _to_label_split(label, i)
            size_first = max(metrics.text_width(best_first[0]), metrics.text_width(best_first[1]))
            break
    # nearest delimiter right of median (:241-250)
    best_second: tuple[str, str] | None = None
    size_second = None
    for i in range(index + 1, len(label)):
        if label[i] in delims:
            best_second = _to_label_split(label, i)
            size_second = max(metrics.text_width(best_second[0]), metrics.text_width(best_second[1]))
            break

    if best_first is None and best_second is None:
        return label  # no viable split (:262-264)
    if best_second is None or (best_first is not None and size_first < size_second):
        l1, l2 = best_first  # type: ignore[misc]
    else:
        l1, l2 = best_second
    return l1 + "\n" + l2


def split_sizes(label: str, metrics: FontMetrics = DEFAULT_METRICS) -> tuple[int, int]:
    """computeLabelSplitSize (labelhelper.cpp:144-158): split on FIRST '\\n'."""
    pos = label.find("\n")
    if pos < 0:
        return metrics.text_width(label), -1
    return metrics.text_width(label[:pos]), metrics.text_width(label[pos + 1 :])


def compute_label_ball(
    name: str,
    icon: str,
    factor: int,
    split_bound: int,
    split_chars: frozenset[str],
    metrics: FontMetrics = DEFAULT_METRICS,
) -> tuple[str, float]:
    """computeLabelBall (labelhelper.cpp:102-134) -> (label, radius)."""
    if icon:
        label = "icon:" + icon
        radius: float = float(metrics.mean_letter_width)
    else:
        split_size_px = split_bound * metrics.mean_letter_width  # labelhelper.cpp:90
        if metrics.text_width(name) > split_size_px:
            label = compute_label_split(name, split_chars, metrics)
        else:
            label = name
        w1, w2 = split_sizes(label, metrics)
        radius = float(max(w1, w2) // 2)  # C++ int division (:121)
    return label, radius * factor  # factor applied last (:124)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_BALL_SCHEMA = StructType(
    [StructField("label", StringType()), StructField("radius", DoubleType())]
)


def label_ball_udf(split_bound: int, split_chars: frozenset[str], metrics: FontMetrics = DEFAULT_METRICS):
    """Arrow-batched (name, icon, factor) -> struct(label, radius).

    The closure captures only the small immutable metrics table; Spark
    serializes it once per task, not per row.
    """
    chars = frozenset(split_chars)

    @F.pandas_udf(_BALL_SCHEMA)
    def _ball(name: pd.Series, icon: pd.Series, factor: pd.Series) -> pd.DataFrame:
        labels: list[str] = []
        radii: list[float] = []
        for n, ic, fa in zip(name.to_numpy(), icon.to_numpy(), factor.to_numpy()):
            lb, r = compute_label_ball(
                n if isinstance(n, str) else "",
                ic if isinstance(ic, str) else "",
                int(fa),
                split_bound,
                chars,
                metrics,
            )
            labels.append(lb)
            radii.append(r)
        return pd.DataFrame({"label": labels, "radius": radii})

    return _ball


def attach_label_ball(df, cfg, name_col: str = "name", icon_col: str = "icon", factor_col: str = "factor"):
    """Add ``label``/``radius`` columns to a POI frame (driver loop
    main.cpp:148-154, re-expressed as one vectorized projection)."""
    udf = label_ball_udf(cfg.split_bound, cfg.split_chars)
    ball = udf(F.col(name_col), F.col(icon_col), F.col(factor_col))
    return df.withColumn("_ball", ball).withColumn("label", F.col("_ball.label")).withColumn(
        "radius", F.col("_ball.radius")
    ).drop("_ball")


def format_balls_rows(df, sep: str = " ") -> Column:
    """K2 balls-only row formatter (writeBallsFile,
    textoutputhelper.cpp:38-65): ``lat sep lon sep importance sep radius``
    with %.17f coords, sequential importance (== the global rank), radius
    ceiled to 3 decimals."""
    radius_ceiled = F.ceil(F.col("radius") * 1000) / 1000.0
    return F.format_string(
        f"%.17f{sep}%.17f{sep}%d{sep}%.3f",
        F.col("lat"),
        F.col("lon"),
        F.col("rank"),
        radius_ceiled,
    )


def format_complete_rows(df, sep: str = " ", export_hierarchy: bool = False) -> Column:
    """K1 row formatter (textoutputhelper.cpp:80-101):
    ``lat lon level|rank radius osm_id 'label' factor`` with %.17f coords,
    radius ceiled to 3 decimals, '\\n' escaped, factor %.3f (the stream
    keeps std::fixed/precision(3) from the radius write)."""
    level = F.col("level_id") if export_hierarchy else F.col("rank")
    radius_ceiled = F.ceil(F.col("radius") * 1000) / 1000.0
    label_esc = F.regexp_replace(F.col("label"), "\n", r"\\n")
    return F.format_string(
        f"%.17f{sep}%.17f{sep}%d{sep}%.3f{sep}%d{sep}'%s'{sep}%.3f",
        F.col("lat"),
        F.col("lon"),
        level,
        radius_ceiled,
        F.col("osm_id"),
        label_esc,
        F.col("factor"),
    )
