"""Driver-side DuckDB replica of the FULL label pipeline (the flagship
query's correctness oracle).

Two pieces:

- :func:`stage_pipeline_corpus` materializes the seeded synth corpus as
  parquet WITHOUT Spark (plain Python over ``synth._make`` — per-doc
  deterministic from ``(seed, i)``), in three files: the documents table
  and the packed-binary blobs table (the ENGINE's input — the Spark side
  runs the real decode on real payload bytes), plus a decoded geometry
  MIRROR for DuckDB (the mirror is produced by ``geoblob.unpack`` on the
  very same payload bytes, so it is the payloads' ground truth, not an
  independent re-derivation).

- :func:`label_pipeline_sql` generates one DuckDB statement reproducing
  the whole pipeline over those files: span decode + tag pivot, the P1
  filter and C1 level tree (compiled from the SAME LabelConfig the engine
  compiles its Catalyst expressions from), P3/P4 name resolution, the
  area path (unknown-role drop, P9 completeness, P8 size cap, A1/A2
  assembly centroid), U1 union, O1/O2 global rank, and the L2-L6 label
  kernel (advance/kerning widths, median split search, radius) from the
  SAME pinned FontMetrics.

Assembly centroid without replaying the stitch walk: the walk's node
multiset is order-independent — every outer-segment node ref counted
once, MINUS one occurrence of each distinct segment endpoint (junctions
appear twice across raw segment lists, once in the walk), PLUS the start
node again (the walk closes the ring back onto it). The start node is the
first stored node of the min-position outer member (``assemblePolygon``
walks from the first endpoint inserted into the adjacency map,
osminputhelper.cpp:98-141). Verified against the engine kernel by the
driver hash; holds for the synth corpus invariant of one closed outer
ring per relation (multi-ring/bail relations would need the full walk).

Label-kernel corpus preconditions (all hold for synth names and are the
reference's own common case): at most one embedded newline form per name,
forms never trailing, no exotic Unicode blanks — so replace-all equals
the reference's replace-one-at-a-time loop and the recursion's second
trailing-strip is a no-op.
"""

from __future__ import annotations

import os

from osmgraft.functions.fontmetrics import DEFAULT_METRICS, FontMetrics, _NARROW, _WIDE
from osmgraft.sources.config import EQUALS, GREATER, LESS, FilterNode, LabelConfig, LevelNode

_ATOI_RE_SQL = "'^[\\t\\n\\x0b\\x0c\\r ]*([+-]?[0-9]+)'"

# tag keys the pipeline consumes (constraints + filter + names + sort key)
_TAG_KEYS = [
    "place",
    "population",
    "amenity",
    "capacity",
    "name",
    "official_name",
    "int_name",
    "name:en",
    "name:de",
]

_MAX_LABEL_LEN = 120  # synth names are <= ~50 codepoints; generous cap


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _col(key: str) -> str:
    return "t_" + key.replace(":", "_")


# ---------------------------------------------------------------------------
# staging (pure Python — no Spark)
# ---------------------------------------------------------------------------


def stage_pipeline_corpus(
    n_docs: int = 800, seed: int = 42, base: str = "/tmp/osmgraft_pipeline_oracle"
) -> tuple[str, str, str]:
    """(docs_path, blobs_path, geom_path); idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmgraft.sources import geoblob
    from osmgraft.sources.synth import SynthParams, _cluster_centers, _make

    docs_path = f"{base}_docs.parquet"
    blobs_path = f"{base}_blobs.parquet"
    geom_path = f"{base}_geom.parquet"
    if all(os.path.exists(p) for p in (docs_path, blobs_path, geom_path)):
        return docs_path, blobs_path, geom_path

    p = SynthParams(n_docs=n_docs, seed=seed)
    centers = _cluster_centers(seed)
    docs: list[dict] = []
    blobs: list[dict] = []
    for i in range(n_docs):
        d, bs = _make(i, p, centers)
        docs.append(d)
        blobs.extend(bs)

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
                "spans": pa.array([d["spans"] for d in docs], pa.list_(span_t)),
            }
        ),
        docs_path,
    )
    pq.write_table(
        pa.table(
            {
                "blob_id": pa.array([b["blob_id"] for b in blobs], pa.string()),
                "payload": pa.array([b["payload"] for b in blobs], pa.binary()),
            }
        ),
        blobs_path,
    )

    g: dict[str, list] = {k: [] for k in ("blob_id", "gkind", "lat", "lon", "role", "way_id", "node_ids", "lats", "lons")}
    for b in blobs:
        d = geoblob.unpack(b["payload"])
        g["blob_id"].append(b["blob_id"])
        if d["kind"] == geoblob.KIND_POINT:
            g["gkind"].append("pt")
            g["lat"].append(float(d["lat"]))
            g["lon"].append(float(d["lon"]))
            g["role"].append(None)
            g["way_id"].append(None)
            g["node_ids"].append(None)
            g["lats"].append(None)
            g["lons"].append(None)
        else:
            g["gkind"].append("seg")
            g["lat"].append(None)
            g["lon"].append(None)
            g["role"].append(int(d["role"]))
            g["way_id"].append(int(d["way_id"]))
            g["node_ids"].append([int(x) for x in d["node_ids"]])
            g["lats"].append([float(x) for x in d["lats"]])
            g["lons"].append([float(x) for x in d["lons"]])
    pq.write_table(
        pa.table(
            {
                "blob_id": pa.array(g["blob_id"], pa.string()),
                "gkind": pa.array(g["gkind"], pa.string()),
                "lat": pa.array(g["lat"], pa.float64()),
                "lon": pa.array(g["lon"], pa.float64()),
                "role": pa.array(g["role"], pa.int32()),
                "way_id": pa.array(g["way_id"], pa.int64()),
                "node_ids": pa.array(g["node_ids"], pa.list_(pa.int64())),
                "lats": pa.array(g["lats"], pa.list_(pa.float64())),
                "lons": pa.array(g["lons"], pa.list_(pa.float64())),
            }
        ),
        geom_path,
    )
    return docs_path, blobs_path, geom_path


# ---------------------------------------------------------------------------
# config -> SQL (mirrors functions/classify.py expression compilers)
# ---------------------------------------------------------------------------


def _atoi_sql(v: str) -> str:
    return f"coalesce(try_cast(regexp_extract({v}, {_ATOI_RE_SQL}, 1) as bigint), 0)"


def _constraint_sql(c, get) -> str:
    v = get(c.tag)
    if c.ctype == EQUALS:
        return f"({v} is not null and {v} = {_q(str(c.comp))})"
    if c.ctype == GREATER:
        return f"({v} is not null and {_atoi_sql(v)} >= {int(c.comp)})"
    if c.ctype == LESS:
        return f"({v} is not null and {_atoi_sql(v)} < {int(c.comp)})"
    return f"({v} is not null)"  # TAG


def _node_sql(n: LevelNode, get) -> str:
    if n.is_leaf:
        res = f"{n.level_id}::bigint"
    else:
        res = "coalesce(" + ", ".join(_node_sql(c, get) for c in n.children) + ")"
    match = " or ".join(_constraint_sql(c, get) for c in n.constraints) if n.constraints else "true"
    return f"(case when {match} then {res} end)"


def level_sql(cfg: LabelConfig, get) -> str:
    return f"coalesce({_node_sql(cfg.mapping_root, get)}, 0::bigint)"


def filter_sql(node: FilterNode | None, get) -> str:
    if node is None:
        return "true"
    if node.ftype == "value":
        return f"({get(node.value)} is not null)"
    op = " and " if node.ftype == "and" else " or "
    return "(" + op.join(filter_sql(o, get) for o in node.operands) + ")"


def _leaf_case(cfg: LabelConfig, value) -> str:
    arms = " ".join(f"when {lf.level_id} then {value(lf)}" for lf in cfg.leaves())
    return f"(case level_id {arms} end)"


# ---------------------------------------------------------------------------
# font metrics -> SQL
# ---------------------------------------------------------------------------


def _adv_sql(c: str, metrics: FontMetrics) -> str:
    """Advance of the single-char expr ``c`` (fontmetrics._advance)."""
    assert metrics.advances is None, "only the builtin class-based table is SQL-generated"
    narrow = ", ".join(_q(ch) for ch in sorted(set(_NARROW)))
    wide = ", ".join(_q(ch) for ch in sorted(set(_WIDE)))
    return (
        f"(case when {c} in ({narrow}) then 5 when {c} in ({wide}) then 16 "
        f"when {c} between '0' and '9' then 10 when {c} between 'A' and 'Z' then 12 "
        f"when unicode({c}) < 32 then 0 else 9 end)"
    )


def _kern_sql(prev: str, c: str, metrics: FontMetrics) -> str:
    arms = " ".join(
        f"when {prev} = {_q(a)} and {c} = {_q(b)} then {v}"
        for (a, b), v in sorted(metrics.kerning.items())
    )
    return f"(case {arms} else 0 end)"


# ---------------------------------------------------------------------------
# the full pipeline statement
# ---------------------------------------------------------------------------


def _core_ctes(docs_path: str, geom_path: str, cfg: LabelConfig) -> str:
    """CTE list from the raw files through ``ranked`` (decode, filter,
    classify, names, area assembly centroid, union, global rank) — shared
    by the label-pipeline, label-dedup, and adaptive-cell oracles."""
    get = lambda key: _col(key)  # noqa: E731
    lvl = level_sql(cfg, get)
    filt = filter_sql(cfg.filter_tree, get)
    factor = _leaf_case(cfg, lambda lf: str(lf.factor))
    icon = _leaf_case(cfg, lambda lf: _q(lf.icon))
    tag_pivot = ", ".join(
        f"max(case when k = {_q(key)} then v end) as {_col(key)}" for key in _TAG_KEYS
    )
    return f"""docs as materialized (select * from read_parquet('{docs_path}')),
geom as materialized (select * from read_parquet('{geom_path}')),
sp as materialized (select doc_id, unnest(spans) as s from docs),
tagkv as materialized (
  select doc_id, split_part(s.text, '=', 1) as k,
         substr(s.text, length(split_part(s.text, '=', 1)) + 2) as v
  from sp where s.kind = 'tag'
),
tags as materialized (select doc_id, {tag_pivot} from tagkv group by doc_id),
grefs as materialized (
  select doc_id, replace(s.media_ref, 'geom://', '') as ref,
         row_number() over (partition by doc_id order by s.offset) as ord
  from sp where s.kind = 'geom'
),
-- ======================= node path (S1/P1/C1/P3/P7) =======================
node_pois as materialized (
  select cast(split_part(d.doc_id, '/', 2) as bigint) as osm_id, g.lat, g.lon, t.*
  from docs d
  join (select doc_id, ref from grefs where ord = 1) r on r.doc_id = d.doc_id
  join geom g on g.blob_id = r.ref and g.gkind = 'pt'
  join tags t on t.doc_id = d.doc_id
  where d.doc_id like 'node/%'
),
node_adm as materialized (
  select *, coalesce(t_name, t_official_name, t_int_name, t_name_en, '') as import_name
  from (select *, {lvl} as level_id from node_pois where {filt}) x
  where level_id <> 0
    and (coalesce(t_name, t_official_name, t_int_name, t_name_en, '') <> ''
         or {icon} <> '')
),
-- ================== area path (S2/J1-J4/P8/P9/A1/A2) ======================
rel_mem as materialized (
  select cast(split_part(r.doc_id, '/', 2) as bigint) as rel_id, r.doc_id, r.ord,
         g.role, g.way_id, g.node_ids, g.lats, g.lons
  from grefs r
  left join geom g on g.blob_id = r.ref and g.gkind = 'seg'
  where r.doc_id like 'rel/%'
),
rel_keep as materialized (
  select rel_id, doc_id from rel_mem
  group by rel_id, doc_id
  having max(case when way_id is null then 1 else 0 end) = 0      -- P9 completeness
     and max(case when role = 255 then 1 else 0 end) = 0          -- unknown-role drop
     and sum(case when role = 0 then len(node_ids) else 0 end) between 1 and 100  -- P8
),
outer_seg as materialized (
  select m.* from rel_mem m join rel_keep k on k.rel_id = m.rel_id where m.role = 0
),
seg_raw as materialized (
  select rel_id, sum(list_sum(lats)) as s_lat, sum(list_sum(lons)) as s_lon,
         sum(len(node_ids)) as n_raw
  from outer_seg group by rel_id
),
rel_nodes as materialized (
  select rel_id, u.node_id, any_value(u.la) as la, any_value(u.lo) as lo
  from (
    select rel_id, unnest(node_ids) as node_id, unnest(lats) as la, unnest(lons) as lo
    from outer_seg
  ) u group by rel_id, u.node_id
),
junctions as materialized (
  select e.rel_id, sum(n.la) as j_lat, sum(n.lo) as j_lon, count(*) as n_j
  from (
    select distinct rel_id, ep as node_id from (
      select rel_id, node_ids[1] as ep from outer_seg
      union all
      select rel_id, node_ids[len(node_ids)] as ep from outer_seg
    )
  ) e join rel_nodes n on n.rel_id = e.rel_id and n.node_id = e.node_id
  group by e.rel_id
),
starts as materialized (
  select rel_id, lats[1] as st_lat, lons[1] as st_lon
  from (select *, row_number() over (partition by rel_id order by ord) as rn from outer_seg)
  where rn = 1
),
area_pois as materialized (
  select r.rel_id as osm_id,
         (s.s_lat - j.j_lat + st.st_lat) / (s.n_raw - j.n_j + 1) as lat,
         (s.s_lon - j.j_lon + st.st_lon) / (s.n_raw - j.n_j + 1) as lon,
         t.*
  from rel_keep r
  join seg_raw s on s.rel_id = r.rel_id
  join junctions j on j.rel_id = r.rel_id
  join starts st on st.rel_id = r.rel_id
  join tags t on t.doc_id = r.doc_id
  where {filt}
),
area_adm as materialized (
  select * from (select *, {lvl} as level_id from area_pois) x where level_id <> 0
),
-- ============================ U1 + O1/O2 ==================================
pois as materialized (
  select osm_id, lat, lon, level_id,
         coalesce({_atoi_sql('t_population')}, 0) as population,
         coalesce(t_name, t_name_de, t_name_en, '<undefined>') as label_src,
         {factor} as factor, {icon} as icon
  from (
    select osm_id, lat, lon, level_id, t_population, t_name, t_name_de, t_name_en
    from node_adm
    union all
    select osm_id, lat, lon, level_id, t_population, t_name, t_name_de, t_name_en
    from area_adm
  )
),
ranked as materialized (
  select *, row_number() over (order by level_id asc, population asc, osm_id asc) - 1 as rank
  from pois
)
"""


def _kernel_ctes(cfg: LabelConfig, metrics: FontMetrics) -> str:
    """CTE list of the L2-L6 label kernel (consumes ``ranked``)."""
    mean_w = metrics.mean_letter_width
    split_px = cfg.split_bound * mean_w
    delims = ", ".join(_q(ch) for ch in sorted(cfg.split_chars))
    adv = _adv_sql("c", metrics)
    kern = _kern_sql("prev", "c", metrics)
    nl = "chr(10)"
    # newline forms normalized to '\n' in declaration order (utf8helper.cpp:
    # 23-36); '\n' itself skipped; none start with a default split char
    forms = ["\r\n", "\x0b", "\x0c", "\r", "\u0085", "\u2028", "\u2029", "^M"]
    norm_expr = "stripped"
    for f in forms:
        lit = "chr(13) || chr(10)" if f == "\r\n" else _q(f)
        norm_expr = f"replace({norm_expr}, {lit}, {nl})"
    one_char_forms = ", ".join(
        _q(f) for f in ["\n", "\x0b", "\x0c", "\r", "\u0085", "\u2028", "\u2029"]
    )
    return f"""-- trailing-newline strip (labelhelper.cpp:172-181) + form normalization
kern_in as materialized (
  select osm_id, label_src as raw, icon, factor,
         strpos(label_src, {nl}) as raw_nl
  from ranked where icon = ''
),
normed as materialized (
  select osm_id, raw, raw_nl,
         {norm_expr.replace('s_stripped', 'stripped')} as norm
  from (
    select *,
      case when length(s1) >= 1 and substr(s1, length(s1), 1) in ({one_char_forms})
           then substr(s1, 1, length(s1) - 1) else s1 end as stripped
    from (
      select *,
        case when length(raw) >= 2
              and substr(raw, length(raw) - 1, 2) in (chr(13) || chr(10), '^M')
             then substr(raw, 1, length(raw) - 1) else raw end as s1
      from kern_in
    )
  )
),
measure1 as materialized (
  select osm_id, 'raw' as tag, raw as s from normed
  union all select osm_id, 'norm', norm from normed
  union all select osm_id, 'ns1', substr(raw, 1, raw_nl - 1) from normed where raw_nl > 0
  union all select osm_id, 'ns2', substr(raw, raw_nl + 1) from normed where raw_nl > 0
),
mchars1 as materialized (
  select m.osm_id, m.tag, r.k, substr(m.s, r.k, 1) as c,
         case when r.k = 1 then '' else substr(m.s, r.k - 1, 1) end as prev
  from measure1 m join range(1, {_MAX_LABEL_LEN + 1}) r(k) on r.k <= length(m.s)
),
madv1 as materialized (
  select osm_id, tag, k,
         {adv} + (case when k = 1 then 0 else {kern} end) as step
  from mchars1
),
widths1 as materialized (select osm_id, tag, sum(step)::bigint as w from madv1 group by osm_id, tag),
-- split branch only: width(raw) > split_bound * mean_letter_width
splitting as materialized (
  select n.osm_id, n.norm, strpos(n.norm, {nl}) > 0 as has_nl, length(n.norm) as nlen
  from normed n join widths1 wr on wr.osm_id = n.osm_id and wr.tag = 'raw'
  where wr.w > {split_px}
),
pref as materialized (
  select a.osm_id, a.k, sum(a.step) over (partition by a.osm_id order by a.k) as cum,
         m.c
  from madv1 a
  join mchars1 m on m.osm_id = a.osm_id and m.tag = a.tag and m.k = a.k
  join splitting s on s.osm_id = a.osm_id
  where a.tag = 'norm'
),
tot as materialized (
  select s.osm_id, w1.w as total from splitting s
  join widths1 w1 on w1.osm_id = s.osm_id and w1.tag = 'norm'
),
idxa as materialized (
  select p.osm_id, min(p.k) as ix
  from pref p join tot t on t.osm_id = p.osm_id
  where p.cum >= t.total // 2 and t.total // 2 > 0
  group by p.osm_id
),
median as materialized (
  select t.osm_id, coalesce(a.ix, 0) as ix
  from tot t left join idxa a on a.osm_id = t.osm_id
),
dpos as materialized (
  -- 0-based delimiter positions in norm, per the active delim set
  select p.osm_id, p.k - 1 as i
  from pref p join splitting s on s.osm_id = p.osm_id
  where case when s.has_nl then p.c = {nl} else p.c in ({delims}) end
),
cand as materialized (
  -- direct hit at the median, else nearest delim left (i >= 1) / right
  select m.osm_id, 'd' as which, m.ix as i
  from median m join splitting s on s.osm_id = m.osm_id
  where case when s.has_nl then substr(s.norm, m.ix + 1, 1) = {nl}
             else substr(s.norm, m.ix + 1, 1) in ({delims}) end
  union all
  select m.osm_id, 'l', max(d.i)
  from median m join dpos d on d.osm_id = m.osm_id and d.i < m.ix and d.i >= 1
  group by m.osm_id, m.ix
  union all
  select m.osm_id, 'r', min(d.i)
  from median m join dpos d on d.osm_id = m.osm_id and d.i > m.ix
  group by m.osm_id, m.ix
),
cand_lines as materialized (
  select c.osm_id, c.which, ln.ln,
         trim(regexp_replace(
           case when ln.ln = 1 then substr(s.norm, 1, c.i + 1) else substr(s.norm, c.i + 2) end,
           '\\n', ' '), ' ') as line
  from cand c join splitting s on s.osm_id = c.osm_id, (values (1), (2)) ln(ln)
),
mchars2 as materialized (
  select m.osm_id, m.which, m.ln, r.k, substr(m.line, r.k, 1) as c,
         case when r.k = 1 then '' else substr(m.line, r.k - 1, 1) end as prev
  from cand_lines m join range(1, {_MAX_LABEL_LEN + 1}) r(k) on r.k <= length(m.line)
),
widths2 as materialized (
  select osm_id, which, ln,
         sum({adv} + (case when k = 1 then 0 else {kern} end))::bigint as w
  from mchars2 group by osm_id, which, ln
),
cand_sized as materialized (
  select l.osm_id, l.which,
         max(case when l.ln = 1 then l.line end) as l1,
         max(case when l.ln = 2 then l.line end) as l2,
         greatest(coalesce(max(case when l.ln = 1 then w.w end), 0),
                  coalesce(max(case when l.ln = 2 then w.w end), 0)) as size
  from cand_lines l
  left join widths2 w on w.osm_id = l.osm_id and w.which = l.which and w.ln = l.ln
  group by l.osm_id, l.which
),
picked as materialized (
  select osm_id,
         case when max(case when which = 'd' then 1 else 0 end) = 1 then 'd'
              when max(case when which = 'l' then 1 else 0 end) = 1
               and max(case when which = 'r' then 1 else 0 end) = 1 then
                 (case when max(case when which = 'l' then size end)
                          < max(case when which = 'r' then size end)
                       then 'l' else 'r' end)
              when max(case when which = 'l' then 1 else 0 end) = 1 then 'l'
              else 'r' end as which
  from cand_sized group by osm_id
),
split_label as materialized (
  select s.osm_id,
         case when p.which is null then s.norm
              else cs.l1 || {nl} || cs.l2 end as label,
         case when p.which is null then t.total
              else cs.size end as maxw
  from splitting s
  left join picked p on p.osm_id = s.osm_id
  left join cand_sized cs on cs.osm_id = s.osm_id and cs.which = p.which
  join tot t on t.osm_id = s.osm_id
),
-- non-icon rows: label + radius (computeLabelBall, labelhelper.cpp:102-134)
nolabel as materialized (
  select n.osm_id,
         coalesce(sl.label, n.raw) as label,
         coalesce(sl.maxw,
                  case when n.raw_nl > 0
                       then greatest(coalesce(w1.w, 0), coalesce(w2.w, 0))
                       else wr.w end) as maxw
  from normed n
  left join split_label sl on sl.osm_id = n.osm_id
  left join widths1 wr on wr.osm_id = n.osm_id and wr.tag = 'raw'
  left join widths1 w1 on w1.osm_id = n.osm_id and w1.tag = 'ns1'
  left join widths1 w2 on w2.osm_id = n.osm_id and w2.tag = 'ns2'
)
"""


def label_pipeline_sql(
    docs_path: str,
    geom_path: str,
    cfg: LabelConfig,
    metrics: FontMetrics = DEFAULT_METRICS,
) -> str:
    mean_w = metrics.mean_letter_width
    return (
        f"with {_core_ctes(docs_path, geom_path, cfg)},\n"
        f"{_kernel_ctes(cfg, metrics)}\n"
        + f"""select round(r.lat, 6) as lat, round(r.lon, 6) as lon, r.level_id, r.rank,
       cast(case when r.icon <> '' then {mean_w} * r.factor
                 else (nl.maxw // 2) * r.factor end as double) as radius,
       r.osm_id,
       case when r.icon <> '' then 'icon:' || r.icon else nl.label end as label,
       cast(r.factor as double) as factor
from ranked r
left join nolabel nl on nl.osm_id = r.osm_id
"""
    )


# ---------------------------------------------------------------------------
# companion oracles over the same staged corpus (PIP, label dedup, adaptive
# cells) — these turned the last rows-only composite queries into full
# value-hash checks
# ---------------------------------------------------------------------------


def node_points_sql(docs_path: str, geom_path: str) -> str:
    """(pid, lat, lon) of EVERY node document — the raw decode, no filter
    (matches decode_documents().node_pois)."""
    return f"""
select cast(split_part(d.doc_id, '/', 2) as bigint) as pid, g.lat, g.lon
from read_parquet('{docs_path}') d
join (
  select doc_id, replace(s.media_ref, 'geom://', '') as ref,
         row_number() over (partition by doc_id order by s.offset) as ord
  from (select doc_id, unnest(spans) as s from read_parquet('{docs_path}'))
  where s.kind = 'geom'
) r on r.doc_id = d.doc_id and r.ord = 1
join read_parquet('{geom_path}') g on g.blob_id = r.ref and g.gkind = 'pt'
where d.doc_id like 'node/%'
"""


def pip_admin_sql(docs_path: str, geom_path: str) -> str:
    """(osm_id, poly_id): even-odd PIP of every node point against the
    admin rings — the exact crossing test of pip.point_in_ring, edges =
    consecutive vertex pairs plus the wrap edge (zero-length on the
    already-closed stored rings, contributing nothing, exactly like the
    engine kernel's always-appended closing edge)."""
    return f"""
with pts as materialized ({node_points_sql(docs_path, geom_path)}),
apoly as materialized (
  select cast(split_part(r.doc_id, '/', 2) as bigint) as poly_id, g.lats, g.lons
  from (
    select doc_id, replace(s.media_ref, 'geom://', '') as ref
    from (select doc_id, unnest(spans) as s from read_parquet('{docs_path}'))
    where s.kind = 'geom' and doc_id like 'admin/%'
  ) r join read_parquet('{geom_path}') g on g.blob_id = r.ref and g.gkind = 'seg'
),
edges as materialized (
  select poly_id,
         lats[r.k] as y1, lons[r.k] as x1,
         lats[case when r.k = len(lats) then 1 else r.k + 1 end] as y2,
         lons[case when r.k = len(lons) then 1 else r.k + 1 end] as x2
  from apoly, range(1, 64) r(k)
  where r.k <= len(lats)
),
hits as materialized (
  select p.pid, e.poly_id,
         sum(case when (e.y1 > p.lat) != (e.y2 > p.lat)
                   and p.lon < e.x1 + (p.lat - e.y1) / (e.y2 - e.y1) * (e.x2 - e.x1)
                  then 1 else 0 end) as c
  from pts p, edges e
  group by p.pid, e.poly_id
)
select pid as osm_id, poly_id from hits where c % 2 = 1
"""


def dedup_labels_sql(
    docs_path: str, geom_path: str, cfg: LabelConfig, radius_m: float
) -> str:
    """Suppression semantics of operators/knn.dedup_labels over the full
    pipeline's ranked labels: keep a label iff no better-ranked label lies
    within ``radius_m`` (exact haversine, same constants as the engine).
    Uses the UNROUNDED ranked coordinates so boundary distances agree with
    the engine to float precision."""
    hav = (
        "2*6371008.8*asin(sqrt("
        "pow(sin(radians(b.lat-a.lat)/2),2) + "
        "cos(radians(a.lat))*cos(radians(b.lat))*pow(sin(radians(b.lon-a.lon)/2),2)))"
    )
    return f"""
with {_core_ctes(docs_path, geom_path, cfg)}
select a.osm_id from ranked a
where not exists (
  select 1 from ranked b
  where b.rank < a.rank and {hav} <= {radius_m!r}
)
"""


def hex_cell_sql_expr(lat: str, lon: str, res: int) -> str:
    """Bit-exact DuckDB replica of osmgraft.functions.cells.hex_cell:
    axial coordinates + cube rounding + (res,q,r) bit-packing. round() is
    half-away-from-zero in DuckDB vs numpy's half-to-even, but the inputs
    are quotients of irrational products — an exact .5 fraction cannot
    occur (verified bit-equal over all sf rows at several resolutions)."""
    size = repr(5.12 / (1 << res))
    off = 1 << 28
    qf = f"((sqrt(3.0)/3.0*{lon} - {lat}/3.0)/{size})"
    rf = f"((2.0/3.0*{lat})/{size})"
    yf = f"(-{qf} - {rf})"
    rx, ry, rz = f"round({qf})", f"round({yf})", f"round({rf})"
    dx, dy, dz = f"abs({rx} - {qf})", f"abs({ry} - {yf})", f"abs({rz} - {rf})"
    cond1 = f"({dx} > {dy} and {dx} > {dz})"
    rx2 = f"(case when {cond1} then -{ry} - {rz} else {rx} end)"
    rz2 = f"(case when not {cond1} and {dz} > {dy} then -{rx2} - {ry} else {rz} end)"
    return (
        f"(({res}::bigint << 58) | ((cast({rx2} as bigint) + {off}) << 29) "
        f"| (cast({rz2} as bigint) + {off}))"
    )


def adaptive_cells_sql(pts_sql: str, base_res: int, max_rows: int, max_res: int) -> str:
    """SQL replica of skew.adaptive_cell_split over any (lat, lon) source:
    refinement round k re-encodes rows of over-full cells at res base+k (a
    cell whose count never exceeded the cap is never touched, so the
    unconditionally-chained rounds equal the engine's early-breaking,
    hot-branch-only loop)."""
    parts = [
        f"e0 as (select lat, lon, {hex_cell_sql_expr('lat', 'lon', base_res)} as cell from p)"
    ]
    prev = "e0"
    for k, res in enumerate(range(base_res + 1, max_res + 1), start=1):
        parts.append(
            f"c{k} as (select cell as _c{k}, count(*) as _n{k} from {prev} group by cell), "
            f"e{k} as (select lat, lon, case when _n{k} > {max_rows} "
            f"then {hex_cell_sql_expr('lat', 'lon', res)} else cell end as cell "
            f"from {prev} join c{k} on cell = _c{k})"
        )
        prev = f"e{k}"
    return (
        f"with p as ({pts_sql}), " + ", ".join(parts)
        + f" select cell, count(*) as n from {prev} group by cell"
    )
